#!/usr/bin/env python
"""Record settled sf0.1 medians for NEW headline ids (BASELINE.md waves).

Same methodology as bench.py / BASELINE.md §A: per query 1 warm-up then
median of 3 timed collect()s, with bench.py's inter-run GC + settle and
the load-gate at the start. Prints one JSON line per query plus a final
summary dict ready to paste into bench.py's BASELINE_SEC.

Usage: python tools/measure_wave.py id1 id2 ...
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    from streamline_hybrid_engine_spark.registry import all_queries
    from streamline_hybrid_engine_spark.session import default_sf_dir, get_session

    names = sys.argv[1:]
    sf_dir = default_sf_dir()
    spark = get_session("measure-wave")
    qs = all_queries()

    def drop_run_state() -> None:
        gc.collect()
        dropped = 0
        try:
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist(True)
                dropped += 1
        except Exception:
            pass
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        time.sleep(1.0 if dropped else 0.25)

    waited = 0.0
    while os.getloadavg()[0] >= 1.5 and waited < 180.0:
        time.sleep(5.0)
        waited += 5.0
    print(
        json.dumps(
            {"start_load1": round(os.getloadavg()[0], 2), "waited_s": waited}
        )
    )

    out: dict[str, float] = {}
    for name in names:
        fn = qs[name].fn
        fn(spark, sf_dir).collect()  # warm-up
        drop_run_state()
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            runs.append(time.time() - t0)
            drop_run_state()
        med = round(sorted(runs)[1], 2)
        out[name] = med
        print(
            json.dumps(
                {
                    "query": name,
                    "median_s": med,
                    "runs": [round(r, 3) for r in runs],
                    "load1": round(os.getloadavg()[0], 2),
                }
            )
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
