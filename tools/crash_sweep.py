#!/usr/bin/env python
"""Full-registry scale crash sweep: run EVERY registry query at
$SPARK_GRAFT_SF_DIR (default sf0.1) and count() it, recording per-id
wall + row count or the exception — one JSON line each, summary last.

Correctness gates run at sf0.01; this sweep is the 10× check that
catches the scale-crash class sf0.01 cannot see (ANSI int64 overflow:
dq_content_checksum's 48-bit-sum threw exactly here in r8, at 150k
rows, after stamping exact at 15k). Usage:

    python tools/crash_sweep.py            # sf0.1
    SPARK_GRAFT_SF_DIR=... python tools/crash_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    from streamline_hybrid_engine_spark.catalog import warm
    from streamline_hybrid_engine_spark.registry import all_queries
    from streamline_hybrid_engine_spark.session import default_sf_dir, get_session

    sf_dir = default_sf_dir()
    spark = get_session("crash-sweep")
    warm(spark, sf_dir)
    fails: dict[str, str] = {}
    qs = all_queries()
    if len(sys.argv) > 1:  # id args → incremental sweep (unknown id = error)
        missing = [a for a in sys.argv[1:] if a not in qs]
        if missing:
            print(json.dumps({"unknown_ids": missing}), flush=True)
            return 2
        qs = {a: qs[a] for a in sys.argv[1:]}
    for name, q in qs.items():
        t0 = time.time()
        try:
            n = q.fn(spark, sf_dir).count()
            print(
                json.dumps({"q": name, "rows": n, "s": round(time.time() - t0, 2)}),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — the sweep's whole job
            fails[name] = f"{type(e).__name__}: {str(e)[:300]}"
            print(json.dumps({"q": name, "FAIL": fails[name]}), flush=True)
    print(
        json.dumps({"total": len(qs), "n_fail": len(fails), "fails": fails}),
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
