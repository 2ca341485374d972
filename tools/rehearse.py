"""Full-dress rehearsal of the external driver's verify pass.

Unlike tools/parity.py (which uses the engine's own tuned session), this
simulates the DRIVER's conditions end to end: a VANILLA SparkSession with
no engine configs (so `catalog.ensure_runtime_confs` has to do its job,
exactly as on the real gate), `__spark_entry__` imported fresh, `entry()`
smoke-checked, then every `queries()` entry compared against its
`oracle_sql()` with the same canon/compare as parity.py. Run this before
every round handoff; an ad-hoc inline comparator once produced a false
NaN-tie failure that this tool's shared `compare()` does not.

Usage:
    python tools/rehearse.py [--sf /root/testdata/sf0.01] [--threads 8] [id ...]

With ids given, only that sample of `queries()` runs (entry() smoke always
runs) — the incremental pre-commit check; the no-arg full sweep remains the
round-handoff gate.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity import compare, duck_con  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("ids", nargs="*", help="query ids to run (default: all)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.threads}]")
        .appName("she-rehearsal")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    n_entry = len(entrymod.entry(spark).collect())
    assert n_entry >= 0
    print(f"entry(): {n_entry} rows")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if args.ids:
        unknown = [i for i in args.ids if i not in qs]
        if unknown:
            print(f"unknown ids: {unknown}")
            return 1
        qs = {i: qs[i] for i in args.ids}
    duck = duck_con(args.sf)
    t0 = time.time()
    n_exact = n_approx = n_rows_only = 0
    fails: list[tuple[str, str]] = []
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            if name not in oracles:
                n_rows_only += 1
                continue
            odf = duck.execute(oracles[name]).fetchdf()
            exact, approx, msg = compare(sdf, odf)
            if exact:
                n_exact += 1
            elif approx:
                n_approx += 1
                print(f"approx {name}: {msg}")
            else:
                fails.append((name, msg))
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            fails.append((name, f"{type(ex).__name__}: {ex}"[:200]))
    dt = time.time() - t0
    print(
        f"== {n_exact} exact, {n_approx} approx-only, {n_rows_only} rows-only, "
        f"{len(fails)} fails / {len(qs)} queries in {dt:.0f}s =="
    )
    for name, msg in fails:
        print(f"FAIL {name}: {msg}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
