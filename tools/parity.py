"""Local replica of the driver's correctness gate.

Runs every registered query's Spark DataFrame and DuckDB oracle SQL on the
same parquet fixtures and compares: row count, column names, and
order-insensitive values (exact where possible, tiny-float-tolerance
reported separately so risk is visible before the real gate runs).

Usage:
    python tools/parity.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell types, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return float(v)
        if isinstance(v, (np.bool_,)):
            return bool(v)
        if isinstance(v, pd.Timestamp):
            return v.to_pydatetime().replace(tzinfo=None)
        if isinstance(v, (list, np.ndarray)):
            return tuple(norm(x) for x in v)
        return v

    out = df.apply(lambda c: c.map(norm))
    key = out.apply(lambda r: tuple(repr(x) for x in r), axis=1)
    return out.loc[key.sort_values().index].reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive value hash of a result frame: columns sorted by
    name, cells normalized, rows sorted, sha256 over the row reprs.

    This is the STRICT comparator — no float tolerance. The driver's gate
    hashes both sides with one function, so any two frames equal under
    this canonicalization are equal under the gate's; a query that passes
    ``--hash`` locally cannot fail the gate on values (only on schema/rows,
    which are checked separately here too).
    """
    import hashlib

    c = canon(df)
    h = hashlib.sha256()
    h.update(("|".join(str(col) for col in c.columns)).encode())
    for row in c.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, bool, str]:
    """Returns (exact_match, approx_match, message)."""
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, False, f"columns differ: {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return False, False, f"row count {len(sdf)} vs {len(odf)}"
    a, b = canon(sdf), canon(odf)
    exact = a.equals(b)
    if exact:
        return True, True, "ok"
    # locate the mismatch; check float tolerance
    approx = True
    msg = []
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x == y or (x is None and y is None):
                continue
            if (
                isinstance(x, float)
                and isinstance(y, float)
                and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
            ):
                msg.append(f"float-ulp {col}[{i}]: {x!r} vs {y!r}")
                continue
            approx = False
            if len(msg) < 5:
                msg.append(f"MISMATCH {col}[{i}]: {x!r} vs {y!r}")
    return False, approx, "; ".join(msg[:5]) or "row-order-sensitive diff"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--hash",
        action="store_true",
        help="strict mode: compare sha256 value-hashes (no float tolerance) "
        "— the bit-identical pre-flight for the driver gate",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from streamline_hybrid_engine_spark import all_queries
    from streamline_hybrid_engine_spark.session import get_session

    spark = get_session("parity")
    con = duck_con(args.sf)
    qs = all_queries()
    names = args.queries or sorted(qs)
    n_exact = n_approx = n_fail = n_rows_only = 0
    for name in names:
        q = qs[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if q.oracle is None:
            ok = len(sdf) >= 0
            print(f"rows  {name}: {len(sdf)} rows ({dt:.1f}s) [rows-only]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(q.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if args.hash:
            if sorted(sdf.columns) != sorted(odf.columns):
                print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
                n_fail += 1
            elif len(sdf) != len(odf):
                print(f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}")
                n_fail += 1
            else:
                hs, ho = value_hash(sdf), value_hash(odf)
                if hs == ho:
                    print(f"exact {name}: {len(sdf)} rows hash={hs[:12]} ({dt:.1f}s)")
                    n_exact += 1
                else:
                    _, _, msg = compare(sdf, odf)
                    print(f"FAIL  {name}: hash {hs[:12]} != {ho[:12]} — {msg}")
                    n_fail += 1
            continue
        exact, approx, msg = compare(sdf, odf)
        if exact:
            print(f"exact {name}: {len(sdf)} rows ({dt:.1f}s)")
            n_exact += 1
        elif approx:
            print(f"APPROX {name}: {len(sdf)} rows ({dt:.1f}s) — {msg}")
            n_approx += 1
        else:
            print(f"FAIL  {name}: {msg}")
            n_fail += 1
    print(
        f"\n== {n_exact} exact, {n_approx} approx-only, {n_fail} fail, "
        f"{n_rows_only} rows-only / {len(names)} total =="
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
