"""Differential gate replica: every oracle-backed query vs DuckDB at sf0.001.

This is the same comparison the driver runs at sf0.01 (SURVEY §5.2 primary
gate), kept in-tree at the smallest scale factor so `pytest -x` catches a
parity regression in seconds per query.
"""

from __future__ import annotations

import pytest

from streamline_hybrid_engine_spark.registry import all_queries
from tools.parity import compare

_QS = all_queries()
ORACLE_BACKED = sorted(n for n, q in _QS.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in _QS.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_oracle_parity(spark, sf_dir, duck, name):
    q = _QS[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    odf = duck.execute(q.oracle).fetchdf()
    exact, approx, msg = compare(sdf, odf)
    assert exact or approx, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = _QS[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert df.columns
