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
    _assert_canonicalizable(name, df)


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_oracle_backed_schema_canonicalizable(spark, sf_dir, name):
    _assert_canonicalizable(name, _QS[name].fn(spark, sf_dir))


def _assert_canonicalizable(name, df):
    """Registry lint: no contract query may surface array/map/struct-typed
    columns. The driver canonicalizes EVERY result (rows-only included) by
    sorting collected rows in pandas; an ndarray/dict cell is unhashable
    there and crashes the sweep (r2: agg_approx_percentile). Convention:
    index sketches into scalars, or sort+join collections to strings."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for f in df.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"{name}.{f.name} is {f.dataType.simpleString()} — project to "
            "scalars or a sorted joined string (driver canonicalizer crash)"
        )
