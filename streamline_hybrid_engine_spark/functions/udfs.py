"""UDF surface — SURVEY §2.10.

Reference analog: Flink's ``ScalarFunction.eval`` / ``TableFunction`` (+
LATERAL) / ``AggregateFunction``. Spark mapping:
- scalar UDF → Arrow-batched ``pandas_udf`` (never row-at-a-time Python);
- UDTF → Python UDTF (Spark 4) with a lateral join;
- UDAF → ``applyInPandas`` (see operators/aggregates.udaf_weighted_avg_price).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.registry import query


def _discount_class_udf():
    """Vectorized scalar UDF (Flink ScalarFunction.eval analog).

    Built lazily — ``pandas_udf`` with a DDL return type needs an active
    SparkSession, and the registry must be importable without one.
    """

    @pandas_udf("string")
    def _discount_class(discount: pd.Series) -> pd.Series:
        out = pd.Series(["none"] * len(discount), index=discount.index)
        out[discount > 0.0] = "small"
        out[discount >= 0.03] = "medium"
        out[discount >= 0.06] = "large"
        return out

    return _discount_class


@query(
    "udf_discount_class",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount >= 0.06 THEN 'large'
                WHEN l_discount >= 0.03 THEN 'medium'
                WHEN l_discount > 0.0 THEN 'small'
                ELSE 'none' END AS dclass
    FROM lineitem
    """,
    tags=("udf",),
)
def udf_discount_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: discount banding (oracle = equivalent CASE)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _discount_class_udf()("l_discount").alias("dclass"),
    )


@query(
    "udtf_tokenize_docs",
    oracle="""
    SELECT doc_id, unnest(toks) AS token, generate_subscripts(toks, 1) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
    tags=("udf", "udtf"),
)
def udtf_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table UDF (Flink TableFunction + LATERAL): doc → (token, 1-based pos).

    Python UDTF is a Spark 4 feature; registered per-call and applied with
    a LATERAL join, the same shape as the reference's ``LATERAL TABLE(f(x))``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int")
    class Tokenize:
        def eval(self, text: str):  # noqa: D401 - UDTF protocol
            for i, tok in enumerate(text.split(" "), start=1):
                yield tok, i

    spark.udtf.register("she_tokenize", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("she_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM she_docs_udtf d, LATERAL she_tokenize(d.text) t
        """
    )


@query(
    "udtf_polymorphic_firstk",
    oracle="""
    SELECT doc_id, toks[1] AS tok_1, toks[2] AS tok_2, toks[3] AS tok_3
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
    tags=("udf", "udtf", "polymorphic"),
)
def udtf_polymorphic_firstk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze``): the output schema is
    computed at plan time FROM THE CALL'S ARGUMENTS — ``she_firstk(text,
    3)`` materializes columns tok_1..tok_3, ``(text, 5)`` would produce
    five, one registration serving every width. Flink analog: a
    ``TableFunction`` with ``FunctionHint``-driven type inference; the
    closest SQL notion is a table function with a dynamic row type.

    ``analyze`` receives each argument's type AND literal value (k must
    be foldable — enforced with a clear error), builds the StructType,
    and Catalyst plans the lateral join against that schema like any
    static UDTF: the Python boundary stays Arrow-batched, one row out
    per document here (missing tokens → NULL, matching DuckDB's
    out-of-bounds list index)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FirstK:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            if k.value is None or not isinstance(k.value, int):
                raise ValueError(
                    "she_firstk(text, k): k must be an integer literal "
                    "(the output schema is derived from it at plan time)"
                )
            return AnalyzeResult(
                StructType(
                    [
                        StructField(f"tok_{i + 1}", StringType())
                        for i in range(k.value)
                    ]
                )
            )

        def eval(self, text: str, k: int):
            toks = (text or "").split(" ")
            yield tuple(
                toks[i] if i < len(toks) else None for i in range(k)
            )

    spark.udtf.register("she_firstk", udtf(FirstK))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "she_docs_poly"
    )
    return spark.sql(
        "SELECT d.doc_id, f.* FROM she_docs_poly d, "
        "LATERAL she_firstk(d.text, 3) f"
    )
