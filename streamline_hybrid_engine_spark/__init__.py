"""streamline_hybrid_engine_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of
``streamline-eu/streamline-hybrid-engine`` (a Flink-1.x-era hybrid
batch+stream fork; see SURVEY.md §0 — the reference mount was empty, so the
contract is SURVEY.md §2), re-expressed Spark-first:

- One abstraction: the DataFrame is simultaneously the batch API
  (Flink ``DataSet``), the stream API (``DataStream``), and the SQL
  ``Table`` — no bridges (SURVEY §3.4).
- No custom parser/planner/executor: Catalyst + Tungsten + AQE provide
  filter pushdown, column pruning, join-strategy selection, codegen,
  spillable sort/hash — everything Flink's optimizer/runtime hand-rolls
  (SURVEY §4.1).
- Custom logic (as-of join, sessionization, MinHash/SimHash dedup,
  cosine kNN, …) is composed from built-in DataFrame ops; Python UDFs
  only where genuinely required, always Arrow-batched.

Layout:
- ``session``   — SparkSession factory with pinned, scale-aware configs
- ``catalog``   — fixture lake loader (handles nanos-timestamp parquet)
- ``registry``  — the SURVEY §2 query contract: (spark_fn, oracle_sql) pairs
- ``operators/``— relational operators (row ops, joins, aggs, windows, …)
- ``functions/``— scalar/UDF/UDTF surface
- ``llm/``      — LLM-data-pipeline operators (dedup, similarity, text, multimodal)
- ``streaming/``— Structured Streaming jobs (tumble/session/watermark/state)
- ``sources/``  — source/sink round-trips
"""

__version__ = "0.1.0"

from streamline_hybrid_engine_spark.registry import all_queries, get_query  # noqa: F401
