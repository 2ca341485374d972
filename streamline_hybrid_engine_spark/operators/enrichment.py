"""Async I/O enrichment — SURVEY §2.9's last uncovered row.

Reference analog: Flink's ``AsyncFunction`` + ``AsyncDataStream.orderedWait``
(flink-streaming-java .../functions/async/): enrich a stream against an
external service with many lookups in flight per subtask, bounded by a
capacity, results re-emitted in input order. The Spark-native shape is
``mapInPandas`` with an asyncio event loop INSIDE the iterator function:
each Arrow batch's keys are fetched concurrently under a semaphore
(= Flink's capacity), ``asyncio.gather`` preserves input order
(= orderedWait), and the event loop is amortized over the whole batch.

This is the escape hatch for genuinely EXTERNAL services (REST lookups,
feature stores). When the "service" is actually a joinable dataset — as in
this fixture — the fast path is a broadcast join (`stream_static_enrich`);
the contract query here keeps the service deterministic (broadcast dict +
an awaited no-op hop standing in for network RTT) so the async plumbing
itself is oracle-checked.

Scale notes (100 TB):
- concurrency is per Python worker; total in-flight = capacity × cores —
  size ``capacity`` to the service's rate limit, not the cluster's;
- the broadcast lookup is dimension-bounded (same bound as a broadcast
  join); a true external client would hold a connection pool per worker
  instead (create it lazily inside the iterator, once per task);
- Arrow batches amortize Python/event-loop overhead; never per-row UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.registry import query

CAPACITY = 64  # max in-flight lookups per batch (Flink AsyncDataStream capacity)


def async_enrich(
    df: DataFrame,
    key_col: str,
    out_col: str,
    lookup: dict,
    out_type: str = "string",
    capacity: int = CAPACITY,
) -> DataFrame:
    """Enrich ``df`` with ``out_col`` by an async lookup of ``key_col``.

    ``lookup`` is broadcast to every worker; the per-batch event loop
    awaits one hop per key (deterministic stand-in for a network call) and
    gathers results under a ``capacity``-wide semaphore, order-preserving.
    """
    from pyspark.sql import types as T

    sc = df.sparkSession.sparkContext
    b = sc.broadcast(lookup)
    # fresh StructType — StructType.add would mutate df's cached schema
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T._parse_datatype_string(out_type))]
    )

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import asyncio

        table = b.value

        async def service(key):
            await asyncio.sleep(0)  # the awaited "RTT"; a real client awaits I/O
            return table.get(key)

        async def gather(keys):
            sem = asyncio.Semaphore(capacity)

            async def one(k):
                async with sem:
                    return await service(k)

            return await asyncio.gather(*(one(k) for k in keys))

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = asyncio.run(gather(pdf[key_col].tolist()))
            yield pdf

    return df.mapInPandas(run_batches, schema)


@query(
    "enrich_async_orders_nation",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, n.n_name AS nation
    FROM orders o
    LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    """,
    tags=("streaming", "async", "enrichment"),
)
def enrich_async_orders_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Async-I/O enrichment of orders with the customer's nation, the
    "service" being a deterministic broadcast dict (customer→nation — a
    dimension-bounded map, the async analog of `stream_static_enrich`'s
    broadcast join). Oracle: the equivalent two-hop LEFT join — the lookup
    emits NULL for a key the service doesn't know (Flink AsyncFunction
    miss semantics), so the oracle must too; an inner join would silently
    drop miss rows and only match by luck of FK-intact fixtures."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "n_name")
        .collect()  # dimension-sized by design: same bound as broadcasting it
    )
    lookup = {r.c_custkey: r.n_name for r in dim}
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        "o_orderkey", "o_custkey"
    )
    return async_enrich(orders, "o_custkey", "nation", lookup)
