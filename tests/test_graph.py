"""Semantic tests for graph algorithms (operators/graph.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from streamline_hybrid_engine_spark.registry import all_queries

_QS = all_queries()


def test_pagerank_covers_all_trading_vertices(spark, sf_dir):
    from streamline_hybrid_engine_spark.catalog import load_table

    pr = _QS["graph_pagerank_suppliers"].fn(spark, sf_dir)
    rows = pr.collect()
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n_cust = (
        o.join(li, o.o_orderkey == li.l_orderkey).select("o_custkey").distinct().count()
    )
    n_supp = li.select("l_suppkey").distinct().count()
    assert len(rows) == n_cust + n_supp
    assert all(r.rank_fp > 0 for r in rows)


def test_pagerank_mass_concentrates_on_suppliers(spark, sf_dir):
    """Suppliers have ~15-30x the degree of customers in the bipartite
    trading graph, so PageRank mass must concentrate there."""
    pr = _QS["graph_pagerank_suppliers"].fn(spark, sf_dir)
    top10 = pr.orderBy(F.desc("rank_fp")).limit(10).collect()
    assert all(r.vertex.startswith("s") for r in top10)
