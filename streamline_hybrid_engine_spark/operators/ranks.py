"""Binned-offset rank decomposition — the engine's corpus-scale sort valve.

Every global ``rank()`` / ``row_number()`` / ``ntile()`` in a Spark plan
is a single-partition window: at 100 TB one task sorts the world. The fix
this engine uses everywhere (reference analog: Flink's range-partitioned
sort, SURVEY §4.2) is the binned-offset decomposition: pick a bin key
that is a MONOTONE PREFIX of the sort order (ties never straddle bins),
count rows per bin — a broadcast-sized table — and split the global rank
into

    rank(row) = offset(bin) + rank_within_bin(row)

where ``offset(bin)`` is the running count of strictly-lower bins. Windows
then only ever partition by (group, bin); the biggest task is the largest
bin, not the whole table.

By r10 this pattern existed five times inline (decile lift, corpus AUC,
grouped AUC, CCNet terciles, perplexity routing cuts). :func:`binned_rank`
is the one parameterized primitive behind all of them (r10-verdict task 3);
the inline realizations are re-expressed through it bit-for-bit, and new
valves are one-liners.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def ntile_from_rank(rnk: str, n: str, tiles: int) -> Column:
    """Exact ANSI NTILE(tiles) from a precomputed 1-based dense rank and
    the partition size — the closed form that lets a binned-rank plan
    skip the single-partition sort NTILE itself would need. ANSI rule:
    base = n div tiles rows per tile, and the first n mod tiles tiles
    take one extra. greatest(base, 1) guards the ANSI divide when
    n < tiles (the ELSE branch is then unreachable but still
    type-checked). Differential-tested against F.ntile() directly
    (tests/test_llm_selection.py). Moved here from llm.selection in r11 —
    it pairs with :func:`binned_rank`'s rank_col/total_col outputs."""
    t = int(tiles)
    return F.expr(
        f"CASE WHEN {rnk} <= ({n} % {t}) * ({n} div {t} + 1)"
        f" THEN ({rnk} - 1) div ({n} div {t} + 1) + 1"
        f" ELSE ({n} % {t})"
        f"  + ({rnk} - ({n} % {t}) * ({n} div {t} + 1) - 1)"
        f"    div greatest({n} div {t}, 1) + 1"
        " END"
    )


def binned_rank(
    df: DataFrame,
    bin_col: str,
    order_by: Sequence[Column | str],
    group_cols: Sequence[str] = (),
    rank_col: str = "rnk",
    total_col: str | None = None,
    method: str = "row_number",
    peers_col: str | None = None,
) -> DataFrame:
    """Exact per-group global rank without a global sort.

    CONTRACT (caller must guarantee): ``bin_col`` ascending is a prefix of
    the ``order_by`` total order within each group — i.e. every row in a
    lower bin sorts strictly before every row in a higher bin, and rows
    with equal ``order_by`` keys share a bin. Under that contract the
    returned ``rank_col`` equals the rank the corresponding global window
    (``Window.partitionBy(*group_cols).orderBy(*order_by)``) would
    produce, while no window in the plan partitions wider than
    (group, bin).

    Parameters:
    - ``method``: ``"row_number"`` (default) or ``"rank"`` — which ANSI
      rank function's semantics ``rank_col`` carries. ``"rank"`` needs the
      ties-never-straddle half of the contract to be exact.
    - ``total_col``: also attach the per-group row count (the ``n`` that
      :func:`..llm.selection.ntile_from_rank` converts ranks to tiles
      with). Computed on the bucket table, never the data.
    - ``peers_col``: also attach the count of order-key peers (the global
      tiecount — equal keys share a bin by contract). Requires a single
      ``order_by`` column; used by the Mann–Whitney tie-averaged rank.

    Plan shape: one groupBy over the data for bin counts (map-side
    combined), a cumulative window over the bucket table ONLY
    (groups × bins rows), a broadcast join back, and one window
    partitioned by (group, bin). Cost is one exchange of the data by
    (group, bin) — the same exchange the within-bin sort needs anyway.

    Returns ``df``'s columns plus ``rank_col`` (long) and the requested
    extras. ``df`` must not already carry columns named ``__bn``/``__off``
    or the requested output names.
    """
    if peers_col is not None and len(list(order_by)) != 1:
        # with multiple order columns RANGE (0, 0) would resolve over the
        # composite key and silently return full-key tie counts
        raise ValueError(
            "peers_col requires exactly one order_by column; got "
            f"{len(list(order_by))}"
        )
    g = list(group_cols)
    counts = df.groupBy(*g, bin_col).agg(F.count("*").alias("__bn"))
    w_off = (
        Window.partitionBy(*g)
        .orderBy(bin_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [
        *g,
        bin_col,
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0))
        .cast("long")
        .alias("__off"),
    ]
    if total_col is not None:
        off_cols.append(
            F.sum("__bn")
            .over(Window.partitionBy(*g))
            .cast("long")
            .alias(total_col)
        )
    offsets = counts.select(*off_cols)

    w_local = Window.partitionBy(*g, bin_col).orderBy(*order_by)
    rank_fn = F.row_number() if method == "row_number" else F.rank()
    out = [
        *df.columns,
        (F.col("__off") + rank_fn.over(w_local).cast("long")).alias(rank_col),
    ]
    if total_col is not None:
        out.append(total_col)
    if peers_col is not None:
        # RANGE frame (0, 0) over the sort key = rows with an equal key —
        # the bin-local peer count IS the global tiecount by contract
        out.append(
            F.count("*")
            .over(w_local.rangeBetween(0, 0))
            .cast("long")
            .alias(peers_col)
        )
    return df.join(F.broadcast(offsets), [*g, bin_col]).select(*out)
