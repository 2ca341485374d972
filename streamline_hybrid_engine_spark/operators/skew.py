"""Skew-handling utilities — SCALE.md's manual fallback when AQE's
runtime skew split isn't available (e.g. the skew is in a stream, or the
join is inside a cached subplan AQE won't re-plan).

Salted join: the skewed probe side gets a deterministic per-row salt in
[0, n_salts); the build side is replicated once per salt; the join key
becomes (key, salt), spreading each hot key over n_salts reducers. Cost:
build side × n_salts — use only when the build side is small relative to
the hot key's row count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    skewed_key: str,
    small_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed large side to a small side, spreading hot keys over
    ``n_salts`` shuffle partitions.

    The salt is derived from a hash of the whole skewed row (xxhash64 of
    all columns) — deterministic per row, uniform across salts, and needs
    no extra state. For ``how`` in (inner, left) the result equals
    ``skewed.join(small, key)`` exactly (the salt participates in
    partitioning only). Right/full outer are REJECTED: the build side is
    replicated once per salt, so its unmatched rows would be emitted
    ``n_salts`` times — use AQE's skew-join for outer shapes instead.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            f"replicated build side would duplicate unmatched rows "
            f"{n_salts}x under right/full outer joins"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("_salt", salt.cast("int"))
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (left[skewed_key] == right[small_key]) & (left["_salt"] == right["_salt"])
    return left.join(right, cond, how).drop("_salt")
