"""Skew-handling join utilities (SURVEY §4 R5 / north-star scale notes).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
``session.py``) handles most skew at runtime by splitting oversized shuffle
partitions. Two cases it cannot fix:

1. a *broadcast-ineligible* medium dimension joined on a hot key, and
2. aggregations where one group dominates (AQE splits partitions, not
   groups).

For those the classic fix is **salting**: spread each hot key across S
synthetic sub-keys so no single task owns the whole key. Deterministic (no
``rand()`` — reproducible plans, retriable tasks) and expressed entirely in
JVM-side column functions.

At 100 TB: salting multiplies the small side by S (replicate-side cost
S × |dim|), so pick S ≈ (hot-key rows / target-partition rows). The
``two_phase_agg`` variant costs one extra narrow shuffle of the partial
aggregates — negligible next to the skewed single shuffle it replaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across
    ``salt_buckets`` sub-keys.

    The big side gets a deterministic per-row salt (hash of all its columns
    mod S — uniform, reproducible); the small side is replicated S times so
    every (key, salt) pair finds its match. Result equals
    ``big.join(small, key, how)`` row-for-row.

    Only big-side-preserving modes are valid: a big row carries exactly one
    salt, but an *unmatched small row* exists once per salt replica, so
    right/full outer would emit it ``salt_buckets`` times. Those modes raise
    — flip the join around or use AQE skew handling instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — unmatched small-side "
            f"rows would duplicate x{salt_buckets}; use inner/left/semi/anti"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_s = big.withColumn("_salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    small_s = small.select("*", salts)
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


_COMBINERS = {"sum": F.sum, "min": F.min, "max": F.max}


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof aggregation: partial-agg on (keys + salt), then final-agg
    on keys. Only decomposable aggregates are valid; the caller passes the
    partial expression plus its combiner ('sum' | 'min' | 'max'):

        two_phase_agg(df, ["k"], {"n": (F.count("*"), "sum"),
                                  "total": (F.sum("x"), "sum")})

    semantically equals ``df.groupBy("k").agg(count, sum)`` but no single
    task ever processes a whole hot group.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    finals = [
        _COMBINERS[combiner](name).alias(name) for name, (_, combiner) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*finals)
