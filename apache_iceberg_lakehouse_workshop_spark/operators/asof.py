"""As-of (nearest-event) join — a time-series operator Spark lacks natively.

The reference expresses "match each row to the most recent prior fact"
through window idioms (SURVEY §2.3 J5/J7: healthcare_example.sql:82-85
labs-within-window, manufacturing.sql:288-317 next-failure pairing). This
operator generalizes that need into a first-class as-of join: for every
left row, attach the single right row with the greatest ``right_ts`` not
exceeding ``left_ts`` (direction="backward"; "forward" is the mirror) for
the same key — LEFT-join semantics, unmatched left rows keep NULLs.

Spark-first plan — union + one window, NOT a join:
    1. tag left rows side=1, right rows side=0;
    2. union them on a shared narrow schema (right payload as one struct,
       left row as one struct — neither side's payload is widened);
    3. ``last(payload, ignorenulls=True)`` over a window partitioned by
       the key, ordered by (ts, side), rows unbounded-preceding..current;
    4. keep side=1 rows and flatten.

Cost at 100 TB: ONE shuffle of both inputs on the key + a linear
per-partition sort-scan. The naive alternative (equi-join on key + range
filter + row_number) materializes every candidate pair first —
O(|L|·avg right rows per key) shuffle volume, quadratic on hot keys. The
union-window plan's volume is |L|+|R| regardless of time density, the same
merge-scan strategy native ASOF implementations (DuckDB, QuestDB, kdb+ aj)
use, expressed in pure Catalyst operators (whole-stage codegen, no UDFs).

Skewed keys: the window sorts within one partition per key; a pathological
single-key input degrades to one task, same as any windowed operator.
``split_bucket_seconds`` activates the time-bucket pre-split: the window
partitions by (key, time-bucket) so a hot key spreads over as many tasks
as it spans buckets, and boundary misses (a left row whose match lives in
an earlier bucket) are repaired with a per-(key, bucket) "carry" — the
nearest right payload from preceding buckets, ONE row per bucket, computed
with a per-key prefix window over O(#buckets) rows and equi-joined back.
Total cost stays |L|+|R| shuffle volume (now on the composite key) plus an
O(#key-buckets) side plan; output is exactly equal to the unsplit plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    split_bucket_seconds: float | None = None,
) -> DataFrame:
    """Attach to each left row the nearest right row per key.

    direction="backward": greatest ``right_ts`` <= ``left_ts`` (inclusive
    at equality, like DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).
    direction="forward": smallest ``right_ts`` >= ``left_ts``.

    ``right_cols`` — right columns to carry (default: all but key + ts).
    ``right_ts`` always rides along (needed downstream for lag/tolerance
    math); name it distinctly from left columns.
    ``tolerance`` — optional max distance as an INTERVAL column (e.g.
    ``F.expr("INTERVAL 7 DAYS")``); matches farther than that are nulled
    out, the left row survives (pandas ``merge_asof`` semantics).

    NULL timestamps: a left row with NULL ``left_ts`` survives unmatched
    (all payload columns NULL), and right rows with NULL ``right_ts`` are
    ignored — matching pandas ``merge_asof``'s "no position on the time
    axis, no match" semantics on both sides, in both directions.

    Equal ``right_ts`` ties within a key break on the last payload in the
    union sort — supply a deterministic tiebreak column in ``right_cols``
    and pre-sort semantics don't matter because ties are resolved by the
    window's stable (ts, side) order only; keep right timestamps unique
    per key for fully deterministic output (true of event streams with
    sub-second precision).

    ``split_bucket_seconds`` — hot-key pre-split (see module docstring):
    choose it so a hot key's densest bucket still fits one task comfortably
    (e.g. 86400.0 for daily buckets on a key with months of events). Output
    is exactly equal to the unsplit plan for any positive value.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if split_bucket_seconds is not None and not split_bucket_seconds > 0:
        raise ValueError(
            f"split_bucket_seconds must be > 0, got {split_bucket_seconds!r}"
        )
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, right_ts)]
    payload_cols = [right_ts, *[c for c in right_cols if c != right_ts]]

    dupes = set(payload_cols) & set(left.columns)
    if dupes:
        raise ValueError(
            f"right payload columns collide with left columns: {sorted(dupes)}; "
            "alias the right side first"
        )

    # Shared narrow union schema: keys + ts + side + one struct per side.
    payload = F.struct(*[F.col(c) for c in payload_cols])
    payload_type = right.select(payload.alias("p")).schema["p"].dataType
    lrow = F.struct(*[F.col(c) for c in left.columns])
    lrow_type = left.select(lrow.alias("r")).schema["r"].dataType

    # NULL-ts right rows sort nulls-first under asc (backward) and would
    # otherwise become phantom "earliest" matches; they have no position on
    # the time axis, so drop them outright.
    r_side = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        F.lit(None).cast(lrow_type).alias("__lrow"),
    )
    l_side = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
        lrow.alias("__lrow"),
    )

    # Backward: ascending ts; at equal ts the right row (side 0) sorts
    # before the left row so an exactly-simultaneous fact is visible.
    # Forward: descending ts, same side order -> nearest following fact.
    ts_order = F.asc("__ts") if direction == "backward" else F.desc("__ts")
    if split_bucket_seconds is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(ts_order, F.asc("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = (
            r_side.unionByName(l_side)
            .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
            .filter(F.col("__side") == 1)
        )
    else:
        # Hot-key pre-split: window per (key, time-bucket), then repair
        # boundary misses with a per-bucket carry. Bucket is a monotone
        # function of ts, so a right row at/before a left row is either in
        # the same bucket (local window sees it — and it is strictly nearer
        # than anything in an earlier bucket) or in an earlier bucket
        # (the carry's prefix-last is exactly the nearest such row).
        # TIMESTAMP_NTZ has no direct numeric cast; the intermediate
        # cast("timestamp") is a no-op for ltz and a session-tz
        # interpretation for ntz — monotone non-decreasing either way,
        # which is the only property bucket assignment needs.
        unioned = r_side.unionByName(l_side).withColumn(
            "__bucket",
            F.floor(
                F.col("__ts").cast("timestamp").cast("double")
                / F.lit(float(split_bucket_seconds))
            ),
        )
        w_local = (
            Window.partitionBy(*on, "__bucket")
            .orderBy(ts_order, F.asc("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # One row per (key, bucket): the bucket's nearest-edge right payload
        # (latest for backward, earliest for forward). max_by/min_by ignore
        # NULL ordering values, so left rows (side=1) never win.
        edge_ts = F.when(F.col("__side") == 0, F.col("__ts"))
        pick = F.max_by if direction == "backward" else F.min_by
        per_bucket = unioned.groupBy(*on, "__bucket").agg(
            pick("__payload", edge_ts).alias("__edge")
        )
        # Prefix over buckets (ONE row each — the per-key window here is
        # O(#buckets), not O(rows), so the hot key's serial portion is tiny):
        # nearest right payload from strictly earlier (backward) / later
        # (forward) buckets.
        bucket_order = F.asc("__bucket") if direction == "backward" else F.desc("__bucket")
        w_carry = (
            Window.partitionBy(*on)
            .orderBy(bucket_order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = per_bucket.select(
            *on,
            "__bucket",
            F.last("__edge", ignorenulls=True).over(w_carry).alias("__carry"),
        )
        matched = (
            unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w_local))
            .filter(F.col("__side") == 1)
            .join(carry, on=[*on, "__bucket"], how="left")
            .withColumn("__match", F.coalesce(F.col("__match"), F.col("__carry")))
            .drop("__bucket", "__carry")
        )
    # A NULL-ts left row sorts nulls-last under desc (forward) and would
    # otherwise "match" the key's extreme fact; it has no position on the
    # time axis, so it survives unmatched.
    matched = matched.withColumn(
        "__match", F.when(F.col("__ts").isNotNull(), F.col("__match"))
    )

    if tolerance is not None:
        dist = (
            F.col("__ts") - F.col(f"__match.{right_ts}")
            if direction == "backward"
            else F.col(f"__match.{right_ts}") - F.col("__ts")
        )
        matched = matched.withColumn(
            "__match",
            F.when(dist <= tolerance, F.col("__match")),
        )

    return matched.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in payload_cols],
    )
