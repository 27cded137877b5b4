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
single-key input degrades to one task, same as any windowed operator —
pre-split such keys with coarse time-bucket sub-keys (bucket boundaries
then need a small overlap pass) or operators.skew utilities.
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
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
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
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r_side.unionByName(l_side)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        # A NULL-ts left row sorts nulls-last under desc (forward) and would
        # otherwise "match" the key's extreme fact; it has no position on the
        # time axis, so it survives unmatched.
        .withColumn("__match", F.when(F.col("__ts").isNotNull(), F.col("__match")))
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
