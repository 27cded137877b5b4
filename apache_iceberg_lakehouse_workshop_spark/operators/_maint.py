"""Shared index-maintenance primitives (r12 review finding #8: the text
and ANN index modules carried lockstep copies of two behaviors — the
layout-maintenance cadence counter and the range-pruned membership read —
and a fix to one copy would silently miss the others)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshots_since_rewrite(table) -> int:
    """Trailing run of append/delete snapshots since the last full
    rewrite (overwrite/compact/anything else resets) — the layout-
    maintenance cadence both index families compact on: appends erode
    clustering, merge-on-read deletes accumulate delete files, and a
    rewrite op re-establishes both."""
    n = 0
    for s in table._load_meta()["snapshots"]:
        n = n + 1 if s["operation"] in ("append", "delete") else 0
    return n


def range_pruned_read(table, ids: DataFrame, col: str) -> DataFrame:
    """The table rows that COULD collide with the given delta ids — a
    min/max ``BETWEEN``-pruned read of a ``col``-range-clustered table:
    any colliding live id necessarily lies inside the delta's id range,
    so files outside it skip. Falls back to the full read when the
    bounds aren't computable (empty/all-null delta)."""
    b = ids.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).collect()[0]
    if b["mn"] is None or b["mx"] is None:
        return table.read()
    return table.read(where=f"{col} BETWEEN {b['mn']} AND {b['mx']}")
