"""Assembled query registry: every implemented operator from SURVEY.md §2
as a named query with (where SQL-expressible) a DuckDB oracle twin.

The driver's CORRECTNESS gate covers the first 50 registry entries, so the
exposed registry is kept at <= 50 entries TOTAL: redundant same-family
singletons are merged into combined battery queries (queries_battery.py)
whose oracles embed the singleton oracles verbatim — every SURVEY §2
operator row therefore gets an oracle-verified driver row in every round.
The singleton implementations stay registered in QUERIES for tests and for
the batteries to compose; only the exposed dict collapses them.
"""

from __future__ import annotations

from .queries_core import QUERIES, Query  # noqa: F401  (QUERIES is the shared list)

# Importing these modules appends their queries to QUERIES via the @q decorator.
from . import queries_pipeline  # noqa: F401, E402
from . import queries_data  # noqa: F401, E402
from . import queries_extra  # noqa: F401, E402
from . import queries_battery  # noqa: F401, E402  (must import last: composes the others)
from .queries_battery import ABSORBED  # noqa: E402

# SURVEY §2 operator-family -> registry entries that carry its driver
# signal. Checked by tests/test_contract.py: every family must resolve to
# live registry entries, so new operator families cannot silently fall out
# of the external correctness gate (and the absorption map cannot orphan a
# family).
FAMILY_COVERAGE: dict[str, list[str]] = {
    "P projections/filters/predicates": ["p1_full_scan", "p2_projection_filter",
                                         "pb_predicate_battery"],
    "J joins": ["j1_inner_equi", "jb_join_battery", "j5_interval_join",
                "j6_anti_join", "j8_multiway", "j10_view_stack", "j11_outer_cross"],
    "A aggregations": ["a1_pricing_summary", "a2_count_distinct",
                       "a3_sum_avg_min_max", "ab_conditional_battery",
                       "ab_shapes_battery", "a9_multikey_group",
                       "a10_groupby_expr", "a13_listagg", "a17_rollup_hierarchy"],
    "W windows": ["w1_latest_per_key", "wb_window_battery",
                  "w4_rank_topn_per_group", "w5_rolling_range"],
    "O sorts/top-k": ["o1_topk"],
    "U set operations": ["ub_setops_battery"],
    "F scalar functions": ["fb_scalar_battery", "fb_temporal_battery"],
    "Q quality audits": ["q1_null_audit", "qb_audit_battery",
                         "q7_reconciliation", "q8_kpi_null_checks"],
    "M medallion pipeline": ["m1_medallion_gold"],
    "E event analytics": ["eb_event_battery"],
    "SK skew handling": ["sk1_salted_join", "sk2_two_phase_agg"],
    "T text analysis / curation": ["t1_token_stats", "t2_lang_quality",
                                   "tb_sample_battery", "c1_curation_pipeline"],
    "D deduplication": ["d1_exact_dup_groups", "db_neardup_battery"],
    "S similarity search": ["s1_knn_bruteforce", "s2_embedding_neardup",
                            "s3_knn_lsh", "s4_knn_ivf", "db_neardup_battery",
                            "s16_rerank_persisted"],  # s5/s6 ride the battery
    "MM multimodal": ["mm1_binary_metadata", "mmb_media_battery"],
    "AI functions": ["aib_ai_battery"],
    # Covered-query reflection substitution rides the driver hash via
    # r1_routed_reflection (aggregate rollup routing), r2_routed_raw
    # (RAW/DISPLAY routing), and r3_routed_raw_join (explicitly spelled
    # join served by a RAW reflection on the equivalent join view), all
    # absorbed into ab_shapes_battery
    # s15 carries the autonomous index lifecycle (observe -> recommend ->
    # accelerate -> serve) under the driver hash
    "R acceleration": ["ab_shapes_battery", "s15_auto_index_serve"],
}

# Driver window size: the exposed registry must never exceed it.
DRIVER_WINDOW = 50


def registry() -> dict[str, Query]:
    by_name: dict[str, Query] = {}
    for query in QUERIES:
        if query.name in by_name:
            raise ValueError(f"duplicate query name: {query.name}")
        by_name[query.name] = query
    unknown = [n for n in ABSORBED if n not in by_name]
    if unknown:
        raise ValueError(f"ABSORBED references unknown queries: {unknown}")
    out = {n: query for n, query in by_name.items() if n not in ABSORBED}
    if len(out) > DRIVER_WINDOW:
        raise ValueError(
            f"registry has {len(out)} entries > driver window {DRIVER_WINDOW}; "
            "merge same-family queries into a battery (queries_battery.py)"
        )
    return out


def full_registry() -> dict[str, Query]:
    """Every registered query including absorbed singletons (test surface)."""
    out: dict[str, Query] = {}
    for query in QUERIES:
        out[query.name] = query
    return out
