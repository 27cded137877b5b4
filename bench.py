"""Engine benchmark (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Probe set mirrors the reference's published benchmark (dremio.sql: full-table
COUNT(*), full-scan multi-AVG) plus the engine's heavier operator families
(join+agg rollup, window, top-k, text dedup fingerprint, ANN) so regressions
anywhere in the plan space show up here.

Timings exclude session startup (the reference's 15s number is query time on
a warm engine, readme.md "cold run" = no result/reflection cache, not JVM
boot). Each probe runs REPS (default 3) times and the median is reported —
the sandbox shows ~±25% wall-clock noise between runs, so single-run numbers
cannot resolve a real regression from drift.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_iceberg_lakehouse_workshop_spark.registry import full_registry
from apache_iceberg_lakehouse_workshop_spark.session import get_spark
from apache_iceberg_lakehouse_workshop_spark.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# single-run numbers cannot resolve regressions under the sandbox's ~±25%
# wall-clock noise (r1->r2 showed a uniform 1.1-1.6x drift with zero code
# change) -> run each probe REPS times and report the median
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

# name -> registry query name (None => custom probe defined below)
BENCH_QUERIES = [
    "count_star",          # dremio.sql:1-2
    "multi_avg_scan",      # dremio.sql:4-8 (the 15s-cold probe)
    "a1_pricing_summary",  # flagship scan-agg
    "j1_inner_equi",       # broadcast join + rollup
    "j5_interval_join",    # range-condition join
    "w2_rolling_7day",     # window frame
    "w1_latest_per_key",   # dedup window
    "o1_topk",             # TakeOrderedAndProject
    "m1_medallion_gold",   # view-stack pipeline
    "t1_token_stats",      # text analysis (codegen string ops)
    "d1_exact_dup_groups", # content-hash dedup
    "d2_minhash_lsh_pairs",# MinHash-LSH near-dup (bucketed candidate join)
    "s1_knn_bruteforce",   # ANN brute force
    "j13_asof_join",       # as-of join (union + single-window merge plan)
    "e1_daily_event_rollup",
    "e3_session_rollup",   # dynamic session windows (sort-heavy stateful shape)
]


def _custom(spark, name):
    from pyspark.sql import functions as F

    li = load_table(spark, SF_DIR, "lineitem")
    if name == "count_star":
        return li.agg(F.count("*").alias("n"))
    if name == "multi_avg_scan":
        return li.agg(
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
        )
    raise KeyError(name)


def _reflection_probe(spark) -> dict[str, float]:
    """BASELINE.md probe 3 — dremio.sql:10-13's reflection-accelerated
    multi-AVG, on different columns than the cold probe (same trick the
    reference uses to bypass its result cache). Materializes a per-returnflag
    aggregation accelerator (SURVEY §4 R7) and serves the AVGs from it.

    The cold side scans a 16x self-union of lineitem (~9.6M rows at sf0.1):
    at plain sf0.1 both paths sit on the ~0.2s job-launch floor and the
    ratio measures noise, not acceleration. Scaling the *same source* up
    lets the scan-cardinality advantage (~10M rows -> 3 rows) show in wall
    time, which is the scale-invariant quantity the reference's 338M-row
    demo exhibits. Both paths run REPS times; medians reported; build time
    reported separately (Dremio also excludes materialization from serve
    latency)."""
    import tempfile

    from pyspark.sql import functions as F

    from apache_iceberg_lakehouse_workshop_spark.plans import AcceleratorRegistry, Lakehouse

    li = load_table(spark, SF_DIR, "lineitem")
    big = li
    for _ in range(4):  # 16x
        big = big.unionAll(big)

    def agg_def():
        # AGGREGATION reflection: partials per returnflag; any AVG over these
        # columns is a cheap finalize over ~3 rows.
        return big.groupBy("l_returnflag").agg(
            F.sum("l_tax").alias("sum_tax"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.count("*").alias("n"),
        )

    cold_runs, cold = [], None
    for _ in range(REPS):
        t0 = time.time()
        cold = big.agg(
            F.avg("l_tax").alias("avg_tax"), F.avg("l_extendedprice").alias("avg_price")
        ).collect()
        cold_runs.append(time.time() - t0)

    with tempfile.TemporaryDirectory() as wh:
        lake = Lakehouse(spark, wh)
        acc = AcceleratorRegistry(lake)
        t0 = time.time()
        acc.create_reflection("li_agg_by_flag", agg_def, [])
        build_s = time.time() - t0
        accel_runs, accel = [], None
        for _ in range(REPS):
            t1 = time.time()
            mat = acc.resolve("li_agg_by_flag")
            accel = mat.agg(
                (F.sum("sum_tax") / F.sum("n")).alias("avg_tax"),
                (F.sum("sum_price") / F.sum("n")).alias("avg_price"),
            ).collect()
            accel_runs.append(time.time() - t1)
        n_mat = acc.resolve("li_agg_by_flag").count()
        assert abs(accel[0]["avg_tax"] - cold[0]["avg_tax"]) < 1e-9
    return {"multi_avg_cold_s": round(statistics.median(cold_runs), 4),
            "multi_avg_accelerated_s": round(statistics.median(accel_runs), 4),
            "reflection_build_s": round(build_s, 4),
            "cold_input_rows": big.count(),
            "accelerated_input_rows": n_mat}


def main() -> None:
    spark = get_spark("bench")
    # full registry: bench probes target specific plan shapes, including
    # singletons that the exposed registry has folded into batteries
    reg = full_registry()
    # warm the session (JIT, codegen caches) on an unrelated trivial job
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    n_rows = load_table(spark, SF_DIR, "lineitem").count()
    for name in BENCH_QUERIES:
        df_fn = reg[name].fn if name in reg else None
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            df = df_fn(spark, SF_DIR) if df_fn else _custom(spark, name)
            # force full execution; tiny results -> collect is honest
            df.collect()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 4)

    reflection = _reflection_probe(spark)
    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "reps": REPS,
        "lineitem_rows": n_rows,
        "rows_per_sec_multi_avg": round(n_rows / timings["multi_avg_scan"], 1),
        "reflection": reflection,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
