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
boot). Each query executes once, cold caches, via count-style actions that
force full materialization without driver-side collect of large results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_iceberg_lakehouse_workshop_spark.registry import registry
from apache_iceberg_lakehouse_workshop_spark.session import get_spark
from apache_iceberg_lakehouse_workshop_spark.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

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
    "s1_knn_bruteforce",   # ANN brute force
    "e1_daily_event_rollup",
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


def main() -> None:
    spark = get_spark("bench")
    reg = registry()
    # warm the session (JIT, codegen caches) on an unrelated trivial job
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    n_rows = load_table(spark, SF_DIR, "lineitem").count()
    for name in BENCH_QUERIES:
        df_fn = reg[name].fn if name in reg else None
        t0 = time.time()
        df = df_fn(spark, SF_DIR) if df_fn else _custom(spark, name)
        # force full execution; tiny results -> collect is the honest action
        df.collect()
        timings[name] = round(time.time() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "lineitem_rows": n_rows,
        "rows_per_sec_multi_avg": round(n_rows / timings["multi_avg_scan"], 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
