"""Bucketed co-located join — the shuffle-elimination path for repeated
big⋈big joins on a stable key (SURVEY scale notes: 'co-locate joins via
bucketing'; Iceberg's bucket(N, col) partition transform plays the same
role). Both sides bucketed+sorted on the join key → SortMergeJoin with NO
Exchange on either side."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = spark.range(1000).select(
        F.col("id").alias("order_id"), (F.col("id") % 97).alias("custkey"),
        (F.col("id") * 1.5).alias("amount"),
    )
    items = spark.range(5000).select(
        (F.col("id") % 1000).alias("order_id"), (F.col("id") % 7).alias("qty"),
    )
    for name, df in [("b_orders", orders), ("b_items", items)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "order_id").sortBy("order_id")
            .option("path", str(base / name))
            .saveAsTable(name)
        )
    yield "b_orders", "b_items"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    lhs, rhs = bucketed_pair
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(lhs).join(spark.table(rhs), "order_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    """Control: the same join over raw (unbucketed) data shuffles both
    sides — the cost bucketing removes."""
    lhs, _ = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        raw = spark.range(5000).select(
            (F.col("id") % 1000).alias("order_id"), (F.col("id") % 7).alias("qty")
        )
        j = spark.table(lhs).join(raw, "order_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
