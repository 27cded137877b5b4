"""Scale-path operator tests: salted joins, two-phase skew-proof
aggregation, approximate distinct (the 100 TB variants SURVEY §2.4 A2 and
§4 R5 call for)."""

from pyspark.sql import functions as F

from apache_iceberg_lakehouse_workshop_spark.operators.skew import salted_join, two_phase_agg
from apache_iceberg_lakehouse_workshop_spark.tables import load_table


def _skewed_fact(spark):
    # 90% of rows on one hot key — the shape AQE partition-splitting can't
    # fix for group-by and replicate-joins
    hot = spark.range(900).select(F.lit(1).alias("k"), (F.col("id") % 7).alias("v"))
    cold = spark.range(100).select((F.col("id") % 10 + 2).alias("k"), (F.col("id") % 5).alias("v"))
    return hot.unionAll(cold)


def test_salted_join_equals_plain_join(spark):
    fact = _skewed_fact(spark)
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 12)], "k BIGINT, name STRING"
    )
    plain = fact.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(fact, dim, "k", salt_buckets=8).groupBy("k", "name").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    fact = _skewed_fact(spark)
    dim = spark.createDataFrame([(1, "one")], "k BIGINT, name STRING")
    plain = fact.join(dim, "k", "left")
    salted = salted_join(fact, dim, "k", salt_buckets=4, how="left")
    assert salted.count() == plain.count() == 1000
    assert salted.filter("name IS NULL").count() == plain.filter("name IS NULL").count() == 100


def test_two_phase_agg_matches_single_phase(spark):
    fact = _skewed_fact(spark)
    got = two_phase_agg(
        fact,
        ["k"],
        {
            "n": (F.count("*"), "sum"),
            "total": (F.sum("v"), "sum"),
            "lo": (F.min("v"), "min"),
            "hi": (F.max("v"), "max"),
        },
        salt_buckets=8,
    )
    exp = fact.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("total"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    # the partial stage really salts: hot key spreads over >1 partial group
    salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(8))
    n_partials = fact.withColumn("_salt", salt).filter("k = 1").select("_salt").distinct().count()
    assert n_partials > 1


def test_approx_percentile_bounds(spark, sf_dir):
    """Quantiles at scale: percentile_approx (one-pass mergeable sketch,
    shuffle carries O(groups) sketches) within tolerance of the exact
    sort-based percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.percentile("l_extendedprice", F.lit(0.5))).first()[0]
    approx = li.select(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10_000))
    ).first()[0]
    assert abs(approx - exact) / exact < 0.01


def test_approx_count_distinct_bounds(spark, sf_dir):
    """A2's 100 TB variant: approx_count_distinct (HLL++) within its rsd of
    exact — sketches merge map-side, so the shuffle carries O(groups)
    sketches instead of O(rows) values."""
    o = load_table(spark, sf_dir, "orders")
    exact = o.select(F.countDistinct("o_custkey")).first()[0]
    approx = o.select(F.approx_count_distinct("o_custkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.1


def test_salted_join_rejects_small_side_outer(spark):
    """right/full outer would emit each unmatched small-side row once per
    salt replica — the operator must refuse rather than silently duplicate."""
    import pytest

    fact = _skewed_fact(spark)
    dim = spark.createDataFrame([(1, "one"), (99, "orphan")], "k BIGINT, name STRING")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(fact, dim, "k", salt_buckets=4, how=how)
