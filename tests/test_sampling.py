"""operators/sampling.py — deterministic sampling & splitting contracts.

The registry battery (tb_sample_battery) pins exact membership against
DuckDB; these tests pin the CONTRACTS: partitioning-independence, rate
accuracy, split disjointness/exhaustiveness, and entity-level consistency
(the leakage-safety property).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_lakehouse_workshop_spark.operators.sampling import (
    assign_split,
    deterministic_sample,
    split_thresholds,
    stratified_sample,
)
from apache_iceberg_lakehouse_workshop_spark.tables import load_table


def test_sample_is_partitioning_independent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    keys = ["l_orderkey", "l_linenumber"]
    a = deterministic_sample(li, 0.3, keys)
    b = deterministic_sample(li.repartition(17, "l_partkey"), 0.3, keys)
    ka = {(r["l_orderkey"], r["l_linenumber"]) for r in a.select(*keys).collect()}
    kb = {(r["l_orderkey"], r["l_linenumber"]) for r in b.select(*keys).collect()}
    assert ka == kb and ka


def test_sample_rate_accuracy(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    got = deterministic_sample(li, 0.25, ["l_orderkey", "l_linenumber"]).count()
    assert abs(got / n - 0.25) < 0.02  # ~6k rows at sf0.001 -> tight


def test_stratified_rates_and_drop(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rates = {"A": 0.1, "R": 0.9}  # N absent -> dropped entirely
    out = stratified_sample(li, "l_returnflag", rates, ["l_orderkey", "l_linenumber"])
    by_flag = {r["l_returnflag"]: r["n"] for r in
               out.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    totals = {r["l_returnflag"]: r["n"] for r in
              li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    assert "N" not in by_flag
    assert abs(by_flag["A"] / totals["A"] - 0.1) < 0.04
    assert abs(by_flag["R"] / totals["R"] - 0.9) < 0.04


def test_split_disjoint_exhaustive_entity_consistent(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    out = o.select("o_orderkey", "o_custkey",
                   assign_split(["o_custkey"], {"train": 0.8, "val": 0.1, "test": 0.1}))
    n = o.count()
    assert out.count() == n                                   # exhaustive
    assert out.filter(F.col("split").isNull()).count() == 0
    # every customer maps to exactly one split (leakage safety)
    assert (out.groupBy("o_custkey")
               .agg(F.countDistinct("split").alias("k"))
               .filter("k > 1").count() == 0)
    shares = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(shares) == {"train", "val", "test"}
    # shares follow weights loosely (entity-level split over ~1k customers)
    assert shares["train"] / n > 0.6


def test_rate_one_keeps_every_row(spark, sf_dir):
    # Regression: format(2**32) is the 9-char '100000000', which compares
    # LESS than most 8-char hex coords and silently dropped ~94% of rows.
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    assert deterministic_sample(li, 1.0, ["l_orderkey", "l_linenumber"]).count() == n
    out = stratified_sample(
        li, "l_returnflag", {"A": 1.0, "N": 1.0, "R": 1.0},
        ["l_orderkey", "l_linenumber"],
    )
    assert out.count() == n


def test_split_with_zero_weight_trailing(spark, sf_dir):
    # An intermediate cumulative weight of exactly 1.0 (zero-weight trailing
    # split) must give the earlier splits everything and the empty split nothing.
    o = load_table(spark, sf_dir, "orders")
    out = o.select("o_custkey",
                   assign_split(["o_custkey"], {"train": 1.0, "zz_empty": 0.0}))
    n = o.count()
    shares = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert shares.get("train", 0) == n
    assert "zz_empty" not in shares


def test_split_weights_must_sum_to_one():
    with pytest.raises(ValueError, match="sum to 1"):
        split_thresholds({"train": 0.8, "val": 0.1})


def test_bad_rate_raises(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="rate"):
        deterministic_sample(li, 1.5, ["l_orderkey"])


def test_domain_mixture_sample_exact_proportions(spark):
    """t20: the binding source keeps everything; every other source keeps
    floor(w_s * T) rows; sources absent from the weights drop; the kept
    SET is deterministic under re-runs and input partitioning."""
    from apache_iceberg_lakehouse_workshop_spark.operators.sampling import (
        domain_mixture_sample,
    )

    rows = (
        [(i, "a") for i in range(10)]
        + [(100 + i, "b") for i in range(40)]
        + [(200 + i, "c") for i in range(50)]
        + [(300 + i, "drop_me") for i in range(7)]
    )
    docs = spark.createDataFrame(rows, "doc_id BIGINT, source STRING")
    # T = min(10/0.2, 40/0.3, 50/0.5) = 50 -> keeps (10, 15, 25)
    weights = {"a": 0.2, "b": 0.3, "c": 0.5}
    out = domain_mixture_sample(docs, weights)
    got = {}
    for r in out.collect():
        got.setdefault(r.source, set()).add(r.doc_id)
    assert {s: len(v) for s, v in got.items()} == {"a": 10, "b": 15, "c": 25}
    assert "drop_me" not in got
    assert got["a"] == set(range(10))  # binding source keeps everything
    # determinism across re-runs and partitionings
    again = domain_mixture_sample(docs.repartition(7), weights)
    got2 = sorted((r.source, r.doc_id) for r in again.collect())
    assert got2 == sorted((s, d) for s, v in got.items() for d in v)
