"""Automated table optimization (readme.md:391-401): metadata-only
fragmentation detection -> recommended compact / fold_deletes /
expire_snapshots -> idempotent auto_maintain execution."""

import pytest
from pyspark.sql import functions as F

from apache_iceberg_lakehouse_workshop_spark.plans import Lakehouse


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


def test_fragmented_table_gets_compacted(lake, spark):
    lake.create_namespace("m")
    t = lake.create_table("m.frag", "id BIGINT")
    for i in range(10):  # ten tiny appends: 10 commit dirs of tiny files
        t.append(spark.createDataFrame([(i,)], "id BIGINT"))
    plan = lake.maintenance_plan(max_commit_dirs=8)
    assert {(p["table"], p["action"]) for p in plan} == {("m.frag", "compact")}
    done = lake.auto_maintain(max_commit_dirs=8, keep_snapshots=20)
    assert done == plan
    h = lake.table_health("m.frag")
    assert h["n_commit_dirs"] == 1
    assert sorted(r.id for r in t.read().collect()) == list(range(10))
    # healthy now: nothing further recommended
    assert lake.maintenance_plan(max_commit_dirs=8, keep_snapshots=20) == []


def test_cdc_delete_files_get_folded_not_rewritten(lake, spark):
    lake.create_namespace("m")
    t = lake.create_table("m.cdc", "id BIGINT, v STRING")
    t.append(
        spark.range(100).select(
            F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
        )
    )
    for i in range(5):  # five equality-upsert batches -> 5 delete files
        t.upsert_equality(
            spark.createDataFrame([(i, f"u{i}")], "id BIGINT, v STRING"), "id"
        )
    # files are large enough relative to a tiny target that compaction is
    # NOT warranted -> the cheaper fold is recommended
    plan = lake.maintenance_plan(
        target_file_mb=0, max_delete_files=3, max_commit_dirs=50,
        keep_snapshots=20,
    )
    assert {(p["table"], p["action"]) for p in plan} == {("m.cdc", "fold_deletes")}
    lake.auto_maintain(
        target_file_mb=0, max_delete_files=3, max_commit_dirs=50,
        keep_snapshots=20,
    )
    snap = t._current_snapshot(t._load_meta())
    assert not snap.get("eq_deletes")
    assert len(snap.get("delete_dirs", [])) == 1
    got = {r.id: r.v for r in t.read().collect()}
    assert got[0] == "u0" and got[4] == "u4" and len(got) == 100


def test_snapshot_history_expiry_recommended(lake, spark):
    lake.create_namespace("m")
    t = lake.create_table("m.hist", "id BIGINT")
    for i in range(12):
        t.append(spark.createDataFrame([(i,)], "id BIGINT"))
    plan = lake.maintenance_plan(
        target_file_mb=0, max_commit_dirs=50, keep_snapshots=10
    )
    assert ("m.hist", "expire_snapshots") in {
        (p["table"], p["action"]) for p in plan
    }
    lake.auto_maintain(target_file_mb=0, max_commit_dirs=50, keep_snapshots=10)
    assert lake.table_health("m.hist")["n_snapshots"] <= 10
