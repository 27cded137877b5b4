"""Iceberg v2 merge-on-read DELETE: position-delete files
(_metadata.file_path / row_index) applied by anti-join at read, carried by
appends, materialized away by full-rewrite DML and compaction."""

import os

import pytest
from pyspark.sql import functions as F

from apache_iceberg_lakehouse_workshop_spark.plans import Lakehouse


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


def _mk(lake, spark, name="ns.t"):
    lake.create_namespace("ns")
    t = lake.create_table(name, "id BIGINT, v STRING, g BIGINT")
    t.append(
        spark.range(10).select(
            F.col("id"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
            (F.col("id") % 2).alias("g"),
        )
    )
    return t


def _data_files(t):
    snap = t._current_snapshot(t._load_meta())
    out = []
    for d in snap["commit_dirs"]:
        for root, _dirs, names in os.walk(os.path.join(t.path, "data", d)):
            out += [os.path.join(root, n) for n in names if n.endswith(".parquet")]
    return sorted(out)


def test_mor_delete_rewrites_no_data_file(lake, spark):
    t = _mk(lake, spark)
    before = _data_files(t)
    s1 = t._load_meta()["current_snapshot_id"]
    t.delete_where("id >= 7", mode="merge-on-read")
    assert sorted(r.id for r in t.read().collect()) == list(range(7))
    # the data-file set is IDENTICAL — only a delete dir was added
    assert _data_files(t) == before
    snap = t._current_snapshot(t._load_meta())
    assert len(snap.get("delete_dirs", [])) == 1
    # prior snapshot still sees every row (time travel unaffected)
    assert sorted(r.id for r in t.read(snapshot_id=s1).collect()) == list(range(10))


def test_mor_deletes_compound_and_never_rematch(lake, spark):
    t = _mk(lake, spark)
    t.delete_where("id >= 7", mode="merge-on-read")
    t.delete_where("id = 3", mode="merge-on-read")
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 4, 5, 6]
    # a predicate matching only already-deleted rows is metadata-only
    meta = t._load_meta()
    n_dirs = len(t._current_snapshot(meta).get("delete_dirs", []))
    t.delete_where("id = 8", mode="merge-on-read")
    meta = t._load_meta()
    assert len(t._current_snapshot(meta).get("delete_dirs", [])) == n_dirs
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 4, 5, 6]


def test_mor_mode_via_table_property_and_sql(lake, spark):
    t = _mk(lake, spark)
    before = _data_files(t)
    t.set_properties({"write.delete.mode": "merge-on-read"})
    # plain DELETE FROM routes through the property — Iceberg's knob
    lake.run_script("DELETE FROM ns.t WHERE id = 5;")
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 4, 6, 7, 8, 9]
    assert _data_files(t) == before
    t.unset_properties(["write.delete.mode"])
    t.delete_where("id = 6")  # back to CoW: rewrites, clears delete dirs
    snap = t._current_snapshot(t._load_meta())
    assert not snap.get("delete_dirs")
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 4, 7, 8, 9]


def test_mor_reads_compose_with_where_skipping_and_appends(lake, spark):
    t = _mk(lake, spark)
    t.delete_where("id = 2", mode="merge-on-read")
    assert sorted(r.id for r in t.read(where="id >= 1 AND id <= 4").collect()) == [1, 3, 4]
    t.append(spark.createDataFrame([(100, "x", 0)], "id BIGINT, v STRING, g BIGINT"))
    snap = t._current_snapshot(t._load_meta())
    assert len(snap.get("delete_dirs", [])) == 1  # appends carry deletes
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 3, 4, 5, 6, 7, 8, 9, 100]


def test_full_rewrites_materialize_deletes_away(lake, spark):
    t = _mk(lake, spark)
    t.delete_where("id >= 8", mode="merge-on-read")
    t.update_where({"v": "'upd'"}, "id = 1")
    snap = t._current_snapshot(t._load_meta())
    assert not snap.get("delete_dirs")
    assert sorted(r.id for r in t.read().collect()) == list(range(8))

    t.delete_where("id = 0", mode="merge-on-read")
    t.compact()
    snap = t._current_snapshot(t._load_meta())
    assert not snap.get("delete_dirs")
    assert sorted(r.id for r in t.read().collect()) == list(range(1, 8))

    t.delete_where("id = 7", mode="merge-on-read")
    src = spark.createDataFrame(
        [(3, "merged", 1), (200, "new", 0)], "id BIGINT, v STRING, g BIGINT"
    )
    t.merge(src, "id")
    got = {r.id: r.v for r in t.read().collect()}
    assert 7 not in got and got[3] == "merged" and got[200] == "new"
    assert not t._current_snapshot(t._load_meta()).get("delete_dirs")


def test_scoped_compact_carries_deletes(lake, spark):
    t = _mk(lake, spark)
    t.delete_where("id = 1", mode="merge-on-read")  # odd partition, survives scope
    t.compact(where="g = 0")  # rewrite only the even-g rows
    snap = t._current_snapshot(t._load_meta())
    assert snap.get("delete_dirs"), "scoped compact must carry delete dirs"
    assert sorted(r.id for r in t.read().collect()) == [0, 2, 3, 4, 5, 6, 7, 8, 9]


def test_expire_keeps_live_delete_dirs(lake, spark):
    t = _mk(lake, spark)
    t.delete_where("id = 4", mode="merge-on-read")
    t.append(spark.createDataFrame([(50, "y", 0)], "id BIGINT, v STRING, g BIGINT"))
    t.expire_snapshots(keep_last=1)
    # current snapshot still references the delete dir — rows stay deleted
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 5, 6, 7, 8, 9, 50]
    # materialize, then expire: the delete dir becomes unreferenced and is removed
    t.compact()
    t.expire_snapshots(keep_last=1)
    data_root = os.path.join(t.path, "data")
    assert not [d for d in os.listdir(data_root) if d.startswith("deletes-")]
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 5, 6, 7, 8, 9, 50]


def test_mor_null_predicate_rows_survive(lake, spark):
    lake.create_namespace("ns")
    t = lake.create_table("ns.n", "id BIGINT, v STRING")
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b")], "id BIGINT, v STRING"
        )
    )
    t.delete_where("v = 'a'", mode="merge-on-read")
    # v IS NULL makes the predicate NULL, not TRUE: the row survives
    assert sorted(r.id for r in t.read().collect()) == [2, 3]


def test_mor_update_position_deletes_plus_appended_copies(lake, spark):
    t = _mk(lake, spark)
    before = _data_files(t)
    t.update_where({"v": "concat(v, '!')"}, "id >= 8", mode="merge-on-read")
    got = {r.id: r.v for r in t.read().collect()}
    assert got[8] == "v8!" and got[9] == "v9!" and got[0] == "v0"
    assert len(got) == 10
    # old files intact; one new commit dir holds the two updated copies
    assert set(before) <= set(_data_files(t))
    snap = t._current_snapshot(t._load_meta())
    assert len(snap.get("delete_dirs", [])) == 1
    # property-routed, no-match predicate: metadata-only
    t.set_properties({"write.update.mode": "merge-on-read"})
    t.update_where({"v": "'x'"}, "id = 999")
    assert len(t._current_snapshot(t._load_meta()).get("delete_dirs", [])) == 1
    # updated rows can be MoR-updated again (their copies have coordinates)
    t.update_where({"v": "concat(v, '?')"}, "id = 9")
    got = {r.id: r.v for r in t.read().collect()}
    assert got[9] == "v9!?" and len(got) == 10


def test_mor_merge_upsert(lake, spark):
    t = _mk(lake, spark)
    before = _data_files(t)
    src = spark.createDataFrame(
        [(3, "m3", 1), (300, "new", 0)], "id BIGINT, v STRING, g BIGINT"
    )
    t.merge(src, "id", mode="merge-on-read")
    got = {r.id: r.v for r in t.read().collect()}
    assert got[3] == "m3" and got[300] == "new" and len(got) == 11
    assert set(before) <= set(_data_files(t))
    snap = t._current_snapshot(t._load_meta())
    assert len(snap.get("delete_dirs", [])) == 1
    # insert-only source: no delete dir added
    t.merge(
        spark.createDataFrame([(301, "i", 1)], "id BIGINT, v STRING, g BIGINT"),
        "id",
        mode="merge-on-read",
    )
    snap = t._current_snapshot(t._load_meta())
    assert len(snap.get("delete_dirs", [])) == 1
    assert {r.id for r in t.read().collect()} == set(range(10)) | {300, 301}
    # CoW merge afterwards materializes everything away
    t.merge(
        spark.createDataFrame([(0, "z", 0)], "id BIGINT, v STRING, g BIGINT"),
        "id",
        mode="copy-on-write",
    )
    snap = t._current_snapshot(t._load_meta())
    assert not snap.get("delete_dirs")
    got = {r.id: r.v for r in t.read().collect()}
    assert got[0] == "z" and got[3] == "m3" and len(got) == 12


def test_mor_update_and_merge_modes_via_sql_properties(lake, spark):
    """Plain UPDATE / MERGE INTO statements route through write.update.mode
    / write.merge.mode set by ALTER TABLE ... SET TBLPROPERTIES — the
    Iceberg knobs, no API-only switch."""
    t = _mk(lake, spark)
    before = _data_files(t)
    lake.run_script(
        "ALTER TABLE ns.t SET TBLPROPERTIES ("
        "'write.update.mode' = 'merge-on-read', "
        "'write.merge.mode' = 'merge-on-read');"
    )
    lake.run_script("UPDATE ns.t SET v = concat(v, '!') WHERE id = 7;")
    got = {r.id: r.v for r in t.read().collect()}
    assert got[7] == "v7!" and len(got) == 10
    assert set(before) <= set(_data_files(t))
    assert len(t._current_snapshot(t._load_meta()).get("delete_dirs", [])) == 1
    spark.createDataFrame(
        [(1, "m1", 1), (500, "new", 0)], "id BIGINT, v STRING, g BIGINT"
    ).createOrReplaceTempView("mor_src")
    lake.run_script(
        "MERGE INTO ns.t AS t USING mor_src AS s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *;"
    )
    got = {r.id: r.v for r in t.read().collect()}
    assert got[1] == "m1" and got[500] == "new" and len(got) == 11
    assert set(before) <= set(_data_files(t))
    assert len(t._current_snapshot(t._load_meta()).get("delete_dirs", [])) == 2


def test_rollback_to_mor_snapshot_keeps_deletes(lake, spark):
    """ADVICE r7 (high): rollback must carry the target snapshot's
    outstanding position-delete state — rolling back to (or past) a
    merge-on-read DELETE must not resurrect the deleted rows."""
    t = _mk(lake, spark)
    t.delete_where("id >= 5", mode="merge-on-read")
    s_del = t._load_meta()["current_snapshot_id"]
    t.append(spark.range(100, 103).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % 2).alias("g")))
    # roll back TO the MoR-delete snapshot: 5 rows, not 10
    t.rollback_to(s_del)
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 4]
    # the timestamp flavor routes through the same fix
    snaps = {r.snapshot_id: r.committed_at_ms for r in t.snapshots().collect()}
    t.rollback_to_timestamp(snaps[s_del])
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 4]


def test_sql_rollback_keeps_mor_deletes(lake, spark):
    t = _mk(lake, spark)
    t.delete_where("id >= 5", mode="merge-on-read")
    s_del = t._load_meta()["current_snapshot_id"]
    t.append(spark.range(100, 103).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % 2).alias("g")))
    lake.run_script(f"ROLLBACK TABLE ns.t TO SNAPSHOT '{s_del}';")
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 4]


def test_mor_delete_coordinate_scan_is_file_pruned(lake, spark, monkeypatch):
    """r12: the merge-on-read DELETE's coordinate scan runs the same
    file-level min/max skipping as reads — a file whose stats prove no
    row matches holds no coordinate the delete could emit, so it is
    never scanned (the MoR path rewrites nothing; unscanned files stay
    live untouched)."""
    from apache_iceberg_lakehouse_workshop_spark.plans.lakeshim import LakeTable

    lake.create_namespace("ns")
    clustered = (
        spark.range(1000)
        .select(F.col("id"), (F.col("id") % 7).alias("g"))
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id")
    )
    lake.create_table_as("ns.big", clustered)
    t = lake.table("ns.big")
    total = len(_data_files(t))
    assert total >= 4
    calls = []
    real = LakeTable._read_dirs

    def spy(self, dirs, file_lists=None, *a, **kw):
        calls.append(file_lists)
        return real(self, dirs, file_lists, *a, **kw)

    monkeypatch.setattr(LakeTable, "_read_dirs", spy)
    t.delete_where("id IN (3, 4)", mode="merge-on-read")
    pruned = [fl for fl in calls if fl is not None]
    assert pruned, "the coordinate scan received no file list"
    kept = sum(len(x) for x in pruned[0] if x is not None)
    assert 0 < kept < total
    assert sorted(r.id for r in t.read().filter("id < 6").collect()) == [
        0, 1, 2, 5,
    ]
    # a predicate provably matching nothing reads zero files (the scan
    # gets an all-empty file list) and commits metadata-only
    t.delete_where("id = 999999", mode="merge-on-read")
    assert calls[-1] is not None and all(x == [] for x in calls[-1])
    snap = t._current_snapshot(t._load_meta())
    assert len(snap.get("delete_dirs", [])) == 1  # no new delete dir


def test_read_with_coords_and_delete_positions_roundtrip(lake, spark):
    """r14 fused-DML surface: an index refresh reads its matched rows ONCE
    with physical coordinates, proves its property on the checkpointed
    result, and deletes the same rows via delete_positions — no second
    scan. Contract pinned here: (a) read_with_coords(where) returns
    exactly read().filter(where)'s rows plus coordinates, (b)
    delete_positions removes exactly those rows merge-on-read (no data
    file rewritten), (c) an EMPTY coordinate frame commits a
    metadata-only delete snapshot (no new delete dir), and (d) the fused
    delete_where empty-match path still commits without losing rows."""
    t = _mk(lake, spark)
    files_before = _data_files(t)
    live = t.read_with_coords(where="id BETWEEN 3 AND 5")
    rows = live.select("id", "v", "g", "__sg_file", "__sg_pos").collect()
    assert sorted(r["id"] for r in rows) == [3, 4, 5]
    want = {(r["id"], r["v"], r["g"]) for r in t.read().filter("id BETWEEN 3 AND 5").collect()}
    assert {(r["id"], r["v"], r["g"]) for r in rows} == want
    coords = live.filter("id IN (3, 5)")
    t.delete_positions(coords)
    assert sorted(r["id"] for r in t.read().collect()) == [0, 1, 2, 4, 6, 7, 8, 9]
    snap = t._current_snapshot(t._load_meta())
    assert snap["operation"] == "delete"
    assert len(snap.get("delete_dirs", [])) == 1
    assert _data_files(t) == files_before, "MoR: no data file rewritten"
    # empty coordinate frame: metadata-only snapshot, no new delete dir
    empty = t.read_with_coords(where="id = 3")  # already deleted
    n_before = len(snap.get("delete_dirs", []))
    t.delete_positions(empty)
    snap2 = t._current_snapshot(t._load_meta())
    assert snap2["operation"] == "delete"
    assert len(snap2.get("delete_dirs", [])) == n_before
    # fused delete_where paths: a no-match MoR delete is metadata-only
    # (outstanding delete dirs carried unchanged); a no-match CoW delete
    # keeps every row (and may legitimately materialize the delete files
    # away — CoW-after-MoR); a full-match CoW delete empties the table
    t.delete_where("id = 12345", mode="merge-on-read")
    assert t.read().count() == 8
    assert len(
        t._current_snapshot(t._load_meta()).get("delete_dirs", [])
    ) == n_before
    t.delete_where("id = 12345")
    assert t.read().count() == 8
    t.delete_where("true")
    assert t.read().count() == 0


def test_read_with_coords_empty_and_fully_pruned(lake, spark):
    """read_with_coords returns None for an empty table and when file
    stats prove no row can match — the zero-matching-rows contract the
    refresh callers branch on."""
    lake.create_namespace("ns")
    t = lake.create_table("ns.empty", "id BIGINT, v STRING")
    assert t.read_with_coords() is None
    t.append(spark.range(5).select("id", F.lit("x").alias("v")))
    assert t.read_with_coords(where="id > 1000000") is None
    got = t.read_with_coords(where="id >= 3")
    assert sorted(r["id"] for r in got.collect()) == [3, 4]
