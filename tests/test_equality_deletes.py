"""Iceberg v2 EQUALITY deletes: key-tuple delete files written WITHOUT
reading the target, applied by null-safe anti-join at read, scoped to the
commit dirs that existed at delete time (the sequence-number rule), folded
away by compaction — the primitive under Flink-style O(batch) streaming
upserts (upsert_equality / stream_upsert_to_table(equality=True))."""

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


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id BIGINT")


def test_delete_by_key_no_rewrite_and_time_travel(lake, spark):
    t = _mk(lake, spark)
    before = _data_files(t)
    prev = t._current_snapshot(t._load_meta())["id"]
    t.delete_by_key(_keys(spark, [3, 7, 999]))
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 4, 5, 6, 8, 9]
    assert _data_files(t) == before  # no data file rewritten
    snap = t._current_snapshot(t._load_meta())
    assert len(snap.get("eq_deletes", [])) == 1
    # prior snapshot never references the delete file
    assert sorted(r.id for r in t.read(snapshot_id=prev).collect()) == list(range(10))


def test_sequence_rule_later_appends_survive(lake, spark):
    t = _mk(lake, spark)
    t.delete_by_key(_keys(spark, [4]))
    # re-insert the same key AFTER the delete: the new row must survive
    t.append(spark.createDataFrame([(4, "reborn", 0)], "id BIGINT, v STRING, g BIGINT"))
    got = {r.id: r.v for r in t.read().collect()}
    assert got[4] == "reborn" and len(got) == 10
    # and a second equality delete covers the new dir too
    t.delete_by_key(_keys(spark, [4]))
    assert 4 not in {r.id for r in t.read().collect()}


def test_upsert_equality_replaces_and_inserts_without_target_read(lake, spark):
    t = _mk(lake, spark)
    before = _data_files(t)
    n_snaps = len(t._load_meta()["snapshots"])
    t.upsert_equality(
        spark.createDataFrame(
            [(2, "u2", 0), (200, "new", 0)], "id BIGINT, v STRING, g BIGINT"
        ),
        "id",
    )
    got = {r.id: r.v for r in t.read().collect()}
    assert got[2] == "u2" and got[200] == "new" and len(got) == 11
    assert set(before) <= set(_data_files(t))  # old files untouched
    assert len(t._load_meta()["snapshots"]) == n_snaps + 1  # one atomic commit
    # chained: the second upsert's delete must cover the FIRST upsert's dir
    t.upsert_equality(
        spark.createDataFrame([(200, "newer", 0)], "id BIGINT, v STRING, g BIGINT"),
        "id",
    )
    got = {r.id: r.v for r in t.read().collect()}
    assert got[200] == "newer" and len(got) == 11


def test_compact_materializes_equality_deletes_away(lake, spark):
    t = _mk(lake, spark)
    t.delete_by_key(_keys(spark, [0, 1]))
    t.upsert_equality(
        spark.createDataFrame([(5, "u5", 1)], "id BIGINT, v STRING, g BIGINT"), "id"
    )
    t.compact()
    snap = t._current_snapshot(t._load_meta())
    assert not snap.get("eq_deletes") and not snap.get("delete_dirs")
    got = {r.id: r.v for r in t.read().collect()}
    assert sorted(got) == [2, 3, 4, 5, 6, 7, 8, 9] and got[5] == "u5"


def test_cow_dml_after_equality_deletes_never_resurrects(lake, spark):
    t = _mk(lake, spark)
    t.delete_by_key(_keys(spark, [9]))
    # CoW delete must full-rewrite (affected-only carry would resurrect 9)
    t.delete_where("id = 0")
    snap = t._current_snapshot(t._load_meta())
    assert not snap.get("eq_deletes")
    assert sorted(r.id for r in t.read().collect()) == list(range(1, 9))


def test_composes_with_position_deletes_and_where_skipping(lake, spark):
    t = _mk(lake, spark)
    t.delete_where("id = 1", mode="merge-on-read")  # position delete
    t.delete_by_key(_keys(spark, [2]))  # equality delete
    assert sorted(r.id for r in t.read().collect()) == [0, 3, 4, 5, 6, 7, 8, 9]
    assert sorted(r.id for r in t.read(where="id <= 4").collect()) == [0, 3, 4]
    # MoR DML on top of both: the matched set excludes eq-deleted rows
    t.update_where({"v": "'seen'"}, "id <= 2", mode="merge-on-read")
    got = {r.id: r.v for r in t.read().collect()}
    assert got[0] == "seen" and 1 not in got and 2 not in got


def test_rename_keeps_delete_file_applicable_drop_refused(lake, spark):
    t = _mk(lake, spark)
    t.delete_by_key(_keys(spark, [6]))
    t.rename_column("id", "ident")
    assert sorted(r.ident for r in t.read().collect()) == [0, 1, 2, 3, 4, 5, 7, 8, 9]
    # a NEW delete keyed on the renamed column also works (physical names)
    t.delete_by_key(spark.createDataFrame([(7,)], "ident BIGINT"))
    assert 7 not in {r.ident for r in t.read().collect()}
    with pytest.raises(ValueError, match="equality-delete"):
        t.drop_column("ident")
    t.compact()
    t.drop_column("ident")  # folded away: drop is legal again


def test_null_keys_match_null_rows(lake, spark):
    lake.create_namespace("ns")
    t = lake.create_table("ns.n", "id BIGINT, v STRING")
    t.append(
        spark.createDataFrame([(1, "a"), (None, "b"), (None, "c")], "id BIGINT, v STRING")
    )
    t.delete_by_key(spark.createDataFrame([(None,)], "id BIGINT"))
    assert [r.v for r in t.read().collect()] == ["a"]


def test_unknown_key_column_raises(lake, spark):
    t = _mk(lake, spark)
    with pytest.raises(ValueError, match="unknown equality-delete key"):
        t.delete_by_key(spark.createDataFrame([(1,)], "nope BIGINT"))


def test_branch_append_carries_equality_deletes(lake, spark):
    t = _mk(lake, spark)
    t.delete_by_key(_keys(spark, [5]))
    t.create_branch("audit")
    t.append_to_branch(
        "audit",
        spark.createDataFrame([(50, "b", 0)], "id BIGINT, v STRING, g BIGINT"),
    )
    ids = sorted(r.id for r in t.read_branch("audit").collect())
    assert 5 not in ids and 50 in ids


def test_expire_snapshots_keeps_live_delete_files(lake, spark):
    t = _mk(lake, spark)
    t.delete_by_key(_keys(spark, [8]))
    t.append(spark.createDataFrame([(80, "x", 0)], "id BIGINT, v STRING, g BIGINT"))
    t.expire_snapshots(keep_last=1)
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 4, 5, 6, 7, 9, 80]


def test_incremental_read_invalidated_by_equality_commits(lake, spark):
    t = _mk(lake, spark)
    base = t._current_snapshot(t._load_meta())["id"]
    t.delete_by_key(_keys(spark, [1]))
    with pytest.raises(ValueError, match="non-append"):
        t.read_incremental(base)


def test_stream_upsert_equality_matches_cow_merge(lake, spark, tmp_path):
    """The Flink-upsert-mode sink (equality=True) lands the same table
    state as the CoW-merge sink, with zero data-file rewrites."""
    from apache_iceberg_lakehouse_workshop_spark.streaming.pipeline import (
        upsert_stream_batch,
    )

    lake.create_namespace("ns")
    eq_t = lake.create_table("ns.eq", "id BIGINT, v STRING, seq BIGINT")
    cow_t = lake.create_table("ns.cow", "id BIGINT, v STRING, seq BIGINT")
    batches = [
        [(1, "a1", 1), (2, "b1", 1)],
        [(1, "a2", 2), (3, "c1", 1), (1, "a3", 3)],  # in-batch dup key
        [(2, "b2", 2)],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "id BIGINT, v STRING, seq BIGINT")
        assert upsert_stream_batch(
            eq_t, str(tmp_path / "ck_eq"), ["id"], df, i, "seq", equality=True
        )
        assert upsert_stream_batch(
            cow_t, str(tmp_path / "ck_cow"), ["id"], df, i, "seq"
        )
    want = {(1, "a3", 3), (2, "b2", 2), (3, "c1", 1)}
    assert {(r.id, r.v, r.seq) for r in eq_t.read().collect()} == want
    assert {(r.id, r.v, r.seq) for r in cow_t.read().collect()} == want
    # replay of an already-applied batch is a no-op (exactly-once)
    df = spark.createDataFrame(batches[2], "id BIGINT, v STRING, seq BIGINT")
    assert not upsert_stream_batch(
        eq_t, str(tmp_path / "ck_eq"), ["id"], df, 2, "seq", equality=True
    )
    # maintenance folds the per-batch delete files away
    eq_t.compact()
    assert not eq_t._current_snapshot(eq_t._load_meta()).get("eq_deletes")
    assert {(r.id, r.v, r.seq) for r in eq_t.read().collect()} == want


def test_fold_deletes_consolidates_without_data_rewrite(lake, spark):
    t = _mk(lake, spark)
    before = _data_files(t)
    t.delete_where("id = 1", mode="merge-on-read")  # position delete
    t.delete_by_key(_keys(spark, [2]))  # equality delete
    t.upsert_equality(
        spark.createDataFrame([(3, "u3", 1), (30, "n", 0)],
                              "id BIGINT, v STRING, g BIGINT"),
        "id",
    )
    want = {r.id: r.v for r in t.read().collect()}
    t.fold_deletes()
    snap = t._current_snapshot(t._load_meta())
    assert not snap.get("eq_deletes")
    assert len(snap.get("delete_dirs", [])) == 1  # one consolidated dir
    assert set(before) <= set(_data_files(t))  # data files untouched
    assert {r.id: r.v for r in t.read().collect()} == want
    assert want[3] == "u3" and 1 not in want and 2 not in want and want[30] == "n"
    # drop_column legal again after the equality entries folded
    t.drop_column("g")
    # idempotent: nothing outstanding beyond the folded dir -> fold again
    sid = t._current_snapshot(t._load_meta())["id"]
    t.fold_deletes()
    assert {r.id for r in t.read().collect()} == set(want)


def test_fold_deletes_noop_when_clean(lake, spark):
    t = _mk(lake, spark)
    sid = t._current_snapshot(t._load_meta())["id"]
    assert t.fold_deletes() == sid  # metadata untouched
    assert t._current_snapshot(t._load_meta())["id"] == sid


def test_publish_fallback_refuses_missing_main_deletes(lake, spark):
    """Chain-broken fast-forward must not resurrect rows main deleted
    AFTER the branch was staged."""
    import pytest as _pt

    t = _mk(lake, spark)
    t.create_branch("wap")
    t.append_to_branch(
        "wap", spark.createDataFrame([(90, "b", 0)], "id BIGINT, v STRING, g BIGINT")
    )
    # main advances with a MoR delete the branch doesn't carry
    t.delete_by_key(_keys(spark, [0]))
    # expire intermediate history so the parent chain breaks
    t.expire_snapshots(keep_last=1)
    with _pt.raises(ValueError, match="fast-forward"):
        t.publish_branch("wap")


def test_stream_upsert_equality_fold_every_bounds_delete_files(lake, spark, tmp_path):
    from apache_iceberg_lakehouse_workshop_spark.streaming.pipeline import (
        upsert_stream_batch,
    )

    lake.create_namespace("ns")
    t = lake.create_table("ns.cdc", "id BIGINT, v STRING, seq BIGINT")
    state = {}
    for i in range(7):
        rows = [(i % 4, f"v{i}", i), (100 + i, f"n{i}", i)]
        state[i % 4] = (f"v{i}", i)
        state[100 + i] = (f"n{i}", i)
        df = spark.createDataFrame(rows, "id BIGINT, v STRING, seq BIGINT")
        upsert_stream_batch(
            t, str(tmp_path / "ck"), ["id"], df, i, "seq",
            equality=True, fold_every=3,
        )
        snap = t._current_snapshot(t._load_meta())
        # readers never chain more than fold_every equality anti-joins
        assert len(snap.get("eq_deletes", [])) < 3 or not snap.get("eq_deletes")
    got = {r.id: (r.v, r.seq) for r in t.read().collect()}
    assert got == state


def test_optimize_rewrite_deletes_sql(lake, spark):
    t = _mk(lake, spark)
    t.delete_by_key(_keys(spark, [1, 3]))
    t.delete_where("id = 5", mode="merge-on-read")
    lake.run_script("OPTIMIZE TABLE ns.t REWRITE DELETES;")
    snap = t._current_snapshot(t._load_meta())
    assert not snap.get("eq_deletes")
    assert len(snap.get("delete_dirs", [])) == 1
    assert sorted(r.id for r in t.read().collect()) == [0, 2, 4, 6, 7, 8, 9]


def test_delete_files_metadata_table_and_tvf(lake, spark):
    t = _mk(lake, spark)
    assert t.delete_files().count() == 0
    t.delete_where("id = 1", mode="merge-on-read")
    t.delete_by_key(_keys(spark, [2]))
    df = t.delete_files().collect()
    by_content = {r.content: r for r in df}
    assert set(by_content) == {1, 2}
    assert by_content[2].equality_cols == "id"
    assert by_content[1].equality_cols is None
    assert all(r.size_bytes > 0 for r in df)
    # SQL TVF form (Iceberg t.delete_files parity) — one DIR per delete
    # commit; parquet part-file counts within a dir are plan-dependent
    out = lake.run_script(
        "SELECT content, COUNT(DISTINCT commit_dir) AS n "
        "FROM TABLE(table_delete_files('ns.t')) "
        "GROUP BY content ORDER BY content;"
    )
    assert [(r.content, r.n) for r in out.collect()] == [(1, 1), (2, 1)]
    # post-maintenance invariant: fold leaves exactly one position dir
    t.fold_deletes()
    assert {r.content for r in t.delete_files().collect()} == {1}
    t.compact()
    assert t.delete_files().count() == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_rows_st = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 9)), min_size=1, max_size=4
)
_ops_st = st.lists(
    st.one_of(
        st.tuples(st.just("append"), _rows_st),
        st.tuples(st.just("delete_by_key"),
                  st.lists(st.integers(0, 7), min_size=1, max_size=3)),
        st.tuples(st.just("upsert"), _rows_st),
        st.tuples(st.just("mor_delete"), st.integers(0, 7)),
        st.tuples(st.just("fold"), st.none()),
        st.tuples(st.just("compact"), st.none()),
    ),
    min_size=2,
    max_size=6,
)


@given(_ops_st)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_mor_delete_machinery_matches_model(spark, ops):
    """Model-based soundness: ANY interleaving of appends, equality
    deletes, equality upserts, position deletes, folds, and compactions
    reads back exactly what a plain multiset model predicts — no
    resurrection, no lost rows, regardless of which delete files are
    outstanding when the next op lands."""
    import shutil
    import tempfile

    wh = tempfile.mkdtemp(prefix="eqprop-")
    try:
        lake = Lakehouse(spark, wh)
        t = lake.create_table("m.t", "id BIGINT, v STRING")
        model: list[tuple[int, str]] = []

        def df_of(rows):
            return spark.createDataFrame(
                [(k, f"v{x}") for k, x in rows], "id BIGINT, v STRING"
            )

        for op, arg in ops:
            if op == "append":
                t.append(df_of(arg))
                model += [(k, f"v{x}") for k, x in arg]
            elif op == "delete_by_key":
                t.delete_by_key(
                    spark.createDataFrame([(k,) for k in arg], "id BIGINT")
                )
                model = [r for r in model if r[0] not in set(arg)]
            elif op == "upsert":
                t.upsert_equality(df_of(arg), "id")
                keys = {k for k, _ in arg}
                model = [r for r in model if r[0] not in keys]
                model += [(k, f"v{x}") for k, x in arg]
            elif op == "mor_delete":
                t.delete_where(f"id = {arg}", mode="merge-on-read")
                model = [r for r in model if r[0] != arg]
            elif op == "fold":
                t.fold_deletes()
            elif op == "compact":
                t.compact(n_files=2)
        got = sorted((r.id, r.v) for r in t.read().collect())
        assert got == sorted(model)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_read_changes_changelog(lake, spark):
    """CDC-out: read_changes emits net row-level changes with _change_type
    (Iceberg create_changelog_view / Delta table_changes semantics)."""
    t = lake.create_table("c.t", "id BIGINT, v STRING")
    base = t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, v STRING"))
    s2 = t.append(spark.createDataFrame([(3, "c")], "id BIGINT, v STRING"))
    # append-only range: the O(delta) fast path, inserts only
    assert [(r.id, r.v, r._change_type) for r in t.read_changes(base).collect()] \
        == [(3, "c", "insert")]
    # upsert: the replaced key appears as delete + insert
    s3 = t.upsert_equality(
        spark.createDataFrame([(2, "B"), (4, "d")], "id BIGINT, v STRING"), "id"
    )
    ch = sorted((r.id, r.v, r._change_type) for r in t.read_changes(s2, s3).collect())
    assert ch == [(2, "B", "insert"), (2, "b", "delete"), (4, "d", "insert")]
    # from the empty table
    assert sorted((r.id, r._change_type) for r in t.read_changes(None).collect()) \
        == [(1, "insert"), (2, "insert"), (3, "insert"), (4, "insert")]
    # net-zero rewrite: compaction is invisible to the changelog
    s4 = t.compact()
    assert t.read_changes(s3, s4).count() == 0
    # MoR position delete shows as a delete
    t.delete_where("id = 1", mode="merge-on-read")
    assert [(r.id, r._change_type) for r in t.read_changes(s4).collect()] \
        == [(1, "delete")]


def test_snapshots_expose_delete_file_counts_and_summary(lake, spark):
    t = _mk(lake, spark)
    t.delete_by_key(_keys(spark, [1]))
    t.delete_where("id = 2", mode="merge-on-read")
    t.upsert_equality(
        spark.createDataFrame([(3, "u", 1)], "id BIGINT, v STRING, g BIGINT"),
        "id",
        snapshot_props={"batch_id": 7},
    )
    snaps = {r.snapshot_id: r for r in t.snapshots().collect()}
    last = snaps[max(snaps)]
    assert last.n_delete_files == 3  # 1 eq + 1 pos + 1 eq (upsert)
    assert '"batch_id": 7' in last.summary
    assert snaps[min(snaps)].n_delete_files == 0


def test_eq_delete_matches_rows_written_after_rename(lake, spark):
    """Post-rename dirs store the key under the NEW physical name; the
    anti-join must compare the same {current, physical} coalesce lineage
    _finalize_read uses — otherwise a second upsert silently fails to
    replace rows the first upsert wrote (duplicate keys)."""
    lake.create_namespace("ns")
    t = lake.create_table("ns.r", "id BIGINT, v STRING")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, v STRING"))
    t.rename_column("id", "ident")
    t.upsert_equality(
        spark.createDataFrame([(1, "b1")], "ident BIGINT, v STRING"), "ident"
    )
    t.upsert_equality(
        spark.createDataFrame([(1, "c1")], "ident BIGINT, v STRING"), "ident"
    )
    got = {r.ident: r.v for r in t.read().collect()}
    assert got == {1: "c1", 2: "b"}
    # delete_by_key reaches post-rename rows too
    t.delete_by_key(spark.createDataFrame([(1,)], "ident BIGINT"))
    assert {r.ident for r in t.read().collect()} == {2}


def test_eq_delete_on_never_written_column_is_null_semantics(lake, spark):
    """A key column added to the schema but present in no data file is a
    typed NULL everywhere: non-NULL delete keys match nothing, a NULL
    delete key matches every pre-existing row — and reads never raise."""
    lake.create_namespace("ns")
    t = lake.create_table("ns.w", "id BIGINT, v STRING")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, v STRING"))
    t.add_column("w", "BIGINT")
    t.delete_by_key(spark.createDataFrame([(5,)], "w BIGINT"))
    assert t.read().count() == 2  # nothing matches a concrete key
    t.delete_by_key(spark.createDataFrame([(None,)], "w BIGINT"))
    assert t.read().count() == 0  # every row's w IS NULL


def test_read_changes_is_select_gated(spark, tmp_path):
    lake = Lakehouse(
        spark, str(tmp_path / "wh"), enforce_grants=True, current_user="ana"
    )
    lake.grant(["CREATE TABLE", "WRITE", "INSERT"], "PROJECT", "", "USER", "ana")
    t = lake.create_table("g.t", "id BIGINT")
    base = t.append(spark.createDataFrame([(1,)], "id BIGINT"))
    # WRITE/INSERT without SELECT must NOT read the changelog
    with pytest.raises(PermissionError, match="SELECT"):
        t.read_changes(None)
    lake.grant(["SELECT"], "TABLE", "g.t", "USER", "ana")
    assert t.read_changes(None).count() == 1


def test_read_changes_fast_path_normalizes_schema_across_rename(lake, spark):
    lake.create_namespace("ns")
    t = lake.create_table("ns.f", "id BIGINT, v STRING")
    base = t.append(spark.createDataFrame([(1, "a")], "id BIGINT, v STRING"))
    t.rename_column("id", "ident")
    t.append(spark.createDataFrame([(2, "b")], "ident BIGINT, v STRING"))
    ch = t.read_changes(base)
    assert ch.columns == ["ident", "v", "_change_type"]
    assert [(r.ident, r.v) for r in ch.collect()] == [(2, "b")]


def test_read_changes_null_rows_do_not_churn(lake, spark):
    """NULL-bearing unchanged rows must not surface as phantom
    delete+insert pairs (the multiset diff is null-safe GROUP BY, not a
    null-unsafe join)."""
    t = lake.create_table("c.n", "id BIGINT, v STRING")
    base = t.append(
        spark.createDataFrame([(1, None), (2, "b")], "id BIGINT, v STRING")
    )
    t.upsert_equality(
        spark.createDataFrame([(3, "c")], "id BIGINT, v STRING"), "id"
    )  # non-append: forces the multiset-diff path
    ch = [(r.id, r.v, r._change_type) for r in t.read_changes(base).collect()]
    assert ch == [(3, "c", "insert")]


def test_read_changes_slow_path_spans_schema_evolution(lake, spark):
    t = lake.create_table("c.e", "id BIGINT, v STRING")
    base = t.append(spark.createDataFrame([(1, "a")], "id BIGINT, v STRING"))
    t.rename_column("id", "ident")
    t.add_column("w", "BIGINT")
    t.upsert_equality(
        spark.createDataFrame([(1, "A", 9)], "ident BIGINT, v STRING, w BIGINT"),
        "ident",
    )
    ch = sorted(
        (r.ident, r.v, r.w, r._change_type)
        for r in t.read_changes(base).collect()
    )
    # the epoch-schema old side aligns onto the current schema (w NULL)
    assert ch == [(1, "A", 9, "insert"), (1, "a", None, "delete")]


def test_read_changes_unknown_to_snapshot_raises_value_error(lake, spark):
    t = _mk(lake, spark)
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.read_changes(None, 9999)


def test_time_travel_sees_intermediate_rename_generations(lake, spark):
    """VERSION AS OF at an epoch inside a rename chain reads rows written
    under intermediate names (the epoch's schema_log entry carries the
    lineage captured at push time)."""
    lake.create_namespace("ns")
    t = lake.create_table("ns.tt", "id BIGINT, v STRING")
    t.append(spark.createDataFrame([(1, "one")], "id BIGINT, v STRING"))
    t.rename_column("id", "a")
    t.append(spark.createDataFrame([(2, "two")], "a BIGINT, v STRING"))
    t.rename_column("a", "b")
    s3 = t.append(spark.createDataFrame([(3, "three")], "b BIGINT, v STRING"))
    t.rename_column("b", "c")
    # current read under the final name
    assert sorted((r.c, r.v) for r in t.read().collect()) == [
        (1, "one"), (2, "two"), (3, "three"),
    ]
    # travel to the 'b' epoch: all three generations, under 'b'
    got = sorted((r.b, r.v) for r in t.read(snapshot_id=s3).collect())
    assert got == [(1, "one"), (2, "two"), (3, "three")]


def test_table_changes_sql_tvf(lake, spark):
    t = _mk(lake, spark)
    base = t._current_snapshot(t._load_meta())["id"]
    t.upsert_equality(
        spark.createDataFrame([(0, "Z", 0), (77, "n", 1)],
                              "id BIGINT, v STRING, g BIGINT"),
        "id",
    )
    out = lake.run_script(
        f"SELECT _change_type, COUNT(*) AS n "
        f"FROM TABLE(table_changes('ns.t', {base})) "
        f"GROUP BY _change_type ORDER BY _change_type;"
    )
    assert [(r._change_type, r.n) for r in out.collect()] == [
        ("delete", 1), ("insert", 2),
    ]
    # NULL from = since the empty table
    out = lake.run_script(
        "SELECT COUNT(*) AS n FROM TABLE(table_changes('ns.t', NULL));"
    )
    assert out.collect()[0].n == 11


def test_rollback_to_equality_delete_snapshot_keeps_deletes(lake, spark):
    """ADVICE r7 (high): rollback must carry eq_deletes too — rolling back
    to a snapshot holding outstanding equality deletes must not resurrect
    the keyed-out rows."""
    t = _mk(lake, spark)
    t.delete_by_key(_keys(spark, [3, 7]))
    s_del = t._load_meta()["current_snapshot_id"]
    t.append(spark.range(20, 23).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % 2).alias("g")))
    t.rollback_to(s_del)
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 4, 5, 6, 8, 9]
    # the sequence rule survives the rollback: re-appending a deleted key
    # AFTER the rollback creates a fresh dir, which the old delete does
    # not apply to
    t.append(_keys(spark, [3]).select(
        F.col("id"), F.lit("re-added").alias("v"), F.lit(1).cast("bigint").alias("g")))
    assert 3 in {r.id for r in t.read().collect()}


def test_read_changes_update_pairing(lake, spark):
    """Round-8 #2: with declared identifier columns a same-key delete+
    insert pair is emitted as update_preimage/update_postimage (Iceberg
    create_changelog_view compute_updates); ambiguous multiplicities stay
    plain insert/delete."""
    t = lake.create_table("c.p", "id BIGINT, v STRING")
    base = t.append(
        spark.createDataFrame([(1, "a"), (2, "b"), (5, "x")], "id BIGINT, v STRING")
    )
    t.delete_where("id = 5")
    s2 = t.append(
        spark.createDataFrame(
            [(5, "y"), (5, "z")], "id BIGINT, v STRING"
        )
    )
    s3 = t.upsert_equality(
        spark.createDataFrame([(2, "B"), (3, "c")], "id BIGINT, v STRING"), "id"
    )
    ch = sorted(
        (r.id, r.v, r._change_type)
        for r in t.read_changes(base, s3, key_cols=["id"]).collect()
    )
    assert ch == [
        (2, "B", "update_postimage"),
        (2, "b", "update_preimage"),
        (3, "c", "insert"),
        # id=5 has 1 delete + 2 inserts: ambiguous, never guessed
        (5, "x", "delete"),
        (5, "y", "insert"),
        (5, "z", "insert"),
    ]
    # no keys declared -> plain rows (back-compat)
    plain = {r._change_type for r in t.read_changes(base, s3).collect()}
    assert plain == {"insert", "delete"}
    # the changelog.key-columns table property drives the default
    t.set_properties({"changelog.key-columns": "id"})
    prop = sorted(
        (r.id, r.v, r._change_type)
        for r in t.read_changes(base, s3).collect()
    )
    assert prop == ch


def test_table_changes_tvf_timestamp_bounds(lake, spark):
    """TABLE(table_changes('t', TIMESTAMP '...')) resolves bounds to the
    snapshot current at that instant via snapshot history."""
    import time as _time
    from datetime import datetime, timezone

    t = lake.create_table("c.ts", "id BIGINT, v STRING")
    t.append(spark.createDataFrame([(1, "a")], "id BIGINT, v STRING"))
    _time.sleep(0.05)
    t.append(spark.createDataFrame([(2, "b")], "id BIGINT, v STRING"))
    snaps = sorted(
        (r.snapshot_id, r.committed_at_ms) for r in t.snapshots().collect()
    )
    first_ms = snaps[0][1]
    lit = datetime.fromtimestamp(first_ms / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    out = lake.run_script(
        f"SELECT id, v, _change_type "
        f"FROM TABLE(table_changes('c.ts', TIMESTAMP '{lit}')) ORDER BY id"
    )
    # state at the first commit's instant -> only the second append differs
    assert [(r.id, r.v, r._change_type) for r in out.collect()] == [
        (2, "b", "insert")
    ]
    # an instant before the table existed -> since the empty table
    early = datetime.fromtimestamp(
        (first_ms - 10_000) / 1000, tz=timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")
    out2 = lake.run_script(
        f"SELECT COUNT(*) AS n "
        f"FROM TABLE(table_changes('c.ts', TIMESTAMP '{early}'))"
    )
    assert out2.collect()[0].n == 2


_cl_ops_st = st.lists(
    st.one_of(
        st.tuples(st.just("append"), _rows_st),
        st.tuples(st.just("delete_by_key"),
                  st.lists(st.integers(0, 7), min_size=1, max_size=3)),
        st.tuples(st.just("upsert"), _rows_st),
        st.tuples(st.just("mor_delete"), st.integers(0, 7)),
        st.tuples(st.just("fold"), st.none()),
        st.tuples(st.just("compact"), st.none()),
        st.tuples(st.just("rename"), st.none()),
        st.tuples(st.just("addcol"), st.none()),
        st.tuples(st.just("rollback"), st.none()),
    ),
    min_size=2,
    max_size=6,
)


@given(_cl_ops_st, st.data())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_read_changes_matches_model_diff(spark, ops, data):
    """Round-8 #8 model-based changelog soundness: for ANY interleaving of
    appends / equality deletes / upserts / MoR deletes / folds /
    compactions / RENAME / ADD COLUMN, ``read_changes(s_i, s_j)`` equals
    the model's multiset diff between the states at those snapshots, for
    random snapshot pairs — inserts are exactly state_j − state_i and
    deletes exactly state_i − state_j, across schema evolution."""
    import shutil
    import tempfile
    from collections import Counter

    wh = tempfile.mkdtemp(prefix="clprop-")
    try:
        lake = Lakehouse(spark, wh)
        t = lake.create_table("m.c", "id BIGINT, v STRING")
        kcol, has_w = "id", False
        model: list[tuple] = []  # rows as (k, v, w)
        # snapshot id -> frozen model state (fold/compact are net-zero and
        # never change the state; they still advance the snapshot)
        states: list[tuple[int | None, tuple]] = [(None, ())]

        def df_of(rows):
            if has_w:
                return spark.createDataFrame(
                    [(k, f"v{x}", x) for k, x in rows],
                    f"{kcol} BIGINT, v STRING, w BIGINT",
                )
            return spark.createDataFrame(
                [(k, f"v{x}") for k, x in rows], f"{kcol} BIGINT, v STRING"
            )

        for op, arg in ops:
            if op == "append":
                t.append(df_of(arg))
                model += [
                    (k, f"v{x}", x if has_w else None) for k, x in arg
                ]
            elif op == "delete_by_key":
                t.delete_by_key(
                    spark.createDataFrame([(k,) for k in arg], f"{kcol} BIGINT")
                )
                model = [r for r in model if r[0] not in set(arg)]
            elif op == "upsert":
                t.upsert_equality(df_of(arg), kcol)
                keys = {k for k, _ in arg}
                model = [r for r in model if r[0] not in keys]
                model += [
                    (k, f"v{x}", x if has_w else None) for k, x in arg
                ]
            elif op == "mor_delete":
                t.delete_where(f"{kcol} = {arg}", mode="merge-on-read")
                model = [r for r in model if r[0] != arg]
            elif op == "fold":
                t.fold_deletes()
            elif op == "compact":
                t.compact(n_files=2)
            elif op == "rename" and kcol == "id":
                t.rename_column("id", "ident")
                kcol = "ident"
            elif op == "addcol" and not has_w:
                t.add_column("w", "BIGINT")
                has_w = True
            elif op == "rollback":
                # roll back to the median committed snapshot (if any):
                # resurrected-then-possibly-re-deleted rows exercise the
                # rewritten-history fallback across a rollback boundary
                committed = [(s, stt) for s, stt in states if s is not None]
                if committed:
                    tgt_sid, tgt_state = committed[len(committed) // 2]
                    t.rollback_to(tgt_sid)
                    model = list(tgt_state)
            sid = t._load_meta()["current_snapshot_id"]
            # a no-op (fold/compact on nothing, rename/addcol re-draws,
            # missed deletes) commits NOTHING — it must not mint a new
            # addressable state (round-8 counterexample: the snapshot-less
            # fold recorded (None, ()) and None-as-to means CURRENT)
            if sid != states[-1][0]:
                states.append((sid, tuple(sorted(model, key=repr))))

        def row_tuple(r):
            # a range ending BEFORE the rename/add-column reads under the
            # to-snapshot's epoch schema (old names, no w) — accept both
            d = r.asDict()
            return (d.get("ident", d.get("id")), d["v"], d.get("w"))

        if len(states) == 1:
            # every op was a no-op: nothing ever committed — the only
            # addressable range is the empty one
            assert t.read_changes(None, None).count() == 0
            return

        # check (None -> current) plus two random pairs i < j
        pairs = [(0, len(states) - 1)]
        for _ in range(2):
            j = data.draw(st.integers(1, len(states) - 1))
            i = data.draw(st.integers(0, j - 1))
            pairs.append((i, j))
        for i, j in pairs:
            s_i, st_i = states[i]
            s_j, st_j = states[j]
            want_ins = Counter(st_j) - Counter(st_i)
            want_del = Counter(st_i) - Counter(st_j)
            got = t.read_changes(s_i, s_j).collect()
            got_ins = Counter(
                row_tuple(r) for r in got
                if r._change_type in ("insert", "update_postimage")
            )
            got_del = Counter(
                row_tuple(r) for r in got
                if r._change_type in ("delete", "update_preimage")
            )
            assert got_ins == want_ins, (i, j, s_i, s_j)
            assert got_del == want_del, (i, j, s_i, s_j)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_noop_maintenance_and_beginning_sentinel(lake, spark):
    """Round-8 hypothesis counterexample, pinned deterministically:
    ``fold_deletes()`` / ``compact()`` on a never-committed table are pure
    no-ops (no snapshot minted), and the ``BEGINNING`` sentinel makes the
    pre-first-snapshot EMPTY state addressable on either
    ``read_changes`` bound — ``None`` keeps its Delta-compatible
    overloads (since-creation / current)."""
    from apache_iceberg_lakehouse_workshop_spark.plans.lakeshim import BEGINNING

    t = lake.create_table("c.noop", "id BIGINT, v STRING")
    assert t.fold_deletes() is None
    assert t.compact(n_files=2) is None
    assert t._load_meta()["current_snapshot_id"] is None
    assert t.read_changes(None, None).count() == 0

    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, v STRING")
    )
    sid = t._load_meta()["current_snapshot_id"]
    # fold-on-empty -> append -> range reads: the append is the only diff
    want = [(1, "insert"), (2, "insert")]
    for frm in (BEGINNING, None):
        got = sorted(
            (r.id, r._change_type) for r in t.read_changes(frm, sid).collect()
        )
        assert got == want
    # the empty starting state as a *to* bound: net deletes
    dels = sorted(
        (r.id, r._change_type)
        for r in t.read_changes(sid, BEGINNING).collect()
    )
    assert dels == [(1, "delete"), (2, "delete")]
    # empty -> empty: the empty diff (None-as-to would have meant CURRENT)
    assert t.read_changes(BEGINNING, BEGINNING).count() == 0


def test_snapshot_id_at_ignores_branch_commits(lake, spark):
    """Timestamp resolution walks MAIN's lineage: a branch commit made
    between two main commits is never 'the state at that instant'."""
    import time as _time

    t = lake.create_table("c.br", "id BIGINT")
    t.append(spark.createDataFrame([(1,)], "id BIGINT"))
    s1 = t._load_meta()["current_snapshot_id"]
    _time.sleep(0.05)
    t.create_branch("wip")
    t.append_to_branch("wip", spark.createDataFrame([(99,)], "id BIGINT"))
    b_ts = max(r.committed_at_ms for r in t.snapshots().collect())
    # at the branch commit's instant, MAIN is still at s1
    assert t.snapshot_id_at(b_ts) == s1
    _time.sleep(0.05)
    t.append(spark.createDataFrame([(2,)], "id BIGINT"))
    s2 = t._load_meta()["current_snapshot_id"]
    s2_ts = {r.snapshot_id: r.committed_at_ms for r in t.snapshots().collect()}[s2]
    assert t.snapshot_id_at(s2_ts) == s2


def test_apply_changes_into_statement(lake, spark):
    """APPLY CHANGES INTO t FROM TABLE(table_changes(...)) KEYS (k) — the
    statement spelling of apply_changes (round-9 task #5): replaying each
    source range through the SQL surface reproduces the source, deletes
    included."""
    a = lake.create_table("c.src", "k BIGINT, v STRING")
    a.set_properties({"changelog.key-columns": "k"})
    lake.create_table("c.rep", "k BIGINT, v STRING")
    a.append(spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, v STRING"))
    a.upsert_equality(
        spark.createDataFrame([(2, "B2"), (3, "c")], "k BIGINT, v STRING"), "k"
    )
    a.delete_by_key(spark.createDataFrame([(1,)], "k BIGINT"))
    sids = [None] + sorted(r.snapshot_id for r in a.snapshots().collect())
    for i in range(len(sids) - 1):
        frm = "NULL" if sids[i] is None else str(sids[i])
        lake.run_script(
            f"APPLY CHANGES INTO c.rep "
            f"FROM TABLE(table_changes('c.src', {frm}, {sids[i + 1]})) "
            f"KEYS (k);"
        )
        got = sorted((r.k, r.v) for r in lake.table("c.rep").read().collect())
        want = sorted(
            (r.k, r.v) for r in a.read(snapshot_id=sids[i + 1]).collect()
        )
        assert got == want, f"divergence after range {i}"
    # malformed: no keys / not a changelog query -> dialect contract error
    import pytest as _pytest

    from apache_iceberg_lakehouse_workshop_spark.plans.script import UnsupportedStatementError

    with _pytest.raises(UnsupportedStatementError):
        lake.run_script("APPLY CHANGES INTO c.rep FROM c.src KEYS (k);")


def test_sync_from_incremental_replication(lake, spark):
    """sync_from: the composed read_changes -> apply_changes step with a
    persisted watermark — each call applies only the new ranges; a no-op
    when the source hasn't moved."""
    a = lake.create_table("c.src", "k BIGINT, v STRING")
    a.set_properties({"changelog.key-columns": "k"})
    b = lake.create_table("c.dst", "k BIGINT, v STRING")
    a.append(spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, v STRING"))
    out = b.sync_from(a)
    assert out["mode"] == "applied" and out["n_changes"] == 2
    assert b.sync_from(a)["mode"] == "noop"
    a.upsert_equality(
        spark.createDataFrame([(1, "A2"), (3, "c")], "k BIGINT, v STRING"), "k"
    )
    a.delete_by_key(spark.createDataFrame([(2,)], "k BIGINT"))
    out = b.sync_from(a)
    assert out["mode"] == "applied"
    assert sorted((r.k, r.v) for r in b.read().collect()) == sorted(
        (r.k, r.v) for r in a.read().collect()
    )


def test_stream_apply_changes_roundtrip_with_deletes(lake, spark, tmp_path):
    """Round-9 task #5 drained-stream roundtrip: source DML history
    (upserts AND deletes) -> read_changes per range -> STREAMED apply into
    a replica (file-source micro-batches through the real foreachBatch
    sink, one range per file, restarts between drops) -> replica equals
    the source at every snapshot; a replayed run applies nothing twice."""
    import json as _json

    from apache_iceberg_lakehouse_workshop_spark.streaming.pipeline import (
        stream_apply_changes,
    )

    a = lake.create_table("c.src", "k BIGINT, v STRING")
    a.set_properties({"changelog.key-columns": "k"})
    b = lake.create_table("c.dst", "k BIGINT, v STRING")
    a.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k BIGINT, v STRING"))
    a.upsert_equality(
        spark.createDataFrame([(2, "B2"), (4, "d")], "k BIGINT, v STRING"), "k"
    )
    a.delete_by_key(spark.createDataFrame([(1,), (4,)], "k BIGINT"))
    a.upsert_equality(spark.createDataFrame([(1, "A4")], "k BIGINT, v STRING"), "k")

    feed = tmp_path / "cdc_feed"
    feed.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "k LONG, v STRING, _change_type STRING"
    sids = [None] + sorted(r.snapshot_id for r in a.snapshots().collect())
    for i in range(len(sids) - 1):
        rows = [r.asDict() for r in a.read_changes(sids[i], sids[i + 1]).collect()]
        (feed / f"range_{i:03d}.json").write_text(
            "\n".join(_json.dumps(r) for r in rows)
        )
        stream = spark.readStream.schema(schema).json(str(feed))
        q = stream_apply_changes(stream, b, ["k"], ckpt)
        q.awaitTermination(120)
        got = sorted((r.k, r.v) for r in b.read().collect())
        want = sorted(
            (r.k, r.v) for r in a.read(snapshot_id=sids[i + 1]).collect()
        )
        assert got == want, f"divergence after streamed range {i}"
    # replay the whole feed against the same checkpoint: nothing reapplies
    n_snaps = len(b.snapshots().collect())
    stream = spark.readStream.schema(schema).json(str(feed))
    q = stream_apply_changes(stream, b, ["k"], ckpt)
    q.awaitTermination(120)
    assert len(b.snapshots().collect()) == n_snaps


def test_apply_changes_replicates_table_including_deletes(lake, spark):
    """CDC replication end-to-end WITH deletes: replaying read_changes
    range-by-range through apply_changes reproduces the source at every
    step (the roundtrip the insert-only streaming test cannot cover)."""
    a = lake.create_table("c.src", "k BIGINT, v STRING")
    a.set_properties({"changelog.key-columns": "k"})
    b = lake.create_table("c.dst", "k BIGINT, v STRING")
    a.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k BIGINT, v STRING"))
    a.upsert_equality(spark.createDataFrame([(2, "B2"), (4, "d")], "k BIGINT, v STRING"), "k")
    a.delete_by_key(spark.createDataFrame([(1,), (4,)], "k BIGINT"))
    a.upsert_equality(spark.createDataFrame([(1, "A4")], "k BIGINT, v STRING"), "k")

    sids = [None] + sorted(r.snapshot_id for r in a.snapshots().collect())
    for i in range(len(sids) - 1):
        b.apply_changes(a.read_changes(sids[i], sids[i + 1]), ["k"])
        assert sorted((r.k, r.v) for r in b.read().collect()) == sorted(
            (r.k, r.v) for r in a.read(snapshot_id=sids[i + 1]).collect()
        ), f"divergence after range {i}"
    # one-shot catch-up from empty also works
    c = lake.create_table("c.dst2", "k BIGINT, v STRING")
    c.apply_changes(a.read_changes(None), ["k"])
    assert sorted((r.k, r.v) for r in c.read().collect()) == sorted(
        (r.k, r.v) for r in a.read().collect()
    )
