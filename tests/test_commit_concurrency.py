"""plans/lakeshim commit protocol — optimistic concurrency (SURVEY §3:
"writers produce data files; one atomic metadata commit").

Two invariants, matching Iceberg's isolation model:
- concurrent APPENDS all land (rebase under the commit lock), snapshot
  history stays linear, no lost update;
- a REWRITE op (overwrite/delete/update/merge/compact) whose base snapshot
  moved while it was writing data files ABORTS with CommitConflictError
  instead of silently last-writer-winning.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import Row

from apache_iceberg_lakehouse_workshop_spark.plans import Lakehouse
from apache_iceberg_lakehouse_workshop_spark.plans.lakeshim import CommitConflictError


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "warehouse"))


def _rows(spark, base, n=1):
    return spark.createDataFrame([Row(k=base + i, v=f"v{base + i}") for i in range(n)])


def test_concurrent_appends_all_land_and_stay_linear(lake, spark):
    t = lake.create_table("db.c", "k INT, v STRING")
    t.append(_rows(spark, 0, 2))

    n_writers = 6
    barrier = threading.Barrier(n_writers)
    errors: list[Exception] = []

    def writer(i):
        try:
            df = _rows(spark, 100 * (i + 1), 3)
            barrier.wait()
            t.append(df)
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert errors == []
    assert t.read().count() == 2 + n_writers * 3  # no lost update
    snaps = sorted(
        (r.snapshot_id, r.parent_id) for r in t.snapshots().collect()
    )
    assert [s for s, _ in snaps] == list(range(1, n_writers + 2))
    # linear history: every snapshot's parent is exactly the previous one
    assert all(p == s - 1 for s, p in snaps[1:])


def test_rewrite_aborts_when_base_snapshot_moved(lake, spark):
    """Deterministic interleaving of the race: a slow rewrite writer
    finishes its data files after a concurrent append commits — its
    verify-and-swap must abort, and the append's rows must survive."""
    t = lake.create_table("db.r", "k INT, v STRING")
    t.append(_rows(spark, 0, 3))

    # slow writer: bases its rewrite on snapshot 1, writes its files
    meta = t._load_meta()
    parent = meta["current_snapshot_id"]
    commit = t._write_commit_dir(_rows(spark, 50, 1), meta)

    t.append(_rows(spark, 200, 2))  # concurrent writer lands first

    with pytest.raises(CommitConflictError, match="no longer current"):
        t._commit_rewrite(parent, "overwrite", [commit])

    assert t.read().count() == 5  # both appends intact, nothing lost
    assert {r.operation for r in t.snapshots().collect()} == {"append"}


def test_racing_delete_and_update_one_aborts(lake, spark):
    """Two full public-API rewrites racing from the same base: exactly one
    commits, the other raises CommitConflictError. The data-file phase is
    synchronized via a barrier wrapped around _write_commit_dir_counted
    (the shared write primitive both DML paths route through since the r14
    fused single-pass writes) so both writers provably derive from the
    same base snapshot."""
    t = lake.create_table("db.w", "k INT, v STRING")
    t.append(_rows(spark, 0, 4))

    barrier = threading.Barrier(2)
    orig = t._write_commit_dir_counted

    def slow_write(df, meta):
        out = orig(df, meta)
        barrier.wait(timeout=60)  # neither commits until both have written
        return out

    t._write_commit_dir_counted = slow_write
    results: dict[str, Exception | None] = {}

    def run(name, fn):
        try:
            fn()
            results[name] = None
        except Exception as e:
            results[name] = e

    th1 = threading.Thread(
        target=run, args=("delete", lambda: t.delete_where("k = 0"))
    )
    th2 = threading.Thread(
        target=run, args=("update", lambda: t.update_where({"v": "'x'"}, "k = 1"))
    )
    th1.start(), th2.start()
    th1.join(), th2.join()
    t._write_commit_dir_counted = orig

    outcomes = {n: type(e).__name__ if e else "ok" for n, e in results.items()}
    assert sorted(outcomes.values()) == ["CommitConflictError", "ok"], outcomes
    # the surviving op's effect is fully applied; the aborted one's is absent
    rows = {r.k: r.v for r in t.read().collect()}
    if outcomes["delete"] == "ok":
        assert 0 not in rows and rows[1] == "v1"
    else:
        assert rows[0] == "v0" and rows[1] == "x"


def test_conflict_retry_succeeds_against_new_base(lake, spark):
    """The documented recovery: redo the rewrite against the new current
    snapshot; second attempt commits cleanly."""
    t = lake.create_table("db.rt", "k INT, v STRING")
    t.append(_rows(spark, 0, 3))

    meta = t._load_meta()
    parent = meta["current_snapshot_id"]
    commit = t._write_commit_dir(_rows(spark, 50, 1), meta)
    t.append(_rows(spark, 200, 1))

    with pytest.raises(CommitConflictError):
        t._commit_rewrite(parent, "overwrite", [commit])
    # retry = rerun the op from the fresh snapshot (public API)
    t.overwrite(_rows(spark, 300, 2))
    assert sorted(r.k for r in t.read().collect()) == [300, 301]


def test_stale_lock_is_broken(lake, spark, tmp_path):
    t = lake.create_table("db.sl", "k INT, v STRING")
    import os
    import time

    lock = os.path.join(t.path, "metadata.lock")
    with open(lock, "w"):
        pass
    old = time.time() - 2 * t._LOCK_TIMEOUT_S
    os.utime(lock, (old, old))  # crashed writer long ago
    t.append(_rows(spark, 0, 1))  # steals the stale lock instead of hanging
    assert t.read().count() == 1
    assert not os.path.exists(lock)


def test_concurrent_branch_appends_both_land(spark, tmp_path):
    """Two threads appending to the same branch race on the ref head; the
    commit lock serializes them and both commits land (linear branch
    history, no lost update) — same OCC discipline as main appends."""
    import threading

    from apache_iceberg_lakehouse_workshop_spark.plans import Lakehouse

    lake = Lakehouse(spark, str(tmp_path / "wh"))
    lake.create_namespace("db.c")
    t = lake.create_table("db.c.bc", "x BIGINT")
    t.append(spark.createDataFrame([(0,)], "x BIGINT"))
    t.create_branch("b")

    errors = []

    def add(v):
        try:
            t.append_to_branch("b", spark.createDataFrame([(v,)], "x BIGINT"))
        except Exception as e:  # pragma: no cover - failure mode under test
            errors.append(e)

    threads = [threading.Thread(target=add, args=(v,)) for v in (1, 2, 3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    got = sorted(r.x for r in t.read_branch("b").collect())
    assert got == [0, 1, 2, 3]
    assert t.read().count() == 1          # main untouched
    t.publish_branch("b")
    assert sorted(r.x for r in t.read().collect()) == [0, 1, 2, 3]


def test_two_stealers_cannot_double_unlink(lake, spark):
    """The classic unlink race: two stalled waiters both decide a lock is
    stale; with naive unlink the second could delete the FRESH lock the
    first just acquired. The owner-verified, mutex-serialized steal must
    (a) let exactly one stealer break the stale lock, and (b) never remove
    a lock whose owner uuid changed since the staleness observation."""
    import os
    import time

    t = lake.create_table("db.steal", "k INT")
    lock = os.path.join(t.path, "metadata.lock")

    # stale lock from a "crashed" writer
    with open(lock, "w") as f:
        f.write("dead-owner")
    old = time.time() - 2 * t._LOCK_TIMEOUT_S
    os.utime(lock, (old, old))

    # directed race: stealer B observed the stale lock, but before B's
    # unlink runs, stealer A already broke it and writer C acquired a FRESH
    # lock (different owner, fresh mtime). B's verified steal must leave
    # C's lock alone.
    os.unlink(lock)                       # A's (legitimate) steal
    with open(lock, "w") as f:
        f.write("fresh-owner-c")          # C's brand-new lock
    t._try_steal(lock)                    # B retries: verify fails -> no-op
    assert os.path.exists(lock)
    with open(lock) as f:
        assert f.read() == "fresh-owner-c"
    os.unlink(lock)

    # while a steal mutex is held by another (live) stealer, nobody unlinks
    with open(lock, "w") as f:
        f.write("dead-owner-2")
    os.utime(lock, (old, old))
    with open(lock + ".steal", "w"):
        pass                              # live concurrent stealer's mutex
    t._try_steal(lock)
    assert os.path.exists(lock), "steal must serialize through the mutex"
    os.unlink(lock + ".steal")
    t._try_steal(lock)                    # mutex free: the stale lock breaks
    assert not os.path.exists(lock)

    # end-to-end: many waiters hammering a stale lock -> single ownership
    with open(lock, "w") as f:
        f.write("dead-owner-3")
    os.utime(lock, (old, old))
    holders, peak, errors = [0], [0], []
    import threading

    gate = threading.Lock()

    def grab(i):
        try:
            with t._commit_lock():
                with gate:
                    holders[0] += 1
                    peak[0] = max(peak[0], holders[0])
                time.sleep(0.02)
                with gate:
                    holders[0] -= 1
        except Exception as e:  # pragma: no cover - failure under test
            errors.append(e)

    threads = [threading.Thread(target=grab, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert peak[0] == 1, f"overlapping lock holders: peak={peak[0]}"
    assert not os.path.exists(lock)
