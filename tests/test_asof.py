"""operators/asof.py — as-of join semantics (SURVEY §2.3 J13 extension).

Registry query j13_asof_join pins the backward direction against DuckDB's
native ASOF JOIN at sf0.01; these tests pin the corners the oracle data
can't reach deterministically: equality inclusion, no-match NULLs,
forward direction, tolerance, and equivalence with a naive
join+row_number reference implementation on real event data.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_iceberg_lakehouse_workshop_spark.operators.asof import asof_join
from apache_iceberg_lakehouse_workshop_spark.tables import load_table


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _micro(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "l-a"),   # exact-tie with right r-10
            (1, _ts("2024-01-01T12:00:00"), "l-b"),   # between r-10 and r-11
            (1, _ts("2024-01-01T09:00:00"), "l-c"),   # before every right row
            (2, _ts("2024-01-01T10:00:00"), "l-d"),   # key with no right rows
        ],
        ["k", "lts", "ltag"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "r-10"),
            (1, _ts("2024-01-01T11:00:00"), "r-11"),
            (1, _ts("2024-01-01T13:00:00"), "r-13"),
        ],
        ["k", "rts", "rtag"],
    )
    return left, right


def test_backward_equality_nomatch_and_nulls(spark):
    left, right = _micro(spark)
    out = {
        r["ltag"]: r
        for r in asof_join(left, right, ["k"], "lts", "rts").collect()
    }
    assert len(out) == 4                       # left join: every left row survives
    assert out["l-a"]["rtag"] == "r-10"        # ties at equality are included
    assert out["l-b"]["rtag"] == "r-11"        # most recent prior, not just any
    assert out["l-c"]["rtag"] is None          # nothing at-or-before -> NULLs
    assert out["l-d"]["rtag"] is None          # key absent on right -> NULLs
    assert out["l-c"]["rts"] is None


def test_forward_direction(spark):
    left, right = _micro(spark)
    out = {
        r["ltag"]: r
        for r in asof_join(
            left, right, ["k"], "lts", "rts", direction="forward"
        ).collect()
    }
    assert out["l-a"]["rtag"] == "r-10"        # equality counts forward too
    assert out["l-b"]["rtag"] == "r-13"        # earliest at-or-after
    assert out["l-c"]["rtag"] == "r-10"
    assert out["l-d"]["rtag"] is None


def test_tolerance_nulls_far_matches(spark):
    left, right = _micro(spark)
    out = {
        r["ltag"]: r
        for r in asof_join(
            left, right, ["k"], "lts", "rts",
            tolerance=F.expr("INTERVAL 90 MINUTES"),
        ).collect()
    }
    assert out["l-a"]["rtag"] == "r-10"        # distance 0 <= 90min
    assert out["l-b"]["rtag"] == "r-11"        # 60min <= 90min
    assert len(out) == 4                       # rows survive even when nulled


def test_matches_naive_reference_on_events(spark, sf_dir):
    """Forward as-of vs the naive join+row_number plan on sf0.001 events.

    (Backward is already pinned by the DuckDB native-ASOF oracle at
    sf0.01; this pins the mirror direction on real data with a completely
    different candidate-explosion reference plan.)"""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(e.event_type == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    errors = e.filter(e.event_type == "error").select(
        "user_id", F.col("ts").alias("ets"), F.col("event_id").alias("eid")
    )

    ours = asof_join(
        purchases, errors, ["user_id"], "pts", "ets", direction="forward"
    ).select("pid", "ets", "eid")

    w = Window.partitionBy("pid").orderBy(F.asc("ets"), F.asc("eid"))
    naive = (
        purchases.join(errors, "user_id", "left")
        .filter(F.col("ets").isNull() | (F.col("ets") >= F.col("pts")))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("pid", "ets", "eid")
    )
    got = {r["pid"]: (r["ets"], r["eid"]) for r in ours.collect()}
    want = {r["pid"]: (r["ets"], r["eid"]) for r in naive.collect()}
    # the naive plan drops purchases whose only error rows are all earlier
    # (filter removes every candidate) -- re-add them as NULL matches
    for r in purchases.collect():
        want.setdefault(r["pid"], (None, None))
    assert got == want


def test_null_timestamps_never_match(spark):
    """NULL left ts -> row survives unmatched; NULL right ts -> ignored.

    Regression: forward direction orders desc (nulls last), so a NULL-ts
    left row used to 'match' the key's earliest right row; and backward
    asc (nulls first) let a NULL-ts right row become a phantom match."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "l-real"), (1, None, "l-null")],
        "k int, lts timestamp, ltag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "r-10"), (1, None, "r-null")],
        "k int, rts timestamp, rtag string",
    )
    for direction in ("backward", "forward"):
        out = {
            r["ltag"]: r
            for r in asof_join(
                left, right, ["k"], "lts", "rts", direction=direction
            ).collect()
        }
        assert len(out) == 2
        assert out["l-null"]["rtag"] is None, direction
        assert out["l-null"]["rts"] is None, direction
        expected = "r-10"  # the only positioned right row, both directions...
        got = out["l-real"]["rtag"]
        if direction == "backward":
            assert got == expected, direction
        else:
            assert got is None, direction  # nothing at-or-after 12:00


def test_hot_key_split_equals_plain(spark):
    """split_bucket_seconds: exact output equality with the unsplit plan on
    a 90%-hot-key input, both directions, with and without tolerance, and
    with a key that has right rows only in early buckets (carry-only
    matches) — the skew hardening the module docstring promises."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01")
    n_l, n_r = 400, 600
    # 90% of rows on key 0, the rest spread over keys 1..9
    lk = np.where(rng.random(n_l) < 0.9, 0, rng.integers(1, 10, n_l))
    rk = np.where(rng.random(n_r) < 0.9, 0, rng.integers(1, 10, n_r))
    lpd = pd.DataFrame(
        {
            "k": lk,
            "lts": base + pd.to_timedelta(rng.choice(40 * 86400, n_l, replace=False), unit="s"),
            "lv": np.arange(n_l),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rk,
            # right rows only in the first 20 days: late-bucket left rows
            # on every key must be served purely by the carry
            "rts": base + pd.to_timedelta(rng.choice(20 * 86400, n_r, replace=False), unit="s"),
            "rv": np.arange(n_r) * 10,
        }
    )
    left, right = spark.createDataFrame(lpd), spark.createDataFrame(rpd)

    for direction in ("backward", "forward"):
        for tol in (None, F.expr("INTERVAL 36 HOURS")):
            plain = asof_join(
                left, right, ["k"], "lts", "rts", direction=direction, tolerance=tol
            )
            split = asof_join(
                left, right, ["k"], "lts", "rts", direction=direction,
                tolerance=tol, split_bucket_seconds=86400.0,
            )
            key = ["k", "lts", "lv"]
            want = plain.toPandas().sort_values(key, kind="stable").reset_index(drop=True)
            got = (
                split.toPandas().sort_values(key, kind="stable").reset_index(drop=True)
            )[want.columns]
            pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # the split plan really windows on (key, bucket): the hot key spans
    # many daily buckets, so its sort no longer runs in one task
    split = asof_join(left, right, ["k"], "lts", "rts", split_bucket_seconds=86400.0)
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan
    hot_buckets = (
        left.filter("k = 0")
        .select(F.floor(F.col("lts").cast("double") / 86400.0).alias("b"))
        .distinct()
        .count()
    )
    assert hot_buckets > 10


def test_split_rejects_nonpositive_bucket(spark):
    left, right = _micro(spark)
    for bad in (0, -1.5):
        try:
            asof_join(left, right, ["k"], "lts", "rts", split_bucket_seconds=bad)
        except ValueError as e:
            assert "split_bucket_seconds" in str(e)
        else:
            raise AssertionError("expected ValueError on nonpositive bucket")


def test_split_null_timestamps_never_match(spark):
    """The NULL-ts guards hold on the split path too (null bucket rows get
    no carry and the final guard nulls any phantom)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-05T12:00:00"), "l-real"), (1, None, "l-null")],
        "k int, lts timestamp, ltag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "r-early"), (1, None, "r-null")],
        "k int, rts timestamp, rtag string",
    )
    for direction in ("backward", "forward"):
        out = {
            r["ltag"]: r
            for r in asof_join(
                left, right, ["k"], "lts", "rts",
                direction=direction, split_bucket_seconds=86400.0,
            ).collect()
        }
        assert len(out) == 2
        assert out["l-null"]["rtag"] is None, direction
        # l-real is 4 buckets after r-early: backward must carry it in,
        # forward has nothing at-or-after
        if direction == "backward":
            assert out["l-real"]["rtag"] == "r-early", direction
        else:
            assert out["l-real"]["rtag"] is None, direction


def test_right_payload_collision_raises(spark):
    left, right = _micro(spark)
    try:
        asof_join(left, right.withColumnRenamed("rtag", "ltag"), ["k"], "lts", "rts")
    except ValueError as e:
        assert "collide" in str(e)
    else:
        raise AssertionError("expected ValueError on colliding payload column")


def test_matches_pandas_merge_asof_random(spark):
    """Random-data equivalence with pandas merge_asof — an independent,
    widely-deployed as-of implementation — on 3 seeds x both directions
    x (no tolerance | 1h tolerance). Right (key, ts) pairs are unique so
    every implementation's tie-break agrees."""
    import numpy as np
    import pandas as pd

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        base = pd.Timestamp("2024-01-01")
        n_keys = 8

        def frame(n, prefix):
            ks = rng.integers(0, n_keys, n)
            # unique (key, ts): distinct second offsets per key
            offs = []
            for k in range(n_keys):
                idx = np.where(ks == k)[0]
                offs.append(
                    (k, idx, rng.choice(200_000, size=len(idx), replace=False))
                )
            ts = np.empty(n, dtype="int64")
            for _, idx, o in offs:
                ts[idx] = o
            return pd.DataFrame(
                {
                    "k": ks,
                    f"{prefix}ts": base + pd.to_timedelta(ts, unit="s"),
                    f"{prefix}v": rng.normal(size=n).round(6),
                }
            )

        lpd = frame(120, "l")
        rpd = frame(180, "r")
        for direction in ("backward", "forward"):
            for tol_expr, tol_pd in ((None, None), ("INTERVAL 1 HOUR", pd.Timedelta(hours=1))):
                want = pd.merge_asof(
                    lpd.sort_values("lts", kind="stable"),
                    rpd.sort_values("rts", kind="stable"),
                    left_on="lts",
                    right_on="rts",
                    by="k",
                    direction=direction,
                    tolerance=tol_pd,
                    allow_exact_matches=True,
                )
                got = asof_join(
                    spark.createDataFrame(lpd),
                    spark.createDataFrame(rpd),
                    ["k"],
                    "lts",
                    "rts",
                    direction=direction,
                    tolerance=F.expr(tol_expr) if tol_expr else None,
                ).toPandas()
                key = ["k", "lts", "lv"]
                want = want.sort_values(key, kind="stable").reset_index(drop=True)
                got = got.sort_values(key, kind="stable").reset_index(drop=True)[want.columns]
                pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------------ SQL dialect surface


def _asof_runner(spark, tmp_path):
    from apache_iceberg_lakehouse_workshop_spark.plans import Lakehouse
    from apache_iceberg_lakehouse_workshop_spark.plans.script import ScriptRunner

    lake = Lakehouse(spark, str(tmp_path / "wh"))
    r = ScriptRunner(lake)
    r.run(
        """
        CREATE FOLDER IF NOT EXISTS db;
        CREATE TABLE db.trades (sym VARCHAR, ts TIMESTAMP, px DOUBLE);
        INSERT INTO db.trades VALUES
          ('A', TIMESTAMP '2025-01-01 10:00:05', 101.0),
          ('A', TIMESTAMP '2025-01-01 10:00:20', 102.0),
          ('B', TIMESTAMP '2025-01-01 10:00:07', 55.0),
          ('C', TIMESTAMP '2025-01-01 10:00:01', 9.0);
        CREATE TABLE db.quotes (sym VARCHAR, ts TIMESTAMP, bid DOUBLE);
        INSERT INTO db.quotes VALUES
          ('A', TIMESTAMP '2025-01-01 10:00:00', 100.5),
          ('A', TIMESTAMP '2025-01-01 10:00:10', 101.5),
          ('B', TIMESTAMP '2025-01-01 10:00:06', 54.5);
        """
    )
    return lake, r


def test_asof_join_sql_matches_api(spark, tmp_path):
    """DuckDB-style ASOF JOIN SQL == the asof_join API result; plain form
    is INNER (unmatched left dropped), LEFT keeps with NULLs."""
    lake, r = _asof_runner(spark, tmp_path)
    out = r.run(
        "SELECT t.sym, t.ts, t.px, q.bid FROM db.trades t "
        "ASOF JOIN db.quotes q ON t.sym = q.sym AND t.ts >= q.ts"
    )
    got = sorted((x.sym, str(x.ts), x.px, x.bid) for x in out.collect())

    api = asof_join(
        lake.table("db.trades").read(),
        lake.table("db.quotes").read().withColumnRenamed("ts", "q_ts"),
        ["sym"],
        "ts",
        "q_ts",
    ).filter("q_ts IS NOT NULL")
    want = sorted((x.sym, str(x.ts), x.px, x.bid) for x in api.collect())
    assert got == want
    assert [g[0] for g in got] == ["A", "A", "B"]   # C has no quote: dropped
    assert got[0][3] == 100.5 and got[1][3] == 101.5 and got[2][3] == 54.5

    left = r.run(
        "SELECT t.sym, t.px, q.bid FROM db.trades t "
        "ASOF LEFT JOIN db.quotes q ON t.sym = q.sym AND t.ts >= q.ts"
    )
    lgot = {(x.sym, x.px): x.bid for x in left.collect()}
    assert lgot[("C", 9.0)] is None and len(lgot) == 4


def test_asof_join_sql_forward_where_and_errors(spark, tmp_path):
    import pytest as _pytest

    from apache_iceberg_lakehouse_workshop_spark.plans.script import (
        UnsupportedStatementError,
    )

    _lake, r = _asof_runner(spark, tmp_path)
    # forward direction: first quote AT/after the trade
    fwd = r.run(
        "SELECT t.sym, t.px, q.bid FROM db.trades t "
        "ASOF JOIN db.quotes q ON t.sym = q.sym AND t.ts <= q.ts "
        "WHERE t.px > 50"
    )
    got = {(x.sym, x.px): x.bid for x in fwd.collect()}
    # only A@10:00:05 has a quote at/after it (10:00:10); B's quote is
    # earlier, A@10:00:20 has none -> inner semantics drop both
    assert got == {("A", 101.0): 101.5}

    with _pytest.raises(UnsupportedStatementError, match="inequality"):
        r.run(
            "SELECT t.sym FROM db.trades t ASOF JOIN db.quotes q ON t.sym = q.sym"
        )
    with _pytest.raises(UnsupportedStatementError, match="exactly one"):
        r.run(
            "SELECT t.sym FROM db.trades t ASOF JOIN db.quotes q "
            "ON t.ts >= q.ts AND t.px <= q.bid"
        )


def test_asof_join_sql_tolerance(spark, tmp_path):
    """Round-6 task #6: the SQL surface exposes the operator's tolerance
    via a difference-bound conjunct (l.ts - r.ts <= INTERVAL '5' SECOND);
    matches farther than the bound are nulled (LEFT) or dropped (inner),
    exactly like the API form."""
    import pytest as _pytest

    from apache_iceberg_lakehouse_workshop_spark.plans.script import (
        UnsupportedStatementError,
    )

    lake, r = _asof_runner(spark, tmp_path)
    out = r.run(
        "SELECT t.sym, t.px, q.bid FROM db.trades t "
        "ASOF LEFT JOIN db.quotes q ON t.sym = q.sym AND t.ts >= q.ts "
        "AND t.ts - q.ts <= INTERVAL '5' SECOND"
    )
    got = {(x.sym, x.px): x.bid for x in out.collect()}
    api = asof_join(
        lake.table("db.trades").read(),
        lake.table("db.quotes").read().withColumnRenamed("ts", "q_ts"),
        ["sym"],
        "ts",
        "q_ts",
        tolerance=F.expr("INTERVAL '5' SECOND"),
    )
    want = {(x.sym, x.px): x.bid for x in api.collect()}
    assert got == want
    # A@10:00:05 matches 10:00:00 (5s, at bound); A@10:00:20's nearest is
    # 10:00:10 (10s, beyond) -> NULL; B@10:00:07 matches 10:00:06 (1s)
    assert got == {("A", 101.0): 100.5, ("A", 102.0): None,
                   ("B", 55.0): 54.5, ("C", 9.0): None}

    # inner form drops the out-of-tolerance rows entirely
    inner = r.run(
        "SELECT t.sym, t.px, q.bid FROM db.trades t "
        "ASOF JOIN db.quotes q ON t.sym = q.sym AND t.ts >= q.ts "
        "AND t.ts - q.ts <= INTERVAL '5' SECOND"
    )
    assert {(x.sym, x.px) for x in inner.collect()} == {("A", 101.0), ("B", 55.0)}

    # forward direction bounds r.ts - l.ts
    fwd = r.run(
        "SELECT t.sym, t.px, q.bid FROM db.trades t "
        "ASOF JOIN db.quotes q ON t.sym = q.sym AND t.ts <= q.ts "
        "AND q.ts - t.ts <= INTERVAL '5' SECOND"
    )
    assert {(x.sym, x.px): x.bid for x in fwd.collect()} == {("A", 101.0): 101.5}

    # wrong-way difference for the direction raises a typed error
    with _pytest.raises(UnsupportedStatementError, match="tolerance"):
        r.run(
            "SELECT t.sym FROM db.trades t "
            "ASOF JOIN db.quotes q ON t.sym = q.sym AND t.ts >= q.ts "
            "AND q.ts - t.ts <= INTERVAL '5' SECOND"
        )


def test_asof_sql_strict_tolerance_rejected(spark, tmp_path):
    """ADVICE r6 (low): the tolerance regex accepted a strict `<`
    conjunct but asof_join applies the bound INCLUSIVELY (dist <=
    tolerance), wrongly matching rows at exactly the bound. Strict `<`
    must raise a typed error instead of being silently widened."""
    import pytest as _pytest

    from apache_iceberg_lakehouse_workshop_spark.plans.script import (
        UnsupportedStatementError,
    )

    _lake, r = _asof_runner(spark, tmp_path)
    with _pytest.raises(UnsupportedStatementError, match="inclusive"):
        r.run(
            "SELECT t.sym, t.px, q.bid FROM db.trades t "
            "ASOF JOIN db.quotes q ON t.sym = q.sym AND t.ts >= q.ts "
            "AND t.ts - q.ts < INTERVAL '5' SECOND"
        )
    # the inclusive form still parses and matches at the bound
    out = r.run(
        "SELECT t.sym, t.px, q.bid FROM db.trades t "
        "ASOF JOIN db.quotes q ON t.sym = q.sym AND t.ts >= q.ts "
        "AND t.ts - q.ts <= INTERVAL '5' SECOND"
    )
    assert ("A", 101.0) in {(x.sym, x.px) for x in out.collect()}
