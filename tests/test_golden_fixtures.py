"""Golden dirty-data cleansing tests — the reference's test strategy
(SURVEY §5 idiom 1): raw layers ship deliberate defects with annotated
expected downstream behavior; silver cleansing must hit exact hand-counted
results.

Fixture mirrors the defect inventory of semantics.sql:59-79 /
semantic_example.sql:21-90 / clinicdata.sql:56-118 (re-authored, not
copied): duplicate rows, NULL amounts, mixed timestamp formats (Dremio
format codes + epoch seconds), invalid enums, orphan FKs.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_iceberg_lakehouse_workshop_spark.dialect import translate


@pytest.fixture(scope="module")
def raw_events(spark):
    # 20 rows; annotated defects:
    #  - rows 1 & 2 and 11 & 12 are duplicate (event_id, user, kind, amount) pairs -> silver keeps 18
    #  - rows 5 & 15 have NULL amount -> revenue treats as 0, audit counts 2
    #  - ts formats: slash (r1-8), ISO (r9-14), epoch-seconds string (r15-18),
    #    garbage (r19, r20) -> parsed 18, null-ts audit 2
    #  - row 7 kind 'REFUND ' (trailing space), row 8 'refund' (case) -> TRIM/UPPER standardize
    #  - rows 19, 20 kind '???' invalid enum -> dropped by enum filter
    #  - rows 17, 18 user 99 has no dimension row -> orphan audit = 2
    rows = [
        (1, 1, "PURCHASE", 10.0, "2025/08/18 10:00:00"),
        (1, 1, "PURCHASE", 10.0, "2025/08/18 10:00:00"),      # dup of 1
        (3, 1, "PURCHASE", 20.0, "2025/08/18 11:00:00"),
        (4, 2, "PURCHASE", 30.0, "2025/08/18 12:00:00"),
        (5, 2, "PURCHASE", None, "2025/08/18 13:00:00"),      # NULL amount
        (6, 2, "REFUND", -5.0, "2025/08/18 14:00:00"),
        (7, 3, "REFUND ", -7.5, "2025/08/19 09:00:00"),       # trailing space
        (8, 3, "refund", -2.5, "2025/08/19 10:00:00"),        # lower case
        (9, 3, "PURCHASE", 40.0, "2025-08-19 11:00:00"),      # ISO format
        (10, 4, "PURCHASE", 50.0, "2025-08-19 12:00:00"),
        (11, 4, "PURCHASE", 60.0, "2025-08-19 13:00:00"),
        (11, 4, "PURCHASE", 60.0, "2025-08-19 13:00:00"),     # dup of 11
        (13, 5, "PURCHASE", 70.0, "2025-08-20 09:00:00"),
        (14, 5, "REFUND", -10.0, "2025-08-20 10:00:00"),
        (15, 5, "PURCHASE", None, "1755680400"),              # NULL amount, epoch ts
        (16, 6, "PURCHASE", 80.0, "1755684000"),
        (17, 99, "PURCHASE", 90.0, "1755687600"),             # orphan user
        (18, 99, "PURCHASE", 15.0, "1755691200"),             # orphan user
        (19, 6, "???", 1.0, "not-a-date"),                    # bad enum + bad ts
        (20, 6, "???", 2.0, ""),                              # bad enum + bad ts
    ]
    df = spark.createDataFrame(
        rows, "event_id INT, user_id INT, kind STRING, amount DOUBLE, raw_ts STRING"
    )
    df.createOrReplaceTempView("g_raw_events")
    spark.createDataFrame(
        [(u, f"user{u}") for u in range(1, 7)], "user_id INT, name STRING"
    ).createOrReplaceTempView("g_users")
    return df


def _silver(spark):
    """Silver cleansing exactly as the reference's silver layer does it:
    W1 window dedup, TRIM/UPPER standardization, lenient multi-format
    timestamp parsing (TO_TIMESTAMP(s,fmt,1) -> try_to_timestamp via the
    dialect layer + epoch fallback), COALESCE amounts."""
    dedup = Window.partitionBy("event_id", "user_id").orderBy("raw_ts")
    parse_slash = translate("TO_TIMESTAMP(raw_ts, 'YYYY/MM/DD HH24:MI:SS', 1)")
    parse_iso = translate("TO_TIMESTAMP(raw_ts, 'YYYY-MM-DD HH24:MI:SS', 1)")
    return (
        spark.table("g_raw_events")
        .withColumn("rn", F.row_number().over(dedup))
        .filter("rn = 1")
        .drop("rn")
        .withColumn("kind_std", F.upper(F.trim("kind")))
        .withColumn(
            "ts",
            F.coalesce(
                F.expr(parse_slash),
                F.expr(parse_iso),
                F.try_to_timestamp(F.from_unixtime(F.col("raw_ts").cast("bigint"))),
            ),
        )
        .withColumn("amount_clean", F.coalesce("amount", F.lit(0.0)))
    )


def test_dedup_20_raw_to_18_silver(spark, raw_events):
    assert spark.table("g_raw_events").count() == 20
    assert _silver(spark).count() == 18  # semantics.sql: 20 raw -> 18 after dedup


def test_mixed_timestamp_parsing(spark, raw_events):
    s = _silver(spark)
    assert s.filter("ts IS NULL").count() == 2  # rows 19, 20 only
    assert s.filter("ts IS NOT NULL").count() == 16
    # epoch rows parse to real instants
    r16 = s.filter("event_id = 16").first()
    assert str(r16.ts).startswith("2025-08-20")


def test_enum_standardization_and_filter(spark, raw_events):
    s = _silver(spark)
    # 'REFUND ', 'refund', 'REFUND' all standardize
    assert s.filter("kind_std = 'REFUND'").count() == 4
    valid = s.filter(F.col("kind_std").isin("PURCHASE", "REFUND"))
    assert valid.count() == 16  # the two '???' rows drop (clinicdata.sql:69-73 idiom)


def test_null_amount_handling(spark, raw_events):
    s = _silver(spark)
    assert s.filter("amount IS NULL").count() == 2  # rows 5 & 15
    revenue = (
        s.filter(F.col("kind_std").isin("PURCHASE", "REFUND"))
        .agg(F.round(F.sum("amount_clean"), 2).alias("rev"))
        .first()
        .rev
    )
    # hand-computed: 10+20+30+0-5-7.5-2.5+40+50+60+70-10+0+80+90+15
    assert revenue == 440.0


def test_orphan_fk_audit(spark, raw_events):
    s = _silver(spark).filter(F.col("kind_std").isin("PURCHASE", "REFUND"))
    orphans = s.join(spark.table("g_users"), "user_id", "left_anti")
    assert orphans.count() == 2
    assert {r.user_id for r in orphans.collect()} == {99}
