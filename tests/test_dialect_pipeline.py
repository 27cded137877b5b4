"""A full industry-example-shaped script executed as ONE Dremio-dialect SQL
text through dialect.run — proving a reference user can paste their
workshop-style script at the engine and get the same behavior
(manufacturing.sql shape, re-authored: IoT readings + bounds dim via UNION
ALL, quality audits, LEAD-based MTBF; SURVEY §2 J9/W3/Q2/Q3 + dialect).
"""

from apache_iceberg_lakehouse_workshop_spark.dialect import run as dialect_run

SCRIPT = """
CREATE OR REPLACE TEMP VIEW machines AS
SELECT * FROM VALUES
  (1, 'press', '2025/01/01 00:00:00'),
  (2, 'lathe', '2025/02/01 00:00:00'),
  (3, 'mill',  '2025/03/01 00:00:00')
AS m(machine_id, kind, installed_raw);

CREATE OR REPLACE TEMP VIEW readings AS
SELECT * FROM VALUES
  (1, 1, 'temp', 45.0,  '2025/04/01 10:00:00'),
  (2, 1, 'temp', 220.0, '2025/04/01 11:00:00'),
  (3, 1, 'psi',  30.0,  '2025/04/01 12:00:00'),
  (4, 2, 'temp', 55.0,  '2025/04/02 09:00:00'),
  (5, 2, 'psi',  -2.0,  '2025/04/02 10:00:00'),
  (6, 9, 'temp', 60.0,  '2025/04/02 11:00:00'),
  (6, 9, 'temp', 60.0,  '2025/04/02 11:00:00'),
  (7, 3, 'temp', 61.0,  '2024/12/01 08:00:00')
AS r(reading_id, machine_id, metric, "value", raw_ts);

CREATE OR REPLACE TEMP VIEW bounds AS
SELECT 'temp' AS metric, 0.0 AS lo, 200.0 AS hi
UNION ALL
SELECT 'psi', 0.0, 100.0;

CREATE OR REPLACE TEMP VIEW silver_readings AS
SELECT reading_id, machine_id, metric, "value",
       TO_TIMESTAMP(raw_ts, 'YYYY/MM/DD HH24:MI:SS', 1) AS ts
FROM readings;

CREATE OR REPLACE TEMP VIEW q_out_of_range AS
SELECT s.reading_id FROM silver_readings s
JOIN bounds b ON s.metric = b.metric
WHERE s."value" < b.lo OR s."value" > b.hi;

CREATE OR REPLACE TEMP VIEW q_orphans AS
SELECT s.reading_id FROM silver_readings s
LEFT JOIN machines m ON s.machine_id = m.machine_id
WHERE m.machine_id IS NULL;

CREATE OR REPLACE TEMP VIEW q_dups AS
SELECT reading_id FROM silver_readings
GROUP BY reading_id HAVING COUNT(*) > 1;

CREATE OR REPLACE TEMP VIEW q_before_install AS
SELECT s.reading_id FROM silver_readings s
JOIN machines m ON s.machine_id = m.machine_id
WHERE s.ts < TO_TIMESTAMP(m.installed_raw, 'YYYY/MM/DD HH24:MI:SS', 1);

CREATE OR REPLACE TEMP VIEW failures AS
SELECT * FROM VALUES
  (1, '2025/04/01 00:00:00'),
  (1, '2025/04/11 00:00:00'),
  (1, '2025/04/26 00:00:00'),
  (2, '2025/04/05 00:00:00')
AS f(machine_id, fail_raw);

CREATE OR REPLACE TEMP VIEW mtbf AS
SELECT machine_id,
       AVG(DATEDIFF(next_ts, ts)) AS mtbf_days
FROM (
  SELECT machine_id,
         TO_TIMESTAMP(fail_raw, 'YYYY/MM/DD HH24:MI:SS', 1) AS ts,
         LEAD(TO_TIMESTAMP(fail_raw, 'YYYY/MM/DD HH24:MI:SS', 1))
           OVER (PARTITION BY machine_id ORDER BY TO_TIMESTAMP(fail_raw, 'YYYY/MM/DD HH24:MI:SS', 1)) AS next_ts
  FROM failures
)
WHERE next_ts IS NOT NULL
GROUP BY machine_id;

SELECT * FROM mtbf
"""


def test_manufacturing_script_via_dialect(spark):
    result = dialect_run(spark, SCRIPT)
    mtbf = {r.machine_id: r.mtbf_days for r in result.collect()}
    # machine 1: gaps 10d and 15d -> 12.5; machine 2: single failure -> absent
    assert mtbf == {1: 12.5}

    assert {r.reading_id for r in spark.table("q_out_of_range").collect()} == {2, 5}
    assert {r.reading_id for r in spark.table("q_orphans").collect()} == {6}
    assert {r.reading_id for r in spark.table("q_dups").collect()} == {6}
    assert {r.reading_id for r in spark.table("q_before_install").collect()} == {7}
    # lenient timestamp parsing really went through the dialect layer
    assert spark.table("silver_readings").filter("ts IS NULL").count() == 0


def test_qualify_rewrite(spark):
    """Dremio/Snowflake-style QUALIFY -> Spark subquery rewrite: alias
    predicates wrap in WHERE; window predicates inject __qualify__ and
    strip it back out with * EXCEPT; ORDER BY/LIMIT tails survive; string
    literals containing the keyword are untouched."""
    from apache_iceberg_lakehouse_workshop_spark import dialect

    spark.range(10).selectExpr("id", "id % 3 AS g", "id * 2 AS v").createOrReplaceTempView(
        "qualify_t"
    )
    alias_form = spark.sql(dialect.translate(
        "SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn "
        "FROM qualify_t QUALIFY rn = 1"
    ))
    assert {(r.g, r.v) for r in alias_form.collect()} == {(0, 18), (1, 14), (2, 16)}

    window_form = spark.sql(dialect.translate(
        "SELECT g, v FROM qualify_t "
        "QUALIFY row_number() OVER (PARTITION BY g ORDER BY v DESC) = 1"
    ))
    assert set(window_form.columns) == {"g", "v"}   # __qualify__ stripped
    assert {(r.g, r.v) for r in window_form.collect()} == {(0, 18), (1, 14), (2, 16)}

    tailed = spark.sql(dialect.translate(
        "SELECT g, v, rank() OVER (PARTITION BY g ORDER BY v) AS r "
        "FROM qualify_t QUALIFY r = 1 ORDER BY g LIMIT 2"
    ))
    assert [r.g for r in tailed.collect()] == [0, 1]

    cte = spark.sql(dialect.translate(
        "WITH c AS (SELECT g, v FROM qualify_t WHERE v > 2) "
        "SELECT g, v FROM c QUALIFY row_number() OVER (PARTITION BY g ORDER BY v) = 1"
    ))
    assert cte.count() == 3

    untouched = "SELECT 'do not QUALIFY here' AS s FROM qualify_t"
    assert dialect.translate(untouched) == untouched

    # QUALIFY alongside top-level set operators (round-6 task #8): each
    # branch is rewritten independently — executable, value-correct SQL
    two_branch = spark.sql(dialect.translate(
        "SELECT g, v FROM qualify_t QUALIFY row_number() OVER (ORDER BY v DESC) = 1 "
        "UNION ALL SELECT g, v FROM qualify_t "
        "QUALIFY row_number() OVER (ORDER BY v) = 2"
    ))
    assert sorted((r.g, r.v) for r in two_branch.collect()) == [(0, 18), (1, 2)]
    # three branches, mixed operators + qualifiers, QUALIFY-free middle,
    # trailing ORDER BY binding the whole set operation
    three = spark.sql(dialect.translate(
        "SELECT g, v FROM qualify_t QUALIFY row_number() OVER (ORDER BY v DESC) = 1 "
        "UNION DISTINCT SELECT g, v FROM qualify_t WHERE v = 0 "
        "UNION ALL SELECT g, v FROM qualify_t "
        "QUALIFY row_number() OVER (ORDER BY v) = 2 ORDER BY v"
    ))
    assert [(r.g, r.v) for r in three.collect()] == [(0, 0), (1, 2), (0, 18)]
    # set-op keyword inside a string literal must NOT split branches
    lit = spark.sql(dialect.translate(
        "SELECT g, v, 'not a UNION here' AS s FROM qualify_t "
        "QUALIFY row_number() OVER (ORDER BY v DESC) = 1"
    ))
    assert [(r.g, r.v) for r in lit.collect()] == [(0, 18)]
    # parenthesized branches: QUALIFY sits at depth > 0, but Spark has no
    # QUALIFY at all — each branch is rewritten inside its parens and the
    # whole statement EXECUTES (it used to pass through and fail analysis)
    branched = (
        "(SELECT g, v FROM qualify_t "
        "QUALIFY row_number() OVER (ORDER BY v DESC) = 1) "
        "UNION ALL "
        "(SELECT g, v FROM qualify_t QUALIFY row_number() OVER (ORDER BY v) = 1)"
    )
    pb = spark.sql(dialect.translate(branched))
    assert sorted((r.g, r.v) for r in pb.collect()) == [(0, 0), (0, 18)]
    # QUALIFY in a genuine subquery (FROM (...)) is still out of scope and
    # passes through untouched
    sub = "SELECT * FROM (SELECT g FROM qualify_t QUALIFY x = 1) q"
    assert dialect.translate(sub) == sub
