"""End-to-end medallion pipeline — the SURVEY §7 'minimum slice': the
finance-P&L shape (raw partitioned tables → insert → silver expression-key
join view → gold CASE-summed rollup), run through the pipeline runner with
dialect-translated Dremio-style SQL, hand-checkable row by row.

Mirrors /root/reference/industry-examples/finance_example.sql semantics
(tables/inserts/views re-authored, not copied): trades join daily prices on
symbol + TO_DATE(trade_ts) = price_date; P&L = SUM(CASE side BUY/SELL).
Plus the manufacturing-style quality gates (empty-result invariants,
manufacturing.sql:345-364).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_iceberg_lakehouse_workshop_spark.plans import Lakehouse, MedallionPipeline


def _trades(spark):
    rows = [
        # trade_id, account, symbol, side, qty, exec_price, trade_ts
        (1, "A1", "AAA", "BUY", 10, 5.00, "2025-08-18 10:00:00"),
        (2, "A1", "AAA", "SELL", 4, 6.00, "2025-08-18 14:00:00"),
        (3, "A1", "BBB", "BUY", 2, 50.00, "2025-08-18 11:00:00"),
        (4, "A2", "AAA", "BUY", 1, 5.50, "2025-08-19 09:30:00"),
        (5, "A2", "BBB", "SELL", 3, 52.00, "2025-08-19 15:00:00"),
    ]
    return (
        spark.createDataFrame(rows, "trade_id INT, account_id STRING, symbol STRING, "
                                    "side STRING, qty INT, exec_price DOUBLE, trade_ts STRING")
        .withColumn("trade_ts", F.col("trade_ts").cast("timestamp"))
    )


def _prices(spark):
    rows = [
        ("AAA", "2025-08-18", 5.50),
        ("BBB", "2025-08-18", 51.00),
        ("AAA", "2025-08-19", 5.60),
        ("BBB", "2025-08-19", 51.50),
    ]
    return (
        spark.createDataFrame(rows, "symbol STRING, price_date STRING, close_price DOUBLE")
        .withColumn("price_date", F.col("price_date").cast("date"))
    )


def test_finance_pnl_pipeline(spark, tmp_path):
    lake = Lakehouse(spark, str(tmp_path / "wh"))
    pipe = (
        MedallionPipeline(spark, lake)
        .table("finance.raw.trades", lambda: _trades(spark), partition_by=["days(trade_ts)"])
        .table("finance.raw.daily_prices", lambda: _prices(spark), partition_by=["price_date"])
        # silver: expression-key join (J3) — symbol + TO_DATE(trade_ts) = price_date
        .view(
            "finance.silver.trades_enriched",
            """SELECT t.trade_id, t.account_id, t.symbol, t.side, t.qty,
                      t.exec_price, t.trade_ts, p.close_price,
                      (p.close_price - t.exec_price) * t.qty AS mark_vs_exec
               FROM trades t
               JOIN daily_prices p
                 ON t.symbol = p.symbol AND TO_DATE(t.trade_ts) = p.price_date""",
        )
        # gold: CASE-summed P&L by account+symbol (A4)
        .view(
            "finance.gold.pnl_by_account_symbol",
            """SELECT account_id, symbol,
                      SUM(CASE WHEN side = 'BUY' THEN -qty * exec_price
                               ELSE qty * exec_price END) AS cash_flow,
                      SUM(CASE WHEN side = 'BUY' THEN qty ELSE -qty END) AS net_qty,
                      COUNT(*) AS n_trades
               FROM trades_enriched
               GROUP BY account_id, symbol""",
        )
        # quality gates: every trade joined a price; no zero-qty trades
        .assert_empty(
            "quality.unpriced_trades",
            """SELECT t.trade_id FROM trades t
               LEFT JOIN daily_prices p
                 ON t.symbol = p.symbol AND TO_DATE(t.trade_ts) = p.price_date
               WHERE p.symbol IS NULL""",
        )
        .assert_empty("quality.nonpositive_qty", "SELECT * FROM trades WHERE qty <= 0")
    )
    results = pipe.run()
    assert all(r.ok for r in results)

    got = {
        (r.account_id, r.symbol): (round(r.cash_flow, 2), r.net_qty, r.n_trades)
        for r in spark.table("pnl_by_account_symbol").collect()
    }
    # hand-computed from the 5 trades
    assert got == {
        ("A1", "AAA"): (-26.0, 6, 2),   # -10*5 + 4*6
        ("A1", "BBB"): (-100.0, 2, 1),  # -2*50
        ("A2", "AAA"): (-5.5, 1, 1),    # -1*5.5
        ("A2", "BBB"): (156.0, -3, 1),  # 3*52
    }

    # silver row-level check: trade 1 marks against 2025-08-18 close 5.50
    enriched = {r.trade_id: round(r.mark_vs_exec, 2) for r in spark.table("trades_enriched").collect()}
    assert enriched[1] == 5.0  # (5.50-5.00)*10
    assert len(enriched) == 5  # every trade priced (J3 join is 1:1 here)


def test_retail_ctas_rolling_pipeline(spark, tmp_path):
    """Retail shape (retail.sql:88-134, 230-240 re-authored): messy status
    casing -> CTAS-materialized silver with DISTRIBUTE BY -> 7-day rolling
    revenue gold; hand-checkable rolling sums."""
    lake = Lakehouse(spark, str(tmp_path / "whr"))
    raw = spark.createDataFrame(
        [
            (1, "Paid", 10.0, "2025-08-01"),
            (2, "PAID", 20.0, "2025-08-02"),
            (3, "paid", 30.0, "2025-08-03"),
            (4, "canceled", 99.0, "2025-08-03"),   # excluded from revenue
            (5, "Paid", 40.0, "2025-08-09"),       # outside 7d of 08-01
            (6, "CANCELED", 7.0, "2025-08-09"),
        ],
        "order_id INT, status STRING, amount DOUBLE, d STRING",
    ).withColumn("d", F.col("d").cast("timestamp"))
    pipe = (
        MedallionPipeline(spark, lake)
        .table("retail.raw.orders", lambda: raw)
        .ctas(
            "retail.silver.orders_std",
            """SELECT order_id, UPPER(TRIM(status)) AS status_std, amount, d
               FROM orders""",
            distribute_by="order_id",
        )
        .view(
            "retail.gold.rolling_revenue",
            """SELECT d, daily,
                      SUM(daily) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                        AS rev_7d
               FROM (SELECT d, SUM(amount) AS daily FROM orders_std
                     WHERE status_std = 'PAID' GROUP BY d)""",
        )
        .assert_empty(
            "quality.unknown_status",
            "SELECT * FROM orders_std WHERE status_std NOT IN ('PAID','CANCELED')",
        )
    )
    results = pipe.run()
    assert all(r.ok for r in results)
    # CTAS silver is a real lakehouse table with standardized values
    silver = lake.table("retail.silver.orders_std").read()
    assert {r.status_std for r in silver.collect()} == {"PAID", "CANCELED"}
    rolling = {str(r.d)[:10]: r.rev_7d for r in spark.table("rolling_revenue").collect()}
    # ROWS BETWEEN 6 PRECEDING is ROW-based over daily rows (the reference's
    # exact frame, retail.sql:230-240) — so 08-09 still sums all 4 daily rows
    # despite the calendar gap. SURVEY §2.5 W2 documents this gap hazard; the
    # gap-robust variant is rangeBetween, deliberately not used here.
    assert rolling == {"2025-08-01": 10.0, "2025-08-02": 30.0,
                       "2025-08-03": 60.0, "2025-08-09": 100.0}


def test_quality_gate_fails_on_violation(spark, tmp_path):
    lake = Lakehouse(spark, str(tmp_path / "wh2"))
    pipe = (
        MedallionPipeline(spark, lake)
        .table("f.raw.trades", lambda: _trades(spark))
        .assert_empty("quality.must_fail", "SELECT * FROM trades WHERE qty > 0")
    )
    with pytest.raises(AssertionError, match="quality gate"):
        pipe.run()
    # fail_fast=False reports instead of raising
    results = pipe.run(fail_fast=False)
    gate = [r for r in results if r.kind == "assert_empty"][0]
    assert not gate.ok and gate.rows == 5


def test_ctas_gold_is_frozen_but_view_is_live(spark, tmp_path):
    """Views don't freeze data; CTAS gold does (SURVEY §7 hazards:
    retail.sql:79-82 CTAS vs finance_example.sql:97 view)."""
    lake = Lakehouse(spark, str(tmp_path / "wh3"))
    pipe = (
        MedallionPipeline(spark, lake)
        .table("f.raw.trades", lambda: _trades(spark))
        .view("f.gold.live_count", "SELECT COUNT(*) AS n FROM trades")
        .ctas("f.gold.frozen_count", "SELECT COUNT(*) AS n FROM trades")
    )
    pipe.run()
    assert spark.table("live_count").first().n == 5
    assert spark.table("frozen_count").first().n == 5

    # append more raw data and re-register the raw view
    lake.table("f.raw.trades").append(_trades(spark))
    lake.table("f.raw.trades").read().createOrReplaceTempView("trades")
    assert spark.table("live_count").first().n == 10   # view recomputes
    assert spark.table("frozen_count").first().n == 5  # CTAS is a snapshot
