"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine: ``apache_iceberg_lakehouse_workshop_spark`` (this repo). Query implementations live in
``apache_iceberg_lakehouse_workshop_spark/queries_*.py``; this file only adapts them to the driver
contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_iceberg_lakehouse_workshop_spark.registry import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the lineitem pricing summary
    (full-scan multi-aggregate — mirrors the reference's one published
    benchmark probe, /root/reference/dremio.sql:4-8)."""
    return registry()["a1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: query.fn for name, query in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins — one per exposed query, including the
    approximate operators (their hashing is engine-portable: md5 simhash,
    integer-exact LSH buckets, md5-ordered IVF seeds, hex frame
    payloads)."""
    return {name: query.oracle for name, query in registry().items() if query.oracle}
