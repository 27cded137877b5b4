"""Medallion pipeline runner (SURVEY §7 M4).

The reference's industry examples are ordered SQL scripts building
raw → silver → gold (± quality) layer stacks — e.g. the finance pipeline
(``/root/reference/industry-examples/finance_example.sql``: namespaces → raw
tables → inserts → silver view join → gold rollup view) and the
manufacturing pipeline with a 4th ``quality`` layer of audit views whose
result sets must be empty (``manufacturing.sql:11-15,216-252,345-364``).

This runner executes those graphs on the engine:

- ``ddl`` steps run through the dialect layer (Dremio-isms accepted).
- ``table`` steps create/append lakehouse tables (snapshot-committed).
- ``view`` steps register silver/gold logical views (views don't freeze
  data — gold views recompute per query, same as the reference; SURVEY §7
  hazards).
- ``ctas`` steps materialize gold physically (the retail/manufacturing
  DROP+CTAS idiom, ``retail.sql:88-100``).
- ``assert_empty`` steps are the quality layer: a query whose non-empty
  result fails the pipeline (the reference's audit views with
  ``WHERE diff <> 0``, Q1–Q8) — turning the workshop's "look at this view"
  into an executable gate.

Steps run in declaration order; each step sees everything before it — the
same contract as running the reference script top to bottom.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .. import dialect
from .lakeshim import Lakehouse


@dataclass
class StepResult:
    name: str
    kind: str
    rows: int | None = None
    ok: bool = True
    detail: str = ""


@dataclass
class MedallionPipeline:
    spark: SparkSession
    lake: Lakehouse
    steps: list[tuple] = field(default_factory=list)

    # ------------------------------------------------------- declaration

    def ddl(self, name: str, sql: str) -> "MedallionPipeline":
        """Dremio-dialect DDL/DML statement(s) (translated, then run)."""
        self.steps.append(("ddl", name, sql))
        return self

    def table(self, name: str, df_fn: Callable[[], DataFrame],
              partition_by: list[str] | None = None) -> "MedallionPipeline":
        """Create-or-replace a lakehouse table from a DataFrame thunk."""
        self.steps.append(("table", name, df_fn, partition_by))
        return self

    def view(self, name: str, sql: str) -> "MedallionPipeline":
        """Silver/gold logical view (dialect-translated SELECT)."""
        self.steps.append(("view", name, sql))
        return self

    def ctas(self, name: str, sql: str,
             partition_by: list[str] | None = None,
             distribute_by: str | None = None) -> "MedallionPipeline":
        """Materialized gold table from a SELECT (DROP+CTAS idiom)."""
        self.steps.append(("ctas", name, sql, partition_by, distribute_by))
        return self

    def assert_empty(self, name: str, sql: str) -> "MedallionPipeline":
        """Quality gate: query must return 0 rows."""
        self.steps.append(("assert_empty", name, sql))
        return self

    # --------------------------------------------------------- execution

    def _register(self, table_name: str) -> None:
        """Expose a lakehouse table to SQL under its leaf name."""
        leaf = table_name.split(".")[-1]
        self.lake.table(table_name).read().createOrReplaceTempView(leaf)

    def run(self, fail_fast: bool = True) -> list[StepResult]:
        results: list[StepResult] = []
        for step in self.steps:
            kind, name = step[0], step[1]
            if kind == "ddl":
                dialect.run(self.spark, step[2])
                results.append(StepResult(name, kind))
            elif kind == "table":
                _, _, df_fn, partition_by = step
                self.lake.drop_table(name)
                self.lake.create_table_as(name, df_fn(), partition_by)
                self._register(name)
                results.append(StepResult(name, kind))
            elif kind == "view":
                self.spark.sql(
                    f"CREATE OR REPLACE TEMP VIEW {name.split('.')[-1]} AS "
                    + dialect.translate(step[2])
                )
                results.append(StepResult(name, kind))
            elif kind == "ctas":
                _, _, sql, partition_by, distribute_by = step
                df = self.spark.sql(dialect.translate(sql))
                self.lake.drop_table(name)
                self.lake.create_table_as(name, df, partition_by, distribute_by)
                self._register(name)
                results.append(StepResult(name, kind))
            elif kind == "assert_empty":
                bad = self.spark.sql(dialect.translate(step[2]))
                n = bad.count()
                res = StepResult(name, kind, rows=n, ok=(n == 0),
                                 detail="" if n == 0 else f"{n} violating rows")
                results.append(res)
                if not res.ok and fail_fast:
                    raise AssertionError(f"quality gate {name!r} failed: {res.detail}")
            else:  # pragma: no cover
                raise ValueError(f"unknown step kind {kind}")
        return results
