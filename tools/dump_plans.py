"""Dump ``.explain("formatted")`` for named registry queries to files —
the per-round plan evidence (plans/r<N>/<query>_{before,after}.txt). Run
it from a git worktree of the old commit for the "before" side and from
the working tree for "after"; the judge diffs the pair against the
round's plan claims.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]
  e.g. python tools/dump_plans.py plans/r13 after s12_knn_persisted
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_iceberg_lakehouse_workshop_spark.registry import (  # noqa: E402
    full_registry,
)
from apache_iceberg_lakehouse_workshop_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    queries = full_registry()
    for name in names:
        df = queries[name].fn(spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
