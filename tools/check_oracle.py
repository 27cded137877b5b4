"""Local replica of the driver's correctness gate.

Runs every queries() entry at sf0.01 on Spark AND its oracle_sql() twin on
DuckDB, then compares row count, column names, and values (exact; floats
bitwise with a reported max-abs-diff fallback). Queries without an oracle
get a rows-only sanity check.

Usage: python tools/check_oracle.py [name_filter ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")


def duck_con():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def to_rows(cols, data):
    """dict col->list  ->  sorted list of tuples with columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = []
    n = len(data[cols[0]]) if cols else 0
    for r in range(n):
        rows.append(tuple(norm_cell(data[cols[i]][r]) for i in order))
    rows.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in order], rows


def compare(name, spark_df, duck_rel):
    spdf = spark_df.toPandas()
    spark_cols = list(spdf.columns)
    spark_data = {c: list(spdf[c]) for c in spark_cols}
    ddf = duck_rel.fetchdf()
    duck_cols = list(ddf.columns)
    duck_data = {c: list(ddf[c]) for c in duck_cols}

    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems, 0
    sc, srows = to_rows(spark_cols, spark_data)
    dc, drows = to_rows(duck_cols, duck_data)
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        return problems, len(srows)
    max_diff = 0.0
    n_mismatch = 0
    first = None
    for sr, dr in zip(srows, drows):
        for c, (a, b) in zip(sc, zip(sr, dr)):
            ok = a == b
            if not ok and isinstance(a, float) and isinstance(b, float):
                d = abs(a - b)
                max_diff = max(max_diff, d)
                ok = a == b  # exact requirement; diff reported for debugging
            if not ok:
                # normalize numpy scalars / dates
                if str(a) == str(b):
                    ok = True
            if not ok:
                n_mismatch += 1
                if first is None:
                    first = f"col={c} spark={a!r} duck={b!r}"
    if n_mismatch:
        problems.append(f"{n_mismatch} cell mismatches (max_float_diff={max_diff:.3e}); first: {first}")
    return problems, len(srows)


def main():
    name_filters = sys.argv[1:]
    from apache_iceberg_lakehouse_workshop_spark.registry import full_registry
    from apache_iceberg_lakehouse_workshop_spark.session import get_spark

    spark = get_spark("oracle-check")
    # full registry: the driver sees the exposed <=50 entries, but the local
    # gate also re-verifies every absorbed singleton so a regression inside
    # a battery branch is still pinpointed to its operator
    qs = {name: query.fn for name, query in full_registry().items()}
    oracles = {
        name: query.oracle for name, query in full_registry().items() if query.oracle
    }
    con = duck_con()

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if name_filters and not any(f in name for f in name_filters):
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            if name in oracles:
                problems, nrows = compare(name, df, con.sql(oracles[name]))
            else:
                nrows = df.count()
                problems = [] if nrows >= 0 else ["negative count?"]
                problems = problems if nrows > 0 else problems + ["WARN: 0 rows (rows-only)"]
        except Exception as e:  # noqa: BLE001
            problems, nrows = [f"EXCEPTION: {type(e).__name__}: {e}"], -1
        dt = time.time() - t0
        status = "PASS" if not problems else "FAIL"
        if not problems:
            n_pass += 1
        else:
            n_fail += 1
        mode = "oracle" if name in oracles else "rows-only"
        print(f"[{status}] {name:28s} rows={nrows:<7d} {dt:5.1f}s ({mode})")
        for p in problems:
            print(f"        {p[:500]}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
