"""Testdata shape contracts the oracle twins rely on.

f_json_funcs (queries_extra.py) equates Spark
``from_json(props, 'k LONG').isNotNull()`` with DuckDB ``json_valid(props)``.
Those agree only when every props value is either a JSON OBJECT or not
parseable at all — a valid scalar/array ('42', '[1,2]') is json_valid in
DuckDB but from_json-to-struct NULL in Spark. This pins that data-shape
assumption so a future testdata generation can't silently break the twin.
"""

from __future__ import annotations

import os

import duckdb
import pytest

_SFS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.exists(os.path.join(d, "events.parquet"))
]


@pytest.mark.parametrize("sf", _SFS)
def test_events_props_object_or_garbage(sf):
    con = duckdb.connect()
    total, nulls, valid_nonobject = con.execute(
        f"""SELECT
              COUNT(*),
              COUNT(*) - COUNT(props),
              COUNT(*) FILTER (WHERE json_valid(props)
                               AND json_type(TRY_CAST(props AS JSON)) <> 'OBJECT')
            FROM read_parquet('{sf}/events.parquet')"""
    ).fetchone()
    assert total > 0
    # NULL props: Spark's isNotNull gives 0 but DuckDB json_valid gives NULL
    assert nulls == 0, f"{nulls} NULL props rows in {sf} would break the twin"
    assert valid_nonobject == 0, (
        f"{valid_nonobject} props rows in {sf} are valid non-object JSON; "
        "the f_json_funcs is_valid oracle twin no longer holds"
    )
