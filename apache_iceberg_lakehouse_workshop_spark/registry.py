"""Assembled query registry: every implemented operator from SURVEY.md §2
as a named query with (where SQL-expressible) a DuckDB oracle twin."""

from __future__ import annotations

from .queries_core import QUERIES, Query  # noqa: F401  (QUERIES is the shared list)

# Importing these modules appends their queries to QUERIES via the @q decorator.
from . import queries_pipeline  # noqa: F401, E402
from . import queries_data  # noqa: F401, E402
from . import queries_extra  # noqa: F401, E402


def registry() -> dict[str, Query]:
    out: dict[str, Query] = {}
    for query in QUERIES:
        if query.name in out:
            raise ValueError(f"duplicate query name: {query.name}")
        out[query.name] = query
    return out
