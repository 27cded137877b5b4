"""Property-based tests (hypothesis) for the pure-Python engine layers:
the dialect translator must never corrupt string literals or valid SQL
structure, and datetime-format translation must be idempotent-safe."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from apache_iceberg_lakehouse_workshop_spark.dialect import translate, translate_datetime_format

# text fragments that are legal inside a single-quoted SQL literal
_literal_text = st.text(
    alphabet=st.characters(blacklist_characters="'", blacklist_categories=("Cs",)),
    max_size=40,
)

_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)


@given(_literal_text)
@settings(max_examples=200, deadline=None)
def test_string_literals_never_rewritten(body):
    """Whatever sits inside '…' — including Dremio keywords, quotes-looking
    text, YYYY, LISTAGG( — must pass through translate() untouched."""
    sql = f"SELECT '{body}' AS c FROM t"
    out = translate(sql)
    assert f"'{body}'" in out


@given(_ident)
@settings(max_examples=100, deadline=None)
def test_quoted_identifiers_become_backticks(name):
    out = translate(f'SELECT "{name}" FROM t')
    assert out == f"SELECT `{name}` FROM t"


@given(_literal_text, _ident)
@settings(max_examples=100, deadline=None)
def test_mixed_literal_and_identifier(body, name):
    """Rewrites apply outside literals even when a literal sits between."""
    out = translate(f"SELECT \"{name}\", '{body}' FROM t")
    assert out.startswith(f"SELECT `{name}`, ")
    assert f"'{body}'" in out


@given(st.sampled_from(["YYYY", "MM", "DD", "HH24", "MI", "SS"]))
@settings(max_examples=20, deadline=None)
def test_format_codes_map_to_spark(code):
    spark_fmt = translate_datetime_format(code)
    # every Dremio code maps to a pure-ASCII Spark pattern of same-or-shorter length
    assert re.fullmatch(r"[a-zA-Z]+", spark_fmt)
    assert len(spark_fmt) <= len(code)


@given(st.lists(st.sampled_from(["YYYY", "MM", "DD", "HH24", "MI", "SS", "/", "-", ":", " "]), max_size=10))
@settings(max_examples=200, deadline=None)
def test_format_translation_stable(parts):
    """Composed format strings translate deterministically and contain no
    leftover Dremio-only codes."""
    fmt = "".join(parts)
    out = translate_datetime_format(fmt)
    assert out == translate_datetime_format(fmt)  # deterministic
    assert "HH24" not in out and "YYYY" not in out


# ------------------------------------------------- QUALIFY rewrite safety


@given(_literal_text, _ident.filter(lambda s: s.upper() != "QUALIFY"))
@settings(max_examples=100, deadline=None)
def test_qualify_keyword_in_literals_untouched(body, alias):
    """A string literal containing 'QUALIFY' (or 'OVER', 'ORDER BY') must
    never trigger the clause rewrite."""
    from apache_iceberg_lakehouse_workshop_spark.dialect import _rewrite_qualify

    sql = f"SELECT 'QUALIFY {body} OVER ORDER BY' AS {alias} FROM t"
    assert _rewrite_qualify(sql) == sql


@given(_ident.filter(lambda s: s.upper() not in ("QUALIFY", "OVER", "ORDER", "LIMIT", "OFFSET")),
       st.integers(min_value=1, max_value=9))
@settings(max_examples=50, deadline=None)
def test_qualify_alias_form_shape(alias, n):
    from apache_iceberg_lakehouse_workshop_spark.dialect import _rewrite_qualify

    sql = f"SELECT x, row_number() OVER (ORDER BY x) AS {alias} FROM t QUALIFY {alias} <= {n}"
    out = _rewrite_qualify(sql)
    assert out.startswith("SELECT * FROM (") and f"WHERE {alias} <= {n}" in out
