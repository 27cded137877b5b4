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


# --------------------------------------------- file-skipping soundness

from apache_iceberg_lakehouse_workshop_spark.plans.lakeshim import LakeTable

_num_lit = st.one_of(
    st.integers(min_value=-99, max_value=99),
    st.floats(min_value=-99, max_value=99, allow_nan=False, allow_infinity=False),
)
# numeric-LOOKING strings are the adversarial case (lexicographic vs
# numeric order disagree: '10' < '9'), plus plain words
_str_val = st.one_of(
    st.integers(min_value=-99, max_value=99).map(str),
    st.from_regex(r"[a-z0-9]{0,4}", fullmatch=True),
)
_col_vals = st.one_of(
    st.lists(st.integers(min_value=-99, max_value=99), min_size=1, max_size=6),
    st.lists(_str_val, min_size=1, max_size=6),
)
_op = st.sampled_from(["=", "<", "<=", ">", ">="])
_lit = st.one_of(_num_lit, _str_val)


def _spark_pred(v, op, lit):
    """Mirror Spark's row-filter semantics for col-vs-literal: same-type
    compares directly; string column vs numeric literal casts the string
    to double (unparsable -> NULL -> not TRUE); numeric column vs string
    literal casts the literal (unparsable -> NULL)."""
    if isinstance(v, str) and isinstance(lit, (int, float)):
        try:
            v = float(v)
        except ValueError:
            return False
    elif isinstance(v, (int, float)) and isinstance(lit, str):
        try:
            lit = float(lit)
        except ValueError:
            return False
    ops = {
        "=": lambda a, b: a == b,
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
    }
    return ops[op](v, lit)


def _stats_for(vals, partition_style):
    """[min, max] the engine records: footer stats keep the native type;
    partition-dir stats are stringified degenerate [v, v] ranges."""
    if partition_style:
        return [str(vals[0]), str(vals[0])]
    return [min(vals), max(vals)]


@given(vals=_col_vals, op=_op, lit=_lit, partition_style=st.booleans())
@settings(max_examples=400, deadline=None)
def test_file_may_match_never_prunes_a_matching_row(vals, op, lit, partition_style):
    """ADVICE r5 / round-6 task #7: pruning must be SOUND for every
    (stats type, literal type, op) combination — if any row in the file
    satisfies the predicate, _file_may_match must keep the file. (The
    reverse — keeping a file with no matching rows — is always allowed.)"""
    if partition_style:
        vals = vals[:1]  # a partition dir holds one identity value
    cols = {"c": _stats_for(vals, partition_style)}
    if not LakeTable._file_may_match(cols, ("c", op, lit)):
        for v in vals:
            assert not _spark_pred(v, op, lit), (
                f"pruned a file containing matching row {v!r} "
                f"(stats={cols['c']!r}, op={op!r}, lit={lit!r})"
            )


@given(
    vals=_col_vals,
    lits=st.lists(_lit, min_size=1, max_size=4),
    partition_style=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_file_may_match_in_list_sound(vals, lits, partition_style):
    if partition_style:
        vals = vals[:1]
    cols = {"c": _stats_for(vals, partition_style)}
    if not LakeTable._file_may_match(cols, ("c", "in", lits)):
        for v in vals:
            assert not any(_spark_pred(v, "=", x) for x in lits)


@given(
    vals=_col_vals,
    lo=_lit,
    hi=_lit,
    partition_style=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_file_may_match_between_sound(vals, lo, hi, partition_style):
    if partition_style:
        vals = vals[:1]
    cols = {"c": _stats_for(vals, partition_style)}
    if not LakeTable._file_may_match(cols, ("c", "between", (lo, hi))):
        for v in vals:
            assert not (_spark_pred(v, ">=", lo) and _spark_pred(v, "<=", hi))


_str_vals = st.lists(st.text(max_size=8), min_size=1, max_size=5)


@given(
    vals=_str_vals,
    p=st.text(min_size=1, max_size=6),
    partition_style=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_file_may_match_prefix_sound(vals, p, partition_style):
    """r10 prefix-LIKE conjunct: if the evaluator prunes a file, no row in
    it may satisfy LIKE 'p%' (startswith on the string form). UTF-8 byte
    order equals code-point order, so Python's string comparison models
    Spark's; keeping a file is always allowed, pruning must be sound."""
    if partition_style:
        vals = vals[:1]
    cols = {"c": _stats_for(vals, partition_style)}
    if not LakeTable._file_may_match(cols, ("c", "prefix", p)):
        for v in vals:
            assert not str(v).startswith(p), (
                f"pruned a file containing LIKE-matching row {v!r} "
                f"(stats={cols['c']!r}, prefix={p!r})"
            )


import datetime as _dt


_ts_vals = st.lists(
    st.datetimes(
        min_value=_dt.datetime(2020, 1, 1),
        max_value=_dt.datetime(2030, 1, 1),
    ).map(lambda d: d.replace(microsecond=0)),
    min_size=1,
    max_size=5,
)
# literal shapes a user writes: date-only, 'YYYY-MM-DD HH:MM', full, junk
_ts_lit = st.one_of(
    st.datetimes(
        min_value=_dt.datetime(2020, 1, 1), max_value=_dt.datetime(2030, 1, 1)
    ).map(lambda d: d.replace(microsecond=0).isoformat(sep=" ")),
    st.dates(
        min_value=_dt.date(2020, 1, 1), max_value=_dt.date(2030, 1, 1)
    ).map(str),
    st.dates(
        min_value=_dt.date(2020, 1, 1), max_value=_dt.date(2030, 1, 1)
    ).map(lambda d: d.isoformat() + " 12:30"),
    st.text(max_size=12),
)


@given(vals=_ts_vals, op=_op, lit=_ts_lit, date_col=st.booleans())
@settings(max_examples=400, deadline=None)
def test_file_may_match_temporal_sound(vals, op, lit, date_col):
    """ISO-tagged temporal stats must never prune a file containing a
    matching row, mirroring Spark's cast semantics: TIMESTAMP columns cast
    the literal (date-only -> midnight, unparsable -> NULL); DATE columns
    TRUNCATE a time-ful literal to its date."""
    if date_col:
        vals = [v.date() for v in vals]
        cols = {"c": [min(vals).isoformat(), max(vals).isoformat(), "d"]}
    else:
        cols = {"c": [min(vals).isoformat(sep=" "), max(vals).isoformat(sep=" "), "ts"]}
    if LakeTable._file_may_match(cols, ("c", op, lit)):
        return  # keeping is always allowed
    # pruned: prove no row matches under Spark's semantics
    s = lit.strip().replace("T", " ")
    try:
        if date_col:
            cast = _dt.date.fromisoformat(s.split(" ")[0])
        elif len(s) == 10:
            cast = _dt.datetime.fromisoformat(s + " 00:00:00")
        else:
            cast = _dt.datetime.fromisoformat(s)
    except ValueError:
        return  # cast NULL -> predicate never TRUE: pruning trivially sound
    ops = {
        "=": lambda a, b: a == b,
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
    }
    for v in vals:
        assert not ops[op](v, cast), (
            f"pruned a matching row {v} (stats={cols['c']}, {op} {lit!r})"
        )

# ------------------------------------- widened-column skipping soundness

_wide_int = st.integers(min_value=-(2**62), max_value=2**62)


@given(
    vals=st.lists(_wide_int, min_size=1, max_size=6),
    op=_op,
    lit=_wide_int,
    partition_style=st.booleans(),
)
@settings(max_examples=400, deadline=None)
def test_file_may_match_widened_bigint_sound(vals, op, lit, partition_style):
    """Round-7 type widening: after int->long widening, literals can exceed
    2^53 where float round-trips collapse neighbours. Spark compares BIGINT
    col vs integer literal EXACTLY, so pruning must too — both for footer
    stats (native ints) and identity-partition stats (degenerate strings)."""
    if partition_style:
        vals = vals[:1]
        cols = {"c": [str(vals[0]), str(vals[0])]}
    else:
        cols = {"c": [min(vals), max(vals)]}
    ops = {
        "=": lambda a, b: a == b,
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
    }
    if not LakeTable._file_may_match(cols, ("c", op, lit)):
        for v in vals:
            assert not ops[op](v, lit), (
                f"pruned a file containing matching row {v!r} "
                f"(stats={cols['c']!r}, op={op!r}, lit={lit!r})"
            )


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-99, max_value=99)),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_file_may_match_notnull_sound(vals):
    """IS NOT NULL pruning: a file is skipped ONLY when provably all-NULL
    — if any row holds a value, the file must survive."""
    non_null = [v for v in vals if v is not None]
    if non_null:
        cols = {"c": [min(non_null), max(non_null)]}
    else:
        cols = {"c": [None, None]}
    keep = LakeTable._file_may_match(cols, ("c", "notnull", None))
    if not keep:
        assert not non_null, f"pruned a file with values {non_null!r}"
    if non_null:
        assert keep


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-99, max_value=99)),
        min_size=1,
        max_size=6,
    ),
    count_known=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_file_may_match_isnull_sound(vals, count_known):
    """IS NULL pruning: a file is skipped ONLY when its recorded null
    count is exactly zero — unknown counts and columns missing from the
    file (which read as NULL) always keep."""
    non_null = [v for v in vals if v is not None]
    n_nulls = len(vals) - len(non_null)
    cols = {}
    if non_null:
        cols["c"] = [min(non_null), max(non_null)]
    else:
        cols["c"] = [None, None]
    if count_known:
        cols["__nulls__"] = {"c": n_nulls}
    keep = LakeTable._file_may_match(cols, ("c", "isnull", None))
    if not keep:
        assert count_known and n_nulls == 0, (
            f"pruned a file holding {n_nulls} NULLs (known={count_known})"
        )
    if n_nulls > 0 or not count_known:
        assert keep
    # a column entirely absent from the file reads as NULL: never pruned
    assert LakeTable._file_may_match({}, ("zz", "isnull", None))
