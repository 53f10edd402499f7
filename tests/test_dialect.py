"""Dialect-layer unit tests + parse_datetime golden vectors (FIXTURES.md §3,
sourced from the reference's own docs at models/udf/schema.yml:10-12)."""

from __future__ import annotations

import datetime

import pytest

from dbt_bigquery_udf_spark.functions.dialect import (
    bq_format_to_duckdb,
    bq_format_to_spark,
    spark_type_for,
    translate_param_list,
    transpile_bq_expr,
)
from dbt_bigquery_udf_spark.models.reference import PARSE_DATETIME


def test_format_translation():
    assert bq_format_to_spark("%Y/%m/%d %H:%M:%S") == "yyyy/MM/dd HH:mm:ss"
    assert bq_format_to_spark("%Y-%m-%d") == "yyyy-MM-dd"
    assert (
        bq_format_to_spark("%Y-%m-%dT%H:%M:%E*SZ")
        == "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]'Z'"
    )


def test_format_translation_duckdb_ladder():
    assert bq_format_to_duckdb("%Y-%m-%dT%H:%M:%E*SZ") == [
        "%Y-%m-%dT%H:%M:%S.%fZ",
        "%Y-%m-%dT%H:%M:%SZ",
    ]
    assert bq_format_to_duckdb("%Y/%m/%d") == ["%Y/%m/%d"]


def test_unknown_format_element_rejected():
    with pytest.raises(ValueError):
        bq_format_to_spark("%Q")


def test_type_map():
    assert spark_type_for("INT64") == "BIGINT"
    assert spark_type_for("DATETIME") == "TIMESTAMP_NTZ"
    assert translate_param_list(["id STRING", "n INT64"]) == [
        ("id", "STRING"),
        ("n", "BIGINT"),
    ]


def test_transpile_safe_and_strict():
    out = transpile_bq_expr("SAFE.PARSE_DATETIME('%Y-%m-%d', x)")
    assert out == "cast(try_to_timestamp(x, 'yyyy-MM-dd') as timestamp_ntz)"
    out = transpile_bq_expr("PARSE_DATETIME('%Y-%m-%d', f(a, b))")
    assert out == "cast(to_timestamp(f(a, b), 'yyyy-MM-dd') as timestamp_ntz)"


def test_transpile_cast_types_but_not_aliases():
    out = transpile_bq_expr("SELECT CAST(c AS INT64) AS column1, f(x) AS datetime")
    assert "CAST(c AS BIGINT)" in out
    assert "AS datetime" in out  # alias untouched
    assert transpile_bq_expr("SAFE_CAST(c AS INT64)") == "try_cast(c AS BIGINT)"


GOLDEN = [
    # (input, expected) — FIXTURES.md §3; first row is the reference's
    # documented example (models/udf/schema.yml:10-12).
    ("2023/01/01 12:00:00", datetime.datetime(2023, 1, 1, 12, 0, 0)),
    ("2023/11/01", datetime.datetime(2023, 11, 1)),
    ("2023-01-01 12:00:00", datetime.datetime(2023, 1, 1, 12, 0, 0)),
    ("2023-11-01", datetime.datetime(2023, 11, 1)),
    ("2023-01-01T12:00:00.123456Z", datetime.datetime(2023, 1, 1, 12, 0, 0, 123456)),
    ("2023-01-01T12:00:07Z", datetime.datetime(2023, 1, 1, 12, 0, 7)),
    (None, None),
]


@pytest.fixture(scope="module")
def parse_expr():
    return transpile_bq_expr(PARSE_DATETIME.sql).replace("timestamp_expression", "s")


def test_parse_datetime_golden_vectors(spark, parse_expr):
    values = ", ".join(
        f"('{s}')" if s is not None else "(CAST(NULL AS STRING))" for s, _ in GOLDEN
    )
    rows = spark.sql(
        f"SELECT {parse_expr} AS dt FROM VALUES {values} AS t(s)"
    ).collect()
    assert [r.dt for r in rows] == [exp for _, exp in GOLDEN]


def test_parse_datetime_garbage_raises(spark, parse_expr):
    # BigQuery semantics: the unprefixed final branch errors
    # (reference: models/udf/function/parse_datetime.sql:15).
    expr = parse_expr.replace("s,", "'garbage',").replace("(s", "('garbage'")
    with pytest.raises(Exception):
        spark.sql(f"SELECT {expr} AS dt").collect()


def test_regexp_split_ieee_divide_rewrites(spark):
    """Round-2 dialect breadth: REGEXP_EXTRACT('' vs NULL + group
    selection), REGEXP_EXTRACT_ALL raw-literal normalization, SPLIT's
    literal (non-regex) delimiter, IEEE_DIVIDE's never-error contract —
    evaluated in Spark against BigQuery's documented results."""
    import math

    sql = transpile_bq_expr(
        "SELECT REGEXP_EXTRACT('abc', '[0-9]+') AS no_match, "
        "REGEXP_EXTRACT('id=42', 'id=([0-9]+)') AS grp, "
        "REGEXP_EXTRACT_ALL('a1 b22', r'\\d+') AS all_m, "
        "SPLIT('a.b.c', '.') AS parts, "
        "SPLIT('x,,y') AS empties, "
        "IEEE_DIVIDE(1, 0) AS pinf, IEEE_DIVIDE(-1, 0) AS ninf, "
        "IEEE_DIVIDE(0, 0) AS nan_v, IEEE_DIVIDE(10, 4) AS frac"
    )
    r = spark.sql(sql).first()
    assert r["no_match"] is None  # BQ NULL, not Spark's ''
    assert r["grp"] == "42"  # single capturing group extracted
    assert r["all_m"] == ["1", "22"]
    assert r["parts"] == ["a", "b", "c"]  # '.' split literally, not as regex
    assert r["empties"] == ["x", "", "y"]  # default ',' delim, empties kept
    assert r["pinf"] == float("inf") and r["ninf"] == float("-inf")
    assert math.isnan(r["nan_v"]) and r["frac"] == 2.5
    # idempotency: transpiling the output changes nothing
    assert transpile_bq_expr(sql) == sql


def test_regexp_extract_multi_group_rejected():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="capturing groups"):
        transpile_bq_expr("SELECT REGEXP_EXTRACT(s, '(a)(b)') FROM t")


def test_regexp_extract_char_class_parens(spark):
    """'(' inside a [...] character class is a literal paren, not a
    capturing group: r'[(]' extracts the whole match (group 0), and
    '[^(]+' is a valid single-group-free pattern (round-3 ADVICE fix)."""
    sql = transpile_bq_expr(
        "SELECT REGEXP_EXTRACT('a(b', r'[(]') AS paren, "
        "REGEXP_EXTRACT('xy(z', '[^(]+') AS prefix, "
        "REGEXP_EXTRACT('k=[v]', r'\\[([^]]+)\\]') AS bracketed"
    )
    r = spark.sql(sql).first()
    assert r["paren"] == "("       # group 0: the whole match
    assert r["prefix"] == "xy"     # no groups counted inside the class
    assert r["bracketed"] == "v"   # the one REAL group still selected


def test_regexp_extract_unsupported_forms_fail_loudly():
    """Spark accepts 2-arg regexp_extract with idx defaulting to 1, so
    pass-through would silently return '' where BigQuery returns NULL —
    non-literal patterns and BQ's position/occurrence forms must raise
    at transpile time instead (round-3 ADVICE fix)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-literal"):
        transpile_bq_expr("SELECT REGEXP_EXTRACT(s, pat) FROM t")
    with _pytest.raises(ValueError, match="position/occurrence"):
        transpile_bq_expr("SELECT REGEXP_EXTRACT(s, '(a)', 2) FROM t")
    with _pytest.raises(ValueError, match="non-literal"):
        transpile_bq_expr("SELECT REGEXP_EXTRACT_ALL(s, pat) FROM t")
    with _pytest.raises(ValueError, match="2 args"):
        transpile_bq_expr("SELECT REGEXP_EXTRACT_ALL(s, '(a)', 2) FROM t")


def test_regexp_extract_uppercase_position_form_rejected():
    """BQ-spelled (uppercase) 3-arg REGEXP_EXTRACT is the position form
    even when the position is 1 — it must reject loudly, while the
    transpiler's own lowercase emission stays idempotent (round-3
    review fix)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="position/occurrence"):
        transpile_bq_expr("SELECT REGEXP_EXTRACT(s, r'(\\d+)', 1) FROM t")
    out = transpile_bq_expr("SELECT REGEXP_EXTRACT('id=42', 'id=([0-9]+)') AS g")
    assert transpile_bq_expr(out) == out  # own output still passes through


def test_grp_marker_spoof_rejected_and_idempotence_validated():
    """The /*grp*/ idempotence marker is VALIDATED, not trusted: a
    hand-written marker whose group index does not equal the pattern's
    group count (smuggling Spark group-index semantics) rejects loudly;
    the transpiler's own emissions — group 0 (no capture), group 1,
    raw-escaped backslashes, character classes — still round-trip
    (round-3 VERDICT #6)."""
    import pytest as _pytest

    # spoof: zero-group pattern branded with group 1
    with _pytest.raises(ValueError, match="marker cannot override"):
        transpile_bq_expr(
            "SELECT regexp_extract(s, 'abc', 1 /*grp*/) FROM t"
        )
    # spoof: one-group pattern branded with group 0
    with _pytest.raises(ValueError, match="marker cannot override"):
        transpile_bq_expr(
            "SELECT regexp_extract(s, '(a)', 0 /*grp*/) FROM t"
        )
    # spoof: marker with a group index outside {0, 1}
    with _pytest.raises(ValueError, match="reserved for transpiler"):
        transpile_bq_expr(
            "SELECT regexp_extract(s, '(a)', 2 /*grp*/) FROM t"
        )
    # spoof: marker with a non-literal pattern
    with _pytest.raises(ValueError, match="non-literal pattern"):
        transpile_bq_expr(
            "SELECT regexp_extract(s, pat, 1 /*grp*/) FROM t"
        )
    # same rules on REGEXP_EXTRACT_ALL
    with _pytest.raises(ValueError, match="marker cannot override"):
        transpile_bq_expr(
            "SELECT regexp_extract_all(s, 'abc', 1 /*grp*/) FROM t"
        )
    # idempotence survives validation for every emission shape
    for src in (
        "SELECT REGEXP_EXTRACT('id=42', 'id=([0-9]+)') AS g",      # group 1
        "SELECT REGEXP_EXTRACT(s, 'abc[0-9]+') FROM t",            # group 0
        r"SELECT REGEXP_EXTRACT(s, r'\(x\)') FROM t",              # raw escaped parens -> 0
        r"SELECT REGEXP_EXTRACT(s, r'(\d+)') FROM t",              # raw group 1
        "SELECT REGEXP_EXTRACT_ALL(s, '([a-z]+)') FROM t",
        "SELECT REGEXP_EXTRACT(s, '[(]x[)]') FROM t",              # class parens -> 0
    ):
        out = transpile_bq_expr(src)
        assert transpile_bq_expr(out) == out, src
