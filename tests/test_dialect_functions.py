"""Golden vectors for the extended BigQuery function transpilation.

Each case is (BigQuery expression, expected value): the transpiled SQL
runs in Spark and must produce the expected result — faithfulness, not
just syntactic rewriting.
"""

from __future__ import annotations

import datetime

import pytest

from dbt_bigquery_udf_spark.functions.dialect import (
    transpile_bq_expr,
    transpile_bq_functions,
)

_DT = "TIMESTAMP_NTZ '2023-03-15 12:30:45'"

CASES = [
    ("SAFE_DIVIDE(10, 0)", None),
    ("SAFE_DIVIDE(10, 4)", 2.5),
    ("SAFE_ADD(9223372036854775807, 1)", None),
    ("REGEXP_CONTAINS('hello world', 'wor.d')", True),
    ("REGEXP_CONTAINS('hello', '^world$')", False),
    ("ARRAY_LENGTH(array(1, 2, 3))", 3),
    ("TO_JSON_STRING(named_struct('a', 1))", '{"a":1}'),
    ("JSON_EXTRACT_SCALAR('{\"k\": \"v\"}', '$.k')", "v"),
    ("JSON_VALUE('{\"k\": 7}', '$.k')", "7"),
    ("COUNTIF(true)", 1),
    ("LOGICAL_AND(true)", True),
    ("LOGICAL_OR(false)", False),
    ("BYTE_LENGTH('abc')", 3),
    ("STRPOS('haystack', 'st')", 4),
    (f"DATETIME_DIFF({_DT}, TIMESTAMP_NTZ '2023-03-13 12:30:45', DAY)", 2),
    (f"TIMESTAMP_DIFF({_DT}, TIMESTAMP_NTZ '2023-03-15 10:30:45', HOUR)", 2),
    (
        f"DATETIME_TRUNC({_DT}, MONTH)",
        datetime.datetime(2023, 3, 1, 0, 0),
    ),
    (
        f"DATETIME_ADD({_DT}, INTERVAL 2 DAY)",
        datetime.datetime(2023, 3, 17, 12, 30, 45),
    ),
    (
        f"DATETIME_SUB({_DT}, INTERVAL 45 MINUTE)",
        datetime.datetime(2023, 3, 15, 11, 45, 45),
    ),
    (f"FORMAT_DATETIME('%Y/%m/%d %H:%M:%S', {_DT})", "2023/03/15 12:30:45"),
    (f"FORMAT_DATETIME('%Y-%m-%dT%H:%M:%SZ', {_DT})", "2023-03-15T12:30:45Z"),
    # Composition with the reference surface (PARSE -> DIFF chain).
    (
        "DATETIME_DIFF(PARSE_DATETIME('%Y-%m-%d', '2024-01-03'), "
        "PARSE_DATETIME('%Y-%m-%d', '2024-01-01'), DAY)",
        2,
    ),
    # Array constructors / joining
    ("GENERATE_ARRAY(1, 4)", [1, 2, 3, 4]),
    ("GENERATE_ARRAY(3, 1)", []),
    ("GENERATE_ARRAY(1, 7, 3)", [1, 4, 7]),
    ("GENERATE_ARRAY(5, 1, -2)", [5, 3, 1]),
    ("GENERATE_ARRAY(1, 5, -1)", []),
    ("ARRAY_TO_STRING(array('a', NULL, 'b'), '-')", "a-b"),
    ("ARRAY_TO_STRING(array('a', NULL, 'b'), '-', 'x')", "a-x-b"),
    # PARSE_DATE / PARSE_TIMESTAMP (typed returns; TIMESTAMP round-trips
    # through FORMAT_TIMESTAMP to stay timezone-repr-agnostic)
    ("PARSE_DATE('%Y-%m-%d', '2024-03-05')", datetime.date(2024, 3, 5)),
    ("SAFE.PARSE_DATE('%Y-%m-%d', 'garbage')", None),
    (
        "FORMAT_TIMESTAMP('%Y-%m-%d %H:%M:%S', "
        "PARSE_TIMESTAMP('%Y-%m-%d %H:%M:%S', '2024-03-05 01:02:03'))",
        "2024-03-05 01:02:03",
    ),
    ("FORMAT_DATE('%Y/%m/%d', DATE '2024-03-05')", "2024/03/05"),
    # hex / base64 / hash compositions (BQ hashes return BYTES; the
    # TO_HEX composition collapses to Spark's hex-string hash)
    ("TO_HEX(MD5('abc'))", "900150983cd24fb0d6963f7d28e17f72"),
    (
        "TO_HEX(SHA256('abc'))",
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad",
    ),
    ("TO_HEX(FROM_HEX('1f2a'))", "1f2a"),
    ("TO_BASE64(FROM_BASE64('YWI='))", "YWI="),
    ("UNIX_DATE(DATE '2024-01-02')", 19724),
    ("DATE_FROM_UNIX_DATE(19724)", datetime.date(2024, 1, 2)),
    # Epoch conversion family: same name AND same semantics in both
    # dialects — the vectors pin that the pass-through is correct.
    ("UNIX_SECONDS(TIMESTAMP '1970-01-01 00:01:00 UTC')", 60),
    ("UNIX_MILLIS(TIMESTAMP '1970-01-01 00:00:01 UTC')", 1000),
    ("UNIX_MICROS(TIMESTAMP '1970-01-01 00:00:01 UTC')", 1000000),
    ("CAST(TIMESTAMP_SECONDS(86400) AS DATE)", datetime.date(1970, 1, 2)),
    ("CAST(TIMESTAMP_MILLIS(86400000) AS DATE)", datetime.date(1970, 1, 2)),
    ("CAST(TIMESTAMP_MICROS(86400000000) AS DATE)", datetime.date(1970, 1, 2)),
    ("IFNULL(NULL, 7)", 7),
    ("NULLIF(3, 3)", None),
    ("MOD(10, 3)", 1),
    ("DIV(10, 3)", 3),
    # APPROX_QUANTILES(x, n) -> n+1 boundaries via percentile_approx;
    # composes with OFFSET indexing (single-row aggregate here).
    ("APPROX_QUANTILES(5, 2)[OFFSET(1)]", 5),
    # FORMAT -> format_string with specifier-matched casts (Spark types
    # 7 as INT and 2.5 as DECIMAL; Java printf needs BIGINT/DOUBLE).
    ("FORMAT('%d items', 7)", "7 items"),
    ("FORMAT('%05d|%.2f|%s', 42, 2.5, 'x')", "00042|2.50|x"),
    ("FORMAT('100%% of %d', 3)", "100% of 3"),
    ("FORMAT('%x', 255)", "ff"),
    # %i normalizes per-specifier (flags/width kept; literal %% safe).
    ("FORMAT('%05i', 42)", "00042"),
    ("FORMAT('100%%iced %d', 3)", "100%iced 3"),
    ("ARRAY_CONCAT(array(1, 2), array(3))", [1, 2, 3]),
    ("ARRAY_REVERSE(array(1, 2, 3))", [3, 2, 1]),
    ("STARTS_WITH('spark', 'sp')", True),
    ("ENDS_WITH('spark', 'ark')", True),
    # Same-name same-semantics string functions: pin the pass-through.
    ("LEFT('engine', 3)", "eng"),
    ("RIGHT('engine', 3)", "ine"),
    ("REPEAT('ab', 3)", "ababab"),
    ("INITCAP('hello world')", "Hello World"),
    ("TRANSLATE('abcd', 'bd', 'xy')", "axcy"),
    ("SOUNDEX('Robert')", "R163"),
    # STRING_AGG / ARRAY_AGG over the implicit one-row relation
    ("STRING_AGG('a')", "a"),
    ("STRING_AGG('a', '|')", "a"),
    ("ARRAY_AGG('x' IGNORE NULLS)", ["x"]),
]


@pytest.mark.parametrize("bq,expected", CASES, ids=[c[0][:45] for c in CASES])
def test_bq_function_golden(spark, bq, expected):
    out = spark.sql(f"SELECT {transpile_bq_expr(bq)} AS v").collect()[0][0]
    assert out == expected, (bq, transpile_bq_expr(bq), out)


def test_unsupported_interval_raises():
    with pytest.raises(ValueError, match="interval"):
        transpile_bq_functions("DATETIME_ADD(x, y)")


def test_unmapped_functions_left_alone():
    # FARM_FINGERPRINT hashes to different values in any Spark mapping —
    # it must pass through untouched (visible failure beats silent
    # semantic change). SPLIT with a NON-literal delimiter likewise: the
    # regex-escape rewrite only applies when the delimiter is a literal.
    sql = "SELECT SPLIT(a, d), FARM_FINGERPRINT(b) FROM t"
    assert transpile_bq_functions(sql) == sql
    # literal delimiter IS faithfully mapped (escaped, trailing empties kept)
    assert (
        transpile_bq_functions("SELECT SPLIT(a, '.') FROM t")
        == "SELECT split(a, '\\\\.', -1) FROM t"
    )


ARRAY_DT_CASES = [
    ("array(10, 20, 30)[OFFSET(1)]", 20),
    ("array(10, 20, 30)[ORDINAL(1)]", 10),
    ("array(10, 20)[SAFE_OFFSET(9)]", None),
    ("array(10, 20)[SAFE_ORDINAL(2)]", 20),
    # nested: index expression is itself an expression
    ("array(1, 2, 3)[OFFSET(1 + 1)]", 3),
    # chained off a function call
    ("split('a,b,c', ',')[OFFSET(2)]", "c"),
    (
        "DATETIME '2024-05-01 08:30:00'",
        datetime.datetime(2024, 5, 1, 8, 30),
    ),
    (
        "DATETIME(2024, 5, 1, 8, 30, 0)",
        datetime.datetime(2024, 5, 1, 8, 30),
    ),
]


@pytest.mark.parametrize(
    "bq,expected", ARRAY_DT_CASES, ids=[c[0][:40] for c in ARRAY_DT_CASES]
)
def test_bq_array_datetime_golden(spark, bq, expected):
    out = spark.sql(f"SELECT {transpile_bq_expr(bq)} AS v").collect()[0][0]
    assert out == expected, (bq, transpile_bq_expr(bq), out)


def test_index_rewrite_edge_cases():
    from dbt_bigquery_udf_spark.functions.dialect import transpile_bq_expr as t

    assert t("a [ OFFSET(i) ]") == "element_at(a, (i) + 1)"
    assert (
        t("a[OFFSET(0)][OFFSET(1)]")
        == "element_at(element_at(a, (0) + 1), (1) + 1)"
    )
    assert t("m.arr[SAFE_ORDINAL(n + 1)]") == "try_element_at(m.arr, (n + 1))"


QUALIFY_CASES = [
    # basic window filter
    (
        "SELECT a, b FROM VALUES (1,'x'),(2,'x'),(3,'y') t(a,b) "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY b ORDER BY a) = 1",
        {(1, "x"), (3, "y")},
    ),
    # predicate referencing a select alias (BQ allows; Spark lateral
    # column aliases make the rewrite faithful)
    (
        "SELECT a, ROW_NUMBER() OVER (ORDER BY a) AS rn "
        "FROM VALUES (3),(1),(2) t(a) QUALIFY rn <= 2",
        {(1, 1), (2, 2)},
    ),
    # WHERE + GROUP BY + QUALIFY over an aggregate window, ORDER BY tail
    (
        "SELECT b, SUM(a) AS s FROM VALUES (1,'x'),(2,'x'),(2,'y'),(-9,'z') t(a,b) "
        "WHERE a > 0 GROUP BY b "
        "QUALIFY RANK() OVER (ORDER BY SUM(a) DESC) = 1 ORDER BY b",
        {("x", 3)},
    ),
    # QUALIFY inside a subquery, outer query plain
    (
        "SELECT count(*) AS n FROM (SELECT a FROM VALUES (1),(2),(3) t(a) "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY a DESC) <= 2)",
        {(2,)},
    ),
]


@pytest.mark.parametrize("bq,expected", QUALIFY_CASES, ids=[c[0][:50] for c in QUALIFY_CASES])
def test_qualify_rewrite(spark, bq, expected):
    out = spark.sql(transpile_bq_expr(bq)).collect()
    assert {tuple(r) for r in out} == expected, transpile_bq_expr(bq)


def test_string_agg_order_by(spark):
    bq = (
        "SELECT STRING_AGG(b, '|' ORDER BY a DESC) AS s "
        "FROM VALUES (1,'x'),(2,'y'),(3,'z') t(a,b)"
    )
    assert spark.sql(transpile_bq_expr(bq)).collect()[0][0] == "z|y|x"


def test_string_agg_limit_raises():
    with pytest.raises(ValueError, match="LIMIT"):
        transpile_bq_expr("SELECT STRING_AGG(x, ',' ORDER BY x LIMIT 5) FROM t")


def test_qualify_distinct_raises():
    with pytest.raises(ValueError, match="DISTINCT"):
        transpile_bq_expr(
            "SELECT DISTINCT a FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1"
        )


def test_plain_array_agg_left_alone():
    # Plain ARRAY_AGG errors on NULL elements in BQ but not in Spark's
    # same-named function — pass through untouched (visible divergence
    # beats a silent one); only the IGNORE NULLS form is mapped.
    sql = "SELECT ARRAY_AGG(a) FROM t"
    assert transpile_bq_functions(sql) == sql


def test_transpile_idempotent_on_spark_sql():
    """Already-Spark SQL (no BQ constructs) must pass through unchanged —
    the transpiler is safe to run on mixed-dialect model bodies."""
    from dbt_bigquery_udf_spark.functions.dialect import transpile_bq_expr as t

    for sql in [
        "SELECT col, element_at(a, 1), to_timestamp(s, 'yyyy') FROM t WHERE x > 1",
        "SELECT date_trunc('hour', ts), count(*) FROM e GROUP BY 1",
        "SELECT CASE WHEN a THEN 'x' ELSE 'y' END FROM t",
        "SELECT try_cast(x AS BIGINT), coalesce(a, b) FROM t",
        # Outputs of the transpiler's own rewrites must not re-match.
        "SELECT format_string('%05d', CAST(7 AS BIGINT)) FROM t",
        "SELECT percentile_approx(x, array(0D / 2D, 1D / 2D, 2D / 2D)) FROM t",
        "SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) FROM t",
    ]:
        assert t(sql) == sql
        assert t(t(sql)) == t(sql)


def test_unsupported_bq_forms_pass_through():
    """Valid-but-unmapped BQ forms pass through untouched rather than
    aborting the transpile (visible divergence over a hard stop)."""
    for sql in [
        "SELECT APPROX_QUANTILES(x, 100 IGNORE NULLS) FROM t",
        "SELECT APPROX_QUANTILES(DISTINCT x, n) FROM t",
        "SELECT FORMAT('%t', x) FROM t",
        "SELECT FORMAT(fmt_col, x) FROM t",
    ]:
        assert transpile_bq_functions(sql) == sql


def test_date_family_bq_forms_rewrite(spark):
    """Unambiguous BQ DATE_* forms map faithfully; Spark-native forms
    pass through; rewrites are idempotent."""
    from dbt_bigquery_udf_spark.functions.dialect import transpile_bq_expr as t

    # boundary-crossing semantics (Jan 31 -> Feb 1 is 1 MONTH in BQ)
    vectors = [
        ("DATE_DIFF(DATE '2024-02-01', DATE '2024-01-31', MONTH)", 1),
        ("DATE_DIFF(DATE '2024-02-01', DATE '2024-01-31', DAY)", 1),
        ("DATE_DIFF(DATE '2025-01-01', DATE '2024-12-31', YEAR)", 1),
        ("DATE_DIFF(DATE '2024-04-01', DATE '2024-03-31', QUARTER)", 1),
        # 2024-01-07 was a Sunday: one Sunday boundary crossed
        ("DATE_DIFF(DATE '2024-01-08', DATE '2024-01-06', WEEK)", 1),
        ("DATE_DIFF(DATE '2024-01-06', DATE '2024-01-01', WEEK)", 0),
    ]
    for bq, expected in vectors:
        got = spark.sql(f"SELECT {t(bq)} AS v").first().v
        assert got == expected, (bq, t(bq), got)
    # BQ DATE_TRUNC weeks start Sunday (Spark's start Monday);
    # month-end clamping for ADD/SUB
    scalar_vectors = [
        ("DATE_TRUNC(DATE '2024-01-10', WEEK)", "2024-01-07"),
        ("DATE_TRUNC(DATE '2024-01-10', MONTH)", "2024-01-01"),
        ("DATE_ADD(DATE '2024-01-31', INTERVAL 1 MONTH)", "2024-02-29"),
        ("DATE_SUB(DATE '2024-03-31', INTERVAL 1 MONTH)", "2024-02-29"),
    ]
    for bq, expected in scalar_vectors:
        sql_expr = t(bq)
        got = spark.sql(f"SELECT {sql_expr} AS v").first().v
        assert str(got) == expected, (bq, sql_expr, got)
    # Spark-native same-name forms are untouched (idempotency guarantee)
    for native in (
        "date_diff(d1, d2)",
        "date_trunc('week', ts)",
        "date_add(d, 3)",
        "date_sub(d, 3)",
    ):
        assert t(native).lower() == native.lower(), native
    # rewritten output is a fixed point
    for bq, _ in vectors:
        assert t(t(bq)) == t(bq), bq


def test_date_trunc_part_named_columns_safe():
    """Columns named like part keywords must not corrupt the rewrite,
    and Spark-native date_trunc('month', col) must pass through even
    when the column is named like a part."""
    from dbt_bigquery_udf_spark.functions.dialect import transpile_bq_expr as t

    # BQ form with a column literally named `day`
    assert t("DATE_TRUNC(day, MONTH)") == "cast(date_trunc('MONTH', day) as date)"
    # fixed point: rewriting the output changes nothing
    assert t(t("DATE_TRUNC(day, MONTH)")) == t("DATE_TRUNC(day, MONTH)")
    # Spark-native: quoted format first — untouched, even with a
    # part-keyword column name second
    assert t("date_trunc('month', day)") == "date_trunc('month', day)"


def test_unnest_forms(spark):
    """BQ UNNEST -> LATERAL VIEW (pos)explode: comma / CROSS JOIN /
    LEFT JOIN ON TRUE (keeps empty-array rows) / standalone FROM, with
    and without WITH OFFSET ordinals."""
    spark.sql(
        "SELECT array(10,20) AS arr, 'r1' AS id "
        "UNION ALL SELECT array(), 'r2'"
    ).createOrReplaceTempView("unnest_t")
    rows = spark.sql(
        transpile_bq_expr("SELECT id, x FROM unnest_t, UNNEST(arr) AS x")
    ).collect()
    assert [(r.id, r.x) for r in rows] == [("r1", 10), ("r1", 20)]
    rows = spark.sql(
        transpile_bq_expr(
            "SELECT id, x, i FROM unnest_t, UNNEST(arr) AS x WITH OFFSET AS i"
        )
    ).collect()
    assert [(r.x, r.i) for r in rows] == [(10, 0), (20, 1)]
    rows = spark.sql(
        transpile_bq_expr(
            "SELECT id, x FROM unnest_t LEFT JOIN UNNEST(arr) AS x ON TRUE"
        )
    ).collect()
    assert ("r2", None) in [(r.id, r.x) for r in rows]  # empty array kept
    rows = spark.sql(
        transpile_bq_expr("SELECT x FROM UNNEST(array(1,2,3)) AS x")
    ).collect()
    assert [r.x for r in rows] == [1, 2, 3]
    # alias-less UNNEST must pass through untouched (loud analysis error
    # beats swallowing the next clause keyword as an alias)
    s = "SELECT 1 FROM t, UNNEST(arr) WHERE x > 0"
    assert transpile_bq_expr(s) == s
    # idempotency on rewritten output
    out = transpile_bq_expr("SELECT id, x FROM unnest_t, UNNEST(arr) AS x")
    assert transpile_bq_expr(out) == out


def test_struct_constructor(spark):
    """BQ STRUCT(expr AS name, ...) -> named_struct; all-bare STRUCT ->
    struct (same inferred field names); mixed forms pass through."""
    r = spark.sql(
        transpile_bq_expr("SELECT STRUCT(1 AS a, 2 + 3 AS b) AS s")
    ).first()
    assert r.s.asDict() == {"a": 1, "b": 5}
    r = spark.sql(
        transpile_bq_expr(
            "SELECT STRUCT(CAST('7' AS INT64) AS n, UPPER('x') AS u) AS s"
        )
    ).first()
    assert r.s.asDict() == {"n": 7, "u": "X"}
    out = transpile_bq_expr("SELECT STRUCT(x, y) FROM t")
    assert out == "SELECT struct(x, y) FROM t"
    mixed = "SELECT STRUCT(1 AS a, y) FROM t"
    assert transpile_bq_expr(mixed) == mixed  # loud, not silently renamed
    assert transpile_bq_expr("CAST(NULL AS STRUCT<a INT64>)").startswith("CAST")
