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
]


@pytest.mark.parametrize("bq,expected", CASES, ids=[c[0][:45] for c in CASES])
def test_bq_function_golden(spark, bq, expected):
    out = spark.sql(f"SELECT {transpile_bq_expr(bq)} AS v").collect()[0][0]
    assert out == expected, (bq, transpile_bq_expr(bq), out)


def test_unsupported_interval_raises():
    with pytest.raises(ValueError, match="interval"):
        transpile_bq_functions("DATETIME_ADD(x, y)")


def test_unmapped_functions_left_alone():
    # SPLIT and FARM_FINGERPRINT have different semantics in Spark —
    # they must pass through untouched (visible failure beats silent
    # semantic change).
    sql = "SELECT SPLIT(a, '.'), FARM_FINGERPRINT(b) FROM t"
    assert transpile_bq_functions(sql) == sql


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


def test_transpile_idempotent_on_spark_sql():
    """Already-Spark SQL (no BQ constructs) must pass through unchanged —
    the transpiler is safe to run on mixed-dialect model bodies."""
    from dbt_bigquery_udf_spark.functions.dialect import transpile_bq_expr as t

    for sql in [
        "SELECT col, element_at(a, 1), to_timestamp(s, 'yyyy') FROM t WHERE x > 1",
        "SELECT date_trunc('hour', ts), count(*) FROM e GROUP BY 1",
        "SELECT CASE WHEN a THEN 'x' ELSE 'y' END FROM t",
        "SELECT try_cast(x AS BIGINT), coalesce(a, b) FROM t",
    ]:
        assert t(sql) == sql
        assert t(t(sql)) == t(sql)
