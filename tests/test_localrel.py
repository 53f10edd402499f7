"""Focused tests for operators/util.py's JVM local-relation helpers
(round-11 optimization): ``local_rows_df`` / ``local_empty_df`` must be
drop-in replacements for ``spark.createDataFrame(rows, ddl)`` — same
schema (types AND nullability), same values bit-for-bit — while planning
as a pure JVM relation (no Python-RDD scan in the plan)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import SparkSession

from dbt_bigquery_udf_spark.operators.util import local_empty_df, local_rows_df


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[2]")
        .appName("test_localrel")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


CASES = [
    ([(1,)], "version int"),
    ([(123456789012345,)], "doc_id bigint"),
    ([(2, [0.1, -1.5e-7]), (3, [])], "cid int, cv array<double>"),
    ([("a'b\\c", True, None)], "s string, b boolean, x bigint"),
    ([(1, 2.5), (2, None)], "k bigint, v double"),
    ([(0, [7, 8, 9])], "doc_id bigint, hs array<bigint>"),
    ([], "doc_id bigint"),
    ([], "batch_id int, doc_id bigint, is_dup boolean, h string"),
]


@pytest.mark.parametrize("rows,ddl", CASES, ids=[c[1] for c in CASES])
def test_matches_createDataFrame(spark, rows, ddl):
    ref = spark.createDataFrame(rows, ddl)
    got = local_rows_df(spark, rows, ddl)
    assert got.schema == ref.schema  # incl. nullability
    norm = lambda rs: sorted(tuple(map(str, r)) for r in rs)  # noqa: E731
    assert norm(got.collect()) == norm(ref.collect())


def test_double_literals_bit_exact(spark):
    vals = [0.1, -1.5e-7, 2.0**-1074, 1.7976931348623157e308, -0.0]
    got = local_rows_df(
        spark, [(i, v) for i, v in enumerate(vals)], "i int, v double"
    ).orderBy("i").collect()
    for row, v in zip(got, vals):
        assert row["v"] == v and math.copysign(1, row["v"]) == math.copysign(1, v)


def test_nan_and_null_distinct(spark):
    got = local_rows_df(
        spark, [(0, float("nan")), (1, None)], "i int, v double"
    ).orderBy("i").collect()
    assert math.isnan(got[0]["v"]) and got[1]["v"] is None


def test_empty_df_schema_and_rows(spark):
    ddl = "doc_id bigint, hs array<bigint>"
    ref = spark.createDataFrame([], ddl)
    got = local_empty_df(spark, ddl)
    assert got.schema == ref.schema and got.collect() == []


def test_no_python_scan_in_plan(spark):
    """The point of the helper: the plan must not contain a Python-RDD
    scan (``Scan ExistingRDD``), which is what createDataFrame plans and
    what costs a Python-worker round trip per action."""
    df = local_rows_df(spark, [(1, [0.5])], "cid int, cv array<double>")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan
    ref = spark.createDataFrame([(1, [0.5])], "cid int, cv array<double>")
    ref_plan = ref._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in ref_plan  # the shape being avoided
