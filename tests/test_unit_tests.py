"""dbt unit-test surface: given/expect fixtures over model logic."""

from __future__ import annotations

import pytest

from dbt_bigquery_udf_spark.api import prepared_engine
from dbt_bigquery_udf_spark.catalog import EngineError
from dbt_bigquery_udf_spark.models.reference import reference_unit_tests
from dbt_bigquery_udf_spark.models.unit_tests import UnitTest, run_unit_tests


def test_reference_unit_tests_pass(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    results = run_unit_tests(spark, engine, reference_unit_tests())
    assert results and all(r.passed for r in results), [
        (r.test.name, r.missing, r.unexpected) for r in results
    ]


def test_unit_test_reports_diff_rows(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    t = UnitTest(
        name="wrong_expectation",
        model="test_table_function",
        given={
            "source:joshua_dataset.test_table": (
                "id string, column1 string, column2 string",
                [("click", "1", "2023/01/01 12:00:00")],
            )
        },
        params={"id_param": "'click'"},
        expect=("column1 bigint, datetime timestamp_ntz", [(2, None)]),
    )
    (res,) = run_unit_tests(spark, engine, [t])
    assert not res.passed
    assert len(res.missing) == 1 and len(res.unexpected) == 1


def test_unit_test_requires_fixtures_for_data_inputs(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    t = UnitTest(
        name="no_fixture",
        model="test_table_function",
        params={"id_param": "'click'"},
        expect=("column1 bigint, datetime timestamp_ntz", []),
    )
    with pytest.raises(EngineError, match="has no fixture"):
        run_unit_tests(spark, engine, [t])


def test_unit_test_rejects_unused_fixture(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    t = UnitTest(
        name="orphan_fixture",
        model="test_table_function",
        given={
            "source:joshua_dataset.test_table": (
                "id string, column1 string, column2 string",
                [],
            ),
            "ref:nonexistent_input": ("x int", []),
        },
        params={"id_param": "'click'"},
        expect=("column1 bigint, datetime timestamp_ntz", []),
    )
    with pytest.raises(EngineError, match="match no model input"):
        run_unit_tests(spark, engine, [t])
