"""Scale-factor switchback: the driver calls ``queries()`` entries
against one SparkSession with varying sf_dir. Catalog objects (UDFs,
TVFs, datamart tables, source views) are session-global, so
``prepared_engine`` must rebuild them when the scale factor changes —
a stale catalog silently answers from the wrong dataset."""

from __future__ import annotations

import dbt_bigquery_udf_spark.queries  # noqa: F401 — populate the registry
from dbt_bigquery_udf_spark.queries import QUERIES


def _counts(spark, sf_dir):
    e2e = QUERIES["ref_datamart_e2e"](spark, sf_dir).count()
    agg = QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    return e2e, agg


def test_sf_switchback_rebuilds_catalog(spark, sf_small, sf_medium):
    small_1 = _counts(spark, sf_small)
    medium = _counts(spark, sf_medium)
    small_2 = _counts(spark, sf_small)
    assert small_1 == small_2, "switching back must restore the small dataset"
    # e2e row counts scale with the data: equality across sfs would mean
    # a stale catalog answered.
    assert medium[0] > small_1[0]
