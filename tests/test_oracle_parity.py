"""Replicates the driver's t2 check locally: every registered query is
compared against its DuckDB oracle at sf0.001 (the driver runs sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from dbt_bigquery_udf_spark.testing import compare_query


def _cases():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, sf_small, name, fn, oracle):
    result = compare_query(spark, fn, oracle, sf_small, name)
    assert result["ok"], result
    if oracle is not None:
        assert result["status"] == "match", result


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["column1", "datetime"]
