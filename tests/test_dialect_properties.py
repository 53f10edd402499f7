"""Property-based tests (hypothesis) for the BigQuery->Spark dialect layer.

Random civil datetimes are formatted per each reference format pattern
and parsed back through BOTH translation targets (Spark SQL expression
and the DuckDB strptime ladder) — round-trip equality across the whole
input space, not just the golden vectors.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_bigquery_udf_spark.functions.dialect import (
    bq_format_to_duckdb,
    bq_format_to_spark,
)

# The reference's five concrete formats
# (models/udf/function/parse_datetime.sql:10-15) + the strict final one.
PATTERNS = [
    ("%Y/%m/%d %H:%M:%S", "%Y/%m/%d %H:%M:%S"),
    ("%Y/%m/%d", "%Y/%m/%d"),
    ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M:%S"),
    ("%Y-%m-%d", "%Y-%m-%d"),
    ("%Y-%m-%dT%H:%M:%E*SZ", "%Y-%m-%dT%H:%M:%S.%fZ"),
]

dts = st.datetimes(
    min_value=datetime(1583, 1, 1),  # proleptic-Gregorian edge cases below 1583
    max_value=datetime(9999, 12, 31, 23, 59, 59),
).map(lambda d: d.replace(microsecond=0))


@pytest.mark.parametrize("bq_fmt,py_fmt", PATTERNS)
@settings(max_examples=30, deadline=None)
@given(dt=dts)
def test_format_roundtrip_both_engines(spark, bq_fmt, py_fmt, dt):
    rendered = dt.strftime(py_fmt.replace("%f", "0") if "%f" in py_fmt else py_fmt)
    # Canonical expectation: whatever fields the format carries (a
    # date-only pattern drops the time of day).
    expected = datetime.strptime(rendered, py_fmt)
    spark_fmt = bq_format_to_spark(bq_fmt)
    got = spark.sql(
        "SELECT CAST(to_timestamp('{}', '{}') AS TIMESTAMP_NTZ)".format(
            rendered, spark_fmt.replace("'", "''")
        )
    ).collect()[0][0]
    assert got == expected, (rendered, spark_fmt)

    con = duckdb.connect()
    ladder = bq_format_to_duckdb(bq_fmt)
    duck = None
    for f in ladder:
        duck = con.execute("SELECT try_strptime(?, ?)", [rendered, f]).fetchone()[0]
        if duck is not None:
            break
    assert duck == expected, (rendered, ladder)
