"""dbt semantic-layer analogue: metric definitions compile to grouped
aggregations over built relations, with dimension governance."""

from __future__ import annotations

import pytest

from dbt_bigquery_udf_spark.api import prepared_engine
from dbt_bigquery_udf_spark.models.core import EngineError
from dbt_bigquery_udf_spark.models.metrics import Metric, MetricRegistry


@pytest.fixture()
def registry(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    reg = MetricRegistry(engine)
    reg.register(
        Metric(
            name="revenue",
            model="src.orders",  # dotted = source relation
            expression="round(sum(o_totalprice), 2)",
            dimensions=("o_orderstatus", "o_orderpriority"),
            time_dimension="o_orderdate",
            description="gross order revenue",
        ),
        Metric(
            name="urgent_orders",
            model="src.orders",
            expression="count(*)",
            dimensions=("o_orderstatus",),
            filter="o_orderpriority = '1-URGENT'",
        ),
    )
    return reg


def test_metric_grouped_query(spark, registry):
    got = {
        r.o_orderstatus: r.revenue
        for r in registry.query(spark, "revenue", group_by=["o_orderstatus"]).collect()
    }
    want = {
        r.o_orderstatus: r.rev
        for r in spark.sql(
            "SELECT o_orderstatus, round(sum(o_totalprice), 2) AS rev "
            "FROM src.orders GROUP BY o_orderstatus"
        ).collect()
    }
    assert got == want


def test_metric_grain_and_filters(spark, registry):
    df = registry.query(spark, "revenue", grain="month", where="o_totalprice > 0")
    assert "o_orderdate_month" in df.columns
    total = registry.query(spark, "revenue").collect()[0].revenue
    assert round(sum(r.revenue for r in df.collect()), 2) == total
    # Metric-level filter always applies.
    urgent = registry.query(spark, "urgent_orders").collect()[0].urgent_orders
    want = spark.sql(
        "SELECT count(*) FROM src.orders WHERE o_orderpriority = '1-URGENT'"
    ).collect()[0][0]
    assert urgent == want


def test_metric_dimension_governance(spark, registry):
    """Grouping by an undeclared dimension is a compile-time error —
    the governance contract a semantic layer exists to enforce."""
    with pytest.raises(EngineError, match="not a declared dimension"):
        registry.compile("revenue", group_by=["o_clerk"])
    with pytest.raises(EngineError, match="unknown metric"):
        registry.compile("profit")
    with pytest.raises(EngineError, match="unknown grain"):
        registry.compile("revenue", grain="fortnight")
    with pytest.raises(EngineError, match="time_dimension"):
        registry.compile("urgent_orders", grain="month")


def test_metric_where_governance_and_kind_checks(spark, registry):
    """Filters obey the same governance as group_by; non-relation
    model kinds are rejected at registration."""
    from dbt_bigquery_udf_spark.api import prepared_engine

    with pytest.raises(EngineError, match="undeclared identifiers"):
        registry.compile("revenue", where="o_clerk = 'Clerk#1'")
    # Measure-input columns are filterable (part of the definition).
    registry.compile("revenue", where="o_totalprice > 100")
    engine = prepared_engine(spark, "/root/testdata/sf0.001")
    reg2 = MetricRegistry(engine)
    with pytest.raises(EngineError, match="not a queryable relation"):
        reg2.register(
            Metric(name="bad", model="parse_datetime", expression="count(*)")
        )
