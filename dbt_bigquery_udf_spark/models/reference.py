"""The reference's model DAG, re-expressed for this engine.

Graph (reference: SURVEY.md §3): external source ``test_table`` ->
scalar UDF ``parse_datetime`` -> table function ``test_table_function``
-> materialized table ``test_datamart``.

Data mapping: the reference's source table
(reference: models/udf/source.yml:4-9) has columns ``id``, ``column1``
(numeric string), ``column2`` (datetime string in one of five formats).
The driver's ``events`` table stands in (FIXTURES.md §1):
``event_type -> id``, ``event_id -> column1``, ``ts`` formatted into the
five reference formats (cycled deterministically by ``event_id % 5``) ->
``column2``. The ``test_table`` view is created by
:func:`register_test_table`.

Documented deviation: the reference's TVF body ends with
``WHERE id = '{{ id }}'`` (reference:
models/udf/table_function/test_table_function.sql:14) where ``{{ id }}``
is an undefined Jinja variable, so dbt compiles it to ``WHERE id = ''``
— the function parameter is silently ignored (latent bug, SURVEY.md
§2.2). The declared intent (``params=['id STRING']`` and the ``('123')``
call) is a real parameter comparison, which is what this engine
implements: ``WHERE id = id_param``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .core import ModelSpec

__all__ = ["REFERENCE_MODELS", "register_test_table", "TEST_TABLE_SQL"]

# The five formats from reference: models/udf/function/parse_datetime.sql:10-15,
# cycled by event_id so every branch of the COALESCE fallback chain is
# exercised by real rows.
TEST_TABLE_SQL = """
SELECT
  event_type AS id,
  CAST(event_id AS STRING) AS column1,
  CASE CAST(event_id % 5 AS INT)
    WHEN 0 THEN date_format(ts, 'yyyy/MM/dd HH:mm:ss')
    WHEN 1 THEN date_format(ts, 'yyyy/MM/dd')
    WHEN 2 THEN date_format(ts, 'yyyy-MM-dd HH:mm:ss')
    WHEN 3 THEN date_format(ts, 'yyyy-MM-dd')
    ELSE concat(date_format(ts, 'yyyy-MM-dd'), 'T',
                date_format(ts, 'HH:mm:ss.SSSSSS'), 'Z')
  END AS column2
FROM {events}
"""


def register_test_table(
    spark: SparkSession, database: str = "src", persistent: bool = True
) -> None:
    """Create the ``test_table`` stand-in view over ``events``."""
    if persistent:
        spark.sql(
            f"CREATE OR REPLACE VIEW {database}.test_table AS "
            + TEST_TABLE_SQL.format(events=f"{database}.events")
        )
    else:
        spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW test_table AS "
            + TEST_TABLE_SQL.format(events="events")
        )


PARSE_DATETIME = ModelSpec(
    name="parse_datetime",
    kind="function",
    database="udf",
    params=("timestamp_expression STRING",),
    return_type="DATETIME",
    description=(
        "* Purpose: convert a string to a civil datetime\n"
        "* Param: timestamp_expression(STRING)\n"
        "* Returns: DATETIME\n"
        "* Example: parse_datetime('2023/01/01 12:00:00') -> 2023-01-01T12:00:00"
    ),
    # Same fallback-chain semantics as reference:
    # models/udf/function/parse_datetime.sql:9-16 — five SAFE branches
    # (NULL on mismatch) then a strict branch that raises, in BQ dialect;
    # the engine transpiles to try_to_timestamp/to_timestamp.
    sql="""
COALESCE(
  SAFE.PARSE_DATETIME('%Y/%m/%d %H:%M:%S', timestamp_expression),
  SAFE.PARSE_DATETIME('%Y/%m/%d', timestamp_expression),
  SAFE.PARSE_DATETIME('%Y-%m-%d %H:%M:%S', timestamp_expression),
  SAFE.PARSE_DATETIME('%Y-%m-%d', timestamp_expression),
  SAFE.PARSE_DATETIME('%Y-%m-%dT%H:%M:%E*SZ', timestamp_expression),
  PARSE_DATETIME('%Y/%m/%d %H:%M:%S', timestamp_expression)
)
""",
)

TEST_TABLE_FUNCTION = ModelSpec(
    name="test_table_function",
    kind="table_function",
    database="udf",
    params=("id_param STRING",),
    description="* Purpose: parameterized filter over test_table\n* Param: id_param(STRING)",
    # Semantics of reference: models/udf/table_function/test_table_function.sql:8-14
    # with the intended (not the bugged) WHERE; see module docstring.
    sql="""
SELECT
  CAST(column1 AS INT64) AS column1,
  {{ ref('parse_datetime') }}(column2) AS datetime
FROM
  {{ source('joshua_dataset', 'test_table') }}
WHERE
  id = id_param
""",
)

TEST_DATAMART = ModelSpec(
    name="test_datamart",
    kind="table",
    database="datamart",
    description="materialized result of test_table_function over the click slice",
    columns={
        # reference: models/datamart/schema.yml:6-10 (INT64 -> BIGINT,
        # DATETIME -> TIMESTAMP_NTZ).
        "column1": "unique event identifier (INT64 in the reference)",
        "datetime": "event time parsed by parse_datetime (DATETIME in the reference)",
    },
    # reference: models/datamart/test_datamart.sql:1-5 calls the TVF with
    # the literal '123'; our stand-in data keys `id` by event_type, so the
    # argument is 'click' to select a real slice.
    sql="""
SELECT
  column1,
  datetime
FROM
  {{ ref('test_table_function') }}('click')
""",
)

REFERENCE_MODELS: tuple[ModelSpec, ...] = (
    PARSE_DATETIME,
    TEST_TABLE_FUNCTION,
    TEST_DATAMART,
)


def reference_tests():
    """Default schema-test suite for the reference DAG — the `dbt test`
    surface the reference configures but ships empty
    (reference: dbt_project.yml:17 test-paths; 387 tests in the
    production log, none in the repo). These four are dbt's built-in
    generic tests applied to the datamart's declared contract
    (reference: models/datamart/schema.yml:6-10)."""
    from .quality import not_null, relationships, unique

    return [
        unique("test_datamart", "column1"),
        not_null("test_datamart", "column1"),
        not_null("test_datamart", "datetime"),
        # Every datamart row must trace back to a source event: the
        # TVF only filters/casts, so column1 ⊆ src.test_table.column1
        # (dotted parent = relationships-to-source).
        relationships("test_datamart", "column1", "src.test_table", "column1"),
    ]


def reference_singular_tests():
    """dbt singular (data) tests — the hand-written .sql files the
    reference's empty tests/ directory would hold. One cross-model
    invariant a generic test can't state: the datamart must not contain
    events newer than its source slice allows (datetime parse produced
    a future timestamp => a format branch misfired)."""
    from .quality import SingularTest

    return [
        SingularTest(
            name="datamart_no_future_datetimes",
            sql="""
                SELECT column1, datetime FROM {{ ref('test_datamart') }}
                WHERE datetime > timestamp'2030-01-01 00:00:00'
            """,
        ),
    ]


def reference_exposures():
    """dbt exposures for the reference DAG: the datamart feeds a
    dashboard — the downstream consumer the reference's datamart
    models exist for (its schema.yml documents the table as a serving
    artifact)."""
    from .core import Exposure

    return (
        Exposure(
            name="click_events_dashboard",
            exposure_type="dashboard",
            depends_on=("test_datamart",),
            owner="analytics",
            url="https://dashboards.example/click-events",
            description="Click-event datamart consumer (lineage terminal)",
            maturity="high",
        ),
    )


def reference_unit_tests():
    """dbt unit tests for the reference DAG, anchored on the golden I/O
    example the reference documents (models/udf/schema.yml:10-12:
    parse_datetime('2023/01/01 12:00:00') -> 2023-01-01T12:00:00) —
    exercised through the TVF body so the UDF call, the INT64 cast, and
    the parameterized filter are all under test, on fixture rows only."""
    from datetime import datetime

    from .unit_tests import UnitTest

    return (
        UnitTest(
            name="tvf_golden_parse_and_filter",
            model="test_table_function",
            given={
                "source:joshua_dataset.test_table": (
                    "id string, column1 string, column2 string",
                    [
                        ("click", "42", "2023/01/01 12:00:00"),  # golden
                        ("click", "43", "2023-05-06"),  # date-only branch
                        ("view", "99", "2023/01/01 12:00:00"),  # filtered
                    ],
                )
            },
            params={"id_param": "'click'"},
            expect=(
                "column1 bigint, datetime timestamp_ntz",
                [
                    (42, datetime(2023, 1, 1, 12, 0, 0)),
                    (43, datetime(2023, 5, 6)),
                ],
            ),
            description=(
                "golden example from reference models/udf/schema.yml:10-12 "
                "+ the intended parameter filter (SURVEY.md §2.2 latent bug)"
            ),
        ),
    )


def reference_metrics():
    """Semantic-layer metrics for the reference DAG: the measures its
    datamart consumers would otherwise each hand-write."""
    from .metrics import Metric

    return (
        Metric(
            name="parsed_events",
            model="test_datamart",
            expression="count(*)",
            dimensions=(),
            time_dimension="datetime",
            description="events successfully parsed into the datamart",
        ),
    )
