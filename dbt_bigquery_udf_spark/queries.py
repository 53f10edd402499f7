"""The engine's query registry — the driver contract surface.

Each entry pairs a Spark query (``(spark, sf_dir) -> DataFrame``) with an
ANSI-SQL oracle DuckDB runs over the same parquet tables. Column names and
value normalization are aligned between the two (see ``testing.py``).

Organized by SURVEY.md §2 coverage: reference-parity queries first (the
UDF/TVF/datamart DAG), then the driver-mandated extension operators
(dedup, similarity, text analysis) contributed by ``operators/``.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .api import prepared_engine

__all__ = ["QUERIES", "ORACLES", "register", "curated_queries"]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and its oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Reference parity (SURVEY.md §2.1/§2.2) — the UDF -> TVF -> datamart DAG.
# --------------------------------------------------------------------------

# DuckDB equivalent of the test_table stand-in view
# (models/reference.py TEST_TABLE_SQL) and of the parse_datetime fallback
# chain (reference: models/udf/function/parse_datetime.sql:9-16). The
# %E*S SAFE branch maps to a two-pattern try ladder in DuckDB because its
# %f requires the literal dot.
_ORACLE_PRELUDE = """
WITH test_table AS (
  SELECT event_type AS id,
         CAST(event_id AS VARCHAR) AS column1,
         CASE CAST(event_id % 5 AS INT)
           WHEN 0 THEN strftime(ts, '%Y/%m/%d %H:%M:%S')
           WHEN 1 THEN strftime(ts, '%Y/%m/%d')
           WHEN 2 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
           WHEN 3 THEN strftime(ts, '%Y-%m-%d')
           ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ')
         END AS column2
  FROM events
), parsed AS (
  SELECT id,
         CAST(column1 AS BIGINT) AS column1,
         coalesce(
           try_strptime(column2, '%Y/%m/%d %H:%M:%S'),
           try_strptime(column2, '%Y/%m/%d'),
           try_strptime(column2, '%Y-%m-%d %H:%M:%S'),
           try_strptime(column2, '%Y-%m-%d'),
           try_strptime(column2, '%Y-%m-%dT%H:%M:%S.%fZ'),
           try_strptime(column2, '%Y-%m-%dT%H:%M:%SZ'),
           strptime(column2, '%Y/%m/%d %H:%M:%S')
         ) AS datetime
  FROM test_table
)
"""


@register(
    "ref_datamart_e2e",
    _ORACLE_PRELUDE
    + "SELECT column1, datetime FROM parsed WHERE id = 'click'",
)
def ref_datamart_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference DAG: source -> scalar UDF -> TVF -> datamart table
    (reference: models/datamart/test_datamart.sql:1-5); returns the
    materialized table."""
    prepared_engine(spark, sf_dir)
    return spark.table("datamart.test_datamart")


@register(
    "ref_parse_datetime",
    _ORACLE_PRELUDE
    + "SELECT column1, datetime FROM parsed",
)
def ref_parse_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar SQL UDF applied over every row/format variant
    (reference: models/udf/function/parse_datetime.sql)."""
    prepared_engine(spark, sf_dir)
    return spark.sql(
        "SELECT CAST(column1 AS BIGINT) AS column1, "
        "udf.parse_datetime(column2) AS datetime FROM src.test_table"
    )


@register(
    "ref_tvf_param",
    _ORACLE_PRELUDE
    + "SELECT column1, datetime FROM parsed WHERE id = 'view'",
)
def ref_tvf_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized table-function invocation with a different argument
    than the datamart's (reference:
    models/udf/table_function/test_table_function.sql)."""
    prepared_engine(spark, sf_dir)
    from .catalog import catalog_lock

    with catalog_lock:
        prev = spark.catalog.currentDatabase()
        spark.sql("USE udf")
        try:
            # Analysis happens eagerly in spark.sql(), so the plan is
            # resolved while udf is the current database; later execution
            # does not re-resolve.
            return spark.sql(
                "SELECT column1, datetime FROM test_table_function('view')"
            )
        finally:
            spark.sql(f"USE {prev}")


@register(
    "ref_incremental_mart",
    """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents_sum
    FROM orders GROUP BY o_orderstatus
    """,
)
def ref_incremental_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialization end to end (F-operator surface the
    round-2 window under-covered): an incremental model over orders is
    built TWICE in one call — first with a mid-1995 var cutoff (the
    initial full build), then with the cutoff lifted, where the
    ``{% if is_incremental() %}`` branch restricts the second batch to
    rows past ``max(o_orderdate)`` in ``{{ this }}`` (append strategy:
    one insertInto, no rewrite of the existing partitioned data). The
    final table must equal a single full scan — which is exactly what
    the oracle states, so the watermark handoff between the two builds
    is value-checked, not just row-counted.

    The watermark subquery COALESCEs the empty-table case to a floor
    timestamp — the standard dbt idiom. Without it, an initial build
    that inserts zero rows (every order past the first cutoff) leaves
    ``max(o_orderdate)`` NULL, the predicate evaluates to NULL for
    every row, and the mart stays empty forever. Found by the round-8
    hypothesis sweep (single order dated after the first cutoff).

    Scale: this IS the 100 TB ingestion pattern — each run scans only
    the arriving slice (the watermark predicate pushes down to the
    source scan) and appends; nothing ever rewrites history.
    """
    from .models.core import ModelSpec

    eng = prepared_engine(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS datamart.inc_orders_mart")
    eng.register(
        ModelSpec(
            name="inc_orders_mart",
            kind="incremental",
            database="datamart",
            dialect="spark",
            incremental_strategy="append",
            sql="""
                SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
                FROM {{ source('src', 'orders') }}
                WHERE o_orderdate <= TIMESTAMP {{ var('inc_cutoff') }}
                {% if is_incremental() %}
                  AND o_orderdate >
                      (SELECT coalesce(max(o_orderdate),
                                       TIMESTAMP '0001-01-01 00:00:00')
                       FROM {{ this }})
                {% endif %}
            """,
        ),
        replace=True,
    )
    eng.vars["inc_cutoff"] = "1995-06-30 00:00:00"
    eng.build(select=["inc_orders_mart"], fail_fast=True)
    eng.vars["inc_cutoff"] = "9999-12-31 00:00:00"
    eng.build(select=["inc_orders_mart"], fail_fast=True)
    from pyspark.sql import functions as F

    return (
        spark.table("datamart.inc_orders_mart")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents_sum"),
        )
    )


@register(
    "ref_snapshot_scd2",
    """
    WITH s1 AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderdate AS updated_at
      FROM orders WHERE o_orderkey % 5 <> 0
    ), s2 AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderdate AS updated_at
      FROM orders WHERE o_orderkey % 3 <> 0
      UNION ALL
      SELECT o_orderkey, 'X',
             CAST(round(o_totalprice * 100) AS BIGINT) + 7,
             o_orderdate + INTERVAL 30 DAY
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT s1.k, s1.status, s1.cents,
           s1.updated_at AS valid_from, s2.updated_at AS valid_to
    FROM s1 JOIN s2 ON s1.k = s2.k AND s2.updated_at > s1.updated_at
    UNION ALL
    SELECT s2.k, s2.status, s2.cents,
           s2.updated_at, CAST(NULL AS TIMESTAMP)
    FROM s2 JOIN s1 ON s1.k = s2.k AND s2.updated_at > s1.updated_at
    UNION ALL
    SELECT s1.k, s1.status, s1.cents,
           s1.updated_at, CAST(NULL AS TIMESTAMP)
    FROM s1 LEFT JOIN s2 ON s1.k = s2.k AND s2.updated_at > s1.updated_at
    WHERE s2.k IS NULL
    UNION ALL
    SELECT s2.k, s2.status, s2.cents,
           s2.updated_at, CAST(NULL AS TIMESTAMP)
    FROM s2 LEFT JOIN s1 ON s1.k = s2.k
    WHERE s1.k IS NULL
    """,
)
def ref_snapshot_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot materialization (dbt SCD Type-2, ``timestamp`` strategy)
    end to end — the F-surface the reference provisions but ships empty
    (reference: dbt_project.yml:20 ``snapshot-paths``). One call builds
    the snapshot TWICE: run 1 sees a partial key set (orders with
    ``o_orderkey % 5 <> 0``), run 2 sees every key with one third of
    them mutated (status -> 'X', price bumped, ``updated_at`` advanced
    30 days). The timestamp strategy stamps validity FROM THE DATA
    (``dbt_valid_from``/``dbt_valid_to`` = the row's own updated_at and
    its successor's), so the full SCD2 state — closed prior versions,
    opened new versions, untouched unchanged keys, run-2-only inserts —
    is deterministic and value-hashed against an oracle that replays
    both states with plain joins. Unchanged keys must keep their RUN-1
    row verbatim (the immutable-history contract); a snapshot that
    rewrites them from the new body would still row-count-match but
    hash-differ on equal-timestamp edge rows.

    Scale: the advance is one key-to-key full-outer join between
    current versions and the fresh body (both shuffle on unique_key —
    co-bucketable) plus an untouched-history union; no MERGE needed on
    plain parquet (models/snapshots.py rewrite-and-swap)."""
    from .models.core import ModelSpec

    eng = prepared_engine(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS datamart.orders_snapshot")
    eng.register(
        ModelSpec(
            name="orders_snapshot",
            kind="snapshot",
            database="datamart",
            dialect="spark",
            unique_key="k",
            snapshot_strategy="timestamp",
            updated_at="updated_at",
            sql="""
                {% if var('snap_state') == 2 %}
                SELECT o_orderkey AS k, o_orderstatus AS status,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                       o_orderdate AS updated_at
                FROM {{ source('src', 'orders') }}
                WHERE o_orderkey % 3 <> 0
                UNION ALL
                SELECT o_orderkey AS k, 'X' AS status,
                       CAST(round(o_totalprice * 100) AS BIGINT) + 7 AS cents,
                       timestampadd(DAY, 30, o_orderdate) AS updated_at
                FROM {{ source('src', 'orders') }}
                WHERE o_orderkey % 3 = 0
                {% else %}
                SELECT o_orderkey AS k, o_orderstatus AS status,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                       o_orderdate AS updated_at
                FROM {{ source('src', 'orders') }}
                WHERE o_orderkey % 5 <> 0
                {% endif %}
            """,
        ),
        replace=True,
    )
    eng.vars["snap_state"] = 1
    eng.build(select=["orders_snapshot"], fail_fast=True)
    eng.vars["snap_state"] = 2
    eng.build(select=["orders_snapshot"], fail_fast=True)
    return spark.sql(
        """
        SELECT k, status, cents,
               CAST(dbt_valid_from AS TIMESTAMP) AS valid_from,
               CAST(dbt_valid_to AS TIMESTAMP) AS valid_to
        FROM datamart.orders_snapshot
        """
    )


@register(
    "ref_snapshot_check",
    """
    WITH s1 AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), s2 AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 3 <> 0
      UNION ALL
      SELECT o_orderkey, 'X',
             CAST(round(o_totalprice * 100) AS BIGINT) + 7
      FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 3 = 0
    )
    SELECT k, status, cents, FALSE AS is_current
    FROM s1 WHERE k % 7 = 0
    UNION ALL
    SELECT s1.k, s1.status, s1.cents, FALSE
    FROM s1 JOIN s2 ON s1.k = s2.k
    WHERE s1.status <> s2.status OR s1.cents <> s2.cents
    UNION ALL
    SELECT s2.k, s2.status, s2.cents, TRUE
    FROM s2 JOIN s1 ON s1.k = s2.k
    WHERE s1.status <> s2.status OR s1.cents <> s2.cents
    UNION ALL
    SELECT s1.k, s1.status, s1.cents, TRUE
    FROM s1 JOIN s2 ON s1.k = s2.k
    WHERE s1.status = s2.status AND s1.cents = s2.cents
    """,
)
def ref_snapshot_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot ``check`` strategy + ``invalidate_hard_deletes`` — the
    other half of dbt's SCD2 surface: change detection by null-safe
    column comparison (no updated_at in the data) and source DELETIONS
    closing their history row. Run 1 sees every order; run 2 drops
    ``o_orderkey % 7 = 0`` (hard deletes) and mutates ``% 3 = 0`` of
    the rest. The check strategy stamps validity with the run's CLOCK,
    so the query projects the clock away — (key, data columns,
    ``dbt_valid_to IS NULL``) is the deterministic SCD2 state: closed
    old versions and hard-deleted keys read is_current=false (with
    their RUN-1 values — a snapshot that leaks run-2 values into
    closed rows hash-differs), opened versions and untouched keys read
    is_current=true. The oracle replays both states with joins and the
    same change predicate.

    Scale: identical plan to the timestamp strategy (one key-to-key
    full-outer join + history union); the null-safe check compare adds
    one projection, no extra shuffle."""
    from .models.core import ModelSpec

    eng = prepared_engine(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS datamart.orders_snapshot_chk")
    eng.register(
        ModelSpec(
            name="orders_snapshot_chk",
            kind="snapshot",
            database="datamart",
            dialect="spark",
            unique_key="k",
            snapshot_strategy="check",
            check_cols=("status", "cents"),
            invalidate_hard_deletes=True,
            sql="""
                {% if var('snap_state') == 2 %}
                SELECT o_orderkey AS k, o_orderstatus AS status,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                FROM {{ source('src', 'orders') }}
                WHERE o_orderkey % 7 <> 0 AND o_orderkey % 3 <> 0
                UNION ALL
                SELECT o_orderkey AS k, 'X' AS status,
                       CAST(round(o_totalprice * 100) AS BIGINT) + 7 AS cents
                FROM {{ source('src', 'orders') }}
                WHERE o_orderkey % 7 <> 0 AND o_orderkey % 3 = 0
                {% else %}
                SELECT o_orderkey AS k, o_orderstatus AS status,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                FROM {{ source('src', 'orders') }}
                {% endif %}
            """,
        ),
        replace=True,
    )
    eng.vars["snap_state"] = 1
    eng.build(select=["orders_snapshot_chk"], fail_fast=True)
    eng.vars["snap_state"] = 2
    eng.build(select=["orders_snapshot_chk"], fail_fast=True)
    from pyspark.sql import functions as F

    snap = spark.table("datamart.orders_snapshot_chk")
    return snap.select(
        "k",
        "status",
        "cents",
        F.col("dbt_valid_to").isNull().alias("is_current"),
    )


@register(
    "ref_schema_tests",
    """
    WITH ov AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 1000000
                  ELSE o_custkey END AS fk_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT 'unique_ov_orders_o_orderkey' AS test_name,
           CAST((SELECT count(*) FROM (
             SELECT 1 FROM ov WHERE o_orderkey IS NOT NULL
             GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT)
             AS n_failures
    UNION ALL
    SELECT 'not_null_ov_orders_o_custkey',
           CAST((SELECT count(*) FROM ov WHERE o_custkey IS NULL)
             AS BIGINT)
    UNION ALL
    SELECT 'unique_ov_orders_o_custkey',
           CAST((SELECT count(*) FROM (
             SELECT 1 FROM ov WHERE o_custkey IS NOT NULL
             GROUP BY o_custkey HAVING count(*) > 1)) AS BIGINT)
    UNION ALL
    SELECT 'accepted_values_ov_orders_o_orderstatus',
           CAST((SELECT count(*) FROM (
             SELECT 1 FROM ov
             WHERE o_orderstatus IS NOT NULL
               AND o_orderstatus NOT IN ('F', 'O')
             GROUP BY o_orderstatus)) AS BIGINT)
    UNION ALL
    SELECT 'relationships_ov_orders_fk_custkey__ov_customer_c_custkey',
           CAST((SELECT count(*) FROM ov
             WHERE fk_custkey IS NOT NULL AND NOT EXISTS (
               SELECT 1 FROM customer c
               WHERE c.c_custkey = ov.fk_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'assert_no_negative_price',
           CAST((SELECT count(*) FROM ov WHERE cents < 0) AS BIGINT)
    """,
)
def ref_schema_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt's ``test`` command end to end — the quality surface the
    reference provisions but ships empty (reference: dbt_project.yml:17
    ``test-paths: ["tests"]``): all four built-in generic tests
    (``unique`` / ``not_null`` / ``accepted_values`` /
    ``relationships``) plus a singular (hand-written SQL) test run via
    ``models/quality.py::run_tests`` against freshly built view models,
    with ``store_failures`` materializing each failing test's violating
    rows to the ``dbt_test__audit`` schema (dbt's config of the same
    name). The child view poisons one FK in 97 so the relationships
    anti-join has real violations to count; ``unique`` on o_custkey
    counts one failure per DUPLICATED VALUE — the row count of dbt's
    compiled test query, which IS upstream dbt's failures number
    (ADVICE r10 corrected the engine's earlier sum-of-group-counts
    deviation) — and the oracle restates the same count, so a
    miscompiled test query hash-mismatches on the failure COUNTS, not
    just pass/fail bits.
    Statuses are derivable from the counts (0 = pass), so the output
    stays two columns and the severity dial is exercised in pytest
    (tests/test_quality.py), not re-proven here.

    Scale: each generic test is one scan + group/anti-join on the
    tested column — the relationships check broadcasts the parent key
    set when small, shuffles key-to-key otherwise; the audit schema
    stays O(problems), only failing tests write."""
    from .models.core import ModelSpec
    from .models.quality import (
        SingularTest,
        accepted_values,
        not_null,
        relationships,
        run_tests,
        unique,
    )

    eng = prepared_engine(spark, sf_dir)
    for name, body in (
        (
            "ov_orders",
            """
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 1000000
                        ELSE o_custkey END AS fk_custkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM {{ source('src', 'orders') }}
            """,
        ),
        (
            "ov_customer",
            "SELECT c_custkey FROM {{ source('src', 'customer') }}",
        ),
    ):
        eng.register(
            ModelSpec(
                name=name, kind="view", database="datamart",
                dialect="spark", sql=body,
            ),
            replace=True,
        )
    eng.build(select=["ov_orders", "ov_customer"], fail_fast=True)
    suite = [
        unique("ov_orders", "o_orderkey"),
        not_null("ov_orders", "o_custkey"),
        unique("ov_orders", "o_custkey"),
        accepted_values("ov_orders", "o_orderstatus", ["F", "O"]),
        relationships("ov_orders", "fk_custkey", "ov_customer", "c_custkey"),
        SingularTest(
            name="assert_no_negative_price",
            sql="SELECT * FROM {{ ref('ov_orders') }} WHERE cents < 0",
        ),
    ]
    results = run_tests(spark, eng, suite, store_failures=True)
    from .operators.util import local_rows_df

    return local_rows_df(
        spark,
        [(r.test.name, r.n_failures) for r in results],
        "test_name string, n_failures bigint",
    )


@register(
    "ref_source_freshness",
    """
    WITH m AS (SELECT max(o_orderdate) AS max_ts FROM orders),
    p AS (
      SELECT 'tight' AS check_name, 10.0 AS w, 48.0 AS e
      UNION ALL SELECT 'std', 24.0, 100.0
      UNION ALL SELECT 'loose', 100.0, 200.0
    )
    SELECT p.check_name, m.max_ts,
           CASE WHEN m.max_ts IS NULL THEN NULL
                ELSE round((epoch(TIMESTAMP '2001-08-04 00:00:00')
                            - epoch(m.max_ts)) / 3600.0, 2) END
             AS age_hours,
           CASE WHEN m.max_ts IS NULL THEN 'error'
                WHEN (epoch(TIMESTAMP '2001-08-04 00:00:00')
                      - epoch(m.max_ts)) / 3600.0 <= p.w THEN 'pass'
                WHEN (epoch(TIMESTAMP '2001-08-04 00:00:00')
                      - epoch(m.max_ts)) / 3600.0 <= p.e THEN 'warn'
                ELSE 'error' END AS status
    FROM p CROSS JOIN m
    """,
)
def ref_source_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt ``source freshness`` end to end
    (``models/quality.py::check_source_freshness``): the age of the
    newest ``o_orderdate`` against three warn/error threshold pairs
    chosen to land on all three outcomes (pass / warn / error) at the
    test data's horizon (max o_orderdate = 2001-08-01, age 72h), with ``as_of`` PINNED (dbt pins the
    invocation clock the same way in its artifacts) so the statuses —
    the operator's actual decision — are deterministic and
    value-hashed. One max() aggregate per check: scan-bound, no
    shuffle; at 100 TB this is a parquet-footer statistics read when
    the source is append-ordered on the timestamp."""
    from datetime import datetime

    from .models.quality import check_source_freshness
    from .operators.util import local_rows_df

    prepared_engine(spark, sf_dir)
    as_of = datetime(2001, 8, 4)
    rows = []
    for check_name, w, e in (
        ("tight", 10.0, 48.0),
        ("std", 24.0, 100.0),
        ("loose", 100.0, 200.0),
    ):
        r = check_source_freshness(
            spark, "src.orders", "o_orderdate",
            warn_after_hours=w, error_after_hours=e, as_of=as_of,
        )
        rows.append(
            (
                check_name,
                r.max_ts,
                None if r.max_ts is None else float(r.age_hours),
                r.status,
            )
        )
    # local_rows_df since round 12: _sql_literal renders TIMESTAMP_NTZ
    # literals exactly (session-UTC pin), so the last hot Python-RDD
    # relation is gone (VERDICT r11 #5)
    return local_rows_df(
        spark,
        rows,
        "check_name string, max_ts timestamp, age_hours double, "
        "status string",
    )


@register(
    "ref_llm_corpus_project",
    """
    WITH stg AS (
      SELECT doc_id, text, lang, source, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
      FROM documents
    ), qf AS (
      SELECT * FROM stg
      WHERE n_chars >= 100 AND n_tokens >= 10 AND n_alpha * 2 >= n_chars
    ), dd AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM qf)
      WHERE rn = 1
    ), w AS (
      SELECT * FROM (VALUES
        ('en', 520), ('de', 120), ('fr', 130), ('es', 110), ('zh', 120)
      ) AS t(lang, weight_pm)
    )
    SELECT dd.lang, count(*) AS n_docs,
           CAST(sum(dd.n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(dd.n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT dd.source) AS n_sources,
           CAST(sum(dd.n_tokens) * max(coalesce(w.weight_pm, 0)) AS BIGINT)
             AS weighted_tokens_pm
    FROM dd LEFT JOIN w ON dd.lang = w.lang GROUP BY dd.lang
    """,
)
def ref_llm_corpus_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's two halves in ONE user artifact: a dbt-style
    project tree (``examples/llm_corpus``) that orchestrates the LLM
    corpus-curation pipeline — staging features -> C4-style quality
    gate (var-configured thresholds) -> exact dedup keep-first ->
    per-language corpus accounting — loaded with ``load_project``
    (folder-tree config, sources:, vars, refs, schema tests all from
    files, exactly how a migrating dbt user would ship it), built
    through the DAG scheduler, its schema tests AND dbt-1.8 unit tests (given/expect fixtures for the gate boundaries and the keep-first tie-break) REQUIRED green, and
    the final mart value-hashed against an oracle replaying the whole
    model chain. A regression anywhere in the file loader, Jinja
    render, ref resolution, materialization routing, test compiler, or
    the SQL itself lands here.

    Scale: view staging folds into the mart scans (no
    materialization); the dedup is one shuffle on md5(text); the stats
    mart is a partial-agg groupBy — the same plans the standalone
    operators use."""
    import os as _os

    from .models.quality import run_tests
    from .project import load_project

    proj = load_project(
        _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "examples",
            "llm_corpus",
        )
    )
    eng = prepared_engine(spark, sf_dir)
    eng.vars.update(proj.vars)
    eng.register(*proj.models, replace=True)
    eng.build(select=[m.name for m in proj.models], fail_fast=True)
    failed = [
        r.test.name
        for r in run_tests(spark, eng, proj.tests)
        if r.n_failures > 0
    ]
    if failed:
        raise AssertionError(f"llm_corpus schema tests failed: {failed}")
    from .models.unit_tests import run_unit_tests

    failed_units = [
        r.test.name
        for r in run_unit_tests(spark, eng, proj.unit_tests)
        if not r.passed
    ]
    if failed_units:
        raise AssertionError(f"llm_corpus unit tests failed: {failed_units}")
    stats = next(m for m in proj.models if m.name == "corpus_stats")
    return spark.table(f"{stats.database}.corpus_stats")


@register(
    "ref_python_model",
    """
    SELECT date_trunc('month', o_orderdate) AS month,
           o_orderstatus AS status,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def ref_python_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt python-model materialization end to end (``kind='python'``,
    dbt's ``def model(dbt, session)`` surface): a SQL view upstream
    (``orders_recent``) feeds a python model that builds its result
    with the DataFrame API via ``dbt.ref()`` — the dependency declared
    through ``python_refs`` exactly as dbt's static scanner would
    record it — and materializes as a table through the same DAG
    scheduler as every SQL model. The oracle replays the chain in SQL,
    so the python body's DataFrame plan (month truncation, grouped
    counts, money-safe integer cents) is value-checked against the
    declarative statement of the same logic.

    Scale: the python body never touches rows in Python — it only
    COMPOSES a DataFrame plan (dbt python models on Spark are plan
    builders, not row processors), so the materialization is the same
    scan + partial-agg shuffle Catalyst gives the SQL twin."""
    from pyspark.sql import functions as F

    from .models.core import ModelSpec

    def _monthly_mix(session, dbt):
        o = dbt.ref("orders_recent")
        return (
            o.groupBy(
                F.date_trunc("month", F.col("o_orderdate")).alias("month"),
                F.col("o_orderstatus").alias("status"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("cents"),
            )
        )

    eng = prepared_engine(spark, sf_dir)
    eng.register(
        ModelSpec(
            name="orders_recent",
            kind="view",
            database="datamart",
            dialect="spark",
            sql="""
                SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
                FROM {{ source('src', 'orders') }}
                WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            """,
        ),
        ModelSpec(
            name="monthly_status_mix",
            kind="python",
            database="datamart",
            dialect="spark",
            sql="",
            python_body=_monthly_mix,
            python_refs=("orders_recent",),
        ),
        replace=True,
    )
    eng.build(select=["monthly_status_mix"], fail_fast=True)
    return spark.table("datamart.monthly_status_mix")


@register(
    "ref_model_versions",
    """
    WITH agg AS (
      SELECT o_orderstatus AS st,
             count(*) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_orderstatus
    )
    SELECT 'latest' AS via, st, n, cents FROM agg
    UNION ALL
    SELECT 'v1' AS via, st, n, CAST(-1 AS BIGINT) AS cents FROM agg
    """,
)
def ref_model_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt 1.5 model versions end to end (round 11, VERDICT r10 #3): a
    versioned model entry (`vq_status` v1/v2, v2 latest) with one
    consumer on the unpinned ``ref('vq_status')`` (dbt: latest) and one
    pinned to ``ref('vq_status', v=1)``. v2 adds a money-safe integer
    `cents` column the v1 shape lacks, so the unioned result value-
    checks BOTH the version routing (latest consumer sees cents, the
    pinned one the v1 shape) and the shared columns agreeing across
    versions. v1 carries a past deprecation_date; the engine must
    RECORD the dbt deprecation warning (asserted here — a missing
    warning fails the query, not just a pytest).

    Scale: each version materializes independently (one scan +
    partial-agg shuffle each); version routing is pure name resolution
    at compile time — zero runtime cost, exactly dbt's semantics.

    reference: the reference tree predates dbt 1.5 and ships no
    versions: blocks (models/udf/schema.yml is unversioned) — this is
    forward-surface for migrating trees (project.py parses the same
    YAML shape)."""
    from .models.core import ModelSpec

    eng = prepared_engine(spark, sf_dir)
    v_common = dict(
        name="vq_status", kind="view", database="datamart", dialect="spark",
        latest_version=2,
    )
    eng.register(
        ModelSpec(
            **v_common,
            version=1,
            deprecation_date="2020-01-01",
            sql=(
                "SELECT o_orderstatus AS st, count(*) AS n "
                "FROM {{ source('src', 'orders') }} GROUP BY o_orderstatus"
            ),
        ),
        ModelSpec(
            **v_common,
            version=2,
            sql=(
                "SELECT o_orderstatus AS st, count(*) AS n, "
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS "
                "BIGINT) AS cents "
                "FROM {{ source('src', 'orders') }} GROUP BY o_orderstatus"
            ),
        ),
        ModelSpec(
            name="vq_latest_consumer", kind="view", database="datamart",
            dialect="spark",
            sql="SELECT st, n, cents FROM {{ ref('vq_status') }}",
        ),
        ModelSpec(
            name="vq_pinned_consumer", kind="view", database="datamart",
            dialect="spark",
            sql=(
                "SELECT st, n, CAST(-1 AS BIGINT) AS cents "
                "FROM {{ ref('vq_status', v=1) }}"
            ),
        ),
        replace=True,
    )
    eng.build(
        select=["vq_latest_consumer", "vq_pinned_consumer"], fail_fast=True
    )
    if not any("vq_status.v1" in w for w in eng.deprecation_warnings):
        raise RuntimeError(
            "deprecated v1 was referenced but no deprecation warning "
            "was recorded"
        )
    return spark.sql(
        "SELECT 'latest' AS via, st, n, cents "
        "FROM datamart.vq_latest_consumer "
        "UNION ALL "
        "SELECT 'v1' AS via, st, n, cents FROM datamart.vq_pinned_consumer"
    )


@register(
    "ref_defer_state",
    """
    SELECT o_orderstatus AS st,
           CAST(count(*) AS BIGINT) AS n,
           false AS dev_parent_exists
    FROM orders GROUP BY o_orderstatus HAVING count(*) > 0
    """,
)
def ref_defer_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt --defer --state end to end (round 11, VERDICT r10 #5): a
    prod engine builds parent+child and writes its state manifest; a
    dev engine with the SAME specs builds ONLY the child under
    defer=True — the parent ref resolves to prod's relation via the
    manifest, the dev env never materializes the parent (asserted as
    the ``dev_parent_exists`` column: a wrongly-built dev parent
    hash-mismatches against the oracle's ``false``). The child's rows
    therefore equal the oracle computed straight off prod's source —
    Slim CI's "build the diff against production" promise.

    Scale: defer is pure compile-time name routing off a JSON manifest —
    the 1000-model CI run materializes ONE model and reads 999 from
    prod, no extra plan cost.

    reference: forward-surface (the reference predates --defer);
    composes with its write-state/state:modified Slim-CI half
    (models/core.py::write_state)."""
    import hashlib
    import tempfile

    from .models.core import ModelSpec

    specs = (
        ModelSpec(
            name="dq_parent", kind="table", database="datamart",
            dialect="spark",
            sql=(
                "SELECT o_orderstatus AS st, CAST(count(*) AS BIGINT) AS n "
                "FROM {{ source('src', 'orders') }} GROUP BY o_orderstatus"
            ),
        ),
        ModelSpec(
            name="dq_child", kind="table", database="datamart",
            dialect="spark",
            sql="SELECT st, n FROM {{ ref('dq_parent') }} WHERE n > 0",
        ),
    )
    prod = prepared_engine(spark, sf_dir)
    prod.register(*specs, replace=True)
    prod.build(select=["dq_child"], fail_fast=True)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    state = os.path.join(
        tempfile.gettempdir(), f"dbt_spark_defer_state_{tag}.json"
    )
    prod.write_state(state)

    dev = prepared_engine(spark, sf_dir, env="dev")
    spark.sql("CREATE DATABASE IF NOT EXISTS datamart_dev")
    spark.sql("DROP TABLE IF EXISTS datamart_dev.dq_parent")
    dev.register(*specs, replace=True)
    dev.build(select=["dq_child"], defer=True, state=state, fail_fast=True)

    from pyspark.sql import functions as F

    exists = spark.catalog.tableExists("datamart_dev.dq_parent")
    return spark.table("datamart_dev.dq_child").select(
        "st", "n", F.lit(exists).alias("dev_parent_exists")
    )


# Extension operators register themselves on import (must come after
# ``register`` is defined — the circular import is intentional and safe).
from . import operators  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from .sources import format_queries  # noqa: E402,F401


# --------------------------------------------------------------------------
# Driver-window curation.
#
# The driver hard-checks the FIRST 50 registry entries (list(QUERIES)[:50])
# against their DuckDB oracles; everything after slot 50 only gets the local
# verify. Import order alone packed round 1's window with near-duplicates of
# the same families while similarity, text, multimodal, profiling, graph,
# streaming, UDTF, and source-format queries sat past the cut with zero
# driver evidence. This explicit window puts one-or-more representatives of
# EVERY operator family (all 14 operator modules + streaming + sources +
# the 3 reference-parity queries) inside the checked prefix. Registration
# order of the remaining 100+ queries is preserved after the window.
# --------------------------------------------------------------------------

_CURATED_WINDOW = (
    # reference parity (SURVEY §2.1/§2.2) — r12: ref_parse_datetime (11
    # greens), ref_tvf_param (11) and ref_incremental_mart (9) rotate
    # out per the VERDICT r11 #2 debt burn-down; the reference family
    # keeps NINE in-window rows (datamart E2E + the six round-11 dbt
    # surfaces + the two round-12 promotions below), strict
    # PARSE_DATETIME stays pytest-pinned by the 62 golden vectors
    "ref_datamart_e2e",
    # round-12 promotions (queued round-11 candidates, VERDICT r11 #2):
    # dbt 1.5 model versions (latest/pinned ref routing) and --defer
    # --state (child built against the prod manifest)
    "ref_model_versions",
    "ref_defer_state",
    # round-11 promotions (VERDICT r10 #1/#6): the round-10-new dbt
    # surfaces earn hard driver rows — SCD2 snapshots (both dbt
    # strategies incl. hard-delete invalidation), the dbt test command
    # (four generic tests + a singular test, dbt row-count failure
    # semantics per ADVICE r10), source freshness, the python-model
    # surface, and the user-shaped LLM-corpus project tree
    "ref_snapshot_scd2",
    "ref_snapshot_check",
    "ref_schema_tests",
    "ref_source_freshness",
    "ref_python_model",
    "ref_llm_corpus_project",
    # (r11: q1_pricing_summary — 10 greens — rotates out; scan+agg
    # stays exercised through the pipeline rows and verify_driver)
    # join / window / grouping shapes (r7: semi_anti_join + cube_orders
    # rotate out after 4+ green rounds) (r11: window_funcs_suite — 10
    # greens — and events_sessionize — 10 — rotate out) (r12:
    # asof_click_attribution — 11 greens — rotates out; the join family
    # gets two FIRST-TIME rows instead: the TPCH waiting-suppliers
    # exists/not-exists multi-join and the per-brand top-k window rank)
    "q21_waiting_suppliers",
    "window_top_parts_per_brand",
    # timeseries — FIRST-TIME family row (the family had no in-window
    # rep since timeseries_gapfill rotated out in r9; EWMA is the
    # round-6 scale-mismatch lesson made driver-checkable)
    "timeseries_ewma",
    # stats (r11: stats_approx_sketches — 9 greens — rotates out; the
    # stats family's driver row moves to the regr_slope/intercept
    # built-in trend, first-time row per VERDICT r10 #6 debt burn-down)
    "stats_regression_trend",
    # BigQuery-dialect transpiler (r11: bq_dialect_qualify — 10
    # greens — rotates out) (r12: FIRST-TIME dialect row — the HLL
    # sketch-merge rollup, the dialect's approximate-aggregation
    # surface — replaces the rotated ref_parse_datetime as the
    # in-window dialect rep)
    "bq_dialect_hll_rollup",
    # hybrid retrieval (BM25 + ANN + reciprocal-rank fusion composed)
    "retrieval_rrf_fusion",
    # dedup family — round 9 promotes the full round-8 surface: the
    # erasure matrix (tombstone overlay + fold for the LSH index and
    # the exact ledger), LSH capacity planning, and the hot-bucket-
    # capped pairing. dedup_exact (8 greens), dedup_minhash_survivors
    # (8) and dedup_incremental_near (3) rotate out (all stay
    # verify_driver-checked; exact stays repped by incr_exact_indexed +
    # the two new exact rows, LSH by incr_near_indexed + the three new
    # LSH rows)
    # (r11: dedup_incr_near_indexed — 4 greens — rotates out; the
    # layered near-dup admission stays repped by the auto-compaction
    # and streaming-gate rows) (r12: dedup_incr_exact_indexed — 4
    # greens — rotates out; exact admission stays repped by
    # dedup_exact_auto_compacted + the exact forget/stream rows)
    "dedup_index_forget",
    "dedup_exact_forget",
    "dedup_lsh_bucket_stats",
    "dedup_minhash_capped",
    # round-10 promotions (VERDICT r9 #1): the LSM auto-compaction
    # gates and streaming erasure earn driver rows; dedup_block_removal
    # (4 greens) and dedup_containment (3) rotate out — LSH stays
    # repped by six in-window rows
    "dedup_near_auto_compacted",
    "dedup_exact_auto_compacted",
    "stream_near_dup_forget",
    "stream_exact_forget",
    # similarity search / embedding analytics — round 9 promotes the
    # embedding-side erasure lifecycle and the IVF retrain trigger
    # (sim_topk_brute rotates out after 7 green rounds; serving stays
    # repped by ivfpq/hamming/range + the persisted-IVF rows)
    # (r10: sim_ivfpq_adc — 4 greens — and sim_hamming_topk — 3 —
    # rotate out; their serving quality stays in-window through
    # sim_ann_eval_metrics, which scores BOTH against brute ground
    # truth) (r11: sim_range_search — 4 greens — rotates out; serving
    # quality stays in-window through sim_ann_eval_metrics and the new
    # autotune/policy rows below)
    # (r12: sim_ivf_upsert — 4 greens — rotates out; the frozen-
    # centroid upsert path stays exercised inside the retrain rows)
    "sim_ivf_trained_indexed",
    "sim_ivf_forget",
    "sim_ivf_drift_stats",
    # round-10 promotions: the retrain lifecycle (execution + the
    # epoch-2 cycle that makes GC driver-checkable), streaming erasure
    # on the vector side, and the ANN serving-quality dashboard
    "sim_ivf_retrain",
    "sim_ivf_retrain_epoch2",
    "stream_ivf_forget",
    "sim_ann_eval_metrics",
    # round-11 promotions: the policy gate closing the drift-trigger ->
    # retrain loop and the dashboard-consuming dial autotuner (both
    # round-10-new, queued per VERDICT r10 #1)
    "sim_ivf_retrain_policy",
    "sim_ann_autotune",
    # (r10: emb_label_propagation — 4 greens — rotates out) (r12:
    # emb_knn_graph — 6 greens — rotates out; the embedding family's
    # driver row moves to the FIRST-TIME k-center seeding loop, whose
    # r12 refcounted-persist change this row now pins)
    "emb_kcenter_init",
    # arrow grouped-map surface — FIRST-TIME row (the family's only
    # query; its r11 bucketed grouped-map rewrite gets driver evidence)
    "pandas_user_trend",
    # text analysis / quality / data selection (r9: text_bigram_lm_nll
    # rotates out after 5 green rounds — the bigram LM stays exercised
    # in-window through ccnet_perplexity_buckets, which scores with it)
    # (r10: text_bm25_topk — 4 greens — rotates out, BM25 stays
    # in-window composed inside retrieval_rrf_fusion;
    # dsir_importance_weights — 6 greens — rotates out, the weights
    # stay exercised through dsir_select_topk which selects on them)
    # (r12: dsir_select_topk — 6 greens —, quality_c4_rules — 6 — and
    # quality_classifier_score — 5 — rotate out; quality keeps ccnet,
    # selection's row moves to the FIRST-TIME leakage-free group split,
    # text gains the FIRST-TIME shingle-fingerprint row, pinning its
    # r11 ensure_min_partitions rewrite)
    "split_group_leakage_free",
    "text_fingerprint",
    "ccnet_perplexity_buckets",
    # tokenizer training (r10: bpe_pair_counts — 5 greens — rotates
    # out; counts stay exercised as stage 1 of bpe_train_merges)
    # (r11: bpe_encode_corpus — 4 greens — rotates out; the trained
    # merge table stays in-window through bpe_train_merges)
    "bpe_train_merges",
    # multimodal (r11: mm_decode_features — 9 greens — rotates out)
    # (r12: the FIRST-TIME props-extract row joins — the two rows now
    # cover decode-only and decode+rewrite)
    "mm_resize_thumbs",
    "mm_props_extract",
    # profiling / graph / streaming (r11: profile_columns — 9 greens —
    # and graph_pagerank_converged — 7 — rotate out per VERDICT r10 #6;
    # each family keeps a first-time rep: the PII scanner's regex
    # sweep, and iterative BFS reachability over the event graph)
    # (r12: stream_hourly_rollup — 11 greens — and
    # stream_near_dup_admission — 5 — rotate out; streaming keeps six
    # rows and gains the FIRST-TIME transformWithState processor)
    "pii_scan",
    "graph_reachable_types",
    "stream_transform_with_state",
    # round-9 promotions: the exact gate's streaming composition and
    # the embedding-side streaming gate — with these the whole
    # {exact, near-dup, IVF} x {batch, streaming, erasure} matrix has
    # driver rows
    "stream_exact_admission",
    "stream_ivf_admission",
    # Python UDTF, source formats, VARIANT (r11: udtf_grouped_topk — 9
    # greens — and source_csv_roundtrip — 9 — rotate out per VERDICT
    # r10 #6) (r12: events_variant_extract — 8 greens — rotates out;
    # the events family's row moves to the FIRST-TIME signup->purchase
    # funnel, and the ORC round trip completes the source-format set)
    "udtf_sentence_stats",
    "source_jsonl_roundtrip",
    "source_orc_roundtrip",
    "funnel_signup_purchase",
    # pipeline audits (oracles embed the registered gate/dedup oracles)
    # — round 8 promotes the incremental-admission audit composing both
    # persisted gates (r11: pipeline_quality_funnel — 4 greens —
    # rotates out) (r12: pipeline_dedup_funnel — 6 greens — rotates
    # out; the family keeps the admission audit, which composes BOTH
    # persisted gates)
    "pipeline_incremental_admission",
)
# Rotated out in round 7 (all remain registered + verify_driver-checked):
# q2_min_cost_supplier, semi_anti_join, cube_orders, events_skew_salted,
# decimal_money_sum, sample_stratified, emb_mmr_diversify,
# emb_hard_negatives, mm_payload_dedup, stream_dedup, text_lang_id,
# stream_recovery_resume.
# Rotated out in round 8 (all remain registered + verify_driver-checked,
# each 3+ driver-green rounds, every family keeps >=1 in-window rep):
# dedup_semantic, dedup_shingle_fraction, sim_ivf_rerank,
# emb_kmeans_train, quality_gopher_rules.
# Rotated IN for round 8 (the five round-7 queue candidates):
# dedup_incr_exact_indexed (persisted hash set + admission ledger — the
# round-7 bench-crash fix), sim_ivf_trained_indexed (persisted
# trained-IVF index), sim_ivf_upsert (frozen-centroid index upsert +
# serve), pipeline_incremental_admission (both persisted gates
# composed), ccnet_perplexity_buckets (head/middle/tail selection).
# Rotated in round 9 (VERDICT r8 #1): all eight round-8-new operators
# promoted — stream_exact_admission, dedup_index_forget, sim_ivf_forget,
# dedup_exact_forget, sim_ivf_drift_stats, dedup_lsh_bucket_stats,
# dedup_minhash_capped, stream_ivf_admission. Displaced (each 3+ driver-
# green rounds, every family keeps >=1 in-window rep, all stay
# registered + verify_driver-checked): q9_product_profit (7 greens),
# timeseries_gapfill (8), stats_summary (8), dedup_exact (8),
# dedup_minhash_survivors (8), dedup_incremental_near (3),
# sim_topk_brute (7), text_bigram_lm_nll (5).
# Rotated in round 10 (VERDICT r9 #1): all eight round-9-new operators
# promoted — sim_ivf_retrain, sim_ivf_retrain_epoch2,
# dedup_near_auto_compacted, dedup_exact_auto_compacted,
# stream_near_dup_forget, stream_exact_forget, stream_ivf_forget,
# sim_ann_eval_metrics. Displaced (each 3+ driver-green rounds, every
# family keeps >=1 in-window rep, all stay registered +
# verify_driver-checked): dedup_block_removal (4 greens),
# dedup_containment (3), sim_ivfpq_adc (4), sim_hamming_topk (3),
# emb_label_propagation (4), text_bm25_topk (4), bpe_pair_counts (5),
# dsir_importance_weights (6).
# Rotated in round 11 (VERDICT r10 #1/#6): all eight queued round-10
# candidates promoted (sim_ivf_retrain_policy, sim_ann_autotune,
# ref_snapshot_scd2, ref_snapshot_check, ref_schema_tests,
# ref_source_freshness, ref_python_model, ref_llm_corpus_project) plus
# six FIRST-TIME rows burning down driver-row debt with family-
# preserving swaps (stats_regression_trend, mm_resize_thumbs, pii_scan,
# graph_reachable_types, udtf_sentence_stats, source_jsonl_roundtrip) —
# 14 first-time rows this round. Displaced (each 4+ driver-green
# rounds, every family keeps >=1 in-window rep, all stay registered +
# verify_driver-checked): q1_pricing_summary (10 greens),
# window_funcs_suite (10), events_sessionize (10), stats_approx_
# sketches (9), bq_dialect_qualify (10), mm_decode_features (9),
# profile_columns (9), graph_pagerank_converged (7),
# source_csv_roundtrip (9), udtf_grouped_topk (9),
# dedup_incr_near_indexed (4), sim_range_search (4),
# pipeline_quality_funnel (4), bpe_encode_corpus (4).
# Rotated in round 12 (VERDICT r11 #2): the two queued round-11 dbt
# surfaces (ref_model_versions, ref_defer_state) plus twelve FIRST-TIME
# rows burning driver-row debt with family-preserving swaps —
# q21_waiting_suppliers, window_top_parts_per_brand, timeseries_ewma
# (family had NO in-window rep since r9), bq_dialect_hll_rollup,
# emb_kcenter_init, pandas_user_trend, split_group_leakage_free,
# text_fingerprint, mm_props_extract, stream_transform_with_state,
# source_orc_roundtrip, funnel_signup_purchase — 14 first-time rows.
# Displaced (each 4+ driver-green rounds, every family keeps >=1
# in-window rep, all stay registered + verify_driver-checked):
# ref_parse_datetime (11 greens), ref_tvf_param (11),
# ref_incremental_mart (9), asof_click_attribution (11),
# stream_hourly_rollup (11), events_variant_extract (8),
# dsir_select_topk (6), quality_c4_rules (6), quality_classifier_score
# (5), pipeline_dedup_funnel (6), emb_knn_graph (6),
# stream_near_dup_admission (5), dedup_incr_exact_indexed (4),
# sim_ivf_upsert (4).
# Queued round-13 window candidates (registered, verify_driver-checked,
# benched — awaiting a driver slot): never-checked family siblings —
# train_split_shards, stream_stream_join, distinct_bitmap_users,
# text_repetition_stats, fuzzy_name_pairs, market_basket_pairs,
# graph_pagerank_step, global_row_ids.


def curated_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The registry with the curated window first.

    Called lazily (from ``__spark_entry__``), NOT at import time: a Spark
    Python worker unpickling an operator UDF re-enters this module mid-
    circular-import with only part of the registry populated, so an
    import-time reorder/validation would crash every executor task. By
    the time the driver asks for the contract surface, every module has
    registered.
    """
    missing = [n for n in _CURATED_WINDOW if n not in QUERIES]
    if missing:  # fail loudly: a rename must update the window
        raise RuntimeError(f"curated driver window names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in _CURATED_WINDOW}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    return ordered
