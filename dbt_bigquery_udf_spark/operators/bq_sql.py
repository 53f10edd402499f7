"""End-to-end BigQuery-dialect SQL queries.

The dialect layer (functions/dialect.py) is unit-tested expression by
expression; these queries put whole BigQuery *statements* through
``transpile_bq_expr`` -> ``spark.sql`` under the driver's DuckDB oracle
gate — the workflow a user migrating the reference's 1000-model
production project (reference: README.md:329) actually runs: paste the
BigQuery model body, get Spark results.

Both queries exercise constructs Spark lacks natively:

- ``QUALIFY`` (window filter clause) — rewritten to a subquery filter;
  DuckDB supports QUALIFY natively, so the oracle states the same
  intent in its own dialect.
- ``STRING_AGG(expr, delim ORDER BY ...)`` — rewritten to
  ``listagg ... WITHIN GROUP``.

Scale: both rewrites are pure plan transformations. The QUALIFY
subquery adds no shuffle beyond the window itself (one exchange on the
partition key); the ordered STRING_AGG sorts only within each group's
collected values, never globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.dialect import transpile_bq_expr
from ..queries import register
from .analytics import _src


@register(
    "bq_dialect_qualify",
    """
    SELECT user_id, ts, event_type FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) = 1
    """,
)
def bq_dialect_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user, stated with BigQuery's QUALIFY clause.

    The transpiler rewrites QUALIFY into
    ``SELECT * EXCEPT(__qualify__) FROM (...) WHERE __qualify__``;
    Catalyst then plans the usual window-rank dedup: one shuffle on
    user_id, rank inside each partition, filter before anything else
    consumes the rows. Same physical plan as dedup_latest_version's
    DataFrame formulation — the clause is sugar, not a new operator.
    """
    _src(spark, sf_dir)
    bq = """
    SELECT user_id, ts, event_type FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) = 1
    """
    return spark.sql(transpile_bq_expr(bq))


@register(
    "bq_dialect_string_agg",
    """
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def bq_dialect_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation via BigQuery's STRING_AGG.

    ``STRING_AGG(x, d ORDER BY k)`` -> ``listagg(x, d) WITHIN GROUP
    (ORDER BY k)``. The ORDER BY is per-group (sorts each group's
    collected values), so the plan is a plain hash aggregate — no
    global sort at any scale.
    """
    _src(spark, sf_dir)
    bq = """
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """
    return spark.sql(transpile_bq_expr(bq))


@register(
    "bq_dialect_hll_rollup",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS hll_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def bq_dialect_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery's mergeable approximate-distinct workflow, verbatim:
    ``HLL_COUNT.INIT`` per (event_type, day) — the sketch table a real
    pipeline materializes — then ``HLL_COUNT.MERGE`` rolls days up to
    per-type estimates without rescanning the facts. The transpiler
    maps the family onto Spark's Datasketches HLL (hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate).

    Driver contract: the sketch estimate is engine-specific, so the
    checkable output is the exact per-type distinct (which DuckDB
    recomputes) plus a Spark-side flag pinning the day-merged HLL
    estimate within 5% of it — the oracle asserts the flag TRUE, so a
    broken sketch/merge path hash-fails instead of going ungraded
    (round 1 recorded this row as err:no_oracle).
    tests/test_sketches.py additionally pins the estimates locally.

    Scale: identical argument to distinct_bitmap_users, with fixed-size
    (~2^lgConfigK bytes) sketch state instead of exact bitmaps — the
    trade every 100 TB audience-counting pipeline chooses when keys are
    unbounded (the day-level sketch table re-aggregates to any grain).
    """
    from pyspark.sql import functions as F

    _src(spark, sf_dir)
    bq = """
    WITH daily AS (
      SELECT event_type, DATE(ts) AS day,
             HLL_COUNT.INIT(user_id, 14) AS sk
      FROM events GROUP BY event_type, day
    )
    SELECT event_type, HLL_COUNT.MERGE(sk) AS approx_users
    FROM daily GROUP BY event_type ORDER BY event_type
    """
    hll = spark.sql(transpile_bq_expr(bq))
    exact = spark.sql(
        "SELECT event_type, count(DISTINCT user_id) AS exact_users "
        "FROM events GROUP BY event_type"
    )
    return (
        hll.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("hll_within_5pct"),
        )
        .orderBy("event_type")
    )
