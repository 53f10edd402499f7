"""General analytics operators over the TPC-H-ish tables.

The reference itself contains no joins/aggregations (SURVEY.md §2.3), but
the engine is mandated to be a complete data-processing layer
(BASELINE.json north star), and these queries are the bench headliners.
Each is written DataFrame-first, lets Catalyst pick the physical strategy,
and is annotated with its 100 TB scale story.

Float policy: every double aggregate is rounded (2-6 decimals) in BOTH
the Spark query and the DuckDB oracle so order-of-summation ulp noise
cannot flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import _money
from ._money import disc_revenue_sum as _disc_revenue_sum
from ..queries import register
from ..sources.registry import register_sources


def _src(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return register_sources(spark, sf_dir)


# -- aggregation -----------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                   AS DOUBLE) / 100.0, 2) AS sum_base_price,
           round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                   AS DOUBLE) / 10000.0, 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                   AS DOUBLE) / (count(*) * 100.0), 6) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan -> partial agg -> final agg.

    The monetary aggregates run in EXACT integer units (cents; price x
    (1-discount) in 1e-4-dollar units — both inputs carry exactly two
    decimals, so the per-row products are integers), summed in
    decimal/HUGEINT, with one double division at the end: raw
    double sums fold in engine- and partition-order and a half-boundary
    ulp would flake the rounded column (the round-6 EWMA lesson).
    l_quantity is integer-valued, so its double sum is already exact in
    any order and stays as-is.

    Scale: map-side partial aggregation keeps the shuffle at
    |groups| x |partitions| rows — a few KB even at 100 TB; the parquet
    scan prunes to 6 of 11 columns and pushes the date filter down.
    Decimal(38,0) accumulation gives ~1e20 headroom over int64 (which
    would wrap silently under ANSI-off at ~2e12 rows of cents).
    """
    li = _src(spark, sf_dir)["lineitem"]
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    disc_c = F.round(F.col("l_discount") * 100, 0).cast("bigint")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                F.sum(cents.cast("decimal(38,0)")).cast("double") / 100.0, 2
            ).alias("sum_base_price"),
            F.round(
                F.sum((cents * (100 - disc_c)).cast("decimal(38,0)"))
                .cast("double")
                / 10000.0,
                2,
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(
                F.sum(cents.cast("decimal(38,0)")).cast("double")
                / (F.count(F.lit(1)) * 100.0),
                6,
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q6_revenue_forecast",
    """
    SELECT round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * CAST(round(l_discount * 100, 0) AS BIGINT))
                  AS DOUBLE) / 10000.0, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter + global agg — the pushdown showcase.

    Scale: all four predicates reach the parquet row-group statistics;
    a date-partitioned 100 TB layout would additionally prune partitions.
    """
    li = _src(spark, sf_dir)["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.02, 0.09)
        & (F.col("l_quantity") < 24)
    ).agg(
        # exact 1e-4-dollar integer units, one double division (the
        # round-6 order-free-sum discipline; see q1)
        F.round(
            F.sum(
                (
                    F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
                    * F.round(F.col("l_discount") * 100, 0).cast("bigint")
                ).cast("decimal(38,0)")
            ).cast("double")
            / 10000.0,
            2,
        ).alias("revenue")
    )


# -- joins ----------------------------------------------------------------


@register(
    "q3_top_orders",
    """
    SELECT o.o_orderkey, round(CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter -> fact joins -> top-k.

    Scale: customer(filtered) broadcasts under AQE thresholds; the
    lineitem-orders join shuffles on orderkey (co-partitionable via
    bucketing at deploy time). ORDER BY + LIMIT executes as TakeOrdered —
    no global sort.
    """
    s = _src(spark, sf_dir)
    c = s["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    return (
        s["orders"]
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(s["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _disc_revenue_sum().alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_volume",
    """
    SELECT n.n_name, round(CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join rolled up to nation.

    Scale: supplier/nation/region are classic broadcast dims (KB-MB at
    any SF); only lineitem streams. One shuffle for the final group-by.
    """
    s = _src(spark, sf_dir)
    r = s["region"].filter(F.col("r_name") == "ASIA")
    return (
        s["lineitem"]
        .join(F.broadcast(s["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(s["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            _disc_revenue_sum().alias(
                "revenue"
            )
        )
    )


@register(
    "semi_anti_join",
    """
    SELECT
      (SELECT count(*) FROM customer c WHERE EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
      ) AS with_big_order,
      (SELECT count(*) FROM customer c WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ) AS never_ordered
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti joins (EXISTS / NOT EXISTS).

    Scale: both sides shuffle on custkey; semi/anti avoid materializing
    payload columns from the probe side. Both joins build against ONE
    persisted per-customer rollup of orders (max price per custkey), so
    the fact table is scanned once (measured via stage metrics) and the
    build sides are |customers|-sized — semantics are unchanged because
    EXISTS(price > X) == max(price) > X and NOT EXISTS == key absent
    from the rollup.
    """
    s = _src(spark, sf_dir)
    per_cust = (
        s["orders"]
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("max_price"))
        .persist()
    )
    big = per_cust.filter(F.col("max_price") > 200000)
    with_big = s["customer"].join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
    never = s["customer"].join(
        per_cust, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return with_big.agg(F.count(F.lit(1)).alias("with_big_order")).crossJoin(
        never.agg(F.count(F.lit(1)).alias("never_ordered"))
    )


# -- window functions ------------------------------------------------------


@register(
    "window_top_parts_per_brand",
    """
    SELECT p_brand, p_partkey, p_retailprice, rk FROM (
      SELECT p_brand, p_partkey, round(p_retailprice, 2) AS p_retailprice,
             rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
      FROM part
    ) WHERE rk <= 3
    """,
)
def window_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window.

    Scale: one shuffle on the partition key; rank+filter avoids a global
    sort. Skewed brands are AQE-splittable since rank only needs
    per-partition order.
    """
    p = _src(spark, sf_dir)["part"]
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.round("p_retailprice", 2).alias("p_retailprice"),
            F.rank().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "window_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (ordered frame)."""
    o = _src(spark, sf_dir)["orders"]
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


# -- set operations, distinct, rollup -------------------------------------


@register(
    "set_ops_nations",
    """
    SELECT n_nationkey FROM (
      SELECT s_nationkey AS n_nationkey FROM supplier
      INTERSECT
      SELECT c_nationkey FROM customer
    ) ORDER BY n_nationkey
    """,
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (nations having both suppliers and customers)."""
    s = _src(spark, sf_dir)
    return (
        s["supplier"]
        .select(F.col("s_nationkey").alias("n_nationkey"))
        .intersect(s["customer"].select(F.col("c_nationkey").alias("n_nationkey")))
        .orderBy("n_nationkey")
    )


@register(
    "rollup_orders",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grouping sets)."""
    o = _src(spark, sf_dir)["orders"]
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@register(
    "distinct_counts",
    """
    SELECT count(DISTINCT l_partkey) AS parts, count(DISTINCT l_suppkey) AS supps,
           count(*) AS rows_total
    FROM lineitem
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts (expand + two-phase agg).

    Scale: for dashboards at 100 TB, swap to approx_count_distinct (HLL,
    no expand) — kept exact here for oracle parity; the approx variant is
    exercised rows-only in tests.
    """
    li = _src(spark, sf_dir)["lineitem"]
    return li.agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_suppkey").alias("supps"),
        F.count(F.lit(1)).alias("rows_total"),
    )


# -- events: JSON + time-series -------------------------------------------


@register(
    "events_json_extract",
    """
    SELECT event_type,
           count(*) AS n,
           -- outer CAST: DuckDB sum(BIGINT) yields HUGEINT, which pandas
           -- materializes as float64 and the driver's dtype-sensitive hash
           -- rejects against Spark's int64 (round-1 hash-fail)
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           round(sum(value), 2) AS value_sum
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON property extraction + aggregation.

    Scale: get_json_object is codegen'd JVM-side; for hot paths a
    one-time parse to a struct column (from_json at ingest) amortizes.
    """
    ev = _src(spark, sf_dir)["events"]
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("k_sum"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


@register(
    "events_hourly_windows",
    """
    SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS n,
           round(sum(value), 2) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over event time (batch form of the
    streaming hourly rollup in streaming/pipelines.py)."""
    ev = _src(spark, sf_dir)["events"]
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))


@register(
    "events_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + cumulative sum —
    the canonical batch session operator.

    Scale: two window passes over one shuffle by user_id; at 100 TB,
    pre-bucketing by user_id makes this shuffle-free. The streaming
    equivalent (applyInPandasWithState) lives in streaming/pipelines.py.
    """
    ev = _src(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_exceeded = (F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")
    with_flag = ev.withColumn(
        "new_session",
        F.when(prev_ts.isNull() | gap_exceeded, 1).otherwise(0),
    )
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = with_flag.withColumn(
        "session_id", F.sum("new_session").over(wsum).cast("bigint")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# -- as-of join ------------------------------------------------------------


@register(
    "asof_click_attribution",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), views AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
           v.ts AS asof_view_ts, v.event_id AS asof_view_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (attribution): each click matched to the same user's
    most recent view at-or-before the click — an operator Spark lacks
    natively, composed as union + one window pass.

    Implementation: tag the two event streams, sort-merge them inside a
    single window partitioned by user (views sort before clicks on ties
    to get >= semantics), and carry the last view forward with
    ``last(..., ignorenulls=True)``. Clicks with no prior view keep
    NULLs (left-join semantics).

    Scale: ONE shuffle on user_id and a linear scan per user — no range
    join, no per-click probe. This is the standard big-data as-of shape;
    a range-partitioned variant handles single-key skew. The oracle is
    DuckDB's native ASOF LEFT JOIN.
    """
    ev = _src(spark, sf_dir)["events"]
    tagged = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "view").alias("is_view"),
    )
    # Views first on (impossible-here) ts ties => 'at or before' semantics.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("is_view").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    view_ts = F.last(F.when(F.col("is_view"), F.col("ts")), ignorenulls=True).over(w)
    view_id = F.last(F.when(F.col("is_view"), F.col("event_id")), ignorenulls=True).over(w)
    carried = tagged.select(
        "event_id", "user_id", "ts", "is_view",
        view_ts.alias("asof_view_ts"), view_id.alias("asof_view_id"),
    )
    clicks = carried.filter(~F.col("is_view"))
    # Explicit LTZ cast: plain "timestamp" resolves to NTZ under the
    # session's timestampType, which unix_micros rejects. Session TZ is
    # UTC, so the LTZ reinterpretation matches DuckDB's epoch_us.
    gap = (
        F.expr("unix_micros(cast(ts as timestamp_ltz))")
        - F.expr("unix_micros(cast(asof_view_ts as timestamp_ltz))")
    )
    return clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        "asof_view_ts",
        "asof_view_id",
        gap.alias("gap_us"),
    )


# -- statistics aggregates -------------------------------------------------


@register(
    "stats_summary",
    """
    -- mean/sd/corr from EXACT integer moments (cents, 1e-2 discount
    -- units): integer sums are order-free; doubles appear only in the
    -- final division/sqrt on identical operands. Raw avg/stddev/corr
    -- fold doubles in engine order — the latent half-boundary class.
    -- Variance factors convert to double BEFORE multiplying (their
    -- int128 product would overflow at large SF).
    SELECT l_returnflag,
           count(*) AS n,
           round(CAST(sum(cents) AS DOUBLE) / (count(*) * 100.0), 2)
             AS avg_price,
           round(sqrt(CAST(count(*) * sum(cents * cents)
                           - sum(cents) * sum(cents) AS DOUBLE)
                      / (count(*) * (count(*) - 1))) / 100.0, 2)
             AS sd_price,
           round(CAST(count(*) * sum(cents * disc)
                      - sum(cents) * sum(disc) AS DOUBLE)
                 / (sqrt(CAST(count(*) * sum(cents * cents)
                              - sum(cents) * sum(cents) AS DOUBLE))
                    * sqrt(CAST(count(*) * sum(disc * disc)
                                - sum(disc) * sum(disc) AS DOUBLE))), 4)
             AS price_discount_corr,
           quantile_cont(cents, 0.5) AS p50_cents,
           quantile_cont(cents, 0.9) AS p90_cents,
           quantile_cont(cents, 0.99) AS p99_cents
    FROM (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
             CAST(round(l_discount * 100, 0) AS BIGINT) AS disc
      FROM lineitem
    )
    GROUP BY l_returnflag
    """,
)
def stats_summary(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Statistical aggregates: stddev, correlation, interpolated
    percentiles per return flag.

    Scale: count/avg/stddev/corr are single-pass partial aggregates.
    ``approx=False`` (the oracle-exact default) computes exact
    percentiles, whose per-group value map concentrates on one reducer —
    fine for a handful of groups at bench scale. ``approx=True`` is the
    100 TB form: ``percentile_approx`` keeps fixed-size mergeable
    quantile state with map-side partials (plan-pinned in
    tests/test_plans.py to contain no exact ``percentile``), trading
    <=1/accuracy rank error for constant memory.

    Perf: the three quantiles go through ONE array-percentile
    aggregate, not three scalar ones — each scalar percentile builds its
    own full state per group, tripling partial-aggregate state
    and time (measured 10x slower at sf0.1).
    """
    li = _src(spark, sf_dir)["lineitem"]
    # Percentiles over integer cents: interpolated midpoints are then
    # exact halves (representable in binary), so no rounding step exists
    # for a 1-ulp engine difference to flip — dollar-scale round(x, 2)
    # mismatched DuckDB at an exact half-cent midpoint.
    cents = "cast(round(l_extendedprice * 100) as bigint)"
    pct = (
        f"percentile_approx({cents}, array(0.5, 0.9, 0.99), 10000)"
        if approx
        else f"percentile({cents}, array(0.5, 0.9, 0.99))"
    )
    # mean/sd/corr from EXACT integer moments (cents, 1e-2 discount
    # units): order-free integer sums; doubles only in the final
    # division/sqrt on identical operands (built-in avg/stddev/corr
    # fold doubles in partition order — the latent half-boundary class).
    # Variance factors convert to double BEFORE multiplying (their
    # decimal product would overflow 38 digits at large SF).
    cents_c = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    disc_c = F.round(F.col("l_discount") * 100, 0).cast("bigint")
    n = F.count(F.lit(1))
    sx = F.sum(cents_c.cast("decimal(38,0)"))
    sxx = F.sum((cents_c * cents_c).cast("decimal(38,0)"))
    sy = F.sum(disc_c.cast("decimal(38,0)"))
    syy = F.sum((disc_c * disc_c).cast("decimal(38,0)"))
    sxy = F.sum((cents_c * disc_c).cast("decimal(38,0)"))
    mx = (n * sxx - sx * sx).cast("double")
    my = (n * syy - sy * sy).cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            F.round(sx.cast("double") / (n * F.lit(100.0)), 2).alias(
                "avg_price"
            ),
            # try_divide: a single-row group (n*(n-1) = 0) or a
            # zero-variance column (sqrt(mx)*sqrt(my) = 0) is NULL
            # stddev/corr like the oracle's sample formulas, not an
            # ANSI DIVIDE_BY_ZERO (round-8 hypothesis find)
            F.round(
                F.sqrt(
                    F.try_divide(mx, (n * (n - F.lit(1))).cast("double"))
                )
                / F.lit(100.0),
                2,
            ).alias("sd_price"),
            F.round(
                F.try_divide(
                    (n * sxy - sx * sy).cast("double"),
                    F.sqrt(mx) * F.sqrt(my),
                ),
                4,
            ).alias("price_discount_corr"),
            F.expr(pct).alias("_pcts"),
        )
        .select(
            "l_returnflag",
            "n",
            "avg_price",
            "sd_price",
            "price_discount_corr",
            F.col("_pcts")[0].alias("p50_cents"),
            F.col("_pcts")[1].alias("p90_cents"),
            F.col("_pcts")[2].alias("p99_cents"),
        )
    )


@register(
    "stats_approx_sketches",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS hll_within_2pct,
           TRUE AS p50_within_1pct,
           TRUE AS p90_within_1pct,
           TRUE AS p99_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB substitutes for their exact
    forms: HyperLogLog++ distinct counts and quantile sketches compose
    over partitions with fixed memory, where exact percentile would
    concentrate a group's values on one reducer.

    Driver contract: sketch estimates are engine-specific, so the
    checkable output is the EXACT value plus per-sketch tolerance flags
    computed Spark-side (estimate vs exact in the same plan); the oracle
    recomputes the exact values and pins every flag TRUE. A broken
    sketch flips a flag and the driver hash-fails — a strictly stronger
    check than round 1's rows-only declaration (whose array-typed
    output also crashed the driver's canonicalizer; scalars only now).

    Scale: the estimate side is the part you'd keep at 100 TB — HLL++
    and KLL-style quantile state merge map-side with fixed memory. The
    exact side here is sf-scale verification scaffolding.
    """
    li = _src(spark, sf_dir)["lineitem"]
    pcts = F.expr(
        "percentile_approx(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
    )
    exact_pcts = F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
    # Exact distinct via two-level agg, NOT countDistinct alongside the
    # percentile aggregates: mixing distinct and non-distinct aggregates
    # plans an Expand that duplicates every row AND every percentile
    # buffer per task (OOMs a default-heap local[8] session).
    exact = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    # DataSketches HLL (round 12, guide §5/§7.2): approx_count_distinct
    # at rsd=0.005 plans an HLL++ buffer of 6557 longs FLATTENED INTO
    # PLAN ATTRIBUTES — every invocation re-paid analysis/codegen over
    # that schema (isolated min 3.9s). hll_sketch_agg keeps the state as
    # ONE binary column (3.9s -> 2.1s measured, flags unchanged at all
    # SFs). Accuracy margin vs the oracle's 2% tolerance IMPROVES:
    # lgConfigK=16 gives rse ~= 1.04/sqrt(2^16) = 0.41% (~4.9 sigma)
    # vs rsd=0.005 (4 sigma).
    sketches = li.groupBy("l_returnflag").agg(
        F.expr(
            "hll_sketch_estimate(hll_sketch_agg(l_orderkey, 16))"
        ).alias("approx_orders"),
        pcts.alias("apx"),
        exact_pcts.alias("ex"),
    )
    agg = sketches.join(F.broadcast(exact), "l_returnflag")

    def within(est, exact, tol):
        return F.abs(est - exact) <= tol * F.abs(exact)

    return agg.select(
        "l_returnflag",
        "exact_orders",
        within(F.col("approx_orders"), F.col("exact_orders"), 0.02).alias(
            "hll_within_2pct"
        ),
        within(F.col("apx")[0], F.col("ex")[0], 0.01).alias("p50_within_1pct"),
        within(F.col("apx")[1], F.col("ex")[1], 0.01).alias("p90_within_1pct"),
        within(F.col("apx")[2], F.col("ex")[2], 0.01).alias("p99_within_1pct"),
    )


# -- skew-safe aggregation (salting) ---------------------------------------

N_SALTS = 16


@register(
    "events_skew_salted",
    f"""
    SELECT event_type, count(*) AS n,
           -- value is an arbitrary double: quantize each addend to
           -- integer 1e-6 units so partial sums are order-free across
           -- salts/partitions; one division per output column
           {_money.micro_sum_sql("value", 2)} AS value_sum,
           {_money.micro_avg_sql("value", 6)} AS value_avg
    FROM events
    GROUP BY event_type
    """,
)
def events_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a low-cardinality (skew-prone)
    key: stage 1 groups by (key, salt) spreading each hot key over
    N_SALTS reducers; stage 2 merges the partials per key.

    The salt is derived from a stable row attribute (not rand()) so the
    result is deterministic and the oracle is the plain GROUP BY —
    salting must be a pure execution-strategy change, invisible in the
    result. avg is re-derived from (sum, count) partials since partial
    averages don't compose.

    Scale: with 5 event types and 1000 executors, the unsalted shuffle
    sends each type to ONE reducer (5 cores busy, 995 idle); salting
    fans each type over 16. AQE's skew handling covers joins; salting
    remains the tool for skewed *aggregations*.
    """
    ev = _src(spark, sf_dir)["events"]
    salted = ev.withColumn("salt", (F.col("event_id") % N_SALTS))
    # integer 1e-6-unit partials: order-free across salts AND partitions
    # (raw double partials fold in salt order, the oracle in scan order —
    # a latent half-boundary ulp); one division per output column
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(
            F.round(F.col("value") * 1e6, 0).cast("bigint").cast("decimal(38,0)")
        ).alias("psum_micro"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("psum_micro").cast("double") / F.lit(1e6), 2).alias(
            "value_sum"
        ),
        F.round(
            F.sum("psum_micro").cast("double")
            / (F.sum("pn") * F.lit(1e6)),
            6,
        ).alias("value_avg"),
    )


# -- extended window-function suite ----------------------------------------


@register(
    "window_funcs_suite",
    """
    SELECT o_orderkey, o_custkey,
           lead(o_totalprice) OVER w AS next_price,
           lag(o_totalprice) OVER w AS prev_price,
           ntile(4) OVER w AS quartile,
           round(cume_dist() OVER w, 6) AS cdist,
           round(percent_rank() OVER w, 6) AS prank,
           dense_rank() OVER w AS drank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining window-function families in one query: lead/lag
    (offset), ntile (bucketing), cume_dist / percent_rank
    (distribution), dense_rank (ranking) — all over one window spec, so
    one shuffle + one sort serves every function."""
    o = _src(spark, sf_dir)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.dense_rank().over(w).alias("drank"),
    )


# -- interval (range) join -------------------------------------------------


@register(
    "interval_join_errors",
    """
    WITH cv AS (
      SELECT user_id, ts FROM events WHERE event_type IN ('click', 'view')
    ), gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS ns
      FROM cv
    ), s AS (
      SELECT user_id, ts,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    ), sessions AS (
      SELECT user_id, sid, min(ts) AS session_start, max(ts) AS session_end
      FROM s GROUP BY user_id, sid
    ), errors AS (
      SELECT user_id, ts FROM events WHERE event_type = 'error'
    )
    SELECT se.user_id, se.session_start, se.session_end,
           count(*) AS n_errors
    FROM sessions se JOIN errors e
      ON e.user_id = se.user_id
     AND e.ts BETWEEN se.session_start AND se.session_end
    GROUP BY se.user_id, se.session_start, se.session_end
    """,
)
def interval_join_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: error events matched into the click/view
    sessions that contain them, counted per session.

    A naive non-equi join plans as a nested-loop; this implementation
    *bins* both sides by hour: each session explodes into the hour bins
    it spans, each error has exactly one bin, and the join becomes an
    equi join on (user_id, bin) followed by the exact range filter. An
    error matches a session through exactly one bin, so no dedup pass
    is needed.

    Scale: the equi join shuffles on (user_id, bin) — partitionable,
    AQE-skew-splittable — and the per-bin candidate set is bounded by
    bin width, not table size. This binning is the standard distributed
    interval-join strategy; bin width trades fan-out (rows per session)
    against selectivity (candidates per bin). Events is read twice by
    design — the two sides are DIFFERENT slices (click/view vs error)
    with different predicates, each pushed into its own pruned columnar
    scan; one shared scan would have to read the union of columns and
    rows for both sides.
    """
    ev = _src(spark, sf_dir)["events"]
    cv = ev.filter(F.col("event_type").isin("click", "view")).select("user_id", "ts")
    w = W.partitionBy("user_id").orderBy("ts")
    prev_ts = F.lag("ts").over(w)
    flag = F.when(
        prev_ts.isNull() | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    s = cv.withColumn("ns", flag).withColumn(
        "sid",
        F.sum("ns").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    sessions = s.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"), F.max("ts").alias("session_end")
    )
    binned_sessions = sessions.select(
        "user_id",
        "session_start",
        "session_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "session_start").cast("timestamp_ntz"),
                F.date_trunc("hour", "session_end").cast("timestamp_ntz"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bin"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("err_ts"),
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bin"),
    )
    joined = binned_sessions.join(errors, ["user_id", "bin"]).filter(
        F.col("err_ts").between(F.col("session_start"), F.col("session_end"))
    )
    return joined.groupBy("user_id", "session_start", "session_end").agg(
        F.count(F.lit(1)).alias("n_errors")
    )


@register(
    "decimal_money_sum",
    """
    -- VARCHAR serialization: DuckDB DECIMAL comes back to pandas as float64
    -- while Spark DecimalType arrives as object(Decimal); the driver's
    -- dtype-sensitive hash rejects that even when the sums are identical
    -- (round-1 hash-fail). The string form is exact on both engines.
    SELECT l_returnflag,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,2)))
                AS VARCHAR) AS revenue,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,2))
               * CAST(l_discount * 100 AS DECIMAL(18,0))) AS VARCHAR) AS disc_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def decimal_money_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money arithmetic on DECIMAL, not DOUBLE: sums are EXACT and
    association-order-independent, so two engines (or two runs with
    different partitioning) agree to the cent — the property financial
    datamarts need and float aggregates cannot give (the BQ NUMERIC ->
    DECIMAL(38,9) mapping in the dialect layer exists for the same
    reason). The oracle needs no rounding: equality is exact.

    Scale: Spark's decimal aggregation uses fixed 128-bit state with
    map-side partials like any sum; the only cost vs double is ~2x
    ALU, never a shuffle or memory change.
    """
    li = _src(spark, sf_dir)["lineitem"]
    price = F.col("l_extendedprice").cast("decimal(18,2)").cast("decimal(38,2)")
    cents = (F.col("l_discount") * 100).cast("decimal(18,0)")
    # Decimal sums serialize to STRING for the driver contract: pandas maps
    # Spark DecimalType to object(Decimal) but DuckDB DECIMAL to float64,
    # so the dtype-sensitive hash can only agree on the exact string form.
    # The arithmetic itself stays DECIMAL end-to-end (the point of the op).
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("string").alias("revenue"),
        F.sum(price * cents).cast("string").alias("disc_cents"),
    )
