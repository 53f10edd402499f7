"""TPC-H-shaped analytics, wave 4+: the remaining canonical query shapes
over the driver's trimmed schema (no partsupp table, no commit/receipt
dates). Q2 and Q20 — the two that fundamentally need partsupp — are
adapted with lineitem-derived part-supplier relations (unit cost /
shipped volume standing in for ps_supplycost / ps_availqty), completing
all 22 canonical shapes; adaptations are noted per query.

The reference itself has no joins or aggregations (SURVEY.md §2.3); these
extend the engine's analytics surface with the classic multi-join /
correlated / distribution shapes the TPC-H suite exists to pin down.

Float policy: every double aggregate is rounded in BOTH the Spark query
and the DuckDB oracle so summation-order ulp noise cannot flip the
driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ._money import disc_revenue_sum as _disc_revenue_sum
from ..queries import register
from ..sources.registry import register_sources


def _src(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return register_sources(spark, sf_dir)


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts for orders with a late lineitem.

    Adaptation: the schema has no l_commitdate/l_receiptdate, so "late"
    is l_shipdate > o_orderdate + 90 days — same EXISTS-correlated
    semi-join shape, date columns swapped.

    Scale: the quarter filter prunes orders at the scan; the semi join
    shuffles on orderkey but carries only (orderkey, orderdate) from the
    build side and never materializes lineitem payload columns. Final
    aggregate is a few-groups rollup.
    """
    s = _src(spark, sf_dir)
    o = s["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    late = o.join(
        s["lineitem"],
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume_m4) AS DOUBLE) / 10000.0, 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l.l_shipdate) AS l_year,
             CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
               AS volume_m4
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    Scale: nation (25 rows) broadcasts twice; supplier broadcasts at any
    realistic dim/fact ratio. The only big-big join is
    lineitem-orders on orderkey (bucketing co-locates it at deploy
    time). The disjunctive nation pair filter is applied after the
    cheap broadcast joins, pre-aggregation, so the shuffled rollup input
    is only the matching pairs.
    """
    s = _src(spark, sf_dir)
    n1 = s["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = s["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        s["lineitem"]
        .join(s["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(s["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            # exact 1e-4-dollar integer units (round-6 order-free sums)
            (
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
                * (100 - F.round(F.col("l_discount") * 100, 0).cast("bigint"))
            ).alias("volume_m4"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("volume_m4").cast("decimal(38,0)")).cast("double")
                / 10000.0,
                2,
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume_m4
                          ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume_m4) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
               AS volume_m4,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's part-type market by year.

    Scale: the p_type filter is the selective one — part(filtered)
    broadcasts and prunes lineitem FIRST, so the orderkey shuffle joins
    only the surviving fraction. Customer-side region membership and
    supplier-side nation both resolve via broadcast; the share is a
    conditional-sum over one aggregate (no self-join).
    """
    s = _src(spark, sf_dir)
    p = s["part"].filter(F.col("p_type") == "STANDARD")
    r = s["region"].filter(F.col("r_name") == "ASIA")
    n1 = s["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = s["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    joined = (
        s["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(s["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(s["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
    )
    # exact 1e-4-dollar integer units for BOTH ratio legs, one double
    # division (round-6 order-free-sum discipline)
    vol_m4 = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100, 0).cast("bigint"))
    )
    return (
        joined.select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol_m4.alias("volume_m4"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_5", F.col("volume_m4"))
                    .otherwise(0)
                    .cast("decimal(38,0)")
                ).cast("double")
                / F.sum(F.col("volume_m4").cast("decimal(38,0)")).cast(
                    "double"
                ),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    """
    SELECT nation, o_year,
           round(CAST(sum(amount_m4) AS DOUBLE) / 10000.0, 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             EXTRACT(year FROM o.o_orderdate) AS o_year,
             -- exact 1e-4-dollar integers: price/discount/retail all
             -- carry two decimals, quantity is integral, and
             -- 0.6 * retail * qty in 1e-4 units = 60 * retail_cents * qty
             CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
               - 60 * CAST(round(p.p_retailprice * 100, 0) AS BIGINT)
                    * CAST(round(l.l_quantity, 0) AS BIGINT) AS amount_m4
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation, per-year profit on a part family.

    Adaptation: no partsupp table, so supply cost is proxied as
    0.6 * p_retailprice (same join tree minus the partsupp probe;
    the canonical query's ps_supplycost becomes a part attribute).

    Scale: part(name-filtered) broadcasts and prunes lineitem before
    the orderkey shuffle; supplier/nation broadcast. One wide-fact
    shuffle total, then a small rollup.
    """
    s = _src(spark, sf_dir)
    p = s["part"].filter(F.col("p_name").like("%widget%"))
    # exact 1e-4-dollar integer units (see oracle comment; round 6)
    amount = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100, 0).cast("bigint"))
        - 60
        * F.round(F.col("p_retailprice") * 100, 0).cast("bigint")
        * F.round(F.col("l_quantity"), 0).cast("bigint")
    ).alias("amount_m4")
    return (
        s["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(s["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(s["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount,
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(
                F.sum(F.col("amount_m4").cast("decimal(38,0)")).cast("double")
                / 10000.0,
                2,
            ).alias("sum_profit")
        )
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           round(CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top customers by revenue lost to returns in a quarter.

    Scale: both fact filters (quarter on orders, returnflag on lineitem)
    push to their scans before the orderkey shuffle; customer join keys
    on custkey after aggregation input is already quarter-pruned.
    Top-20 executes as TakeOrdered, no global sort.
    """
    s = _src(spark, sf_dir)
    o = s["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    li = s["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _disc_revenue_sum().alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count.

    Adaptation: the filter-inside-the-outer-join predicate is on
    o_orderpriority (the schema carries no o_comment).

    Scale: the outer join shuffles both sides on custkey; count(key)
    ignores the NULLs the outer join manufactures for order-less
    customers — exactly the canonical double-aggregate shape. The
    second aggregate's input is |customers| rows, already tiny.
    """
    s = _src(spark, sf_dir)
    o = s["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        s["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
                    ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
                     AS DOUBLE), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of a month's revenue from promo parts.

    Scale: the month filter pushes into the lineitem scan (at 100 TB
    with shipdate partitioning this is partition pruning, not a scan
    filter); part broadcasts; the whole query is one shuffle-free
    conditional aggregate to a single row.
    """
    s = _src(spark, sf_dir)
    li = s["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp_ntz"))
    )
    # exact 1e-4-dollar integer units for both ratio legs (round 6)
    rev_m4 = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100, 0).cast("bigint"))
    )
    return (
        li.join(F.broadcast(s["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev_m4)
                    .otherwise(0)
                    .cast("decimal(38,0)")
                ).cast("double")
                / F.sum(rev_m4.cast("decimal(38,0)")).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with the quarter's maximum revenue.

    The per-supplier revenue is rounded BEFORE the max comparison on
    both engines, so the equality join cannot be split by ulp noise.

    Scale: revenue is one partial-agg shuffle keyed on suppkey; the
    scalar max is a one-row broadcast back onto it. Like Q11, the
    revenue relation feeds two consumers, and AQE's exchange reuse is
    not guaranteed to deduplicate the fact scan (measured), so the
    |suppliers|-row intermediate is persisted explicitly — the quarter
    of lineitem is scanned once by construction. Supplier broadcasts.
    """
    s = _src(spark, sf_dir)
    li = s["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _disc_revenue_sum().alias(
                "total_revenue"
            )
        )
        .persist()
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s["supplier"]), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q11_important_parts",
    """
    WITH value_by_part AS (
      SELECT l_partkey,
             round(sum(l_extendedprice * l_quantity), 2) AS part_value,
             sum(l_extendedprice * l_quantity) AS raw_value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM value_by_part
    WHERE raw_value > (SELECT sum(raw_value) * 0.0005 FROM value_by_part)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose value exceeds a fraction of the
    grand total (HAVING against a global scalar subquery).

    Adaptation: no partsupp, so "stock value" is shipped value
    (l_extendedprice * l_quantity) grouped by part.

    Scale: the per-part aggregate feeds two consumers (the rows and the
    grand-total threshold) — a diamond. Exchange/stage reuse is not
    guaranteed to catch it (measured: AQE re-scanned the fact table once
    a final sort entered the stage graph), so the small intermediate is
    persisted explicitly: the broadcast-threshold branch materializes
    the cache while building, and the probe side then reads it —
    lineitem is scanned once BY CONSTRUCTION. The cached relation is
    |parts| rows (KBs per 1M parts), trivially memory-resident on any
    cluster. The threshold compares RAW sums on both engines (rounding
    only the displayed value) so the cut line is rounding-free.
    """
    s = _src(spark, sf_dir)
    raw = F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
    per_part = (
        s["lineitem"]
        .groupBy("l_partkey")
        .agg(F.round(raw, 2).alias("part_value"), raw.alias("raw_value"))
        .persist()
    )
    threshold = per_part.agg((F.sum("raw_value") * 0.0005).alias("threshold"))
    return (
        per_part.join(F.broadcast(threshold), F.col("raw_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "q16_supplier_counts",
    """
    SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type <> 'PROMO' AND p.p_size IN (1, 2, 3, 4, 5)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part attribute class,
    excluding a blacklist via NOT IN.

    Adaptation: the part-supplier link is lineitem (no partsupp); the
    excluded suppliers are those with negative account balance (no
    s_comment complaints column).

    Scale: NOT IN compiles to a null-aware anti join — the blacklist is
    tiny and broadcasts (Spark plans BroadcastNestedLoopJoin only if the
    key is nullable; s_suppkey is not, so it stays a broadcast hash anti
    join). count(DISTINCT) expands to a two-level aggregate; the first
    level shuffles on (brand, size, suppkey) which partial-aggregates
    the fact stream down before any wide exchange.
    """
    s = _src(spark, sf_dir)
    p = s["part"].filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    bad = s["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        s["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH marked AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS is_late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
      FROM marked GROUP BY l_orderkey
    )
    SELECT m.l_suppkey AS s_suppkey, count(DISTINCT m.l_orderkey) AS numwait
    FROM marked m JOIN per_order p ON m.l_orderkey = p.l_orderkey
    WHERE m.is_late AND p.n_supp > 1 AND p.n_late = 1
    GROUP BY m.l_suppkey
    ORDER BY numwait DESC, s_suppkey
    LIMIT 10
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier
    orders (correlated EXISTS + NOT EXISTS over the same fact).

    Adaptation: "late" is l_shipdate > o_orderdate + 60 days (no
    commit/receipt dates in the schema).

    The double correlation is decorrelated the way Catalyst would:
    per-order distinct supplier / late-supplier counts, and the EXISTS
    ("another supplier on the order") / NOT EXISTS ("no OTHER late
    supplier") pair becomes n_supp > 1 AND n_late = 1 checked against
    the late rows themselves — no repeated self-joins.

    Scale: the per-order counts are WINDOW aggregates over the
    lineitem-orders join output, partitioned by the join's own key — so
    the fact tables are scanned and joined ONCE (the aggregate-then-
    join-back formulation measurably re-scanned both), and the window
    adds no exchange on top of the join's orderkey partitioning.
    Per-order distinct-supplier sets are bounded by lines-per-order
    (~7), so the collect_set state is O(1) per row.
    """
    s = _src(spark, sf_dir)
    marked = (
        s["lineitem"]
        .join(s["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
                "is_late"
            ),
        )
    )
    w = W.partitionBy("l_orderkey")
    stats = marked.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late"),
    )
    return (
        stats.filter(F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(10)
    )


@register(
    "q12_ship_priority",
    """
    -- CASTs: DuckDB sum(int) -> HUGEINT -> pandas float64 (driver dtype
    -- hash-fail vs Spark int64)
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-shipping-class counts of high- vs
    low-priority order lines (conditional-sum pivot after a fact join).

    Adaptation: the schema has no l_shipmode or commit/receipt dates
    (reference Q12 filters late receipts per mode), so l_returnflag
    stands in for the mode and the year filter for the receipt window —
    the join + CASE-priority double-count shape is identical.

    Scale: the year filter prunes lineitem at the scan; the join
    shuffles on orderkey carrying only (orderkey, priority) from orders
    and (orderkey, returnflag) from lineitem — two columns each side.
    The final 3-group aggregate is map-side combined.
    """
    s = _src(spark, sf_dir)
    li = s["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_returnflag")
        .join(s["orders"].select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, min(unit_cost) AS best_cost FROM cost GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           round(c.unit_cost, 4) AS unit_cost
    FROM cost c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
    JOIN part p ON p.p_partkey = c.l_partkey AND p.p_size = 3
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey, s.s_suppkey
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (reference schema has no partsupp table): the
    minimum-cost supplier per part, with supply cost derived as each
    (part, supplier)'s best observed unit price in lineitem.

    Shape parity with canonical Q2: a correlated min-subquery over the
    part-supplier cost relation. The oracle states it as the classic
    decorrelated aggregate + equality join; the Spark plan computes the
    per-part min as a WINDOW over the cost aggregate instead — same
    rows (ties kept both ways), but lineitem is scanned ONCE, where the
    self-joining formulation scans the 100 TB fact table twice.

    Scale: one fact scan -> partial agg on (partkey, suppkey) -> window
    min on partkey (a reshuffle of the already-aggregated relation, not
    of raw data). part filters before its join (pushed p_size
    predicate); supplier/nation/region broadcast. The float-equality
    filter is safe cross-engine because both sides are min() over the
    identical double set. Final top-20 is a TakeOrdered.
    """
    s = _src(spark, sf_dir)
    li = s["lineitem"]
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = cost.withColumn(
        "best_cost", F.min("unit_cost").over(W.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("best_cost"))
    return (
        best.join(s["part"].filter(F.col("p_size") == 3), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(s["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(s["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(20)
    )


@register(
    "q20_dominant_suppliers",
    """
    WITH vol AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ), tot AS (
      SELECT l_partkey, sum(sq) AS tq FROM vol GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM vol v
    JOIN tot t ON v.l_partkey = t.l_partkey
    JOIN part p ON p.p_partkey = v.l_partkey AND p.p_size <= 10
    JOIN supplier s ON s.s_suppkey = v.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE v.sq > 0.5 * t.tq
    ORDER BY s.s_name
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp.ps_availqty in the reference
    schema): suppliers who shipped more than half of some small part's
    total 1995 volume — canonical Q20's "excess share of a part's
    supply" predicate with observed volume standing in for availqty.

    Scale: the year filter pushes into the scan, and the part total is
    a WINDOW sum over the (partkey, suppkey) aggregate — one fact scan,
    where the oracle's vol-tot self-join formulation scans lineitem
    twice. part prunes via a pushed p_size range; supplier/nation
    broadcast; DISTINCT collapses map-side. Quantities are integral
    doubles, so the 0.5*total comparison is exact cross-engine.
    """
    s = _src(spark, sf_dir)
    li = s["lineitem"].filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    vol = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("sq"))
    return (
        vol.withColumn("tq", F.sum("sq").over(W.partitionBy("l_partkey")))
        .filter(F.col("sq") > 0.5 * F.col("tq"))
        .join(s["part"].filter(F.col("p_size") <= 10), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(s["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name")
    )
