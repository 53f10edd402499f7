"""Data-profiling, quality-scan, and diagnostics operators.

Production pipelines at 100 TB spend as much time *inspecting* data as
transforming it: column profiles before schema changes, PII scans
before egress, skew diagnostics before big joins, anomaly flags on the
metrics the pipeline emits. The reference has none of this
(SURVEY.md §2.3); these are engine extensions in the same
oracle-checked registry as everything else.

Design rule shared by all five: the profile/diagnostic output is
*small* (rows = columns, sources, days, or top-k keys), so every query
reduces before it shuffles — the scan is the only full-data pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..queries import register
from .util import local_rows_df
from .analytics import _src

# Orders columns profiled (closed list: a profiler that discovers
# columns at runtime would need a schema read, which is fine, but a
# stable list keeps the oracle exact).
_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"]


@register(
    "profile_columns",
    " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col,
               count(*) - count({c}) AS n_null,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_s,
               CAST(max({c}) AS VARCHAR) AS max_s
        FROM orders
        """
        for c in _PROFILE_COLS
    ),
)
def profile_columns(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Per-column profile (nulls, distincts, min/max) of ``orders``.

    One scan for all columns: a single ``agg`` computes every
    per-column statistic, then the wide row unpivots to the
    (col, stats) long form via ``stack``. The DuckDB oracle states the
    same profile as a UNION ALL of per-column scans — N scans there,
    ONE here, same rows.

    Scale: output is |columns| rows. ``approx=False`` (the oracle-exact
    default) computes exact multi-column NDV, whose Expand duplicates
    every row once per distinct-counted column — the standard Spark
    trade for one-pass exactness, an |cols|x row blowup at 100 TB.
    ``approx=True`` is the at-scale form: ``approx_count_distinct``
    (HLL++, fixed memory, map-side partials) removes the Expand
    entirely — plan-pinned in tests/test_plans.py.
    """
    o = _src(spark, sf_dir)["orders"]
    aggs = []
    for c in _PROFILE_COLS:
        ndv = (
            F.approx_count_distinct(c) if approx else F.countDistinct(c)
        )
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            ndv.alias(f"{c}__n_distinct"),
            F.min(c).cast("string").alias(f"{c}__min_s"),
            F.max(c).cast("string").alias(f"{c}__max_s"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n_null, {c}__n_distinct, {c}__min_s, {c}__max_s"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (col, n_null, n_distinct, min_s, max_s)"
    )


# Patterns kept to the regex subset Java (Spark) and RE2 (DuckDB) parse
# identically: character classes, bounded repeats, \\d, word boundaries.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_IDLIKE_RE = r"\b\d{9,16}\b"


@register(
    "pii_scan",
    f"""
    SELECT source,
           count(*) AS n_docs,
           -- CASTs: DuckDB sum(int) -> HUGEINT -> pandas float64 (driver
           -- dtype hash-fail vs Spark int64)
           CAST(sum(len(regexp_extract_all(text, '{_EMAIL_RE}'))) AS BIGINT)
             AS n_emails,
           CAST(sum(len(regexp_extract_all(text, '{_PHONE_RE}'))) AS BIGINT)
             AS n_phones,
           CAST(sum(len(regexp_extract_all(text, '{_IDLIKE_RE}'))) AS BIGINT)
             AS n_idlike,
           count(*) FILTER (WHERE regexp_matches(text, '{_EMAIL_RE}')
                               OR regexp_matches(text, '{_PHONE_RE}')) AS docs_flagged
    FROM documents GROUP BY source
    """,
)
def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure scan over the document corpus, rolled up by source.

    Counts email / phone / long-digit-run matches per source plus how
    many documents are flagged at all — the report a pre-egress or
    pre-training compliance gate consumes (the masking counterpart is
    ``text_clean``).

    Scale: regexp_count is JVM-side codegen over each document exactly
    once; the rollup output is |sources| rows. The patterns stay in the
    regex subset Java and RE2 interpret identically, which is what
    makes the DuckDB oracle exact.
    """
    d = _src(spark, sf_dir)["documents"]
    email_n = F.expr(f"regexp_count(text, '{_EMAIL_RE}')")
    phone_n = F.expr(f"regexp_count(text, '{_PHONE_RE}')")
    idlike_n = F.expr(f"regexp_count(text, '{_IDLIKE_RE}')")
    return (
        d.select("source", email_n.alias("e"), phone_n.alias("p"), idlike_n.alias("i"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("e").alias("n_emails"),
            F.sum("p").alias("n_phones"),
            F.sum("i").alias("n_idlike"),
            F.count_if((F.col("e") > 0) | (F.col("p") > 0)).alias("docs_flagged"),
        )
    )


@register(
    "anomaly_zscore_daily",
    """
    WITH daily AS (
      SELECT o_orderdate AS day, round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY o_orderdate
    ), scored AS (
      SELECT day, revenue,
             avg(revenue) OVER w AS mu,
             stddev_samp(revenue) OVER w AS sigma
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, revenue, round((revenue - mu) / sigma, 4) AS z
    FROM scored
    WHERE sigma > 0 AND abs((revenue - mu) / sigma) > 2
    """,
)
def anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomalies on daily order revenue.

    Each day scores against the mean/stddev of the preceding 30 days
    (never itself — no self-masking); |z| > 2 flags. This is the
    standard drift/incident detector for pipeline output metrics.

    Scale: the group-by first reduces 100 TB of orders to |days| rows
    (a few thousand); only THEN comes the unpartitioned window — a
    single-reducer sort of a provably tiny series, which is the correct
    plan, not an accident. The full-data pass remains one partial agg.
    """
    o = _src(spark, sf_dir)["orders"]
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = W.orderBy("day").rowsBetween(-30, -1)
    scored = daily.select(
        "day",
        "revenue",
        F.avg("revenue").over(w).alias("mu"),
        F.stddev_samp("revenue").over(w).alias("sigma"),
    )
    z = (F.col("revenue") - F.col("mu")) / F.col("sigma")
    return scored.filter((F.col("sigma") > 0) & (F.abs(z) > 2)).select(
        "day", "revenue", F.round(z, 4).alias("z")
    )


@register(
    "join_skew_profile",
    """
    WITH freq AS (
      SELECT l_partkey AS key, count(*) AS n FROM lineitem GROUP BY l_partkey
    ), tot AS (SELECT sum(n) AS total, count(*) AS n_keys FROM freq)
    SELECT key, n, round(n / total, 6) AS share,
           round(n * n_keys / total, 2) AS x_avg
    FROM freq, tot
    ORDER BY n DESC, key LIMIT 10
    """,
)
def join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of a join key (lineitem.l_partkey): top keys
    by row count, their share of the table, and their multiple of the
    mean key frequency.

    This is the pre-join diagnostic that decides the physical strategy:
    x_avg in the hundreds means salting or AQE skew-join handling;
    share near 1/n_keys means plain hash join is safe.

    Scale: one partial-aggregated group-by (|keys| rows out), a
    broadcast of the 1-row total, and a TakeOrdered top-k — no global
    sort, no second scan.
    """
    li = _src(spark, sf_dir)["lineitem"]
    freq = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = freq.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(F.col("n") * F.col("n_keys") / F.col("total"), 2).alias("x_avg"),
        )
        .orderBy(F.col("n").desc(), "key")
        .limit(10)
    )


@register(
    "market_basket_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING count(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b LIMIT 15
    """,
)
def market_basket_pairs(
    spark: SparkSession, sf_dir: str, max_basket_size: int = 256
) -> DataFrame:
    """Co-occurrence mining: part pairs appearing together in at least
    two orders (the item-item affinity input for recommenders and
    negative-sampling schemes).

    Scale: items shuffle ONCE, on the basket id, into a
    ``collect_set`` per order (dedup for free); the ordered pairs are
    exploded from each basket with JVM-side array ``transform`` /
    ``slice`` — the self-join formulation the DuckDB oracle uses would
    shuffle the item set twice more (distinct is keyed on
    (order, part), the join on order — different partitionings). Pair
    cost is O(sum k_i^2) for basket sizes k_i — so the production guard
    is ON BY DEFAULT: baskets larger than ``max_basket_size`` truncate
    to their ``max_basket_size`` smallest items before pairing (a
    10k-item basket would otherwise contribute 50M pairs), and the
    count of truncated baskets is exposed as an ``observe`` metric
    (``truncated_baskets``) so a production run sees the coverage loss
    instead of silently mining partial affinities. TPC-H baskets hold
    <= 7 items, so the default cap never fires here and the DuckDB
    oracle (uncapped self-join) stays exact. The HAVING prunes the
    pair tail before the top-k.
    """
    li = _src(spark, sf_dir)["lineitem"]
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("all_parts")
    )
    baskets = baskets.select(
        F.slice("all_parts", 1, max_basket_size).alias("parts"),
        (F.size("all_parts") > max_basket_size).alias("truncated"),
    ).observe(
        "market_basket_pairs",
        F.sum(F.col("truncated").cast("long")).alias("truncated_baskets"),
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts) - i - 1), "
                "y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("pr")
    )
    return (
        pairs.groupBy(
            F.col("pr.part_a").alias("part_a"),
            F.col("pr.part_b").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(15)
    )


@register(
    "chi2_event_dow",
    """
    WITH c AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS n
      FROM events GROUP BY 1, 2
    ), rt AS (SELECT event_type, sum(n) AS rn FROM c GROUP BY event_type),
       ct AS (SELECT dow, sum(n) AS cn FROM c GROUP BY dow),
       t  AS (SELECT sum(n) AS tot FROM c)
    SELECT c.event_type, c.dow, c.n,
           round(rt.rn * ct.cn / t.tot, 4) AS expected,
           round(pow(c.n - rt.rn * ct.cn / t.tot, 2) / (rt.rn * ct.cn / t.tot), 6)
             AS chi2_term
    FROM c JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN t
    """,
)
def chi2_event_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency decomposition: event_type x day-of-week
    observed vs expected counts, with each cell's chi-square term —
    the independence check behind drift detection ("did the weekly
    traffic mix change?").

    Dialect note: Spark ``dayofweek`` is 1=Sunday..7; DuckDB's is
    0-based, so the oracle adds 1 (same mapping as date_funcs_orders).

    Scale: one full pass reduces events to |types x 7| cells; the
    margins (row/column/grand totals) are WINDOW sums over those cells
    — re-deriving them as separate aggregates would re-scan events once
    per margin (the oracle's CTE formulation does exactly that; DuckDB
    materializes the CTE, Spark would not). The unpartitioned grand
    total window is over the bounded cell set, not raw data. The
    chi-square statistic itself is sum(chi2_term) — left decomposed per
    cell so the oracle pins every intermediate.
    """
    ev = _src(spark, sf_dir)["events"]
    c = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("bigint").alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"))
    withm = c.select(
        "event_type",
        "dow",
        "n",
        F.sum("n").over(W.partitionBy("event_type")).alias("rn"),
        F.sum("n").over(W.partitionBy("dow")).alias("cn"),
        F.sum("n").over(W.partitionBy()).alias("tot"),
    )
    expected = F.col("rn") * F.col("cn") / F.col("tot")
    return (
        withm.select(
            "event_type",
            "dow",
            "n",
            F.round(expected, 4).alias("expected"),
            F.round(F.pow(F.col("n") - expected, 2) / expected, 6).alias("chi2_term"),
        )
    )


@register(
    "pipeline_observe_metrics",
    """
    SELECT count(*) AS n_input,
           count(*) FILTER (WHERE n_chars >= 200 AND lang = 'en') AS n_kept,
           round(count(*) FILTER (WHERE n_chars >= 200 AND lang = 'en')
                 / CAST(count(*) AS DOUBLE), 4) AS kept_pct
    FROM documents
    """,
)
def pipeline_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight pipeline QA metrics via ``DataFrame.observe``: the
    quality gate's input/kept counts are collected DURING the filtering
    job itself — zero extra scans, zero extra shuffles — instead of the
    usual "run the pipeline, then run a second aggregation to report
    what it did".

    At 100 TB this is the difference between free metrics and paying a
    second full pass per QA counter: observe attaches accumulator-style
    aggregates to a plan edge, every executor contributes as rows flow
    through, and the driver reads one tiny struct at job end. The same
    mechanism powers Structured Streaming's per-batch observed metrics.

    The observed values are returned as a 1-row DataFrame so the
    driver's DuckDB oracle (a plain conditional aggregate over the same
    table) pins them exactly.
    """
    from pyspark.sql import Observation

    d = _src(spark, sf_dir)["documents"]
    keep = (F.col("n_chars") >= 200) & (F.col("lang") == "en")
    obs = Observation("quality_gate")
    gated = d.observe(
        obs,
        F.count(F.lit(1)).alias("n_input"),
        F.count_if(keep).alias("n_kept"),
    ).filter(keep)
    # Any action on the observed plan materializes the metrics; the
    # write/count IS the pipeline run the metrics piggyback on.
    gated.count()
    m = obs.get
    return local_rows_df(spark, 
        [
            (
                m["n_input"],
                m["n_kept"],
                round(m["n_kept"] / m["n_input"], 4) if m["n_input"] else None,
            )
        ],
        "n_input bigint, n_kept bigint, kept_pct double",
    )


@register(
    "supplier_concentration_hhi",
    """
    WITH qty AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), share AS (
      SELECT l_partkey, l_suppkey,
             q / sum(q) OVER (PARTITION BY l_partkey) AS s
      FROM qty
    )
    SELECT l_partkey,
           count(*) AS n_suppliers,
           round(sum(s * s), 4) AS hhi
    FROM share
    GROUP BY l_partkey
    HAVING round(sum(s * s), 4) >= 0.9
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration risk: the Herfindahl-Hirschman index of
    each part's supplier mix (sum of squared quantity shares), flagging
    parts at HHI >= 0.9 — effectively single-sourced, the supply-chain
    analogue of the join-skew profile (one dominant key = one fragile
    dependency).

    Shape: one partial-aggregated groupBy reduces lineitem to
    (part, supplier) cells; the share window partitions by part over
    that reduced relation (reduce-before-window, as everywhere); the
    final rollup is |parts| rows with the HAVING pruning the healthy
    tail before anything returns.
    """
    li = _src(spark, sf_dir)["lineitem"]
    qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("q")
    )
    share = qty.select(
        "l_partkey",
        (F.col("q") / F.sum("q").over(W.partitionBy("l_partkey"))).alias("s"),
    )
    return (
        share.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(F.col("s") * F.col("s")), 4).alias("hhi"),
        )
        .filter(F.col("hhi") >= 0.9)
    )


@register(
    "corpus_version_diff",
    """
    WITH v1 AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0
    ), v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN md5(text || '!') ELSE md5(text) END AS h
      FROM documents
    )
    -- CASTs: DuckDB sum(int) -> HUGEINT -> pandas float64 (driver dtype
    -- hash-fail vs Spark int64)
    SELECT
      CAST(sum(CASE WHEN v1.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_added,
      CAST(sum(CASE WHEN v2.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_removed,
      CAST(sum(CASE WHEN v1.doc_id IS NOT NULL AND v2.doc_id IS NOT NULL
               AND v1.h <> v2.h THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      CAST(sum(CASE WHEN v1.doc_id IS NOT NULL AND v2.doc_id IS NOT NULL
               AND v1.h = v2.h THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    """,
)
def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff — added / removed / changed / unchanged
    between two dataset versions, the audit every training-data release
    publishes (and the input to incremental re-embedding: only
    added+changed docs re-encode). Stand-in versions are derived from
    one table (v1 drops doc_id%7==0; v2 perturbs doc_id%11==0's text).

    Shape: content comparison travels as 16-byte md5, never the
    payload; one full-outer join on the primary key classifies every
    doc in a single pass. Scale: both sides shuffle once on doc_id —
    at 100 TB the versions are partitioned identically on ingest date,
    so the join is partition-aligned; the diff table (ids + class) is
    the release artifact, re-embedding reads only the added/changed ids.
    """
    d = _src(spark, sf_dir)["documents"]
    v1 = d.filter(F.col("doc_id") % 7 != 0).select(
        F.col("doc_id").alias("id1"), F.md5("text").alias("h1")
    )
    v2 = d.select(
        F.col("doc_id").alias("id2"),
        F.when(F.col("doc_id") % 11 == 0, F.md5(F.concat("text", F.lit("!"))))
        .otherwise(F.md5("text"))
        .alias("h2"),
    )
    j = v1.join(v2, F.col("id1") == F.col("id2"), "full_outer")
    both = F.col("id1").isNotNull() & F.col("id2").isNotNull()
    return j.agg(
        F.sum(F.when(F.col("id1").isNull(), 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("id2").isNull(), 1).otherwise(0)).alias("n_removed"),
        F.sum(F.when(both & (F.col("h1") != F.col("h2")), 1).otherwise(0)).alias(
            "n_changed"
        ),
        F.sum(F.when(both & (F.col("h1") == F.col("h2")), 1).otherwise(0)).alias(
            "n_unchanged"
        ),
    )


@register(
    "drift_psi_value",
    """
    WITH ref AS (
      SELECT value FROM events WHERE event_id % 2 = 0
    ), cur AS (
      SELECT value FROM events WHERE event_id % 2 = 1
    ), bounds AS (
      SELECT min(value) AS lo, max(value) AS hi FROM ref
    ), rb AS (
      SELECT least(9, greatest(0, CAST(floor((value - lo) * 10 / (hi - lo + 1e-12)) AS INT))) AS b,
             count(*) AS n
      FROM ref, bounds GROUP BY 1
    ), cb AS (
      SELECT least(9, greatest(0, CAST(floor((value - lo) * 10 / (hi - lo + 1e-12)) AS INT))) AS b,
             count(*) AS n
      FROM cur, bounds GROUP BY 1
    ), bins AS (
      SELECT g.b,
             (coalesce(rb.n, 0) + 0.5) / ((SELECT sum(n) FROM rb) + 5.0) AS p,
             (coalesce(cb.n, 0) + 0.5) / ((SELECT sum(n) FROM cb) + 5.0) AS q
      FROM (SELECT unnest(range(10)) AS b) g
      LEFT JOIN rb ON rb.b = g.b LEFT JOIN cb ON cb.b = g.b
    )
    SELECT round(sum((p - q) * ln(p / q)), 6) AS psi FROM bins
    """,
)
def drift_psi_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between a reference and a current
    sample of ``events.value`` (stand-in split: even/odd event_id) —
    the standard drift gate a feature/label pipeline runs before
    trusting new data. Ten fixed-width bins over the REFERENCE range
    (deterministic — quantile bins would hash-diverge across engines),
    Laplace-smoothed (+0.5) so empty bins don't blow up the log;
    PSI > 0.2 is the conventional re-examine threshold.

    Scale: two filtered aggregations reduce to <=10 rows each before
    any join; the bin spine is a 10-row literal. Nothing here grows
    with data volume except the scans.
    """
    ev = _src(spark, sf_dir)["events"]
    ref = ev.filter(F.col("event_id") % 2 == 0).select("value")
    cur = ev.filter(F.col("event_id") % 2 == 1).select("value")
    # bounds and sample sizes fold in as 1-row broadcasts — driver-side
    # first()/count() here would scan events three extra times
    bounds = ref.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))

    def binned(df, n_alias):
        b = F.least(
            F.lit(9),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("value") - F.col("lo"))
                    * 10
                    / (F.col("hi") - F.col("lo") + F.lit(1e-12))
                ).cast("int"),
            ),
        )
        per_bin = (
            df.crossJoin(F.broadcast(bounds))
            .groupBy(b.alias("b"))
            .agg(F.count(F.lit(1)).alias(n_alias))
        )
        total = per_bin.agg(F.sum(n_alias).alias(f"{n_alias}_tot"))
        return per_bin, total

    rb, r_tot = binned(ref, "rn")
    cb, c_tot = binned(cur, "cn")
    spine = spark.range(10).select(F.col("id").cast("int").alias("b"))
    bins = (
        spine.join(rb, "b", "left")
        .join(cb, "b", "left")
        .crossJoin(F.broadcast(r_tot))
        .crossJoin(F.broadcast(c_tot))
        .select(
            (
                (F.coalesce("rn", F.lit(0)) + 0.5) / (F.col("rn_tot") + 5.0)
            ).alias("p"),
            (
                (F.coalesce("cn", F.lit(0)) + 0.5) / (F.col("cn_tot") + 5.0)
            ).alias("q"),
        )
    )
    return bins.agg(
        F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6).alias(
            "psi"
        )
    )


@register(
    "bot_regularity_flags",
    """
    WITH gaps AS (
      -- integer MICROSECOND gaps: exact, so the mean and the
      -- second-moment variance below are order-free integer sums; the
      -- only doubles are one division / sqrt on identical operands
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ), stats AS (
      SELECT user_id, count(*) AS n_gaps,
             round(CAST(sum(gap_us) AS DOUBLE)
                   / (count(*) * 1e6), 4) AS mean_gap_s,
             round(sqrt(CAST(count(*) * sum(CAST(gap_us AS HUGEINT) * gap_us)
                             - sum(gap_us) * sum(gap_us) AS DOUBLE)
                        / (count(*) * (count(*) - 1))) / 1e6, 4) AS sd_gap_s
      FROM gaps WHERE gap_us IS NOT NULL
      GROUP BY user_id HAVING count(*) >= 5
    )
    SELECT user_id, n_gaps, mean_gap_s, sd_gap_s,
           (sd_gap_s < 0.01 * mean_gap_s) AS too_regular
    FROM stats
    """,
)
def bot_regularity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation detection by inter-event-time regularity: humans
    produce bursty gaps (high coefficient of variation); schedulers and
    scrapers fire on near-constant intervals. Users whose gap stddev is
    under 1% of their mean gap flag ``too_regular`` — the traffic a
    curation pipeline drops before events feed engagement metrics or
    training mixes (the behavioral sibling of text_quality_score's
    content gates).

    One window pass (lag over the user shuffle) reduces events to
    per-user moment statistics — fixed-width state per user; the flag
    is pure arithmetic on the reduced rows. The 5-gap floor keeps the
    estimator out of small-sample noise.
    """
    ev = _src(spark, sf_dir)["events"]
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # integer MICROSECOND gaps (unix_micros is exact; the NTZ ->
    # TIMESTAMP hop is identity under the engine's UTC session): the
    # mean and the second-moment variance are order-free integer sums;
    # doubles appear only in one division / sqrt on identical operands
    # (stddev_samp over raw doubles folds engine-order — the EWMA class)
    us = F.expr("unix_micros(cast(ts AS timestamp_ltz))")
    prev = F.lag(us).over(w)
    gaps = ev.select("user_id", (us - prev).alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    n = F.count(F.lit(1))
    sx = F.sum(F.col("gap_us").cast("decimal(38,0)"))
    sxx = F.sum(
        F.col("gap_us").cast("decimal(20,0)")
        * F.col("gap_us").cast("decimal(20,0)")
    )
    stats = (
        gaps.groupBy("user_id")
        .agg(
            n.alias("n_gaps"),
            F.round(sx.cast("double") / (n * F.lit(1e6)), 4).alias(
                "mean_gap_s"
            ),
            F.round(
                F.sqrt(
                    (n * sxx - sx * sx).cast("double")
                    / (n * (n - F.lit(1)))
                )
                / F.lit(1e6),
                4,
            ).alias("sd_gap_s"),
        )
        .filter(F.col("n_gaps") >= 5)
    )
    return stats.withColumn(
        "too_regular", F.col("sd_gap_s") < 0.01 * F.col("mean_gap_s")
    )
