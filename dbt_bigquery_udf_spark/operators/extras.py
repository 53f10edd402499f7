"""Reshaping, sampling, and time-series operators.

Second analytics wave beyond ``analytics.py``: pivot/unpivot, CUBE,
extended aggregates (median / max_by / count_if / bool_or), calendar and
string function suites, global sort with pagination, interval-range
window frames, time-series gap filling, deterministic hash sampling
(whole-table and stratified), TF-IDF, and bigram mining.

The reference contains none of these (SURVEY.md §2.3 — no aggregations
at all); they are engine extensions mandated by the BASELINE.json north
star (large-scale training-data pipelines). Everything stays JVM-side in
built-in functions; every query carries a DuckDB oracle.

Determinism policy for sampling: Bernoulli ``rand()`` sampling is not
reproducible across engines (or even runs), so the sampling operators
hash a stable key with md5 — both engines produce identical digests,
making the sample itself oracle-checkable. At 100 TB this is also the
*operationally correct* design: re-runs and backfills pick the same
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import _money
from ._money import disc_revenue_sum as _disc_revenue_sum
from ..queries import register
from .analytics import _src

# TPC-H order priorities are a closed set; naming them avoids the
# driver-side distinct scan df.pivot otherwise runs to discover values —
# at 100 TB that scan is a full extra job.
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "pivot_status_priority",
    """
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS unspecified,
           count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
    FROM orders GROUP BY o_orderstatus
    """,
)
def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): order counts by status x priority.

    Compiled as one conditional-count aggregate per named value — a
    SINGLE groupBy/shuffle. DataFrame ``.pivot`` (even with explicit
    values) desugars into TWO aggregations (pre-agg on (key, value),
    then ``pivotfirst``) = two shuffles; with a closed value set the
    conditional-aggregate form halves that, which is the plan the
    single-exchange test pins. Empty cells are 0, matching the
    FILTER-clause oracle.
    """
    o = _src(spark, sf_dir)["orders"]
    names = ["urgent", "high", "medium", "unspecified", "low"]
    return o.groupBy("o_orderstatus").agg(
        *[
            F.count_if(F.col("o_orderpriority") == v).alias(n)
            for v, n in zip(_PRIORITIES, names)
        ]
    )


@register(
    "unpivot_order_measures",
    f"""
    WITH m AS (
      SELECT o_orderstatus,
             CAST(count(*) AS DOUBLE) AS n_orders,
             {_money.money_sum_sql("o_totalprice")} AS total_price,
             {_money.money_avg_sql("o_totalprice")} AS avg_price
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'n_orders' AS measure, n_orders AS value FROM m
    UNION ALL
    SELECT o_orderstatus, 'total_price', total_price FROM m
    UNION ALL
    SELECT o_orderstatus, 'avg_price', avg_price FROM m
    """,
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long / melt) of per-status order measures.

    Scale: unpivot is a zero-shuffle Expand (each input row emits one
    row per measure) — the only shuffle is the upstream aggregate's.
    """
    o = _src(spark, sf_dir)["orders"]
    wide = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        _money.money_sum("o_totalprice").alias("total_price"),
        _money.money_avg("o_totalprice").alias("avg_price"),
    )
    return wide.unpivot(
        ["o_orderstatus"],
        ["n_orders", "total_price", "avg_price"],
        "measure",
        "value",
    )


@register(
    "cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus) AS g_status,
           grouping(o_orderpriority) AS g_priority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 2^2 grouping sets in one pass,
    with grouping() flags disambiguating real NULLs from subtotal rows.

    Scale: CUBE expands each row 4x before the partial aggregate; at
    100 TB prefer ROLLUP (hierarchies) or explicit GROUPING SETS to cap
    the expansion factor.
    """
    o = _src(spark, sf_dir)["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    ).select(
        "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n", "total"
    )


# Sortable (price, key) encoding shared by both engines so max_by /
# arg_max tie-breaks are deterministic: fixed-width zero-padded decimal
# then key. Prices are positive and < 10^9 here, so lexicographic order
# == numeric order.
_ARGMAX_KEY = "'%018.2f|%018d'"


@register(
    "agg_extended",
    f"""
    SELECT o_orderstatus,
           median(o_totalprice) AS median_price,
           arg_max(o_orderkey, printf({_ARGMAX_KEY}, o_totalprice, o_orderkey))
             AS top_order,
           arg_min(o_orderkey, printf({_ARGMAX_KEY}, o_totalprice, -o_orderkey))
             AS bottom_order,
           count(*) FILTER (WHERE o_totalprice > 150000) AS n_large,
           bool_or(o_orderpriority = '1-URGENT') AS has_urgent,
           bool_and(o_totalprice > 0) AS all_positive
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended aggregate suite: exact median, argmax/argmin with
    deterministic tie-breaks, conditional count, boolean aggregates.

    max_by/arg_max alone is non-deterministic under value ties, so the
    ordering value is a fixed-width ``(price, key)`` string both engines
    sort identically.

    Scale: median is the one reducer-heavy aggregate here (exact
    percentile state); swap to approx_percentile at 100 TB. Everything
    else is constant-size partial-aggregate state.
    """
    o = _src(spark, sf_dir)["orders"]
    enc = "format_string('%018.2f|%018d', o_totalprice, {key})"
    return o.groupBy("o_orderstatus").agg(
        F.expr("median(o_totalprice)").alias("median_price"),
        F.expr(f"max_by(o_orderkey, {enc.format(key='o_orderkey')})").alias(
            "top_order"
        ),
        F.expr(f"min_by(o_orderkey, {enc.format(key='-o_orderkey')})").alias(
            "bottom_order"
        ),
        F.expr("count_if(o_totalprice > 150000)").alias("n_large"),
        F.expr("bool_or(o_orderpriority = '1-URGENT')").alias("has_urgent"),
        F.expr("bool_and(o_totalprice > 0)").alias("all_positive"),
    )


@register(
    "date_funcs_orders",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           quarter(o_orderdate) AS qtr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           o_orderdate + INTERVAL 30 DAYS AS plus_30d,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
             AS days_since_95,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr_start
    FROM orders
    """,
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar function suite over order dates.

    Dialect note: Spark ``dayofweek`` is 1=Sunday..7, DuckDB's is
    0=Sunday..6 — the oracle adds 1. ``last_day`` returns DATE in both;
    cast to timestamp for hash parity with the TIMESTAMP_NTZ session
    default. All of these are codegen'd scalar expressions — no scale
    story beyond staying JVM-side.
    """
    o = _src(spark, sf_dir)["orders"]
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.dayofweek(d).cast("bigint").alias("dow"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        F.date_add(d.cast("date"), 30).cast("timestamp_ntz").alias("plus_30d"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_95"),
        F.date_trunc("quarter", d).cast("timestamp_ntz").alias("qtr_start"),
    )


@register(
    "string_funcs_part",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lpad(p_brand, 12, '*') AS brand_pad,
           translate(p_type, 'AEIOU', 'aeiou') AS type_translated,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
           strpos(p_type, 'BRUSHED') AS brushed_at,
           levenshtein(p_brand, 'Brand#33') AS brand_dist,
           len(string_split(p_type, ' ')) AS type_words,
           substr(p_name, 1, 10) AS name_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    """,
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function suite over parts: case, padding, translate,
    regex replace, substring search, edit distance, tokenized length.

    All are codegen'd JVM expressions (UTF8String ops) — the 100 TB
    story is simply that none of this leaves the scan stage.
    """
    p = _src(spark, sf_dir)["part"]
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_translated"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.instr("p_type", "BRUSHED").cast("bigint").alias("brushed_at"),
        F.levenshtein("p_brand", F.lit("Brand#33")).cast("bigint").alias(
            "brand_dist"
        ),
        F.size(F.split("p_type", " ")).cast("bigint").alias("type_words"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "global_sort_page",
    """
    SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
    FROM lineitem
    ORDER BY l_shipdate, l_orderkey, l_linenumber
    LIMIT 200 OFFSET 400
    """,
)
def global_sort_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination: global ORDER BY + LIMIT/OFFSET on a total key.

    Scale: limit+offset still executes as TakeOrdered(offset+limit) —
    fine for page-sized offsets. Deep pagination at 100 TB should use
    keyset predicates (WHERE key > last_seen ORDER BY key LIMIT n)
    instead; this operator pins the engine-side semantics.
    """
    li = _src(spark, sf_dir)["lineitem"]
    return (
        li.select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .offset(400)
        .limit(200)
    )


@register(
    "window_range_7d",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 2)
             AS spend_7d,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
             AS orders_7d
    FROM orders
    """,
)
def window_range_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-customer trailing-7-day spend — the
    value-based (not row-count) frame, which is what time-series
    features actually need.

    Spark's rangeBetween is numeric, so the ordering column is epoch
    seconds and the frame is +/-7*86400; DuckDB's INTERVAL frame over
    the timestamp is semantically identical (orders are date-grained).

    Scale: one shuffle on o_custkey, then a per-partition ordered scan
    with a sliding frame — same cost shape as any window.
    """
    o = _src(spark, sf_dir)["orders"]
    epoch = F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_7d"),
        F.count(F.lit(1)).over(w).alias("orders_7d"),
    )


@register(
    "timeseries_gapfill",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events WHERE event_type = 'click'
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds
    ), counts AS (
      SELECT date_trunc('hour', ts) AS hour_start, count(*) AS n,
             round(sum(value), 2) AS value_sum
      FROM events WHERE event_type = 'click' GROUP BY 1
    )
    SELECT s.hour_start, coalesce(c.n, 0) AS n,
           coalesce(c.value_sum, 0.0) AS value_sum
    FROM spine s LEFT JOIN counts c USING (hour_start)
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap filling: hourly click counts over
    a dense hour spine (empty hours become explicit zero rows) — the
    shape every downstream forecasting/feature job needs.

    Scale: the spine bounds derive from the HOURLY AGGREGATE (truncation
    is monotonic, so min/max of the bucketed hours equal the truncated
    min/max of raw ts), which is persisted — the event stream is
    scanned once by construction instead of once for counts and once
    for bounds (measured via stage metrics). The spine stays tiny
    (hours between bounds) and broadcasts into the left join — no extra
    shuffle beyond the aggregation's own.
    """
    ev = _src(spark, sf_dir)["events"].filter(F.col("event_type") == "click")
    hour = F.date_trunc("hour", F.col("ts"))
    counts = (
        ev.groupBy(hour.alias("hour_start"))
        .agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("value_sum")
        )
        .persist()
    )
    spine = (
        counts.agg(
            F.min("hour_start").alias("lo"),
            F.max("hour_start").alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_start")
        )
    )
    return spine.join(counts, "hour_start", "left").select(
        "hour_start",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("value_sum"), F.lit(0.0)).alias("value_sum"),
    )


@register(
    "sample_hash_pct",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE ('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)),
                          1, 8))::BIGINT % 100 < 5
    """,
)
def sample_hash_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% Bernoulli sample via md5 of a stable row key.

    ``rand()``-based sampling is irreproducible across engines and
    re-runs; hashing a stable key gives the same sample everywhere —
    at 100 TB that reproducibility is what makes backfills and
    train/eval splits sound. md5 is identical in Spark and DuckDB, so
    the sample itself (not just its size) is oracle-checked.

    Scale: pure scan-side filter (codegen'd hash + modulo), no shuffle;
    pushes down nothing but costs one hash per row.
    """
    li = _src(spark, sf_dir)["lineitem"]
    key = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % 100
    return li.filter(bucket < 5).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@register(
    "sample_stratified",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: a deterministic fixed-size sample per
    language (hash-ordered row_number <= n) — balanced corpora slices
    for training mixes.

    Scale: one shuffle on the stratum key; rank truncation happens
    per-partition. For heavy strata, pre-filter with the hash-percent
    trick (sample_hash_pct) to cap rows entering the window sort.
    """
    d = _src(spark, sf_dir)["documents"]
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


# Tokenizer shared by tfidf/bigrams and their oracles: lowercase, split
# on runs of non-alphanumerics, drop empties. Kept deliberately simple
# and *identical* on both sides.
_TOK_RE = "[^a-z0-9]+"


@register(
    "text_tfidf_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '{_TOK_RE}'), t -> t <> ''))
               AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 highest-scoring terms per document.

    Scale: two aggregates over the exploded token stream (term
    frequency per doc, document frequency per term) plus a join keyed
    on term — the DF side is |vocab| rows and broadcasts; the corpus
    size is a 1-row literal-ish aggregate also broadcast. Final top-k
    is a per-doc window truncation. No Python anywhere.
    """
    d = _src(spark, sf_dir)["documents"]
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), _TOK_RE), lambda t: t != ""
            )
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # DF derives from TF (|doc,term| rows), not from a second pass over
    # the raw token stream. Counting via least(tf, 1) instead of count(1)
    # keeps the tf column referenced, so column pruning cannot specialize
    # this branch's aggregate — both branches canonicalize to the same
    # Exchange(doc_id, term) subtree and ReuseExchange tokenizes the
    # corpus ONCE (pinned by test_plans). least(tf, 1) == 1 always
    # (tf >= 1 by construction), so the count is exact.
    df = tf.groupBy("term").agg(F.sum(F.least(F.col("tf"), F.lit(1))).alias("df"))
    # Corpus size rides along as a 1-row aggregate cross join (broadcast)
    # instead of a separate .count() job per invocation.
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.select("doc_id", "term", "tfidf", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "text_bigrams_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '{_TOK_RE}'),
                                 t -> t <> '') AS ts
      FROM documents
    ), grams AS (
      SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                                   i -> ts[i] || ' ' || ts[i + 1])) AS bigram
      FROM toks
    )
    SELECT bigram, count(*) AS n
    FROM grams GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 25
    """,
)
def text_bigrams_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram mining: top-25 corpus bigrams.

    Bigrams come from a zero-copy array zip (tokens[i], tokens[i+1]) —
    ``transform(sequence(...))`` over the token array, exploded, then a
    plain count. Scale: the explode multiplies rows by avg tokens/doc;
    partial aggregation collapses them map-side, so the shuffle carries
    only |distinct bigrams x partitions|. Top-k is TakeOrdered.
    """
    d = _src(spark, sf_dir)["documents"]
    toks = F.filter(F.split(F.lower(F.col("text")), _TOK_RE), lambda t: t != "")
    # 0-based Spark array indexing: pairs (ts[i-1], ts[i]) for i in 1..n-1.
    # CASE-guarded: sequence(1, n) with n < 1 yields a DESCENDING range
    # ([1,0]), so a 0/1-token doc would index past the array and crash
    # under ANSI (round-8 hypothesis-sweep find); short docs contribute
    # no bigrams (slice(ts, 1, 0) is the type-correct empty array).
    grams = d.select(toks.alias("ts")).select(
        F.explode(
            F.expr(
                "CASE WHEN size(ts) >= 2 THEN "
                "transform(sequence(1, size(ts) - 1),"
                " i -> concat(ts[i - 1], ' ', ts[i])) "
                "ELSE slice(ts, 1, 0) END"
            )
        ).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(25)
    )


# BM25 retrieval: literal query terms + Okapi constants. The scoring
# arithmetic is written ONCE as SQL text and pasted into both engines,
# and per-term scores convert to integer micro-units BEFORE the per-doc
# sum — integer addition is order-independent, so the result has no
# float-summation-order edge between Spark's partial aggregates and
# DuckDB (the sim_pq_codes convention).
_BM25_QUERY = ("hash", "join", "scan", "batch")
_BM25_IDF = (
    "ln((CAST(n_docs AS DOUBLE) - df + CAST(0.5 AS DOUBLE))"
    " / (df + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))"
)
_BM25_TFNORM = (
    "(CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))"
    " / (tf + CAST(1.2 AS DOUBLE)"
    " * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))"
)
_BM25_MICRO = (
    f"CAST(round(({_BM25_IDF}) * ({_BM25_TFNORM}) * 1000000) AS BIGINT)"
)
_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_QUERY)


_BM25_ORACLE = f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{_TOK_RE}'),
                         t -> t <> '') AS ts
      FROM documents
    ), toks AS (
      SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM base
    ), tf AS (
      SELECT doc_id, term, max(dl) AS dl, count(*) AS tf
      FROM toks WHERE term IN ({_BM25_IN})
      GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(CAST(sum(len(ts)) AS BIGINT) AS DOUBLE)
               / count(*) AS avgdl
      FROM base
    )
    SELECT doc_id,
           CAST(sum({_BM25_MICRO}) AS BIGINT) AS bm25_micro,
           count(*) AS n_terms_hit
    FROM tf JOIN df USING (term) CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY bm25_micro DESC, doc_id
    LIMIT 10
    """


@register("text_bm25_topk", _BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval: top-10 documents for a literal keyword
    query (k1=1.2, b=0.75, Lucene idf) — the standard lexical-search
    half of a hybrid (BM25 + ANN) retrieval stack; sim_* provides the
    other half over the same corpus.

    Shape: the token stream filters to the |query| terms IMMEDIATELY
    after the explode, so everything downstream of the scan is
    O(docs x query_terms), not O(tokens): tf is a tiny grouped agg, df
    derives from tf (<= |query| rows, broadcast), doc length rides
    along scan-side as size(tokens) — no second corpus pass — and
    corpus stats are a broadcast 1-row aggregate. Per-term scores
    convert to integer micro-units before the per-doc sum, so the
    ranking is bit-identical across engines and partitionings (integer
    addition commutes; float summation order doesn't).

    Scale: one groupBy on (doc_id, term) over the filtered stream is
    the only data shuffle; top-10 is a TakeOrdered. This is the
    batch-scoring plan — for serving, precompute tf/df/dl as tables
    (same expressions) and the per-query work is the final join+sum.
    """
    d = _src(spark, sf_dir)["documents"]
    base = d.select(
        "doc_id",
        F.filter(F.split(F.lower(F.col("text")), _TOK_RE), lambda t: t != "").alias(
            "ts"
        ),
    )
    toks = base.select(
        "doc_id", F.size("ts").alias("dl"), F.explode("ts").alias("term")
    ).filter(F.col("term").isin(*_BM25_QUERY))
    tf = toks.groupBy("doc_id", "term").agg(
        F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = base.selectExpr("size(ts) AS dl0").selectExpr(
        "CAST(count(*) AS BIGINT) AS n_docs",
        "CAST(CAST(sum(dl0) AS BIGINT) AS DOUBLE) / count(*) AS avgdl",
    )
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .selectExpr("doc_id", f"{_BM25_MICRO} AS score_micro")
        .groupBy("doc_id")
        .agg(
            F.sum("score_micro").alias("bm25_micro"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25_micro").desc(), "doc_id")
        .limit(10)
    )


# Reciprocal-rank fusion of the two retrieval halves. RRF_K = 60 is the
# published constant (Cormack et al. 2009); contributions convert to
# integer micro-units so the fused score is engine-exact.
_RRF_K = 60
_RRF_TERM = "CAST(round(CAST(1000000 AS DOUBLE) / ({k} + {rank})) AS BIGINT)"


def _rrf_oracle() -> str:
    from .similarity import QUERY_VEC_ID, TOP_K

    term_bm = _RRF_TERM.format(k=_RRF_K, rank="r_bm25")
    term_ann = _RRF_TERM.format(k=_RRF_K, rank="r_ann")
    return f"""
    WITH bm_raw AS (SELECT * FROM ({_BM25_ORACLE})),
    bm AS (
      SELECT doc_id AS id,
             row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS r_bm25
      FROM bm_raw
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT emb AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
    ann_raw AS (
      SELECT e.vec_id,
             round((list_dot_product(e.emb, q.qv) / nullif(sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(q.qv, q.qv)), 0)), 4) AS cosine
      FROM e, q
      WHERE e.vec_id <> {QUERY_VEC_ID}
      ORDER BY cosine DESC, e.vec_id
      LIMIT {TOP_K}
    ),
    ann AS (
      SELECT vec_id AS id,
             row_number() OVER (ORDER BY cosine DESC, vec_id) AS r_ann
      FROM ann_raw
    )
    SELECT COALESCE(bm.id, ann.id) AS id,
           COALESCE({term_bm}, 0) + COALESCE({term_ann}, 0) AS rrf_micro,
           r_bm25, r_ann
    FROM bm FULL OUTER JOIN ann ON bm.id = ann.id
    ORDER BY rrf_micro DESC, id
    """


@register("retrieval_rrf_fusion", _rrf_oracle())
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    list (text_bm25_topk) and the ANN cosine list (sim_topk_brute
    shape) — rrf = sum over lists of 1/(60 + rank), the standard way
    to combine rankers with incomparable score scales.

    The id domains overlap by construction in the fixtures (vec_id and
    doc_id share the low range, the embeddings-cover-part-of-the-corpus
    case); ids ranked by only one list still score through the full
    outer join. Rank contributions are integer micro-units, so fusion
    is pure integer arithmetic — no float edge between engines.

    Scale: both input lists are already k-bounded (TakeOrdered plans),
    so the window ranks and the full outer join touch <= 2k rows total
    regardless of corpus size; fusion cost is O(k), the corpus cost is
    whatever the two retrievers cost.
    """
    from .similarity import sim_topk_brute

    bm = text_bm25_topk(spark, sf_dir)
    w_bm = W.orderBy(F.col("bm25_micro").desc(), "doc_id")
    bm_r = bm.select(
        F.col("doc_id").alias("id"), F.row_number().over(w_bm).alias("r_bm25")
    )
    ann = sim_topk_brute(spark, sf_dir)
    w_ann = W.orderBy(F.col("cosine").desc(), "vec_id")
    ann_r = ann.select(
        F.col("vec_id").alias("id"), F.row_number().over(w_ann).alias("r_ann")
    )
    term_bm = _RRF_TERM.format(k=_RRF_K, rank="r_bm25")
    term_ann = _RRF_TERM.format(k=_RRF_K, rank="r_ann")
    return (
        bm_r.join(ann_r, "id", "full_outer")
        .selectExpr(
            "id",
            f"COALESCE({term_bm}, 0) + COALESCE({term_ann}, 0) AS rrf_micro",
            "r_bm25",
            "r_ann",
        )
        .orderBy(F.col("rrf_micro").desc(), "id")
    )


@register(
    "q17_small_qty_revenue",
    f"""
    WITH thresholds AS (
      SELECT l_partkey AS t_partkey, 0.5 * avg(l_quantity) AS qty_limit
      FROM lineitem GROUP BY l_partkey
    )
    -- /7 makes the result an arbitrary real: exact-integer cents sum
    -- (order-free), ONE division on identical operands in both engines
    SELECT round(CAST({_money.cents_sum_sql("l_extendedprice")}
                 AS DOUBLE) / 700.0, 2) AS avg_yearly
    FROM lineitem JOIN thresholds ON l_partkey = t_partkey
    WHERE l_quantity < qty_limit
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: rows below half their group's average — the
    correlated-aggregate-subquery pattern, decorrelated into an
    aggregate + self-join.

    Scale: the per-part average is |parts| rows (small relative to the
    fact table) and AQE converts the join to broadcast when it fits;
    otherwise both sides shuffle on partkey — the same key, so bucketed
    storage makes it shuffle-free. The fact table is deliberately read
    twice (once aggregated, once raw): the single-scan alternative is a
    window-average over a full-fact shuffle, which moves 100 TB through
    the exchange to save one columnar re-scan of two columns — the
    wrong trade on columnar storage.
    """
    li = _src(spark, sf_dir)["lineitem"]
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li.join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        # /7 makes the result an arbitrary real: exact cents sum
        # (order-free), one division on identical operands both engines
        .agg(
            F.round(
                _money.cents_sum("l_extendedprice").cast("double")
                / F.lit(700.0),
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "array_agg_rollup",
    """
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
             AS priorities,
           array_to_string(list_sort(list(DISTINCT o_orderpriority))[1:2], ',')
             AS top2_alpha,
           len(list(DISTINCT o_orderpriority)) AS n_priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def array_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation round-trip: collect_set -> sort_array -> slice
    -> array_join, flattened to strings so the value-hash is
    engine-neutral.

    Scale: collect_set state is bounded by the distinct values per
    group — safe for low-cardinality facets, a deliberate anti-pattern
    for unbounded ones (documented; use top-k aggregation instead).
    """
    o = _src(spark, sf_dir)["orders"]
    arr = F.sort_array(F.collect_set("o_orderpriority"))
    return o.groupBy("o_orderstatus").agg(
        F.array_join(arr, ",").alias("priorities"),
        F.array_join(F.slice(arr, 1, 2), ",").alias("top2_alpha"),
        F.size(F.collect_set("o_orderpriority")).cast("bigint").alias(
            "n_priorities"
        ),
    )


@register(
    "full_outer_daily_activity",
    """
    WITH clicks AS (
      SELECT user_id, count(*) AS n_clicks FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ), purchases AS (
      SELECT user_id, count(*) AS n_purchases,
             round(sum(value), 2) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(c.n_clicks, 0) AS n_clicks,
           coalesce(p.n_purchases, 0) AS n_purchases,
           coalesce(p.purchase_value, 0.0) AS purchase_value
    FROM clicks c FULL OUTER JOIN purchases p ON c.user_id = p.user_id
    """,
)
def full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: per-user click vs purchase activity, keeping
    users present on either side — the reconciliation join (no silent
    row loss in either direction).

    Scale: full outer cannot broadcast (both sides must surface
    unmatched rows), so it is always a shuffle join on the key — plan
    accordingly: this is the join type that most rewards co-bucketed
    storage at 100 TB. Both sides derive from ONE persisted
    per-(user, type) aggregate, so the event stream is scanned once
    (measured via stage metrics) and the join inputs are already
    |users|-sized.
    """
    ev = _src(spark, sf_dir)["events"]
    per = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("v"),
        )
        .persist()
    )
    clicks = per.filter(F.col("event_type") == "click").select(
        "user_id", F.col("n").alias("n_clicks")
    )
    purchases = per.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("n").alias("n_purchases"),
        F.col("v").alias("purchase_value"),
    )
    joined = clicks.alias("c").join(
        purchases.alias("p"),
        F.col("c.user_id") == F.col("p.user_id"),
        "full_outer",
    )
    return joined.select(
        F.coalesce(F.col("c.user_id"), F.col("p.user_id")).alias("user_id"),
        F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
        F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
        F.coalesce(F.col("purchase_value"), F.lit(0.0)).alias("purchase_value"),
    )


@register(
    "correlated_scalar_subquery",
    """
    SELECT o_orderkey, o_totalprice,
           (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey)
             AS n_items,
           (SELECT round(coalesce(sum(l_quantity), 0.0), 2) FROM lineitem
            WHERE l_orderkey = o_orderkey) AS total_qty
    FROM orders
    WHERE o_totalprice > 400000
    """,
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list — the ORM-ish
    query shape users write constantly; Catalyst decorrelates each into
    an aggregate + left outer join rather than a per-row probe.

    Expressed via spark.sql on registered source views: scalar-subquery
    syntax has no DataFrame-API equivalent, and the point is that the
    engine's SQL front door handles it. Scale: after decorrelation the
    cost is two grouped aggregates on l_orderkey joined back — the
    selective filter on orders broadcasts into both joins under AQE.
    The two lineitem scans are intrinsic to the two independent
    subqueries; Catalyst merges them when the aggregates are compatible
    (here one counts, one sums a different column — kept separate to
    pin the general decorrelation path).
    """
    _src(spark, sf_dir)  # registers the source temp views
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey)
                 AS n_items,
               (SELECT round(coalesce(sum(l_quantity), 0.0), 2) FROM lineitem
                WHERE l_orderkey = o_orderkey) AS total_qty
        FROM orders
        WHERE o_totalprice > 400000
        """
    )


@register(
    "q18_large_orders",
    """
    SELECT o.o_orderkey, o.o_orderdate, round(o.o_totalprice, 2) AS o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 200
    )
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds a threshold
    — IN over a HAVING aggregate, planned as aggregate -> semi join ->
    re-aggregate.

    Scale: the HAVING subquery collapses lineitem to |qualifying
    orderkeys| rows before the semi join; both joins key on orderkey, so
    bucketed storage makes the whole query one shuffle. Lineitem is
    deliberately read twice (aggregated for the filter, raw for the
    re-aggregate): caching or shuffling the raw fact to avoid a
    two-column columnar re-scan costs more than the scan at 100 TB.
    """
    s = _src(spark, sf_dir)
    li = s["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    return (
        s["orders"]
        .join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
              F.col("o_orderkey") == F.col("b_orderkey"), "left_semi")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@register(
    "q19_disjunctive_revenue",
    """
    SELECT round(CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: disjunction of conjunctive brand/size/quantity
    bands across both join sides.

    Scale: Catalyst extracts the common single-side conjuncts from the
    OR (brand IN (...), size <= 35, quantity bounds) and pushes them
    below the join, shrinking both inputs before the broadcast; the
    full disjunction evaluates post-join. This is the query shape that
    punishes engines without predicate extraction.
    """
    s = _src(spark, sf_dir)
    li, p = s["lineitem"], s["part"]
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return joined.filter(band).agg(
        _disc_revenue_sum().alias(
            "revenue"
        )
    )


@register(
    "q22_idle_customers",
    """
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS threshold FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, count(*) AS n_custs,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > threshold
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 300000)
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: above-average-balance customers who never
    placed a large order — scalar-aggregate threshold (broadcast 1-row
    cross join) + filtered anti join + rollup.

    Scale: the threshold is one broadcast row; the anti join shuffles
    on custkey with its own filter pushed below, and drops payload
    columns from the probe side.
    """
    s = _src(spark, sf_dir)
    c, o = s["customer"], s["orders"]
    threshold = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("threshold")
    )
    big_orders = o.filter(F.col("o_totalprice") > 300000)
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "dedup_latest_version",
    """
    SELECT user_id, event_type, event_id, ts, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-version compaction: keep each key's most recent record —
    the CDC/upsert-log compaction every incremental lake table needs
    (deterministic tie-break on event_id).

    Scale: one shuffle on the key, per-partition sort, rank truncation;
    at 100 TB this is exactly the merge-on-read compaction pass, and
    pre-bucketed storage removes the shuffle.
    """
    ev = _src(spark, sf_dir)["events"]
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select("user_id", "event_type", "event_id", "ts", "value",
                  F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "funnel_signup_purchase",
    """
    WITH steps AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (WHERE t_signup IS NOT NULL) AS signed_up,
           count(*) FILTER (WHERE t_signup < t_click) AS clicked_after,
           count(*) FILTER (WHERE t_signup < t_click AND t_click < t_purchase)
             AS purchased_after
    FROM steps
    """,
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup -> click -> purchase, each step strictly
    after the previous (first-occurrence timestamps per user) — the
    conversion query behind every growth dashboard.

    Scale: ONE shuffle (the per-user aggregate); step ordering is plain
    column comparison on the aggregate row, not per-event joins. The
    conditional-min pattern is the same single-pass trick as the pivot.
    """
    ev = _src(spark, sf_dir)["events"]
    t = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts")))  # noqa: E731
    steps = ev.groupBy("user_id").agg(
        t("signup").alias("t_signup"),
        t("click").alias("t_click"),
        t("purchase").alias("t_purchase"),
    )
    return steps.agg(
        F.count_if(F.col("t_signup").isNotNull()).alias("signed_up"),
        F.count_if(F.col("t_signup") < F.col("t_click")).alias("clicked_after"),
        F.count_if(
            (F.col("t_signup") < F.col("t_click"))
            & (F.col("t_click") < F.col("t_purchase"))
        ).alias("purchased_after"),
    )


@register(
    "histogram_prices",
    """
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (50k buckets) — binning by
    floor division, one aggregation pass.

    Scale: bucket count is data-independent, so the shuffle is
    |buckets| x partitions; for data-dependent bin edges use the
    quantile sketch (stats_approx_sketches) to pick edges first.
    """
    o = _src(spark, sf_dir)["orders"]
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@register(
    "decontaminate_overlap",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '{_TOK_RE}'),
                                 t -> t <> '') AS ts
      FROM documents
    ), shingles AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(ts) - 4, 0)),
               i -> md5(array_to_string(ts[i:i+4], ' '))))) AS sh
      FROM toks
    ), bench AS (
      SELECT DISTINCT sh FROM shingles WHERE doc_id % 11 = 0
    ), hits AS (
      SELECT s.doc_id, count(*) AS n_overlap
      FROM shingles s JOIN bench b USING (sh)
      WHERE s.doc_id % 11 <> 0
      GROUP BY s.doc_id
    )
    SELECT doc_id, n_overlap FROM hits WHERE n_overlap >= 1
    """,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing 5-gram
    shingles with a benchmark set (here simulated as every 11th doc) —
    the standard eval-leakage check before LLM training.

    Shingles are md5'd 5-token windows, deduped per document; the
    benchmark side collapses to a distinct-hash set that broadcasts
    into the overlap join. Scale: |bench shingles| is benchmark-sized
    (small by definition), so the training side streams through a
    broadcast semi-ish join with a count — no shuffle of the corpus.
    """
    d = _src(spark, sf_dir)["documents"]
    toks = F.filter(F.split(F.lower(F.col("text")), _TOK_RE), lambda t: t != "")
    # 5-token windows via 1-based slice(); distinct within doc.
    shingles = d.select(toks.alias("ts"), "doc_id").select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    # CASE-guarded like text_bigrams_topk: docs shorter
                    # than one 5-token window contribute no shingles —
                    # the old greatest() guard produced sequence(1,0) =
                    # [1,0] and slice(ts, 0, 5) errors on start 0
                    "CASE WHEN size(ts) >= 5 THEN "
                    "transform(sequence(1, size(ts) - 4),"
                    " i -> md5(array_join(slice(ts, i, 5), ' '))) "
                    "ELSE slice(ts, 1, 0) END"
                )
            )
        ).alias("sh"),
    )
    bench = (
        shingles.filter(F.col("doc_id") % 11 == 0).select("sh").distinct()
    )
    train = shingles.filter(F.col("doc_id") % 11 != 0)
    return (
        train.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= 1)
    )


@register(
    "sample_weighted_mix",
    """
    SELECT source, count(*) AS n
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 <
          CASE WHEN substr(source, 4)::INT < 5 THEN 80
               WHEN substr(source, 4)::INT < 10 THEN 50
               WHEN substr(source, 4)::INT < 15 THEN 30
               ELSE 10 END
    GROUP BY source
    """,
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: per-source sampling rates (source tiers
    at 80/50/30/10%) via the deterministic hash-bucket trick — the
    training-mix composition step, reproducible across engines and
    re-runs.

    Scale: scan-side filter, zero shuffle beyond the count; changing
    the mix is a literal change, not a new shuffle topology.
    """
    d = _src(spark, sf_dir)["documents"]
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    src_num = F.substring("source", 4, 10).cast("int")
    rate = (
        F.when(src_num < 5, 80)
        .when(src_num < 10, 50)
        .when(src_num < 15, 30)
        .otherwise(10)
    )
    return (
        d.filter(bucket < rate)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_cohort_retention",
    """
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), cohorts AS (
      SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day
      FROM activity
    )
    SELECT cohort_day, datediff('day', cohort_day, day) AS day_offset,
           count(*) AS n_users
    FROM cohorts
    WHERE datediff('day', cohort_day, day) BETWEEN 0 AND 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted at day offsets 0-7 — the standard product-analytics
    retention triangle.

    Single-scan by construction: the distinct (user, day) activity set
    is the one intermediate, and the cohort day attaches via a window
    min over user_id instead of a first-activity self-join — no join,
    no second pass over events.

    Scale: distinct collapses the event stream to |user x active-day|
    rows map-side before its shuffle; the window shuffles that (already
    small) set on user_id; the final rollup is |cohorts x 8| rows.
    Per-user state in the window is one date.
    """
    ev = _src(spark, sf_dir)["events"]
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    cohort = activity.withColumn(
        "cohort_day", F.min("day").over(W.partitionBy("user_id"))
    )
    off = F.datediff(F.col("day"), F.col("cohort_day"))
    return (
        cohort.select("cohort_day", off.cast("bigint").alias("day_offset"))
        .filter((F.col("day_offset") >= 0) & (F.col("day_offset") <= 7))
        # timestamp_ntz output: pandas materializes Spark DATE as
        # object(datetime.date) but DuckDB DATE as datetime64, which the
        # driver's dtype-sensitive hash rejects; midnight timestamps agree
        .groupBy(
            F.col("cohort_day").cast("timestamp_ntz").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "events_rolling_wau",
    """
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), days AS (
      SELECT DISTINCT day FROM activity
    ), contrib AS (
      SELECT DISTINCT a.user_id, d.day AS wau_day
      FROM activity a
      JOIN days d ON d.day BETWEEN a.day AND a.day + 6
    )
    SELECT wau_day, count(*) AS wau
    FROM contrib GROUP BY wau_day ORDER BY wau_day
    """,
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per observed day (WAU) — rolling
    COUNT DISTINCT, which no engine's window frames support directly.

    Instead of a per-day self-join over the activity range, each
    (user, day) row explodes into the exactly-7 report days it
    contributes to; distinct (user, report-day) pairs then count per
    day. The persisted distinct-activity set feeds both the explode and
    the observed-day spine, so events is scanned once.

    Scale: the explode factor is a constant 7 (window length), the
    distinct collapses map-side before its shuffle, and the spine semi
    join broadcasts — linear in |user x active-day| with no range join
    anywhere.
    """
    ev = _src(spark, sf_dir)["events"]
    act = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .persist()
    )
    days = act.select("day").distinct().withColumnRenamed("day", "wau_day")
    contrib = act.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("wau_day"),
    ).dropDuplicates(["user_id", "wau_day"])
    return (
        contrib.join(F.broadcast(days), "wau_day", "left_semi")
        # timestamp_ntz output: align pandas dtype with the DuckDB oracle
        # (see events_cohort_retention)
        .groupBy(F.col("wau_day").cast("timestamp_ntz").alias("wau_day"))
        .agg(F.count(F.lit(1)).alias("wau"))
        .orderBy("wau_day")
    )


# -- winsorization (outlier clamping for feature pipelines) ----------------


@register(
    "stats_winsorize",
    f"""
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.01) AS lo,
             quantile_cont(o_totalprice, 0.99) AS hi
      FROM orders
    )
    SELECT o_orderstatus,
           count(*) AS n,
           count(*) FILTER (WHERE o_totalprice < lo OR o_totalprice > hi)
             AS n_clamped,
           -- means are arbitrary reals: exact-integer cents sums
           -- (order-free), clamped rows contribute count * bound with
           -- the identical double the clamp itself uses; ONE division
           {_money.money_avg_sql("o_totalprice")} AS raw_avg,
           round((CAST(sum(CASE WHEN o_totalprice >= lo
                                 AND o_totalprice <= hi
                    THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                    ELSE 0 END) AS DOUBLE) / 100.0
                  + count(*) FILTER (WHERE o_totalprice < lo) * min(lo)
                  + count(*) FILTER (WHERE o_totalprice > hi) * min(hi))
                 / count(*), 2) AS wins_avg
    FROM orders, b
    GROUP BY o_orderstatus
    """,
)
def stats_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp a metric to its [p1, p99] band and report
    per-group raw vs clamped means plus how many rows were clamped —
    the standard outlier treatment before a feature lands in a model
    (means after clamping are robust; rows are never dropped).

    Shape: one exact-percentile aggregate produces the 1-row bounds
    (linear-interpolated, same definition as the oracle's
    quantile_cont); the bounds broadcast into the main scan, and the
    per-group stats are one partial-aggregated groupBy. Two scans
    total — the bounds pass is unavoidable for exact quantiles.

    Scale: at 100 TB swap the bounds pass to approx_percentile (one
    fixed-memory sketch, same broadcast shape) — documented, not
    silently done, because the oracle pins exact interpolation.
    """
    o = _src(spark, sf_dir)["orders"]
    b = o.agg(
        F.expr("percentile(o_totalprice, 0.01)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.99)").alias("hi"),
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    in_band = (F.col("o_totalprice") >= F.col("lo")) & (
        F.col("o_totalprice") <= F.col("hi")
    )
    in_cents = F.sum(
        F.when(in_band, cents).otherwise(F.lit(0)).cast("decimal(38,0)")
    )
    n_lo = F.count_if(F.col("o_totalprice") < F.col("lo"))
    n_hi = F.count_if(F.col("o_totalprice") > F.col("hi"))
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(
                (F.col("o_totalprice") < F.col("lo"))
                | (F.col("o_totalprice") > F.col("hi"))
            ).alias("n_clamped"),
            # means are arbitrary reals: exact cents sums, clamped rows
            # contribute count * bound (the same double the clamp uses),
            # one division — mirrors the oracle expression shape exactly
            F.round(
                F.sum(cents.cast("decimal(38,0)")).cast("double")
                / (F.count(F.lit(1)) * F.lit(100.0)),
                2,
            ).alias("raw_avg"),
            F.round(
                (
                    in_cents.cast("double") / F.lit(100.0)
                    + n_lo * F.min("lo")
                    + n_hi * F.min("hi")
                )
                / F.count(F.lit(1)),
                2,
            ).alias("wins_avg"),
        )
    )


# -- group-wise linear regression (trend estimation) -----------------------


@register(
    "stats_regression_trend",
    """
    SELECT o_orderstatus,
           round(regr_slope(o_totalprice,
                            date_diff('day', DATE '1970-01-01', o_orderdate)), 4)
             AS slope_per_day,
           round(regr_intercept(o_totalprice,
                                date_diff('day', DATE '1970-01-01', o_orderdate)), 2)
             AS intercept,
           round(regr_r2(o_totalprice,
                         date_diff('day', DATE '1970-01-01', o_orderdate)), 6) AS r2,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def stats_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend: slope/intercept/R^2 of
    order value against time, via the SQL-standard ``regr_*``
    aggregates — the closed-form regression every metrics pipeline
    runs before reaching for ML ("is revenue drifting, and does time
    explain it?").

    Shape: regr_* aggregates carry fixed-size moment state
    (n, sum x, sum y, sum xy, sum x^2) with map-side partials — ONE
    shuffle of a few doubles per group, identical plan budget to avg.
    The x axis is integer days-since-epoch so both engines regress on
    exactly the same values.

    Scale: closed-form moments at any size; for millions of groups it
    is still one partial-aggregated groupBy. R^2 near zero on TPC-H is
    the honest answer (order values are not time-trended) — the
    operator's job is computing it, not finding a story.
    """
    o = _src(spark, sf_dir)["orders"]
    x = F.datediff("o_orderdate", F.lit("1970-01-01").cast("date")).cast("double")
    y = F.col("o_totalprice")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope_per_day"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.count(F.lit(1)).alias("n"),
    )


# -- RFM segmentation (recency / frequency / monetary) ---------------------


@register(
    "customer_rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey,
             ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quintile-score every customer on recency
    (last order date), frequency (order count), and monetary (total
    spend), then count the population of each (R, F, M) cell — the
    classic churn/VIP segmentation grid.

    Determinism note: ntile over a metric with ties is
    order-dependent, so every window's ORDER BY carries o_custkey as
    the tiebreak — both engines then assign identical quintiles.

    Scale: orders reduce to |customers| rows in one partial-aggregated
    pass; the three ntile windows are unpartitioned (global quantile
    ranks) over that reduced relation — at billions of customers swap
    ntile for a two-pass percentile-boundary join (approx_percentile
    the boundaries, then a scan-side CASE), which removes the global
    sort entirely. The cell rollup is |5^3| rows.
    """
    o = _src(spark, sf_dir)["orders"]
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    scored = rfm.select(
        "o_custkey",
        F.ntile(5).over(W.orderBy("last_order", "o_custkey")).alias("r_score"),
        F.ntile(5).over(W.orderBy("frequency", "o_custkey")).alias("f_score"),
        F.ntile(5).over(W.orderBy("monetary", "o_custkey")).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# -- correlated LATERAL subquery join --------------------------------------


# One SQL text, both engines: Spark and DuckDB accept the identical
# LATERAL statement, so the query body IS the oracle (no drift risk).
_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
    WHERE c.c_custkey <= 200
"""


@register("lateral_top_orders", _LATERAL_SQL)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join: each customer's top-3 orders
    by value, stated as a per-row subquery with ORDER BY + LIMIT — the
    SQL shape ORMs and migrated Postgres/BQ workloads produce (the
    window-rank formulation of the same question is
    window_top_parts_per_brand).

    Catalyst decorrelates the lateral into a join + per-key rank — no
    per-customer re-execution survives into the physical plan, which
    is the entire point: the nested-loop the syntax implies would be
    |customers| separate order scans at 100 TB; the decorrelated plan
    is one shuffle each side. Through the SQL front door so the
    DecorrelateLateralSubquery path itself is what's under test.
    """
    _src(spark, sf_dir)  # registers temp views: customer, orders
    return spark.sql(_LATERAL_SQL)


# -- exponentially weighted moving average (time-series smoothing) ---------

EWMA_ALPHA = 0.2  # weight on the most recent observation
EWMA_WINDOW = 30  # trailing days in the (truncated) weight sum

# Decay weights precomputed ONCE in Python, QUANTIZED to integer
# micro-weights, and inlined as literals into BOTH engines'
# expressions. Two separate float-parity traps forced this shape
# (both observed on this machine): (1) JVM Math.pow and DuckDB/glibc
# pow are bitwise-divergent for pow(0.8, k) at several k; (2) even
# with shared double weights, the two engines' fold association
# differs by an ulp, which at sf0.1 landed one row's weighted mean
# exactly on a round-half boundary (…69905 vs …699049…). With integer
# cents x integer weights the numerator/denominator sums are EXACT in
# any association order; the single double division then runs on
# bit-identical operands in both engines. W[j] = round(decay^j * 1e6).
_EWMA_W = [round((1.0 - EWMA_ALPHA) ** j * 1_000_000) for j in range(EWMA_WINDOW)]
_EWMA_W_SQL = ", ".join(str(w) for w in _EWMA_W)


@register(
    "timeseries_ewma",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders GROUP BY o_orderdate
    ), arr AS (
      SELECT day, cents,
             list(cents) OVER (ORDER BY day
                               ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING
                               AND CURRENT ROW) AS win
      FROM daily
    ), wlit AS (SELECT [{_EWMA_W_SQL}] AS wv)
    SELECT day, cents / 100.0 AS revenue,
           round(
             CAST(list_sum([win[i] * wv[len(win) - i + 1]
                            for i in generate_series(1, len(win))])
               AS DOUBLE)
             / (CAST(list_sum([wv[len(win) - i + 1]
                               for i in generate_series(1, len(win))])
                  AS DOUBLE) * 100.0),
             4) AS ewma
    FROM arr, wlit
    """,
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily revenue
    (alpha={EWMA_ALPHA}, truncated at {EWMA_WINDOW} trailing days) —
    the smoothing curve behind alerting baselines and trend charts,
    where a plain moving average lags regime changes.

    EWMA's textbook form is a recursion (s_t = a*x_t + (1-a)*s_t-1),
    which SQL windows cannot express; the truncated-weight identity
    (weights (1-a)^lag over a bounded window, renormalized) is exact
    for the truncated series and fully declarative: collect the
    trailing window into an array, fold weights over it per row.

    Scale: the full-data pass is the daily group-by reduction; the
    window + per-row fold run over |days| rows with <= {EWMA_WINDOW}
    elements each — the same reduce-before-window discipline as
    anomaly_zscore_daily (the per-row HOF is over a bounded array on
    a bounded relation, not data-sized).
    """
    o = _src(spark, sf_dir)["orders"]
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = W.orderBy("day").rowsBetween(-(EWMA_WINDOW - 1), 0)
    arr = daily.select(
        "day", "cents", F.collect_list("cents").over(w).alias("win")
    )
    wv = "array(" + ", ".join(f"{x}L" for x in _EWMA_W) + ")"
    # DECIMAL(38,0) accumulator: DuckDB's list_sum silently promotes
    # past int64 while a bigint fold in Spark would WRAP (ANSI off) —
    # at ~$3.1B daily revenue the 30-term cents x 1e6-weight sum
    # crosses 2^63. Decimal keeps the sum exact on both sides; each
    # individual PRODUCT must still fit bigint (daily cents < 9.2e12,
    # i.e. < $92B/day — comfortably above any real corpus).
    num = F.expr(
        "aggregate(zip_with(win, sequence(1, size(win)), "
        f"(x, i) -> x * element_at({wv}, size(win) - i + 1)), "
        "cast(0 as decimal(38,0)), (s, x) -> s + x)"
    )
    den = F.expr(
        "aggregate(transform(sequence(1, size(win)), "
        f"i -> element_at({wv}, size(win) - i + 1)), "
        "cast(0 as decimal(38,0)), (s, x) -> s + x)"
    )
    return arr.select(
        "day",
        (F.col("cents") / F.lit(100.0)).alias("revenue"),
        F.round(
            num.cast("double") / (den.cast("double") * F.lit(100.0)), 4
        ).alias("ewma"),
    )


# -- grouped Pandas UDF (applyInPandas) ------------------------------------


@register(
    "pandas_user_trend",
    """
    SELECT user_id,
           count(*) AS n_events,
           round(regr_slope(value, epoch(ts)), 6) AS slope_per_sec
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 2
    """,
)
def pandas_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value over time, computed in a
    grouped Pandas UDF (``applyInPandas``) — the batch grouped-map API
    (mapInPandas = per-partition, applyInPandasWithState = stateful
    streaming; this is the third Arrow surface, the one per-entity
    model fitting uses when the math outgrows SQL).

    The slope itself IS SQL-expressible (regr_slope — exactly what the
    oracle runs), which is deliberate: the Python path must reproduce
    the closed-form answer bit-for-rounded-bit, so the test proves the
    Arrow round-trip, the float math, and the grouping semantics all
    line up before anyone trusts this surface with real scipy.

    Scale: one shuffle on the grouping key; grouping is by a
    DETERMINISTIC hash bucket of the user (``pmod(xxhash64(user_id),
    n_buckets)`` — guide §2.5's derive-synthetic-keys-deterministically
    rule), not by raw user_id: Spark's grouped-map machinery pays a
    per-GROUP cost (Arrow slice, function dispatch, output frame,
    schema validation), so one group per user made the stage
    per-user-overhead-bound (measured 3.5s at sf0.1 for ~40k users;
    bucketed: sub-second). Inside a bucket the per-user fit is the
    IDENTICAL pandas code over the identical per-user frames
    (``pdf.groupby`` slices), so the floats are bit-for-bit what the
    one-group-per-user form produced. n_buckets scales with the
    cluster (4x parallelism), keeping per-task frames at
    |users|/n_buckets users each; skewed USERS still bound a frame by
    per-user event counts as before.
    """
    import pandas as pd

    ev = _src(spark, sf_dir)["events"]

    def _fit_users(pdf: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        ns: list[int] = []
        slopes: list[float | None] = []
        for uid, g in pdf.groupby("user_id", sort=False):
            n = len(g)
            if n < 2:
                continue
            x = g["ts"].astype("int64") / 1e9  # epoch seconds (ns -> s)
            y = g["value"].astype("float64")
            xm, ym = x.mean(), y.mean()
            denom = ((x - xm) ** 2).sum()
            # Zero time-variance (all events share a timestamp):
            # regr_slope is NULL, never NaN/inf — match the oracle
            # exactly. Rounding mode matters on exact half-boundaries
            # (round-8 hypothesis find: slope 0.0008125 -> Python's
            # half-EVEN round() gives ...812, DuckDB's round() is
            # half-AWAY -> ...813): quantize the shortest decimal repr
            # half-away like the engine side's F.round/DuckDB do.
            if denom == 0:
                slope = None
            else:
                from decimal import ROUND_HALF_UP, Decimal

                slope = float(
                    Decimal(repr(float(((x - xm) * (y - ym)).sum() / denom)))
                    .quantize(Decimal("0.000001"), ROUND_HALF_UP)
                )
            ids.append(int(uid))
            ns.append(n)
            slopes.append(slope)
        return pd.DataFrame(
            {
                "user_id": pd.Series(ids, dtype="int64"),
                "n_events": pd.Series(ns, dtype="int64"),
                # object dtype: a float64 Series would coerce the
                # zero-time-variance None to NaN; Arrow maps object-None
                # to SQL NULL (what regr_slope and the oracle emit)
                "slope_per_sec": pd.Series(slopes, dtype="object"),
            }
        )

    n_buckets = max(64, spark.sparkContext.defaultParallelism * 4)
    return (
        ev.select("user_id", "ts", "value")
        .withColumn(
            "bucket", F.pmod(F.xxhash64("user_id"), F.lit(n_buckets))
        )
        .groupBy("bucket")
        .applyInPandas(
            _fit_users, "user_id bigint, n_events bigint, slope_per_sec double"
        )
    )


# -- forward fill (last observation carried forward) -----------------------


@register(
    "timeseries_locf",
    """
    WITH bounds AS (
      SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ), daily AS (
      SELECT o_orderdate AS day, round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY o_orderdate
    )
    SELECT s.day,
           d.revenue AS observed,
           last_value(d.revenue IGNORE NULLS)
             OVER (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS filled
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def timeseries_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward): join the daily
    series onto a dense day spine and fill gaps with the most recent
    observed value via an IGNORE NULLS window — the resampling step
    sensor/price/metric series need before any rolling computation
    (zero-filling, as timeseries_gapfill does for counts, is wrong for
    level metrics: a missing reading is not a zero reading).

    Shape: the spine derives from a 1-row min/max aggregate (sequence +
    explode, broadcast into the join, same as gapfill); the fill is one
    ordered window with last(ignorenulls=True) — Spark's ignore-nulls
    frame navigation, DuckDB's IGNORE NULLS, same semantics. The
    window is unpartitioned over |days| rows — bounded by calendar,
    not data (reduce-before-window as always).
    """
    o = _src(spark, sf_dir)["orders"]
    bounds = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    ).select(F.col("day").cast("date").alias("day"))
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        spine.join(daily, "day", "left")
        .select(
            # timestamp_ntz output: pandas materializes Spark DATE as
            # object(datetime.date) but DuckDB DATE as datetime64; the
            # driver's dtype-sensitive hash needs both sides datetime64
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.col("revenue").alias("observed"),
            F.last("revenue", ignorenulls=True).over(w).alias("filled"),
        )
    )


@register(
    "sample_temperature_mix",
    """
    WITH lc AS (
      SELECT lang, count(*) AS n_total FROM documents GROUP BY lang
    ), tot AS (
      SELECT sum(n_total) AS big_n, sum(pow(n_total, 0.7)) AS z FROM lc
    ), rates AS (
      SELECT lang, n_total,
             least(1.0, 0.5 * big_n * pow(n_total, 0.7) / z / n_total) AS r
      FROM lc, tot
    )
    SELECT d.lang,
           any_value(rates.n_total) AS n_total,
           count(*) AS n_kept,
           round(any_value(rates.r), 6) AS rate
    FROM documents d JOIN rates ON d.lang = rates.lang
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          % 1000000 < CAST(floor(rates.r * 1000000) AS BIGINT)
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (the mT5/XLM-R alpha
    sampling): target share of language l is p_l^alpha renormalized
    (alpha=0.7), so head languages are downsampled and tail languages
    keep ~all their data; beta=0.5 sets the corpus-wide keep fraction.
    Per-doc keep is the deterministic md5-bucket trick (reproducible
    across engines and re-runs, like sample_weighted_mix), with the
    per-language rate r_l = min(1, beta * N * p_l^alpha / Z / n_l)
    computed FROM corpus statistics rather than hand-set tiers.

    Scale: language counts are |langs| rows; the rates table broadcasts
    into a scan-side filter — the only full-data shuffle is the final
    per-language count. Changing alpha/beta re-plans nothing.
    """
    d = _src(spark, sf_dir)["documents"].select("doc_id", "lang")
    lc = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    tot = lc.agg(
        F.sum("n_total").alias("big_n"),
        F.sum(F.pow("n_total", F.lit(0.7))).alias("z"),
    )
    rates = (
        lc.crossJoin(F.broadcast(tot))
        .withColumn(
            "r",
            F.least(
                F.lit(1.0),
                F.lit(0.5)
                * F.col("big_n")
                * F.pow("n_total", F.lit(0.7))
                / F.col("z")
                / F.col("n_total"),
            ),
        )
        .select("lang", "n_total", "r")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1000000
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(bucket < F.floor(F.col("r") * 1000000).cast("bigint"))
        .groupBy("lang")
        .agg(
            F.any_value(F.col("n_total")).alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.any_value(F.col("r")), 6).alias("rate"),
        )
        .orderBy("lang")
    )


@register(
    "events_pareto_concentration",
    """
    WITH per_user AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ), ranked AS (
      SELECT n,
             sum(n) OVER (ORDER BY n DESC, user_id) AS running,
             sum(n) OVER () AS total,
             row_number() OVER (ORDER BY n DESC, user_id) AS rnk,
             count(*) OVER () AS n_users
      FROM per_user
    )
    SELECT
      CAST(any_value(n_users) AS BIGINT) AS n_users,
      CAST(min(CASE WHEN running >= 0.8 * total THEN rnk END) AS BIGINT)
        AS users_for_80pct,
      round(max(CASE WHEN rnk <= greatest(1, CAST(floor(n_users * 0.01) AS INT))
                     THEN running END) * 1.0 / any_value(total), 4)
        AS share_top_1pct
    FROM ranked
    """,
)
def events_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration (the Pareto/80-20 curve): how many users
    produce 80% of events, and what share the top 1% produce — the
    corpus-composition diagnostic behind per-author caps in training
    pipelines (one prolific source must not dominate the mix; the
    supplier-side analogue is supplier_concentration_hhi).

    Scale: events reduce to one row per user FIRST; the window pass
    runs over |users|, not |events| — and at 100 TB |users| after the
    reduce is the small side. Ties break on user_id so the rank (and
    the two thresholds) are engine-deterministic.
    """
    ev = _src(spark, sf_dir)["events"]
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as W

    w_order = W.orderBy(F.col("n").desc(), "user_id")
    w_all = W.partitionBy()
    ranked = per_user.select(
        "n",
        F.sum("n").over(w_order.rowsBetween(W.unboundedPreceding, 0)).alias(
            "running"
        ),
        F.sum("n").over(w_all).alias("total"),
        F.row_number().over(w_order).alias("rnk"),
        F.count(F.lit(1)).over(w_all).alias("n_users"),
    )
    top1 = F.greatest(
        F.lit(1), F.floor(F.col("n_users") * 0.01).cast("int")
    )
    return ranked.agg(
        F.any_value(F.col("n_users")).cast("bigint").alias("n_users"),
        F.min(
            F.when(F.col("running") >= 0.8 * F.col("total"), F.col("rnk"))
        )
        .cast("bigint")
        .alias("users_for_80pct"),
        F.round(
            F.max(F.when(F.col("rnk") <= top1, F.col("running")))
            / F.any_value(F.col("total")),
            4,
        ).alias("share_top_1pct"),
    )
