"""Physical-plan regression tests (SURVEY.md §4).

Pins the scale-critical plan properties per operator: predicate
pushdown into parquet scans, column-pruned read schemas, broadcast
joins for small dimensions, and bounded shuffle counts. A change that
silently de-optimizes a plan fails here even if results stay correct.
"""

from __future__ import annotations

from dbt_bigquery_udf_spark import queries as Q
from dbt_bigquery_udf_spark.plans import plan_facts


def _facts(spark, sf_small, name):
    return plan_facts(Q.QUERIES[name](spark, sf_small))


def test_tvf_filter_pushdown_no_shuffle(spark, sf_small):
    """The TVF's WHERE id = <param> must reach the parquet scan after
    UDF/TVF inlining (SURVEY.md §2.2 Q2), and scan->filter->project
    needs no shuffle."""
    f = _facts(spark, sf_small, "ref_tvf_param")
    assert any("EqualTo(event_type,view)" in p for p in f.pushed_filters), f.pushed_filters
    assert f.exchanges == 0, f.text


def test_q5_broadcasts_small_dims(spark, sf_small):
    """Multi-way join: every small dimension side must broadcast (no
    sort-merge join at this shape), with pruned scan schemas."""
    f = _facts(spark, sf_small, "q5_nation_volume")
    assert f.broadcast_joins >= 3, f.text
    assert f.sort_merge_joins == 0, f.text
    cols = f.scan_columns()
    assert "l_comment" not in cols and "s_comment" not in cols, cols


def test_q1_prunes_and_pushes(spark, sf_small):
    """TPC-H Q1 shape: shipdate filter pushed to the scan; only the 6
    needed lineitem columns read; exactly one shuffle (the groupBy)."""
    f = _facts(spark, sf_small, "q1_pricing_summary")
    assert any("l_shipdate" in p for p in f.pushed_filters), f.pushed_filters
    assert "l_orderkey" not in f.scan_columns(), f.read_schemas
    assert f.exchanges == 1, f.text


def test_text_ops_are_narrow(spark, sf_small):
    """Per-document text analysis must stay shuffle-free and read only
    the needed columns."""
    f = _facts(spark, sf_small, "text_token_stats")
    assert f.exchanges == 0, f.text
    assert "lang" not in f.scan_columns(), f.read_schemas


def test_topk_has_no_join_or_shuffle(spark, sf_small):
    """Brute-force cosine top-k folds the query vector into the plan as
    a literal: no join, no shuffle; global top-k via ordered take."""
    f = _facts(spark, sf_small, "sim_topk_brute")
    assert f.exchanges == 0, f.text
    assert f.broadcast_joins == 0 and f.sort_merge_joins == 0, f.text
    assert "TakeOrderedAndProject" in f.text
    assert any("vec_id" in p for p in f.pushed_filters), f.pushed_filters


def test_dedup_exact_single_shuffle(spark, sf_small):
    """Exact dedup is one hash aggregation: exactly one exchange, and
    the scan reads only (doc_id, text)."""
    f = _facts(spark, sf_small, "dedup_exact")
    assert f.exchanges == 1, f.text
    assert f.scan_columns() <= {"doc_id", "text"}, f.read_schemas


def test_pivot_is_single_aggregate(spark, sf_small):
    """Explicit-value pivot compiles to one aggregation: exactly one
    shuffle, no value-discovery pass, scan pruned to the two columns."""
    f = _facts(spark, sf_small, "pivot_status_priority")
    assert f.exchanges == 1, f.text
    assert f.scan_columns() <= {"o_orderstatus", "o_orderpriority"}, f.read_schemas


def test_unpivot_is_expand_no_extra_shuffle(spark, sf_small):
    """Unpivot is a row-local Expand after the aggregate: still exactly
    one shuffle (the groupBy's)."""
    f = _facts(spark, sf_small, "unpivot_order_measures")
    assert f.exchanges == 1, f.text
    assert "Expand" in f.text


def test_sample_filter_is_scan_side(spark, sf_small):
    """Deterministic hash sampling must stay a scan-stage filter: no
    shuffle, no join, pruned read schema."""
    f = _facts(spark, sf_small, "sample_hash_pct")
    assert f.exchanges == 0, f.text
    assert f.broadcast_joins == 0 and f.sort_merge_joins == 0, f.text
    assert f.scan_columns() <= {"l_orderkey", "l_linenumber", "l_extendedprice"}


def test_tfidf_broadcasts_df_side(spark, sf_small):
    """TF-IDF joins term frequencies to document frequencies on the
    term key; the |vocab|-sized DF side must broadcast — no sort-merge
    join in the plan."""
    f = _facts(spark, sf_small, "text_tfidf_topk")
    assert f.broadcast_joins >= 1, f.text
    assert f.sort_merge_joins == 0, f.text


def test_tfidf_tokenizes_once(spark, sf_small):
    """The TF and DF branches share one tokenize->Exchange(doc_id, term)
    subtree; ReuseExchange must fire so the corpus is scanned and
    exploded ONCE (at 100 TB the token stream dominates the query)."""
    df = Q.QUERIES["text_tfidf_topk"](spark, sf_small)
    df.collect()  # ReuseExchange is only visible in the AQE-final plan
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, executed


def test_gapfill_spine_joins_broadcast(spark, sf_small):
    """The hour spine is a one-row-aggregate explode; its join against
    the hourly counts must not be a sort-merge join."""
    f = _facts(spark, sf_small, "timeseries_gapfill")
    assert f.sort_merge_joins == 0, f.text


def test_global_sort_page_is_take_ordered(spark, sf_small):
    """ORDER BY + LIMIT/OFFSET executes as TakeOrdered — never a full
    global sort."""
    f = _facts(spark, sf_small, "global_sort_page")
    assert "TakeOrderedAndProject" in f.text, f.text
    assert f.exchanges == 0, f.text


def test_asof_join_single_shuffle(spark, sf_small):
    """The as-of join is union + one window pass: exactly one exchange
    (user_id), never a range/nested-loop join."""
    f = _facts(spark, sf_small, "asof_click_attribution")
    assert f.exchanges == 1, f.text
    assert f.nested_loop_joins == 0, f.text


def test_interval_join_no_nested_loop(spark, sf_small):
    """The binned interval join must stay an equi join on the bin key —
    no BroadcastNestedLoopJoin/CartesianProduct from the raw range
    predicate."""
    f = _facts(spark, sf_small, "interval_join_errors")
    assert f.nested_loop_joins == 0, f.text


def test_q19_pushes_common_predicates(spark, sf_small):
    """Catalyst must extract single-side conjuncts from the OR bands
    and push them into the scans (brand IN-set on part; quantity bounds
    on lineitem)."""
    f = _facts(spark, sf_small, "q19_disjunctive_revenue")
    pushed = " ".join(f.pushed_filters)
    assert "p_brand" in pushed, f.pushed_filters
    assert "l_quantity" in pushed, f.pushed_filters
    assert f.broadcast_joins >= 1, f.text


def test_q1_stays_in_codegen(spark, sf_small):
    """The aggregate pipeline must run inside whole-stage codegen (at
    least one span; a zero here means the hot path fell back to
    interpreted eval). Codegen spans exist only on the AQE-final
    executed plan, so this runs the query."""
    f = plan_facts(Q.QUERIES["q1_pricing_summary"](spark, sf_small), execute=True)
    assert f.codegen_spans >= 1, f.text


def test_train_split_is_scan_parallel(spark, sf_small):
    """Split/shard assignment must be pure per-row arithmetic: exactly
    one exchange (the 48-cell aggregate), no join, no global sort
    before it."""
    f = _facts(spark, sf_small, "train_split_shards")
    assert f.broadcast_joins == 0 and f.sort_merge_joins == 0
    # partial agg -> exchange -> final agg -> (tiny) result sort
    assert f.exchanges <= 2


def test_q12_single_join_shuffle_with_pushdown(spark, sf_small):
    """Q12 shape: the year filter reaches the lineitem scan; the only
    join is orderkey-to-orderkey; both sides carry 2 columns."""
    f = _facts(spark, sf_small, "q12_ship_priority")
    assert any("l_shipdate" in p for p in f.pushed_filters)
    cols = f.scan_columns()
    assert "l_extendedprice" not in cols and "o_totalprice" not in cols


def test_kmeans_assignment_is_broadcast_bounded(spark, sf_small):
    """Assignment joins the corpus against a BROADCAST k-row centroid
    table (one nested-loop crossJoin against a bounded relation — the
    `_assign_enc` shape) and must never sort-merge: a sort-merge join
    here would mean the centroid side stopped broadcasting and the
    corpus shuffled on a join key. The only other join allowed is the
    final k-row counts-to-norms combine."""
    f = _facts(spark, sf_small, "emb_kmeans_step")
    assert f.sort_merge_joins == 0
    # exactly the assignment crossJoin (counted as both a nested-loop
    # and a broadcast join — its build side is a BroadcastExchange);
    # counts are fused into the exploded dim aggregation so there is no
    # second join or scan.
    assert f.nested_loop_joins == 1 and f.broadcast_joins <= 1
    assert f.scans == 1, f.text


def test_fuzzy_pairs_is_equi_join_not_cross(spark, sf_small):
    """Blocking must keep the self-join an equi join — a nested-loop
    (cross) join here would be the quadratic blowup the blocking keys
    exist to prevent."""
    f = _facts(spark, sf_small, "fuzzy_name_pairs")
    assert f.nested_loop_joins == 0


def test_profile_is_single_scan(spark, sf_small):
    """The column profiler computes every per-column statistic in ONE
    scan of orders (the DuckDB oracle does N scans; ours must not)."""
    f = _facts(spark, sf_small, "profile_columns")
    assert f.scans == 1, f.text


def test_pii_scan_reduces_before_shuffle(spark, sf_small):
    """PII scan: regexp counting happens scan-side; only the per-source
    partial aggregates shuffle (one exchange), reading (source, text)."""
    f = _facts(spark, sf_small, "pii_scan")
    assert f.exchanges == 1, f.text
    assert f.scan_columns() <= {"source", "text"}, f.read_schemas


def test_anomaly_reduces_then_windows(spark, sf_small):
    """The z-score window must run AFTER the daily reduction: the plan
    aggregates (partial+final) before the single-partition window sort,
    never windows raw orders."""
    f = _facts(spark, sf_small, "anomaly_zscore_daily")
    assert "Window" in f.text
    agg_pos = f.text.index("HashAggregate")
    win_pos = f.text.index("Window")
    assert win_pos < agg_pos  # formatted plans print top-down: window consumes the agg
    assert f.scan_columns() <= {"o_orderdate", "o_totalprice"}, f.read_schemas


def test_market_basket_is_joinless(spark, sf_small):
    """Pair mining shuffles the items exactly once (collect_set on the
    basket id) and explodes pairs JVM-side — no join operator of any
    kind, and certainly no cartesian product."""
    f = _facts(spark, sf_small, "market_basket_pairs")
    assert "Join" not in f.text and "CartesianProduct" not in f.text, f.text
    assert f.exchanges == 2, f.text  # basket-id shuffle + pair-count shuffle
    assert f.scan_columns() <= {"l_orderkey", "l_partkey"}, f.read_schemas


def test_q2_q20_scan_fact_once(spark, sf_small):
    """The adapted Q2/Q20 compute their per-part extremum/total as a
    window over the aggregate, so lineitem is scanned exactly once
    (the oracle's self-join formulation scans it twice)."""
    f2 = _facts(spark, sf_small, "q2_min_cost_supplier")
    assert f2.scans == 5, f2.text  # lineitem + part + supplier + nation + region
    assert f2.sort_merge_joins == 0, f2.text
    f20 = _facts(spark, sf_small, "q20_dominant_suppliers")
    assert f20.scans == 4, f20.text  # lineitem + part + supplier + nation
    assert f20.sort_merge_joins == 0, f20.text


def test_chi2_margins_are_windows(spark, sf_small):
    """Chi-square margins derive from the reduced cell set via windows:
    one events scan, no joins at all."""
    f = _facts(spark, sf_small, "chi2_event_dow")
    assert f.scans == 1, f.text
    assert f.broadcast_joins == 0 and f.sort_merge_joins == 0, f.text


def test_chunking_is_narrow(spark, sf_small):
    """Token-window chunking must stay a per-row explode: no shuffle,
    scan pruned to (doc_id, text)."""
    f = _facts(spark, sf_small, "text_chunk_windows")
    assert f.exchanges == 0, f.text
    assert f.scan_columns() <= {"doc_id", "text"}, f.read_schemas


def test_bitmap_rollup_bounded_shuffles(spark, sf_small):
    """The two-level bitmap distinct: exactly three aggregations'
    exchanges (cells -> bucket merge -> final), one scan, pruned to
    the three needed columns, no joins."""
    f = _facts(spark, sf_small, "distinct_bitmap_users")
    assert f.exchanges == 3, f.text
    assert f.scans == 1, f.text
    assert f.scan_columns() <= {"event_type", "ts", "user_id"}, f.read_schemas


def test_variant_extract_single_shuffle(spark, sf_small):
    """VARIANT extraction stays a scan-side projection: one groupBy
    exchange, scan pruned to (event_type, props)."""
    f = _facts(spark, sf_small, "events_variant_extract")
    assert f.exchanges == 1, f.text
    assert f.scan_columns() <= {"event_type", "props"}, f.read_schemas


def test_pagerank_derives_edges_once(spark, sf_small):
    """The PageRank step must read the persisted edge relation, not
    re-derive it per consumer: every plan branch that needs edges
    consumes the InMemoryRelation (the parquet lineage only appears
    inside the cache's printed provenance — the windowed derivation
    executed once, at persist time)."""
    f = _facts(spark, sf_small, "graph_pagerank_step")
    assert f.text.count("InMemoryTableScan") >= 2, f.text
    assert f.sort_merge_joins == 0, f.text


def test_pca_step_is_one_pass(spark, sf_small):
    """X^T X v0 without materializing the covariance: the d-cell
    aggregate plus the 1-row norm — no sort-merge join, embedding-only
    read schema."""
    f = _facts(spark, sf_small, "emb_pca_power_step")
    assert f.sort_merge_joins == 0, f.text
    assert f.scan_columns() <= {"embedding"}, f.read_schemas


def test_lateral_decorrelates(spark, sf_small):
    """The correlated LATERAL subquery must decorrelate: no nested-loop
    join survives into the physical plan."""
    f = _facts(spark, sf_small, "lateral_top_orders")
    assert f.nested_loop_joins == 0, f.text


def test_novelty_is_joinless_window(spark, sf_small):
    """Corpus gram frequency rides a window over the exploded stream —
    no self-join; three exchanges (the single-file parallelize
    repartition, the gram-key window shuffle, the doc rollup)."""
    f = _facts(spark, sf_small, "text_novelty_ratio")
    assert "Join" not in f.text, f.text
    assert f.exchanges == 3, f.text


def test_rfm_reduces_before_windows(spark, sf_small):
    """RFM: orders reduce to |customers| before the ntile windows —
    two exchanges total (customer groupBy + single-partition windows),
    one scan, no joins."""
    f = _facts(spark, sf_small, "customer_rfm_segments")
    assert f.exchanges == 2, f.text
    assert f.scans == 1 and f.sort_merge_joins == 0, f.text


def test_winsorize_broadcasts_bounds(spark, sf_small):
    """Winsorization: the 1-row quantile bounds broadcast into the
    clamping scan — no sort-merge join, exactly the two scans the
    exact-quantile bounds pass requires."""
    f = _facts(spark, sf_small, "stats_winsorize")
    assert f.broadcast_joins >= 1, f.text
    assert f.sort_merge_joins == 0, f.text
    assert f.scans == 2, f.text


def test_hhi_single_scan(spark, sf_small):
    """HHI: one lineitem scan; cell reduction, share window, and part
    rollup ride two exchanges with no join."""
    f = _facts(spark, sf_small, "supplier_concentration_hhi")
    assert f.exchanges == 2 and f.scans == 1, f.text
    assert "Join" not in f.text, f.text


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Partition-layout-aware joins: a fact table partitioned on the
    join key, joined to a filtered dimension, must get a DynamicPruning
    subquery on its scan — at 100 TB this is what turns a full-corpus
    scan into reading only the partitions the dimension selects
    (BigQuery's clustered-join pruning analogue; on by default via
    session.py's AQE config, pinned here so a conf regression fails)."""
    fact_dir = str(tmp_path / "fact_part")
    dim_dir = str(tmp_path / "dim")
    spark.range(0, 5000).selectExpr("id", "id % 20 AS part").write.partitionBy(
        "part"
    ).parquet(fact_dir)
    spark.createDataFrame(
        [(i, f"t{i}") for i in range(20)], "part long, tag string"
    ).write.parquet(dim_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).filter("tag = 't3'")
    q = fact.join(dim, "part")
    q.collect()
    executed = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in executed.lower(), executed


def test_runtime_bloom_filter_join(spark):
    """Shuffle joins where neither side broadcasts: the selective side
    must inject a bloom filter (`might_contain`) into the probe side's
    scan stage so non-matching rows die before the shuffle. The size
    thresholds are production-tuned (10 GB application side), so this
    test lowers them to make the sf fixture eligible — pinning that the
    engine session leaves the mechanism ON."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    )
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower(), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_udtf_lateral_single_exchange(spark, sf_small):
    """Python-UDTF LATERAL expansion is partition-local: the only
    exchange is the per-doc aggregate after it."""
    f = _facts(spark, sf_small, "udtf_sentence_stats")
    assert f.exchanges == 1, f.text
    assert "Join" not in f.text, f.text


def test_global_row_ids_single_shuffle(spark, sf_small):
    """Ordinal assignment shuffles once (bucket repartition); the sort
    is partition-local — never a global single-task sort."""
    f = _facts(spark, sf_small, "global_row_ids")
    assert f.exchanges == 1, f.text
    assert "TakeOrdered" not in f.text, f.text
    # every Sort node must be partition-local (global flag false):
    # "Sort [...], true" would be the single-task global sort this
    # operator exists to avoid
    assert "], true" not in f.text, f.text


def test_pq_codes_joinless_until_regroup(spark, sf_small):
    """PQ encoding folds the codebook in as literals: no join anywhere,
    one exchange (the per-vector regroup)."""
    f = _facts(spark, sf_small, "sim_pq_codes")
    assert "Join" not in f.text, f.text
    assert f.exchanges == 1, f.text


def test_perplexity_broadcasts_unigrams(spark, sf_small):
    """The unigram table (bounded distinct-token state) must broadcast
    back onto the token stream — a sort-merge join here would shuffle
    the full token explosion."""
    f = _facts(spark, sf_small, "text_perplexity_proxy")
    assert f.broadcast_joins >= 1, f.text
    assert f.sort_merge_joins == 0, f.text


def test_psi_bins_join_broadcast(spark, sf_small):
    """PSI reduces both samples to <=10 bin rows before any join; the
    10-row spine joins broadcast."""
    f = _facts(spark, sf_small, "drift_psi_value")
    assert f.sort_merge_joins == 0, f.text
    assert f.broadcast_joins >= 2, f.text


def test_aqe_skew_join_splits(spark, sf_small):
    """Hot-key fact-to-fact joins: AQE must split the skewed partition
    (skew=true on the join node) instead of letting one task carry the
    hot key. Session config leaves skewJoin ON; the size thresholds are
    production-scale, so the test lowers them for the local fixture —
    pinning the mechanism, not the thresholds. (The manual counterpart
    for aggregations is events_skew_salted.)"""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        big = spark.range(0, 400000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(right, "k")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_profile_columns_approx_removes_expand(spark, sf_small):
    """The 100 TB profiler form (approx=True) must plan NO Expand — the
    exact default pays an |distinct-counted cols|x row blowup for exact
    NDV; the HLL++ swap must eliminate it while keeping one scan."""
    from dbt_bigquery_udf_spark.operators.profiling import profile_columns
    from dbt_bigquery_udf_spark.plans import plan_facts

    exact = plan_facts(profile_columns(spark, sf_small, approx=False))
    assert "Expand" in exact.text, exact.text  # the documented trade exists
    apx = plan_facts(profile_columns(spark, sf_small, approx=True))
    assert "Expand" not in apx.text, apx.text
    assert apx.scans == 1, apx.text


def test_stats_summary_approx_uses_sketch_percentile(spark, sf_small):
    """The 100 TB stats form (approx=True) must aggregate percentiles
    via the mergeable approx sketch, never the exact percentile whose
    per-group value map concentrates on one reducer."""
    from dbt_bigquery_udf_spark.operators.analytics import stats_summary
    from dbt_bigquery_udf_spark.plans import plan_facts

    apx = plan_facts(stats_summary(spark, sf_small, approx=True))
    assert "approx_percentile" in apx.text or "percentile_approx" in apx.text, apx.text
    assert "percentile(" not in apx.text.replace("percentile_approx(", ""), apx.text
    # same single-shuffle aggregate shape as the exact form
    assert apx.exchanges == 1, apx.text


def test_semantic_assignment_is_bounded(spark, sf_small):
    """SemDeDup's plan must contain NO data-by-data cartesian: the one
    allowed product is the centroid assignment — a broadcast of the
    k (= max(8, n//64)) centroid rows against the vectors, the
    irreducible n x k exact-assignment cost with the small side
    guaranteed broadcast-size. Everything else must be an equi join
    (pair join on cluster_id, survivor anti join, assignment attach)."""
    import re

    f = _facts(spark, sf_small, "dedup_semantic")
    assert "CartesianProduct" not in f.text, f.text

    def _ids(pattern: str) -> set:
        # unique operator ids in the formatted tree (the details section
        # repeats each operator, so raw substring counts over-count)
        return set(re.findall(pattern + r"[^\n(]*\((\d+)\)", f.text))

    # the pre-execution plan inlines the persisted `assigned` lineage on
    # BOTH pair-join sides, so the single centroid broadcast (and the
    # assignment-attach equi join) each show up twice
    bnlj = _ids(r"BroadcastNestedLoopJoin")
    assert len(bnlj) <= 2, (sorted(bnlj), f.text)  # centroid broadcast x2 sides
    equi = _ids(r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)")
    assert len(equi) <= 5, (sorted(equi), f.text)  # attach x2 + pair + anti
    # round 3: the centroid side is a DERIVED relation — a pushed-filter
    # parquet scan (vec_id < k), never a driver-collected literal table —
    # so the plan must carry the filter pushdown and no LocalTableScan.
    assert "LocalTableScan" not in f.text, f.text
    assert any("LessThan(vec_id" in p for p in f.pushed_filters), f.pushed_filters


def test_group_split_is_scan_parallel_and_leakage_free(spark, sf_small):
    """Group-split placement must stay per-row arithmetic (no join, one
    shuffle for the 3-row aggregate) AND be leakage-free by
    construction: every source appears in exactly one split."""
    f = _facts(spark, sf_small, "split_group_leakage_free")
    assert f.broadcast_joins == 0 and f.sort_merge_joins == 0, f.text
    # (split, source) partial-distinct exchange -> split exchange ->
    # 3-row result sort: the canonical two-phase distinct-agg shape,
    # every stage reduced before it shuffles
    assert f.exchanges <= 3, f.text
    from dbt_bigquery_udf_spark.operators.text import _docs
    from pyspark.sql import functions as F

    d = _docs(spark, sf_small)
    first2 = F.substring(F.md5(F.col("source")), 1, 2)
    per_source = (
        d.select(
            "source",
            F.when(first2 < "cd", "train")
            .when(first2 < "e6", "val")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
    )
    assert per_source.filter("n_splits > 1").count() == 0


def test_mix_weights_invariants(spark, sf_small):
    """Natural shares sum to ~1, every rate is in (0, 3], and the
    plan's only product is the broadcast 1-row totals join."""
    import dbt_bigquery_udf_spark.queries as Q

    rows = Q.QUERIES["mix_domain_weights"](spark, sf_small).collect()
    assert abs(sum(r.natural_share for r in rows) - 1.0) < 1e-3
    assert all(0 < r.sample_rate <= 3.0 for r in rows)
    f = _facts(spark, sf_small, "mix_domain_weights")
    assert f.sort_merge_joins == 0, f.text


def test_bm25_filters_before_shuffle_and_broadcasts(spark, sf_small):
    """BM25's token stream must filter to the query terms scan-side
    (the only data shuffle is the tiny (doc_id, term) aggregate), and
    the df / corpus-stats sides must broadcast — no sort-merge join
    anywhere."""
    f = _facts(spark, sf_small, "text_bm25_topk")
    assert f.sort_merge_joins == 0, f.text
    assert f.broadcast_joins >= 2, f.text
    assert "isin" in f.text or "IN (" in f.text or " IN " in f.text, f.text


def test_rrf_fusion_is_k_bounded(spark, sf_small):
    """Fusion only touches the two k-bounded lists: both retriever
    subplans end in TakeOrdered, and the fused output carries every id
    from both lists with integer scores."""
    f = _facts(spark, sf_small, "retrieval_rrf_fusion")
    assert f.text.count("TakeOrderedAndProject") >= 2, f.text
    rows = Q.QUERIES["retrieval_rrf_fusion"](spark, sf_small).collect()
    assert 10 <= len(rows) <= 20
    assert all(r.rrf_micro > 0 for r in rows)
    assert any(r.r_bm25 is not None for r in rows)
    assert any(r.r_ann is not None for r in rows)


def test_dsir_ratio_join_is_broadcast(spark, sf_small):
    """DSIR's per-bucket log-ratio table (B=512 rows) must join back
    onto the exploded feature stream as a BROADCAST — a sort-merge
    there would shuffle the entire gram stream a second time."""
    f = _facts(spark, sf_small, "dsir_importance_weights")
    assert "CartesianProduct" not in f.text, f.text
    assert f.broadcast_joins >= 1, f.text
    assert f.sort_merge_joins == 0, f.text


def test_bpe_pairs_generate_after_vocab_reduction(spark, sf_small):
    """BPE pair generation must run over the aggregated VOCABULARY,
    not the raw token stream: the plan's only wide ops are the two
    hash aggregates (token->vocab, pair->count) — 2 shuffle pairs at
    most, and the pair-Generate sits above the first aggregate."""
    f = _facts(spark, sf_small, "bpe_pair_counts")
    assert f.exchanges <= 4, f.text  # 2 aggregates x (partial+final)
    gen = f.text.find("Generate")              # pair explode
    agg_below = f.text.rfind("HashAggregate")  # deepest aggregate
    assert gen != -1 and agg_below > gen, f.text  # vocab agg BELOW the explode


def test_hard_negatives_anchor_broadcast(spark, sf_small):
    """Hard-negative mining broadcasts the anchor batch; the label
    inequality keeps it a broadcast nested-loop (never a cartesian),
    and the only shuffle is the per-anchor top-k window."""
    f = _facts(spark, sf_small, "emb_hard_negatives")
    assert "CartesianProduct" not in f.text, f.text
    assert "BroadcastNestedLoopJoin" in f.text, f.text


def test_dsir_and_bigram_single_tokenize_pass(spark, sf_small):
    """DSIR and the bigram LM must tokenize the corpus ONCE: both the
    count-table branch and the scoring branch read the same
    per-cell-aggregated exchange (ReusedExchange in the AQE final plan
    after a collect-shaped action). Before round 5 each branch re-ran
    the tokenize+explode narrow stage. The explicit isNotNull guards
    in the operators exist to keep the branch subtrees canonically
    equal — without them the scoring join's inferred isnotnull breaks
    the reuse."""
    for name in ("dsir_importance_weights", "text_bigram_lm_nll"):
        df = Q.QUERIES[name](spark, sf_small)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "ReusedExchange" in final, f"{name}: no exchange reuse\n{final}"


def test_gopher_rules_shuffle_free_narrow_scan(spark, sf_small):
    """quality_gopher_rules is one narrow pass per document: all eight
    gate signals (word/line/symbol families) compute in-array with NO
    exchange at all, and the scan reads only doc_id + text."""
    f = _facts(spark, sf_small, "quality_gopher_rules")
    assert f.exchanges == 0, f.text
    cols = f.scan_columns()
    assert "lang" not in cols and "source" not in cols, f.read_schemas


def test_hamming_topk_joinless_heap_shortlist(spark, sf_small):
    """sim_hamming_topk: the query's sign pattern is a plan literal (no
    join anywhere), stage 1 is a TakeOrdered heap of the Hamming
    shortlist, and there is no full-corpus Sort or sort-merge join."""
    f = _facts(spark, sf_small, "sim_hamming_topk")
    assert f.sort_merge_joins == 0 and f.broadcast_joins == 0, f.text
    assert "TakeOrderedAndProject" in f.text, f.text
    assert "Sort " not in f.text.replace("TakeOrdered", ""), f.text


def test_dsir_select_is_heap_topk(spark, sf_small):
    """dsir_select_topk: the global selection is a TakeOrdered heap (no
    full Sort) over the weight stream — O(k) driver traffic."""
    f = _facts(spark, sf_small, "dsir_select_topk")
    assert "TakeOrderedAndProject" in f.text, f.text


def test_shingle_fraction_joinless_pair_stream(spark, sf_small):
    """dedup_shingle_fraction (round-6 rewrite): the distinct
    (doc, shingle) pair stream is only ever AGGREGATED — no sort-merge
    join anywhere; the sole join is the doc-level combine of two
    |docs|-row aggregates (broadcast at this sf). The pre-rewrite shape
    sort-merged the full pair stream onto the df table (~17x slower at
    x30)."""
    f = _facts(spark, sf_small, "dedup_shingle_fraction")
    assert f.sort_merge_joins == 0, f.text
    assert f.broadcast_joins == 1, f.text


def test_block_removal_broadcasts_dup_set(spark, sf_small):
    """dedup_block_removal: the duplicate-block set joins back via
    BROADCAST (the block stream never sort-merges), and the exchange
    feeding the dup-set aggregation carries (hash, doc_id) only — block
    TEXT must not appear in any exchange before the final per-document
    reassembly."""
    f = _facts(spark, sf_small, "dedup_block_removal")
    assert f.broadcast_joins == 1, f.text
    assert f.sort_merge_joins == 0, f.text


def test_range_search_no_exchange(spark, sf_small):
    """sim_range_search: broadcast nested-loop scoring with an inline
    radius predicate — the corpus side streams partition-local; unlike
    top-k there is NO global heap, so the whole plan needs zero
    exchanges."""
    f = _facts(spark, sf_small, "sim_range_search")
    assert f.exchanges == 0, f.text
    assert f.sort_merge_joins == 0, f.text


def test_bpe_trainer_vocab_sized_steps(spark, sf_small):
    """bpe_train_merges: each training step aggregates the VOCABULARY
    (one pair-explode over Heaps-bounded state rows), never re-reads
    the corpus — the returned merge table itself is a local relation
    built from 1-row argmax collects."""
    df = Q.QUERIES["bpe_train_merges"](spark, sf_small)
    rows = df.collect()
    from dbt_bigquery_udf_spark.operators.text import BPE_MERGE_STEPS

    assert len(rows) == BPE_MERGE_STEPS
    assert [r.step for r in rows] == list(range(1, BPE_MERGE_STEPS + 1))
    # merged token really is the concatenation, counts monotone non-incr
    for r in rows:
        assert r.merged == r.a + r.b
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True), cnts


def test_persisted_index_probe_is_equi_join(spark, sf_small):
    """The admission gate's scoring plan: the batch probes the persisted
    bands table via a (band, key) EQUI-join (never a nested-loop /
    cartesian shape), and the verify stage joins signature arrays by id
    only — at 100 TB the probe must shuffle/broadcast the small batch
    side, not the index."""
    from dbt_bigquery_udf_spark.operators import dedup as D
    from dbt_bigquery_udf_spark.plans.inspect import plan_facts
    from pyspark.sql import functions as F

    db = D._near_index_db(sf_small)
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    D.build_near_dup_index(spark, sf_small)
    batch = D._docs(spark, sf_small).filter(
        F.col("doc_id") % D.INCR_NEAR_MOD == D.INCR_IDX_BATCH1
    )
    scored = D._score_batch_vs_index(spark, db, D._doc_signatures(batch))
    f = plan_facts(scored)
    assert f.nested_loop_joins == 0, f.text
    # index tables are real storage-backed scans, not memoized lineage
    assert any("bands" in s.lower() for s in f.text.splitlines() if "Scan" in s), f.text
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_ivf_trained_serve_pushes_probe_cids(spark, sf_small):
    """The persisted trained-IVF serve (round 11): probe selection is
    driver-side k-row math, so the plan must carry the chosen nprobe
    cids as a PUSHED IN-filter on the assignment scan — at 100 TB,
    where assign is partitioned by cid, that is inverted-list partition
    pruning — with no probe-side join at all (no sort-merge, no
    nested-loop; the only joins left are the candidate semi-join and
    the tombstone overlay's broadcast anti-join)."""
    f = _facts(spark, sf_small, "sim_ivf_trained_indexed")
    assert any("In(cid" in p for p in f.pushed_filters), f.pushed_filters
    assert f.sort_merge_joins == 0, f.text
    assert f.nested_loop_joins == 0, f.text


def test_ivf_retrain_serve_is_broadcast_bounded(spark, sf_small):
    """The retrained-index serve (sim_ivf_retrain) must keep the
    trained-IVF serving shape: the nprobe probe list and the k-row
    version-diff joins broadcast (no sort-merge join anywhere in the
    serve), and no nested-loop join sneaks in through the moved-flag
    double join."""
    f = _facts(spark, sf_small, "sim_ivf_retrain")
    assert f.broadcast_joins >= 1, f.text
    assert f.sort_merge_joins == 0, f.text
    assert f.nested_loop_joins == 0, f.text


def test_exact_gate_probe_has_no_nested_loop(spark, sf_small):
    """The duplicate-tolerant exact probe (rank on the batch alone +
    left-semi membership) must stay an equi-join pipeline: no
    nested-loop join, no cartesian product, regardless of the two
    joins it now performs."""
    f = _facts(spark, sf_small, "dedup_exact_auto_compacted")
    assert f.nested_loop_joins == 0, f.text
