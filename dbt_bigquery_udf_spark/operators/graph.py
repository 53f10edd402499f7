"""Graph analytics over behavioral data: transition graphs and
PageRank — engine extensions (the reference has no aggregates at all,
SURVEY.md §2.3), oracle-checked like everything else.

The graph here is derived, which is the realistic shape: raw 100 TB
event logs in, a small weighted graph out (nodes = event types). The
expensive step is the *derivation* (a per-user window over the full
log); the iteration that follows runs on the reduced graph. The same
split powers the connected-components operator (dedup_components):
derive edges once at scale, iterate on the small result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..queries import register
from .analytics import _src

PAGERANK_DAMPING = 0.85


@register(
    "graph_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), e AS (
      SELECT prev_type AS src, event_type AS dst, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT src, dst, n,
           round(n / sum(n) OVER (PARTITION BY src), 6) AS p
    FROM e
    """,
)
def graph_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition graph: for each user-session stream, count
    consecutive (prev_type -> type) pairs and row-normalize into a
    Markov transition matrix — the substrate for next-action prediction,
    funnel drop-off analysis, and the PageRank step below.

    Scale: ONE shuffle of (user_id)-partitioned windows derives the
    edges from the full log (ts, event_id ordering makes ties
    deterministic); the groupBy reduces to |types|^2 rows and the
    row-normalization window runs on that reduced relation — same
    reduce-before-window discipline as anomaly_zscore_daily.
    """
    ev = _src(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    e = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return e.select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(W.partitionBy("src")), 6
        ).alias("p"),
    )


@register(
    "graph_pagerank_step",
    f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), e AS (
      SELECT prev_type AS src, event_type AS dst, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), p AS (
      SELECT src, dst, n / sum(n) OVER (PARTITION BY src) AS p FROM e
    ), nodes AS (
      SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e
    ), nn AS (SELECT count(*) AS n_nodes FROM nodes),
    mass AS (
      SELECT p.dst AS node, sum(p.p) AS m FROM p GROUP BY p.dst
    )
    SELECT nodes.node,
           round((1 - {PAGERANK_DAMPING}) / nn.n_nodes
                 + {PAGERANK_DAMPING} * coalesce(mass.m, 0) / nn.n_nodes, 6)
             AS rank
    FROM nodes LEFT JOIN mass ON nodes.node = mass.node CROSS JOIN nn
    """,
)
def graph_pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank power-iteration over the transition graph, from the
    uniform start vector r0 = 1/N: r1(v) = (1-d)/N + d * sum over
    in-edges (r0(u) * p(u, v)). Iterating this step to a fixed point is
    full PageRank; one step is exactly oracle-checkable (the same
    argument as emb_kmeans_step — iterative algorithms verify per
    step).

    Shape: ranks join edges on src, aggregate on dst — at graph scale
    these are THE two shuffles of every distributed PageRank round
    (here the rank vector is uniform, so the join folds into the edge
    aggregation; with a materialized rank table it becomes an explicit
    broadcast-or-shuffle join on src). N arrives as a broadcast 1-row
    cross join, never a collect. The aggregated in-mass LEFT JOINs
    back to the full node set so source-only nodes (no in-edges) keep
    their (1-d)/N teleport rank — dropping them would shrink the
    vector on every iteration.

    Scale: the event-log derivation dominates (one windowed pass, as
    graph_event_transitions); each PageRank round then moves
    O(|edges|) rows. The reduced edge relation is persisted BEFORE the
    rank expressions — Spark does not share subtrees across a plan, so
    without it the edge derivation (the 100 TB window pass) would run
    three times: once for the transition probabilities and once per
    side of the node-set union (measured: 3 scans -> 1, pinned by
    plan test). For web-scale graphs the same loop runs with the rank
    vector as a partitioned table and AQE handling the in-degree skew
    of hub nodes.
    """
    ev = _src(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    e = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    e.count()  # materialize the one full-log pass; all else reads |types|^2 rows
    p = e.select(
        "src", "dst", (F.col("n") / F.sum("n").over(W.partitionBy("src"))).alias("p")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    d = F.lit(PAGERANK_DAMPING)
    mass = p.groupBy(F.col("dst").alias("node")).agg(F.sum("p").alias("m"))
    return (
        nodes.join(mass, "node", "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "node",
            F.round(
                (F.lit(1) - d) / F.col("n_nodes")
                + d * F.coalesce(F.col("m"), F.lit(0.0)) / F.col("n_nodes"),
                6,
            ).alias("rank"),
        )
    )


# One SQL text, both engines: Spark 4's WITH RECURSIVE and DuckDB's
# accept the identical statement, so the query body IS the oracle.
_REACHABILITY_SQL = """
    WITH RECURSIVE seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), e AS (
      SELECT DISTINCT prev_type AS src, event_type AS dst
      FROM seq WHERE prev_type IS NOT NULL
    ), reach(node, hops) AS (
      SELECT CAST('signup' AS STRING), 0
      UNION ALL
      SELECT e.dst, r.hops + 1
      FROM reach r JOIN e ON e.src = r.node
      WHERE r.hops < 4
    )
    SELECT node, min(hops) AS min_hops
    FROM reach GROUP BY node
"""


@register("graph_reachable_types", _REACHABILITY_SQL)
def graph_reachable_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive reachability via Spark 4's ``WITH RECURSIVE``: which
    event types are reachable from 'signup' through observed
    transitions, and in how few hops — BFS stated declaratively, where
    dedup_components hand-rolls the same fixpoint as a driver-side
    join loop (both shapes belong in the inventory: the CTE is
    terser; the explicit loop controls persistence and convergence).

    Termination on a CYCLIC transition graph comes from the hop bound
    (hops < 4): UNION ALL recursion re-visits nodes per path, so the
    bound caps work at O(|types|^hops) path rows — fine for a small
    node set. At scale (or unbounded depth) switch to the label-
    propagation loop, whose per-round state is O(|nodes|), never
    O(|paths|): recursive CTEs do not subsume iterative graph
    algorithms, they sugar the small-graph cases.

    The edge relation is derived ONCE as a persisted DataFrame and the
    recursion joins that |types|^2 view: with edges inline in the CTE,
    Spark re-derived them (full event scan + window) on EVERY recursion
    step — the scan audit measured events read 8x for a 4-hop bound,
    which at 100 TB is 8 full scans. Recursive CTEs do not materialize
    their anchor subqueries; anything expensive under the recursion
    must be persisted BY CONSTRUCTION (the engine-wide scan-audit rule).
    """
    ev = _src(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .select(
            F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
        )
        .distinct()
        .persist()
    )
    e.count()  # materialize: recursion steps read the cache, not events
    e.createOrReplaceTempView("__reach_edges")
    return spark.sql(
        """
        WITH RECURSIVE reach(node, hops) AS (
          SELECT CAST('signup' AS STRING), 0
          UNION ALL
          SELECT e.dst, r.hops + 1
          FROM reach r JOIN __reach_edges e ON e.src = r.node
          WHERE r.hops < 4
        )
        SELECT node, min(hops) AS min_hops
        FROM reach GROUP BY node
        """
    )


# -- multi-iteration PageRank (the driver-loop iterative pattern) ----------

PAGERANK_ITERS = 3
_PR_SCALE = "1e12"  # micro-rank units; 1e12 keeps 3 iterations well above rounding noise
# Per-term rounding to INTEGER micro-ranks before every sum makes each
# iteration engine-exact (integer addition commutes; float summation
# order does not): contrib = round(r_prev * p), r_next = teleport_int +
# round(d * mass / N). `85e-2`/`15e-2` not `0.85`: decimal-literal trap
# (see operators/text.py _DSIR_TERM).


def _duck_pagerank_converged() -> str:
    head = f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), e AS MATERIALIZED (
      SELECT prev_type AS src, event_type AS dst, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), p AS MATERIALIZED (
      SELECT src, dst, n / sum(n) OVER (PARTITION BY src) AS p FROM e
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e
    ), nn AS (SELECT count(*) AS n_nodes FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, CAST(round({_PR_SCALE} / n_nodes) AS BIGINT) AS r
      FROM nodes CROSS JOIN nn
    )"""
    stages = []
    for i in range(1, PAGERANK_ITERS + 1):
        prev = f"r{i - 1}"
        stages.append(f"""
    mass{i} AS MATERIALIZED (
      SELECT p.dst AS node,
             CAST(sum(CAST(round({prev}.r * p.p) AS BIGINT)) AS BIGINT) AS m
      FROM p JOIN {prev} ON p.src = {prev}.node
      GROUP BY p.dst
    ),
    r{i} AS MATERIALIZED (
      SELECT nodes.node,
             CAST(round(15e-2 * {_PR_SCALE} / nn.n_nodes) AS BIGINT)
             + CAST(round(85e-2 * coalesce(mass{i}.m, 0)) AS BIGINT)
               AS r
      FROM nodes LEFT JOIN mass{i} ON nodes.node = mass{i}.node CROSS JOIN nn
    )""")
    return (
        head + "," + ",".join(stages)
        + f"""
    SELECT node, r AS rank_micro FROM r{PAGERANK_ITERS}
    """
    )


@register("graph_pagerank_converged", _duck_pagerank_converged())
def graph_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank iterated {PAGERANK_ITERS} rounds — the full driver-loop
    iterative-algorithm pattern next to the single oracle-checkable
    step (graph_pagerank_step): each round's rank table is PERSISTED
    and the previous round's is unpersisted, so iteration i reads a
    materialized |nodes|-row table instead of re-deriving the whole
    lineage (without this, Spark's lazy plans re-run every prior round
    per iteration — the classic iterative-workload trap).

    Recurrence: r_i(v) = (1-d)/N + d * sum_u r_(i-1)(u) * p(u, v) —
    the in-mass term carries r_(i-1) in absolute units (unlike the
    single-step query, whose /N IS the uniform r0), so it is NOT
    divided by N again; the rank vector keeps summing to ~1.

    Ranks travel as INTEGER micro-units (1e-12): every per-edge
    contribution rounds to an integer before the in-mass sum, so the
    result is bit-exact against the oracle's unrolled stages however
    the engines order their additions — the same commutativity trick
    as BM25/DSIR.

    Scale: per round, one join of the rank table onto edges (broadcast
    while ranks fit, shuffle-on-src beyond) + one aggregate on dst —
    the canonical distributed PageRank round. The event-log window
    pass runs ONCE (persisted edge relation); rounds touch only
    O(|edges|) rows. Convergence-by-delta swaps the fixed range for a
    while-loop over the same persisted-table step.
    """
    ev = _src(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    e = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    e.count()  # one full-log pass; everything after reads |types|^2 rows
    p = e.select(
        "src", "dst", (F.col("n") / F.sum("n").over(W.partitionBy("src"))).alias("p")
    ).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    # localCheckpoint, not persist+count (guide §3.3): persist keeps
    # every prior round's lineage in round i's plan, so analysis cost
    # grows per round (the final explain reached 1.4 MB) — the
    # checkpoint truncates each round's rank table to its materialized
    # blocks (eager=True is the materializing action the count used to
    # provide). Rows are identical; the iterative-workload shape the
    # docstring describes is unchanged.
    ranks = (
        nodes.crossJoin(F.broadcast(nn))
        .selectExpr("node", f"CAST(round({_PR_SCALE} / n_nodes) AS BIGINT) AS r")
        .localCheckpoint(eager=True)
    )
    for _ in range(PAGERANK_ITERS):
        mass = (
            p.join(ranks, p["src"] == ranks["node"])
            .selectExpr("dst AS node", "CAST(round(r * p) AS BIGINT) AS contrib")
            .groupBy("node")
            .agg(F.sum("contrib").cast("bigint").alias("m"))
        )
        ranks = (
            nodes.join(mass, "node", "left")
            .crossJoin(F.broadcast(nn))
            .selectExpr(
                "node",
                f"CAST(round(15e-2 * {_PR_SCALE} / n_nodes) AS BIGINT)"
                " + CAST(round(85e-2 * coalesce(m, 0)) AS BIGINT) AS r",
            )
            .localCheckpoint(eager=True)
        )
    return ranks.selectExpr("node", "r AS rank_micro")
