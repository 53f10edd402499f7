"""Scale probe: replicate sf0.1 inputs Nx in-memory and time key
operators, demonstrating the scaling behavior SCALE.md claims.

Not part of the driver bench (which owns BENCH_r*.json); run manually:

    python scripts/scale_probe.py [N]

Replication unions the source with shifted keys so group/join
cardinalities scale with the data (a plain union would collapse into
the same groups and understate shuffle cost).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from dbt_bigquery_udf_spark import get_spark  # noqa: E402
from dbt_bigquery_udf_spark.sources.registry import register_sources  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df: DataFrame, n: int, key_cols: dict[str, int]) -> DataFrame:
    """Union n copies, shifting each key column by copy*stride."""
    out = None
    for i in range(n):
        c = df
        for col, stride in key_cols.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * stride))
        out = c if out is None else out.unionByName(c)
    return out


def timed(label: str, df: DataFrame) -> None:
    t = time.perf_counter()
    n = df.count()
    print(f"{label}: {time.perf_counter() - t:.2f}s ({n} rows)")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale-probe")
    src = register_sources(spark, SF_DIR)

    li = replicate(src["lineitem"], n, {"l_orderkey": 10_000_000})
    ev = replicate(src["events"], n, {"event_id": 10_000_000, "user_id": 1_000_000})

    # Q1 shape: scan + partial agg (should scale ~linearly, stay 2-stage)
    timed(
        f"q1_agg x{n}",
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1))
        ),
    )
    # Sessionize shape: shuffle by user + two window passes
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    timed(
        f"sessionize x{n}",
        sess.groupBy("user_id", "sid").agg(F.count(F.lit(1)), F.min("ts"), F.max("ts")),
    )
    # Join shape: orders x lineitem on orderkey (AQE decides strategy)
    o = replicate(src["orders"], n, {"o_orderkey": 10_000_000, "o_custkey": 1_000_000})
    timed(
        f"orders_join x{n}",
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).groupBy(
            "o_orderpriority"
        ).agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)),
    )
    # Global-ordinal shape: two-pass histogram numbering (one tiny
    # collect + one bucket shuffle; should scale ~linearly, never
    # collapse to a single task the way row_number() OVER (ORDER BY)
    # does)
    docs = replicate(src["documents"], n, {"doc_id": 10_000_000})
    from dbt_bigquery_udf_spark.operators.spark_native import _number_by_key

    timed(f"global_row_ids x{n}", _number_by_key(docs, "doc_id", k=32))
    # Python-UDTF LATERAL shape: partition-local row expansion through
    # the Arrow boundary; scales with input partitions
    from dbt_bigquery_udf_spark.operators.python_tvf import SplitSentences

    spark.udtf.register("split_sentences_probe", SplitSentences)
    docs.createOrReplaceTempView("__probe_docs")
    timed(
        f"udtf_lateral x{n}",
        spark.sql(
            "SELECT d.doc_id, count(*) AS n FROM __probe_docs d, "
            "LATERAL split_sentences_probe(d.text) s GROUP BY d.doc_id"
        ),
    )
    # Perplexity shape: bounded unigram table broadcast onto the token
    # stream; the per-doc aggregate is the only full shuffle
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), " ")).alias("t")
    ).filter(F.col("t") != "")
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    timed(
        f"perplexity x{n}",
        tok.join(F.broadcast(uni), "t")
        .groupBy("doc_id")
        .agg(F.avg(-F.log(F.col("n") / F.lit(1e6)))),
    )


if __name__ == "__main__":
    main()
