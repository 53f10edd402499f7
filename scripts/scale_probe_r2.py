"""Round-2 scale probe: replicate sf0.1 inputs Nx ON DISK (an sf-layout
temp dir) and run the round-2 operators UNCHANGED through the registry,
so what's timed is the exact shipped code — including semdedup_k's
corpus-scaling cluster count and the IVF-PQ probe pruning.

    python scripts/scale_probe_r2.py [N ...]     # default: 1 10

Replication shifts vec_id / o_orderkey / l_orderkey by copy*stride so
key cardinalities scale with the data. vec_id shifts keep copy 0's ids
lowest, so centroid seeds (vec_id < k) and the ADC query vector stay
valid as the corpus grows.

Not part of the driver bench (which owns BENCH_r*.json); results are
recorded in SCALE.md "Round-2 measured scaling".
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_bigquery_udf_spark import get_spark  # noqa: E402
from dbt_bigquery_udf_spark.operators.dedup import (  # noqa: E402
    dedup_semantic,
    semdedup_k,
)
from dbt_bigquery_udf_spark.operators.profiling import profile_columns  # noqa: E402
from dbt_bigquery_udf_spark.operators.analytics import stats_summary  # noqa: E402
from dbt_bigquery_udf_spark.operators.similarity import sim_ivfpq_adc  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STRIDES = {
    "embeddings": {"vec_id": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
}


def stage(spark, n: int, root: str) -> str:
    """Write an sf-layout dir with each table replicated n times."""
    out = os.path.join(root, f"x{n}")
    for table, strides in STRIDES.items():
        df = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        parts = []
        for i in range(n):
            c = df
            for col, stride in strides.items():
                c = c.withColumn(col, (F.col(col) + F.lit(i * stride)).cast("long"))
            parts.append(c)
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionByName(p)
        rep.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
    # non-replicated tables symlink to the base sf dir (register_sources
    # registers the full table set)
    for f in os.listdir(SF_DIR):
        dst = os.path.join(out, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, f), dst)
    return out


def timed(label: str, fn, spark, sf_dir: str, **kw) -> None:
    t = time.perf_counter()
    rows = fn(spark, sf_dir, **kw).count()
    print(f"{label}: {time.perf_counter() - t:.2f}s ({rows} rows)", flush=True)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark(app_name="scale-probe-r2")
    root = tempfile.mkdtemp(prefix="scale_probe_r2_")
    try:
        for n in ns:
            d = stage(spark, n, root)
            n_vec = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
            print(f"-- x{n}: {n_vec} vectors, semdedup_k={semdedup_k(n_vec)}")
            timed(f"dedup_semantic x{n}", dedup_semantic, spark, d)
            timed(f"sim_ivfpq_adc x{n}", sim_ivfpq_adc, spark, d)
            timed(f"profile_columns(exact) x{n}", profile_columns, spark, d)
            timed(
                f"profile_columns(approx) x{n}",
                profile_columns,
                spark,
                d,
                approx=True,
            )
            timed(f"stats_summary(exact) x{n}", stats_summary, spark, d)
            timed(f"stats_summary(approx) x{n}", stats_summary, spark, d, approx=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
