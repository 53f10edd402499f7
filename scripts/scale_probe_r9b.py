"""Round-9 probe: catalog-lock contention under the reference's
production concurrency (8-thread dbt runs, dbt_run_result.png).

Runs the concurrency test's workload — 8 independent engine builds
(2-model DAG each: source scan + ref()) plus 2 persisted-index
admission gates (near-dup LSH + exact hash, dedicated layered pairs) —
first SERIALLY, then CONCURRENTLY on a 10-thread pool in the same
session at $SPARK_GRAFT_SF_DIR (default sf0.01). Prints one JSON line:
serial sum, concurrent wall, speedup, and the max single-job wall in
the concurrent phase (the 'bounded lock wait' number — how long the
unluckiest job waited behind the catalog lock plus its own work).
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from dbt_bigquery_udf_spark.api import prepared_engine
    from dbt_bigquery_udf_spark.models.core import Engine, ModelSpec
    from dbt_bigquery_udf_spark.operators import dedup as D

    prepared_engine(spark, SF_DIR)

    def build_job(i: int) -> float:
        t0 = time.perf_counter()
        db = f"conc_p{i}"
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        spark.sql(f"CREATE DATABASE {db}")
        eng = Engine(spark)
        eng.register(
            ModelSpec(
                name=f"conc_pm1_{i}",
                kind="table",
                database=db,
                dialect="spark",
                sql=(
                    "SELECT o_orderstatus AS st, count(*) AS n "
                    "FROM {{ source('src', 'orders') }} GROUP BY o_orderstatus"
                ),
            ),
            ModelSpec(
                name=f"conc_pm2_{i}",
                kind="table",
                database=db,
                dialect="spark",
                sql="SELECT sum(n) AS total FROM {{ ref('conc_pm1_%d') }}" % i,
            ),
        )
        eng.build(fail_fast=True)
        spark.table(f"{db}.conc_pm2_{i}").count()
        return time.perf_counter() - t0

    def near_gate(tag: str) -> float:
        t0 = time.perf_counter()
        base = D._near_index_db(SF_DIR) + tag
        delta = base + "d"
        for dbx in (base, delta):
            spark.sql(f"DROP DATABASE IF EXISTS {dbx} CASCADE")
        D.build_near_dup_index(spark, SF_DIR, db=base)
        spark.sql(f"CREATE DATABASE {delta}")
        spark.createDataFrame(
            [], "doc_id bigint, hs array<bigint>"
        ).write.format("parquet").saveAsTable(f"{delta}.sigs")
        spark.createDataFrame(
            [], "doc_id bigint, band int, key string"
        ).write.format("parquet").saveAsTable(f"{delta}.bands")
        batch = D._docs(spark, SF_DIR).filter(
            F.col("doc_id") % D.INCR_NEAR_MOD == D.INCR_IDX_BATCH1
        )
        D._admit_batch_df(spark, (base, delta), batch, write_db=delta).count()
        for dbx in (base, delta):
            spark.sql(f"DROP DATABASE IF EXISTS {dbx} CASCADE")
        return time.perf_counter() - t0

    def exact_gate(tag: str) -> float:
        t0 = time.perf_counter()
        base = D._exact_index_db(SF_DIR) + tag
        delta = base + "d"
        for dbx in (base, delta):
            spark.sql(f"DROP DATABASE IF EXISTS {dbx} CASCADE")
        D.build_exact_dup_index(spark, SF_DIR, db=base)
        spark.sql(f"CREATE DATABASE {delta}")
        spark.createDataFrame([], "h string").write.format(
            "parquet"
        ).saveAsTable(f"{delta}.hashes")
        batch = D._docs(spark, SF_DIR).filter(
            F.col("doc_id") % D.INCR_NEAR_MOD == D.INCR_IDX_BATCH1
        )
        D._admit_exact_batch_df(
            spark, (base, delta), batch, write_db=delta
        ).count()
        for dbx in (base, delta):
            spark.sql(f"DROP DATABASE IF EXISTS {dbx} CASCADE")
        return time.perf_counter() - t0

    # warm-up (plans + index-build JIT), excluded from both measurements
    build_job(99)
    near_gate("_pw")
    exact_gate("_pew")

    serial = (
        [build_job(i) for i in range(8)]
        + [near_gate("_ps"), exact_gate("_pes")]
    )
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=10) as pool:
        futs = [pool.submit(build_job, i) for i in range(8)]
        futs.append(pool.submit(near_gate, "_pc"))
        futs.append(pool.submit(exact_gate, "_pec"))
        conc = [f.result(timeout=900) for f in futs]
    conc_wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "jobs": "8 engine builds + near-dup gate + exact gate",
                "serial_sum_s": round(sum(serial), 2),
                "concurrent_wall_s": round(conc_wall, 2),
                "speedup": round(sum(serial) / conc_wall, 2),
                "max_concurrent_job_s": round(max(conc), 2),
                "max_serial_job_s": round(max(serial), 2),
            }
        )
    )
    for i in list(range(8)) + [99]:
        spark.sql(f"DROP DATABASE IF EXISTS conc_p{i} CASCADE")


if __name__ == "__main__":
    main()
