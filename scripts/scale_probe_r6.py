"""Round-6 scale probe: same staging discipline as scale_probe_r3
(sf0.1 inputs replicated Nx on disk with shifted ids, >=32 write
splits, per-op warmup, min-of-2 timing) over the round-6 operators and
the two queries newly rotated into the driver window:

- quality_gopher_rules (stopword-aware + line/symbol gate breadth)
- quality_c4_rules (line-level cleaning + page gates)
- dedup_shingle_fraction (shared-exchange near-dup signal, regression
  guard after the gopher/C4 work touched the same module)
- sim_hamming_topk (1-bit Hamming shortlist + exact re-rank)
- sim_ivfpq_adc, text_bm25_topk (round-6 window rotation)

    python scripts/scale_probe_r6.py [N ...]     # default: 1 10 30

Results recorded in SCALE.md "Round-6 measured scaling".
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
from dbt_bigquery_udf_spark.operators.similarity import (  # noqa: E402
    sim_hamming_topk,
    sim_ivfpq_adc,
)
from dbt_bigquery_udf_spark.operators.extras import (  # noqa: E402
    text_bm25_topk,
)
from dbt_bigquery_udf_spark.operators.text import (  # noqa: E402
    dedup_shingle_fraction,
    quality_c4_rules,
    quality_gopher_rules,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STRIDES = {
    "embeddings": {"vec_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
}

OPS = (
    quality_gopher_rules,
    quality_c4_rules,
    dedup_shingle_fraction,
    sim_hamming_topk,
    sim_ivfpq_adc,
    text_bm25_topk,
)


def stage(spark, n: int, root: str) -> str:
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
        rep = rep.repartition(32 * max(1, (4 * n + 31) // 32))
        rep.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
    for f in os.listdir(SF_DIR):
        dst = os.path.join(out, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, f), dst)
    return out


def timed(label: str, fn, spark, sf_dir: str) -> None:
    best, rows = None, 0
    for _ in range(2):
        t = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t
        best = dt if best is None or dt < best else best
    print(f"{label}: {best:.2f}s ({rows} rows)", flush=True)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-r6")
    root = tempfile.mkdtemp(prefix="scale_probe_r6_")
    try:
        for fn in OPS:  # warmup, untimed (see scale_probe_r3 rationale)
            fn(spark, SF_DIR).count()
        for n in ns:
            d = stage(spark, n, root)
            n_doc = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
            n_vec = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
            print(f"-- x{n}: {n_doc} docs, {n_vec} vectors")
            for fn in OPS:
                timed(f"{fn.__name__} x{n}", fn, spark, d)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
