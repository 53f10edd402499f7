"""Round-3 scale probe: replicate sf0.1 inputs Nx ON DISK (sf-layout
temp dir, same staging as scale_probe_r2) and time the round-3 paths
UNCHANGED through the registry:

- global_row_ids with the SIZE-DERIVED bucket count (the round-2 fixed
  k=8 nit): the probe also reports the k the sizing rule picked, and a
  forced-small-budget variant shows bucket count scaling with rows.
- dedup_semantic with the DERIVED (join-side, never collected) centroid
  relation — same query, new plan.
- the round-3 operators dsir_importance_weights / bpe_pair_counts /
  emb_hard_negatives (documents replicate with shifted doc_ids so the
  vocab/bucket distributions keep their shape while doc count scales).

    python scripts/scale_probe_r3.py [N ...]     # default: 1 10 30

Results recorded in SCALE.md "Round-3 measured scaling".
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _probe_common import stage as _stage  # noqa: E402
from _probe_common import timed as _timed  # noqa: E402

from dbt_bigquery_udf_spark import get_spark  # noqa: E402
from dbt_bigquery_udf_spark.operators.dedup import (  # noqa: E402
    dedup_semantic,
    semdedup_k,
)
from dbt_bigquery_udf_spark.operators.similarity import (  # noqa: E402
    emb_hard_negatives,
)
from dbt_bigquery_udf_spark.operators.spark_native import (  # noqa: E402
    _derive_bucket_count,
    global_row_ids,
)
from dbt_bigquery_udf_spark.operators.graph import (  # noqa: E402
    graph_pagerank_converged,
)
from dbt_bigquery_udf_spark.operators.text import (  # noqa: E402
    bpe_pair_counts,
    dsir_importance_weights,
    text_bigram_lm_nll,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STRIDES = {
    "embeddings": {"vec_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
}


def stage(spark, n: int, root: str) -> str:
    # shared harness (round 6): one staging discipline for all probes
    return _stage(spark, n, root, SF_DIR, STRIDES)


timed = _timed


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-r3")
    root = tempfile.mkdtemp(prefix="scale_probe_r3_")
    try:
        # Warmup: run each op once untimed so the first timed column
        # (x1) isn't paying JVM/codegen/broadcast warmup that the later
        # columns don't — warmup used to make x1 look SLOWER than x10.
        for fn in (
            global_row_ids, dedup_semantic, dsir_importance_weights,
            bpe_pair_counts, text_bigram_lm_nll, emb_hard_negatives,
            graph_pagerank_converged,
        ):
            fn(spark, SF_DIR).count()
        for n in ns:
            d = stage(spark, n, root)
            n_doc = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
            n_vec = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
            # what the sizing rule would pick at this and real scales
            print(
                f"-- x{n}: {n_doc} docs ({_derive_bucket_count(n_doc)} buckets; "
                f"at 1e12 rows: {_derive_bucket_count(10**12)}), "
                f"{n_vec} vectors (semdedup_k={semdedup_k(n_vec)})"
            )
            timed(f"global_row_ids x{n}", global_row_ids, spark, d)
            timed(f"dedup_semantic x{n}", dedup_semantic, spark, d)
            timed(f"dsir_importance_weights x{n}", dsir_importance_weights, spark, d)
            timed(f"bpe_pair_counts x{n}", bpe_pair_counts, spark, d)
            timed(f"text_bigram_lm_nll x{n}", text_bigram_lm_nll, spark, d)
            timed(f"emb_hard_negatives x{n}", emb_hard_negatives, spark, d)
            timed(
                f"graph_pagerank_converged x{n}",
                graph_pagerank_converged,
                spark,
                d,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
