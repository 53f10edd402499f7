"""Round-6 (cont.) scale probe: the three operators added after the
round-6 closeout gate, same staging discipline as the shared harness
(scripts/_probe_common.py):

- bpe_train_merges   (corpus scan once; per-step work vocabulary-sized,
                      so columns should grow ~linearly with the scan
                      while the 4 training steps stay constant)
- dedup_block_removal (replicas make EVERY block a cross-doc dup — the
                      adversarial worst case for the broadcast dup set:
                      it stays |distinct blocks|-sized, not corpus-sized)
- sim_range_search   (broadcast query batch, zero exchanges: pure scan)
- dedup_containment  (LSH-bounded candidate pairs; replicas multiply
                      true near-dups, the candidate stream scales with
                      dup density by design)
- emb_knn_graph      (cluster-blocked pair space O(n x cell); k grows
                      with n so cell size stays ~64)
- pipeline_dedup_funnel (composition: cost = sum of its branches)

    python scripts/scale_probe_r6b.py [N ...]     # default: 1 10 30

Results recorded in SCALE.md "Round-6 measured scaling (continued)".
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _probe_common import stage, timed  # noqa: E402

from dbt_bigquery_udf_spark import get_spark  # noqa: E402
from dbt_bigquery_udf_spark.operators.dedup import (  # noqa: E402
    _STAGE_MEMO,
    dedup_containment,
)
from dbt_bigquery_udf_spark.operators.similarity import (  # noqa: E402
    emb_knn_graph,
    sim_range_search,
)
from dbt_bigquery_udf_spark.operators.text import (  # noqa: E402
    bpe_train_merges,
    dedup_block_removal,
    pipeline_dedup_funnel,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

OPS = (
    bpe_train_merges,
    dedup_block_removal,
    sim_range_search,
    dedup_containment,
    emb_knn_graph,
    pipeline_dedup_funnel,
)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-r6b")
    root = tempfile.mkdtemp(prefix="scale_probe_r6b_")
    try:
        for fn in OPS:  # warmup, untimed (see _probe_common)
            fn(spark, SF_DIR).count()
        # warmup populated the memoized stages / block cache for
        # SF_DIR; clear so the x1 column isn't measured under that
        # cache pressure (same reason as the per-multiple clear below)
        _STAGE_MEMO.clear()
        spark.catalog.clearCache()
        for n in ns:
            d = stage(spark, n, root, SF_DIR)
            n_doc = spark.read.parquet(
                os.path.join(d, "documents.parquet")
            ).count()
            n_vec = spark.read.parquet(
                os.path.join(d, "embeddings.parquet")
            ).count()
            print(f"-- x{n}: {n_doc} docs, {n_vec} vectors")
            for fn in OPS:
                timed(f"{fn.__name__} x{n}", fn, spark, d)
            # drop this multiple's memoized persisted stages before the
            # next one, or earlier dirs' caches skew later columns
            _STAGE_MEMO.clear()
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
