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
from dbt_bigquery_udf_spark.operators.similarity import (  # noqa: E402
    sim_range_search,
)
from dbt_bigquery_udf_spark.operators.text import (  # noqa: E402
    bpe_train_merges,
    dedup_block_removal,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

OPS = (bpe_train_merges, dedup_block_removal, sim_range_search)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-r6b")
    root = tempfile.mkdtemp(prefix="scale_probe_r6b_")
    try:
        for fn in OPS:  # warmup, untimed (see _probe_common)
            fn(spark, SF_DIR).count()
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
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
