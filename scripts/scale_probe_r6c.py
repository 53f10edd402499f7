"""Round-6 (cont.) scale probe for the iterated k-means trainer:

- emb_kmeans_train  (3 Lloyd rounds over a persisted corpus; per round
                     one literal-centroid assignment scan + one k x 64
                     partial aggregate, so the column should scale
                     ~linearly with the corpus and the per-round driver
                     traffic stays k-bounded)
- emb_kmeans_step   (the single round, as the per-round unit cost)
- emb_kcenter_init  (k scans, each one literal-folded min-distance
                     argmax — cost = k x one corpus pass)
- emb_label_propagation (reuses the persisted kNN edges; the vote join
                     and argmax window move n x k narrow rows)

    python scripts/scale_probe_r6c.py [N ...]     # default: 1 10 30

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
    emb_kcenter_init,
    emb_kmeans_step,
    emb_kmeans_train,
    emb_label_propagation,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

OPS = (emb_kmeans_step, emb_kmeans_train, emb_kcenter_init, emb_label_propagation)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-r6c")
    root = tempfile.mkdtemp(prefix="scale_probe_r6c_")
    try:
        for fn in OPS:  # warmup, untimed (see _probe_common)
            fn(spark, SF_DIR).count()
        spark.catalog.clearCache()
        for n in ns:
            d = stage(spark, n, root, SF_DIR)
            n_vec = spark.read.parquet(
                os.path.join(d, "embeddings.parquet")
            ).count()
            print(f"-- x{n}: {n_vec} vectors")
            for fn in OPS:
                timed(f"{fn.__name__} x{n}", fn, spark, d)
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
