"""Round-6 scale probe: same staging discipline as scale_probe_r3
(shared harness in scripts/_probe_common.py) over the round-6
operators and the two queries newly rotated into the driver window:

- quality_gopher_rules (stopword-aware + line/symbol gate breadth)
- quality_c4_rules (line-level cleaning + page gates)
- dedup_shingle_fraction (xxhash64-keyed shared-exchange signal)
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _probe_common import stage, timed  # noqa: E402

from dbt_bigquery_udf_spark import get_spark  # noqa: E402
from dbt_bigquery_udf_spark.operators.extras import (  # noqa: E402
    text_bm25_topk,
)
from dbt_bigquery_udf_spark.operators.similarity import (  # noqa: E402
    sim_hamming_topk,
    sim_ivfpq_adc,
)
from dbt_bigquery_udf_spark.operators.text import (  # noqa: E402
    dedup_shingle_fraction,
    quality_c4_rules,
    quality_gopher_rules,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

OPS = (
    quality_gopher_rules,
    quality_c4_rules,
    dedup_shingle_fraction,
    sim_hamming_topk,
    sim_ivfpq_adc,
    text_bm25_topk,
)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-r6")
    root = tempfile.mkdtemp(prefix="scale_probe_r6_")
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
