"""Round-11 scaling probe (VERDICT r10 #4): the ANN SERVING path,
measured the way round 10 measured admission — x1/x10/x30 shifted-id
embedding replicas, cold/warm columns, and the warm log-log exponent —
so "the serve is nprobe-bounded" becomes a measured exponent instead
of a docstring claim.

Per multiple:

  ivf_serve cold   sim_ivf_trained_indexed end to end on a fresh
                   corpus — pays k-means training + the full serving
                   assignment (the build half of the lifecycle)
  ivf_serve warm   min-of-2 repeats — what every later query pays:
                   catalog adopt + k-row centroid rank + nprobe
                   semi-join + candidate rerank
  ann_dash warm    sim_ann_eval_metrics min-of-2 — the dashboard:
                   four variant serves + brute ground truth + k-row
                   grading joins (dominated by the brute serve, which
                   IS linear by design — the recall denominator)

The expected shape: ivf_serve warm grows with the probed lists (~N/k
rows per list x fixed nprobe -> sub-linear vs corpus only through
scan parallelism; the candidate rerank is the linear-ish floor), while
the dashboard tracks its brute component. Exponents are recorded in
SCALE.md next to the admission-side table.

Usage: python scripts/scale_probe_r11.py [multiples...]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _probe_common import stage  # noqa: E402

from dbt_bigquery_udf_spark import get_spark  # noqa: E402
from dbt_bigquery_udf_spark.operators import similarity as S  # noqa: E402
from dbt_bigquery_udf_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

# every suffix a serving-family query might persist under the staged
# corpus db — dropped after each multiple so probes never cross-adopt
_SUFFIXES = ("", "_fg", "_fgs", "_up", "_rt", "_rt_e2", "_svb", "_svd")


def _drop_probe_dbs(spark, d: str) -> None:
    for suffix in _SUFFIXES:
        spark.sql(
            f"DROP DATABASE IF EXISTS {S._ivf_index_db(d)}{suffix} CASCADE"
        )


def _cold_warm(spark, name: str, d: str) -> tuple[float, float]:
    t0 = time.perf_counter()
    QUERIES[name](spark, d).count()
    cold = time.perf_counter() - t0
    warm = None
    for _ in range(2):
        t0 = time.perf_counter()
        QUERIES[name](spark, d).count()
        dt = time.perf_counter() - t0
        warm = dt if warm is None or dt < warm else warm
    return cold, warm


def main() -> None:
    multiples = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="r11_")
    warm_cols: dict[str, dict[int, float]] = {}
    try:
        # per-op warmup on the raw sf dir (JVM/codegen/broadcast)
        for name in ("sim_ivf_trained_indexed", "sim_ann_eval_metrics"):
            QUERIES[name](spark, SF_DIR).count()
        for n in multiples:
            d = stage(spark, n, root, SF_DIR)
            n_vecs = spark.read.parquet(
                os.path.join(d, "embeddings.parquet")
            ).count()
            line = [f"x{n}: vecs={n_vecs}"]
            cold, warm = _cold_warm(spark, "sim_ivf_trained_indexed", d)
            warm_cols.setdefault("ivf_serve", {})[n] = warm
            line.append(f"ivf_serve={cold:.2f}/{warm:.2f}s")
            _c2, warm2 = _cold_warm(spark, "sim_ann_eval_metrics", d)
            warm_cols.setdefault("ann_dash", {})[n] = warm2
            line.append(f"ann_dash={_c2:.2f}/{warm2:.2f}s")
            print(" ".join(line), flush=True)
            _drop_probe_dbs(spark, d)
        lo, hi = min(multiples), max(multiples)
        if lo != hi:
            for tag, col in warm_cols.items():
                e = math.log(col[hi] / col[lo]) / math.log(hi / lo)
                print(f"exponent[{tag}] (warm, x{lo}->x{hi}): {e:.2f}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
