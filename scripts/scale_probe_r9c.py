"""Round-9 scaling probe: the IVF retrain lifecycle (versioned
rebuild-and-swap) over staged shifted-id embedding replicas.

Protocol: shared _probe_common harness. Per multiple, the probe
measures the three costs the rebuild-and-swap design trades between:

  retrain cold   retrain_ivf_index on a fresh corpus — pays the _up
                 artifact (owned-split Lloyd training + upserts), the
                 v1 snapshot, the ONE-refresh + full reassignment, and
                 the pointer swap
  retrain reused call 2 — both version groups reused, pointer already 2
                 (what every later maintenance tick pays)
  serve          sim_ivf_retrain end to end on the warm index — the
                 query-side cost (probe + rerank + moved-flag joins)

Usage: python scripts/scale_probe_r9c.py [multiples...]
Results recorded in SCALE.md.
"""

from __future__ import annotations

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


def main() -> None:
    multiples = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="r9c_")
    try:
        # warmup: full lifecycle once on the raw sf dir
        S.retrain_ivf_index(spark, SF_DIR)
        QUERIES["sim_ivf_retrain"](spark, SF_DIR).count()
        for n in multiples:
            d = stage(spark, n, root, SF_DIR)
            t0 = time.perf_counter()
            S.retrain_ivf_index(spark, d)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            res = S.retrain_ivf_index(spark, d)
            reused = time.perf_counter() - t0
            assert res == {"v1": "reused", "v2": "reused", "live": 2}, res
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                n_rows = QUERIES["sim_ivf_retrain"](spark, d).count()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            n_vecs = spark.read.parquet(
                os.path.join(d, "embeddings.parquet")
            ).count()
            print(
                f"x{n}: vecs={n_vecs} retrain_cold={cold:.2f}s "
                f"retrain_reused={reused:.2f}s serve={best:.2f}s "
                f"({n_rows} rows)",
                flush=True,
            )
            for suffix in ("_up", "_rt"):
                spark.sql(
                    "DROP DATABASE IF EXISTS "
                    f"{S._ivf_index_db(d)}{suffix} CASCADE"
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
