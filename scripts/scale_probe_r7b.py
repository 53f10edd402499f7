"""Round-7 scaling probe, second batch: the persisted trained-IVF
index lifecycle. Same protocol as scale_probe_r7 (_probe_common staged
replicas, per-op warmup). Per multiple: call 1 = TRAIN + persist +
serve (the build), call 2 = serve-only against the adopted index (what
every query after the build pays), plus the upsert path's first/steady
calls. Results recorded in SCALE.md.

Usage: python scripts/scale_probe_r7b.py [multiples...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _probe_common import stage  # noqa: E402

from dbt_bigquery_udf_spark import get_spark  # noqa: E402
from dbt_bigquery_udf_spark.operators.similarity import (  # noqa: E402
    _ivf_index_db,
    sim_ivf_trained_indexed,
    sim_ivf_upsert,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _drop(spark, d):
    spark.sql(f"DROP DATABASE IF EXISTS {_ivf_index_db(d)} CASCADE")
    spark.sql(f"DROP DATABASE IF EXISTS {_ivf_index_db(d)}_up CASCADE")


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-r7b")
    root = tempfile.mkdtemp(prefix="scale_probe_r7b_")
    try:
        sim_ivf_trained_indexed(spark, SF_DIR).count()  # warmup
        _drop(spark, SF_DIR)
        spark.catalog.clearCache()
        for n in ns:
            d = stage(spark, n, root, SF_DIR)
            n_vec = spark.read.parquet(
                os.path.join(d, "embeddings.parquet")
            ).count()
            print(f"-- x{n}: {n_vec} vectors")
            for name, fn in (
                ("trained_indexed", sim_ivf_trained_indexed),
                ("upsert", sim_ivf_upsert),
            ):
                for call, phase in ((1, "build+serve"), (2, "serve-only")):
                    t = time.perf_counter()
                    rows = fn(spark, d).count()
                    print(
                        {
                            "op": name,
                            "call": call,
                            "x": n,
                            "wall_s": round(time.perf_counter() - t, 2),
                            "rows": rows,
                            "phase": phase,
                        }
                    )
            _drop(spark, d)
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
