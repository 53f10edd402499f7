"""Round-7 scaling probe: the persisted-index incremental near-dup gate.

Protocol identical to scale_probe_r6b (shared _probe_common harness:
staged shifted-id replicas, >=32 write splits, per-op warmup, min-of-2).
The op under test is end-to-end dedup_incr_near_indexed: base-index
BUILD (first call only) + batch-1 admission append + batch-2 scoring.
A second timed call per multiple isolates the steady-state cost — the
index is adopted/reused, so call 2 pays only batch signature-ization +
probe + verify, the per-batch cost a continuous-ingestion pipeline
actually pays.

Usage: python scripts/scale_probe_r7.py [multiples...]
Results recorded in SCALE.md.
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
from dbt_bigquery_udf_spark.operators.dedup import (  # noqa: E402
    _STAGE_MEMO,
    _near_index_db,
    dedup_incr_near_indexed,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-r7")
    root = tempfile.mkdtemp(prefix="scale_probe_r7_")
    try:
        # warmup on the base sf dir (JVM/codegen), then drop its state
        dedup_incr_near_indexed(spark, SF_DIR).count()
        spark.sql(f"DROP DATABASE IF EXISTS {_near_index_db(SF_DIR)} CASCADE")
        _STAGE_MEMO.clear()
        spark.catalog.clearCache()
        for n in ns:
            d = stage(spark, n, root, SF_DIR)
            n_doc = spark.read.parquet(
                os.path.join(d, "documents.parquet")
            ).count()
            print(f"-- x{n}: {n_doc} docs")
            walls = []
            for call in (1, 2):
                t = time.perf_counter()
                rows = dedup_incr_near_indexed(spark, d).count()
                walls.append(time.perf_counter() - t)
                print(
                    {
                        "call": call,
                        "x": n,
                        "wall_s": round(walls[-1], 2),
                        "batch2_rows": rows,
                        "phase": "build+admit+score" if call == 1 else (
                            "steady-state (index reused)"
                        ),
                    }
                )
            spark.sql(f"DROP DATABASE IF EXISTS {_near_index_db(d)} CASCADE")
            _STAGE_MEMO.clear()
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
