"""Round-12 streaming-floor A/B (VERDICT r11 #7): time an EMPTY
availableNow foreachBatch pipeline (same staged two-file source, no-op
batch fn, same trigger shape as the gates) against a representative
real gate — the difference is the engine's own work; the empty number
is the structural floor (query start/stop + micro-batch scheduling +
checkpoint commits) that no operator change can remove.

    python scripts/stream_floor_probe.py [--runs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_bigquery_udf_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()
    spark = get_spark(app_name="stream_floor_probe")

    from dbt_bigquery_udf_spark.operators.dedup import (
        _stage_near_dup_arrivals,
    )

    stage = _stage_near_dup_arrivals(spark, SF_DIR)
    schema = spark.read.parquet(stage).schema

    def empty_pipeline() -> None:
        docs = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = (
            docs.writeStream.foreachBatch(lambda df, bid: None)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)

    def count_pipeline() -> None:
        # minimal real work: count each micro-batch (forces the read)
        docs = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = (
            docs.writeStream.foreachBatch(lambda df, bid: df.count() and None)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)

    out = {}
    for name, fn in (("empty_2batch", empty_pipeline), ("count_2batch", count_pipeline)):
        per = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"floor:{name}#{i}")
            t = time.perf_counter()
            fn()
            per.append(round(time.perf_counter() - t, 3))
        out[name] = {"runs": per, "min": min(per)}
        print(json.dumps({name: out[name]}))
    print(json.dumps({"floor_min": out["empty_2batch"]["min"], "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
