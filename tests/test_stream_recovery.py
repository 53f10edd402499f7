"""Checkpoint recovery: the exactly-once guarantee across restarts.

A streaming pipeline's value at 100 TB is surviving restarts without
dropping or double-counting — this drives a windowed aggregation
through TWO separate runs sharing one checkpoint: run 1 sees batch A,
the query STOPS (simulated crash/deploy), more files land, run 2 starts
from the same checkpoint and must produce totals equal to one batch
pass over ALL the data, never re-counting batch A.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_checkpoint_recovery_exactly_once(spark, sf_small, tmp_path):
    src_dir = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)

    events = spark.read.parquet(os.path.join(sf_small, "events.parquet"))
    events = events.withColumn(
        "ts", F.expr("timestamp_micros(CAST(ts / 1000 AS BIGINT))")
    ) if dict(events.dtypes).get("ts") in ("bigint", "long") else events
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    a.write.parquet(os.path.join(src_dir, "batch_a"))

    schema = events.schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
        )
        agg = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
        )

        def sink(batch_df, batch_id):
            (
                batch_df.write.mode("overwrite").parquet(out_dir)
            )  # complete-mode totals: idempotent overwrite

        q = (
            agg.writeStream.outputMode("complete")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()  # run 1: batch A only
    got_a = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(out_dir).collect()
    }
    exp_a = {
        r["event_type"]: r["cnt"]
        for r in a.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got_a == exp_a

    b.write.parquet(os.path.join(src_dir, "batch_b"))
    run_once()  # run 2: same checkpoint, must add ONLY batch B
    got_all = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(out_dir).collect()
    }
    exp_all = {
        r["event_type"]: r["cnt"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got_all == exp_all  # no drops, no double counts
