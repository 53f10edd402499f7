"""Shared staging/timing harness for the scale probes (r3/r6+).

The discipline encoded here is the accumulation of three rounds of
probe-methodology fixes (VERDICT round-3 #7):

- replicate sf inputs Nx ON DISK with shifted ids (plan sees real
  files, not a union view);
- stage as >= 32 write splits rounded to a whole multiple of the 32
  cores (small N otherwise under-splits the map stage; a near-1.x
  multiple schedules a half-idle straggler wave);
- symlink the non-replicated tables so the staged dir is a complete
  sf layout;
- min-of-2 timing (the first run over freshly staged files pays cold
  page cache + plan compilation — measured 2-3x);
- per-op warmup before the first timed column (JVM/codegen/broadcast
  warmup used to make x1 look slower than x10).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

DEFAULT_STRIDES = {
    "embeddings": {"vec_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
}


def stage(spark, n: int, root: str, sf_dir: str, strides=None) -> str:
    strides = strides or DEFAULT_STRIDES
    out = os.path.join(root, f"x{n}")
    for table, cols in strides.items():
        df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
        parts = []
        for i in range(n):
            c = df
            for col, stride in cols.items():
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * stride)).cast("long")
                )
            parts.append(c)
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionByName(p)
        rep = rep.repartition(32 * max(1, (4 * n + 31) // 32))
        rep.write.mode("overwrite").parquet(
            os.path.join(out, f"{table}.parquet")
        )
    for f in os.listdir(sf_dir):
        dst = os.path.join(out, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(sf_dir, f), dst)
    return out


def timed(label: str, fn, spark, sf_dir: str, **kw) -> None:
    best, rows = None, 0
    for _ in range(2):
        t = time.perf_counter()
        rows = fn(spark, sf_dir, **kw).count()
        dt = time.perf_counter() - t
        best = dt if best is None or dt < best else best
    print(f"{label}: {best:.2f}s ({rows} rows)", flush=True)
