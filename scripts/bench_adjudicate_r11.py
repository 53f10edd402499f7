"""Isolated min-of-3 adjudication for bench movers (VERDICT r10 #2).

Every r9->r10 per-query mover with >1s absolute delta gets its own
FRESH PROCESS (no preceding bench queries, no lifecycle session state)
running just that query N times at $SPARK_GRAFT_SF_DIR; the minimum is
the adjudicated number. One JSON line per query on stdout, then a
summary line. Run on a quiesced box.

    python scripts/bench_adjudicate_r11.py [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the r9->r10 movers with |delta| > 1s (BENCH_r09 tail vs r10
# BENCH_RUNS.json minima; see SCALE.md round-11 adjudication table)
DEFAULT_MOVERS = (
    "sim_ivf_trained_indexed",
    "pipeline_embedding_curation",
    "sim_ivf_retrain_epoch2",
    "dedup_incr_exact_indexed",
    "stream_near_dup_admission",
    "stream_ivf_forget",
)

# plain-string template (.replace, not .format — the body's JSON
# braces would trip str.format)
_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, @REPO@)
from dbt_bigquery_udf_spark import get_spark
from dbt_bigquery_udf_spark import queries as Q
name = @NAME@
spark = get_spark(app_name="adjudicate-" + name)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
runs = []
for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))):
    t = time.perf_counter()
    Q.QUERIES[name](spark, sf_dir).collect()
    runs.append(round(time.perf_counter() - t, 3))
    spark.catalog.clearCache()
print("ADJ " + json.dumps({"query": name, "runs": runs, "min": min(runs)}))
"""


def main() -> int:
    movers = sys.argv[1:] or list(DEFAULT_MOVERS)
    out = {}
    for name in movers:
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                _CHILD.replace("@REPO@", repr(REPO)).replace(
                    "@NAME@", repr(name)
                ),
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=1200,
        )
        line = next(
            (
                ln[4:]
                for ln in proc.stdout.splitlines()
                if ln.startswith("ADJ ")
            ),
            None,
        )
        if proc.returncode != 0 or line is None:
            out[name] = {"error": (proc.stderr or proc.stdout)[-400:]}
            print(json.dumps({"query": name, "error": True}))
        else:
            rec = json.loads(line)
            out[name] = rec
            print(json.dumps(rec))
    print(json.dumps({"adjudicated": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
