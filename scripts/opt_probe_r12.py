"""Round-12 optimization probe: isolate named queries, time them with
the bench methodology (min of N end-to-end fn+collect runs, same
session confs, same epoch resets), and dump ``.explain("formatted")``
of the returned DataFrame to ``plans/r12/<name>_<tag>.txt``.

Usage:
    python scripts/opt_probe_r12.py [--tag before] [--runs 3] name [name ...]
    python scripts/opt_probe_r12.py --tag before --top 12   # slowest by BENCH_RUNS.json

The explain capture is best-effort plan evidence: for lifecycle queries
(fn() itself mutates indexes / runs streaming) the returned DF is only
the final read — the timing is still the honest end-to-end number.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_bigquery_udf_spark import get_spark  # noqa: E402
from dbt_bigquery_udf_spark import queries as Q  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        with open(os.path.join(REPO, "BENCH_RUNS.json")) as fh:
            q = json.load(fh)["queries"]
        names += [
            n for n, _ in sorted(q.items(), key=lambda kv: -kv[1])[: args.top]
            if n not in names
        ]

    import bench  # noqa: E402  (reuses _reset_epoch_dbs + ordering)

    spark = get_spark(app_name="opt_probe_r12")
    plans_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, list[float]] = {}
    for name in names:
        fn = Q.QUERIES[name]
        bench._reset_epoch_dbs(spark)
        per: list[float] = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name}#run{i}")
            t = time.perf_counter()
            df = fn(spark, SF_DIR)
            rows = df.collect()
            per.append(round(time.perf_counter() - t, 3))
            assert len(rows) >= 0
        spark.sparkContext.setJobDescription(None)
        if not args.no_plan:
            try:
                plan = spark._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
                ) as fh:
                    fh.write(plan)
            except Exception as exc:  # plan capture must not fail the probe
                print(f"plan capture failed for {name}: {exc}", file=sys.stderr)
        out[name] = per
        spark.catalog.clearCache()
        print(json.dumps({"query": name, "runs": per, "min": min(per)}))
        sys.stdout.flush()

    print(json.dumps({"tag": args.tag, "sf_dir": SF_DIR,
                      "minima": {n: min(v) for n, v in out.items()}}))


if __name__ == "__main__":
    main()
