"""Targeted oracle verification for a subset of registered queries —
the fast iteration loop for optimization rounds (full-registry replica:
scripts/verify_driver.py).

    python scripts/verify_subset.py [--sf-dir DIR] name [name ...]

Runs each named query through ``testing.compare_query`` against its
DuckDB oracle in a foreign session (driver shape). Exit 0 iff all match.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod
    from dbt_bigquery_udf_spark.testing import compare_query

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad: list[tuple[str, str]] = []
    for name in args.names:
        r = compare_query(
            spark, queries[name], oracles.get(name), args.sf_dir, name
        )
        ok = r["status"] in ("match", "rows_only") and r["ok"]
        if not ok:
            bad.append((name, r["status"]))
        print(json.dumps({"query": name, "status": r["status"], "ok": r["ok"]}))
    print(json.dumps({"n": len(args.names), "bad": bad, "sf_dir": args.sf_dir}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
