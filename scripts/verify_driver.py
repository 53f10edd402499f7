"""Driver-gate replica: run the full __spark_entry__ contract the way
the driver does — entry() smoke plus every queries()[name] compared to
oracle_sql()[name] via DuckDB — in a FOREIGN SparkSession (built
without engine confs; `apply_engine_confs` inside bootstrap must make
it work anyway). One command, one JSON summary line:

    python scripts/verify_driver.py [sf_dir]   # default sf0.01

Exit 0 only when entry smokes and every query matches (or is a
declared rows-only sketch query).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod
    from dbt_bigquery_udf_spark.testing import compare_query

    df = entry_mod.entry(spark)
    n_entry = df.count()
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad: list[tuple[str, str]] = []
    n_rows_only = 0
    for name, fn in queries.items():
        r = compare_query(spark, fn, oracles.get(name), sf_dir, name)
        if r["status"] == "rows_only":
            n_rows_only += 1
        elif r["status"] != "match" or not r["ok"]:
            bad.append((name, r["status"]))
    print(
        json.dumps(
            {
                "entry_rows": n_entry,
                "total": len(queries),
                "match": len(queries) - n_rows_only - len(bad),
                "rows_only": n_rows_only,
                "bad": bad,
                "sf_dir": sf_dir,
            }
        )
    )
    return 1 if (bad or n_entry <= 0) else 0


if __name__ == "__main__":
    raise SystemExit(main())
