"""Scan audit: ground-truth duplicate-fact-scan detection for every
registered query.

`.explain` strings under AQE hide stage subtrees behind `ShuffleQueryStage`
references, so counting `Scan parquet` in plan text is unreliable in both
directions. This audit uses the only trustworthy signal: per-stage
`inputRecords` from the Spark UI REST API. A stage whose input record count
equals a fact table's row count read that table; the same table appearing in
two stages of one query means the plan scanned it twice.

Two scans are not automatically a bug — different slices (different
predicates/columns) legitimately scan twice on columnar storage, and
aggregate-vs-raw diamonds (Q17/Q18) are cheaper re-scanned than cached or
shuffled. The audit surfaces candidates; each hit is either fixed
(persist the small diamond intermediate, or restructure to a window over an
existing partitioning) or documented in the operator's docstring.

Usage: python scripts/scan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

PORT = 4091


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(PORT))
        .getOrCreate()
    )
    from dbt_bigquery_udf_spark import queries as Q
    from dbt_bigquery_udf_spark.sources.registry import SOURCE_TABLES, read_source

    # Identify fact tables by row count (dims under 50k rows rarely matter).
    fact_rows = {}
    for t in SOURCE_TABLES:
        n = read_source(spark, sf_dir, t).count()
        if n >= 50_000:
            fact_rows[n] = t

    def stages() -> list[dict]:
        base = f"http://localhost:{PORT}/api/v1/applications"
        app = json.load(urllib.request.urlopen(base))[0]["id"]
        return json.load(
            urllib.request.urlopen(f"{base}/{app}/stages?status=COMPLETE")
        )

    seen: set[int] = set()
    seen.update(s["stageId"] for s in stages())
    flagged = []
    skip_prefixes = ("stream_", "source_", "ref_")
    for name in sorted(Q.QUERIES):
        if name.startswith(skip_prefixes):
            continue
        try:
            Q.QUERIES[name](spark, sf_dir).collect()
        except Exception as exc:  # pragma: no cover - audit tool
            print(f"{name}: ERROR {exc}")
            continue
        spark.catalog.clearCache()
        new = [s for s in stages() if s["stageId"] not in seen]
        seen.update(s["stageId"] for s in new)
        counts: dict[str, int] = {}
        for s in new:
            t = fact_rows.get(s["inputRecords"])
            if t:
                counts[t] = counts.get(t, 0) + 1
        dup = {t: c for t, c in counts.items() if c > 1}
        if dup:
            flagged.append((name, dup))
            print(f"{name}: MULTI-SCAN {dup}")
    print(f"audit complete: {len(flagged)} queries with duplicate fact scans")


if __name__ == "__main__":
    main()
