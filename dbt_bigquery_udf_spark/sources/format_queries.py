"""Driver-checked format round-trips.

``tests/test_formats.py`` checks CSV/JSONL/ORC fidelity locally; these
registry entries put the same guarantee under the DRIVER's oracle: each
query stages the events table in another format (once per session,
inside the repo's staging dir), reads it back through
``sources.formats.read_any``, and aggregates — the DuckDB oracle runs
on the ORIGINAL parquet, so any loss in the round-trip (timestamp
precision, type drift, row loss) breaks the value hash.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from .formats import read_any, write_any
from .registry import register_sources

_STAGING = os.path.join(os.path.dirname(__file__), "..", "..", ".fmt-staging")
_lock = threading.Lock()
_staged: dict[tuple[int, str, str], str] = {}


def _stage_events(spark: SparkSession, sf_dir: str, fmt: str) -> tuple[str, str]:
    """Write events once per (session, sf, fmt); returns (path, ddl schema)."""
    ev = register_sources(spark, sf_dir, tables=("events",))["events"].select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    schema = ev.schema
    key = (id(spark), sf_dir, fmt)
    with _lock:
        path = _staged.get(key)
        if path is None:
            name = "events_" + fmt + "_" + sf_dir.strip("/").replace("/", "_").replace(".", "_")
            path = os.path.abspath(os.path.join(_STAGING, name))
            write_any(ev, path, fmt)
            _staged[key] = path
    return path, schema


_ROUNDTRIP_ORACLE = """
SELECT event_type, count(*) AS n,
       round(sum(value), 2) AS value_sum,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM events GROUP BY event_type
"""


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    path, schema = _stage_events(spark, sf_dir, fmt)
    back = read_any(
        spark, path, fmt, schema=None if fmt in ("parquet", "orc") else schema
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("value_sum"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@register("source_orc_roundtrip", _ROUNDTRIP_ORACLE)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events staged as ORC, read back, aggregated — oracle runs on the
    original parquet, so the hash certifies lossless ORC round-trip."""
    return _roundtrip(spark, sf_dir, "orc")


@register("source_csv_roundtrip", _ROUNDTRIP_ORACLE)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events staged as headered CSV with explicit schema and
    microsecond timestamp format, read back, aggregated — certifies the
    text-format round-trip including sub-second event times."""
    return _roundtrip(spark, sf_dir, "csv")


@register("source_jsonl_roundtrip", _ROUNDTRIP_ORACLE)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events staged as JSON-lines (the dominant training-data
    interchange format), read back with an explicit schema, aggregated —
    certifies lossless JSONL round-trip including microsecond event
    times, against the oracle on the original parquet."""
    return _roundtrip(spark, sf_dir, "json")
