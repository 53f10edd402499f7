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
    "snapshot_tables",
    "restore_snapshot",
    "drop_snapshot",
]

STAGE_COMPLETE_MARKER = "_STAGE_COMPLETE"
SNAP_COMPLETE_MARKER = "_SNAP_COMPLETE"
_SNAP_DIR = "_pristine"


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


def invalidate_db_location(db: str) -> None:
    """Drop ``db``'s cached location (every warehouse). Call wherever a
    ``DROP DATABASE`` can occur (ADVICE r11): a database re-created at a
    different (custom LOCATION) path must not have the old path served —
    ``clear_tables`` deletes files at the cached location. All package
    creates go through ``_ensure_db`` (which pops on create); this
    covers external droppers (bench.py, scripts)."""
    for key in [k for k in _DB_LOCATION_CACHE if k[1] == db]:
        _DB_LOCATION_CACHE.pop(key, None)


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
    only then is the stage COMMITTED into the live slot — since round 12
    by a same-volume atomic directory rename (:func:`_commit_stage`),
    not a second Spark write job: the kept bytes are written exactly
    once (guide §6 — at scale the old stage→live copy was a full second
    pass over the table). Every crash window keeps a recovery source:

    * before the stage commits — live table untouched, stale stage
      cleared on the next fold;
    * mid-commit — the staged table (or, post-rename, the live
      directory) holds the complete kept set; :func:`recover_staged`
      (run at the top of every fold) finishes the commit, same-session
      or from a fresh session over the warm warehouse (it adopts an
      on-disk stage the empty catalog doesn't know about);
    * after the commit, before the stage entry drop — finishing the
      commit is idempotent.

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
        _commit_stage(spark, db, table)


def _commit_stage(spark: SparkSession, db: str, table: str) -> None:
    """Commit a COMPLETE stage into the live slot without rewriting its
    bytes: clear the live table, atomically ``os.rename`` the staged
    directory onto the live path (same volume by construction — both
    live under the database location), register the live table over the
    moved files, and drop the now-dangling stage entry. Replaces the
    pre-round-12 stage→live ``saveAsTable`` copy (a second full write
    job per fold; guide §6). Preconditions: ``db.<table>__staged`` is
    cataloged and its directory holds the complete kept set (the caller
    wrote the completion marker). The live table comes back EXTERNAL
    (``CREATE TABLE ... LOCATION`` with the stage's catalog schema —
    explicit, so an empty kept set whose write produced zero part-files
    still registers); every consumer already handles external relations
    (``ensure_tables`` adoption has produced them since round 8, and
    ``clear_tables`` removes files explicitly).

    Crash windows, each detectable and finished by
    :func:`recover_staged`:

    * after the live clear, before the rename — stage cataloged with
      its directory intact: recovery re-runs this commit;
    * after the rename, before the live re-register — stage cataloged
      but its directory GONE (the rename is the atomic commit point):
      recovery registers the live directory from the stage entry's
      schema and drops the entry;
    * after the re-register, before the stage entry drop — both
      cataloged, stage directory gone: recovery just drops the entry.

    The renamed live directory keeps the stage's completion marker
    (underscore-prefixed, invisible to Spark's file listing) — harmless,
    and a truthful witness that the directory holds a committed set."""
    staged = f"{table}__staged"
    with catalog_lock:
        schema = spark.table(f"{db}.{staged}").schema  # catalog-only read
        loc = db_location(spark, db)
        path = loc.removeprefix("file:")
        clear_tables(spark, db, (table,))
        os.rename(os.path.join(path, staged), os.path.join(path, table))
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        spark.sql(
            f"CREATE TABLE {db}.{table} ({cols}) USING parquet "
            f"LOCATION '{loc}/{table}'"
        )
        spark.catalog.refreshTable(f"{db}.{table}")
        # entry only: the managed stage's directory was renamed away, so
        # the drop's file cleanup is a no-op
        spark.sql(f"DROP TABLE IF EXISTS {db}.{staged}")


def recover_staged(
    spark: SparkSession, db: str, tables: Sequence[str]
) -> list[str]:
    """Finish any interrupted :func:`staged_overwrite`: for each table
    whose ``__staged`` copy survives (in the catalog, or as orphaned
    parquet under the database location after a process crash), finish
    the rename commit from it and drop the stage; a stage entry whose
    directory is already gone means the atomic rename landed — recovery
    completes the live registration instead (see :func:`_commit_stage`
    for the window-by-window map). Returns the recovered table names.
    Called at the top of every compaction fold.

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
            sdir = os.path.join(path, staged)
            tdir = os.path.join(path, t)
            if spark.catalog.tableExists(f"{db}.{staged}"):
                if os.path.isdir(sdir):
                    # stage intact (crash before/at the live clear, or
                    # after it): the stage is the source — finish the
                    # rename commit
                    _commit_stage(spark, db, t)
                    recovered.append(t)
                    continue
                # dangling entry: the rename already moved the stage
                # into the live slot (the atomic commit point passed) —
                # finish the registration from the entry's schema and
                # drop the entry
                if os.path.isdir(tdir):
                    if not spark.catalog.tableExists(f"{db}.{t}"):
                        schema = spark.table(f"{db}.{staged}").schema
                        cols = ", ".join(
                            f"`{f.name}` {f.dataType.simpleString()}"
                            for f in schema.fields
                        )
                        spark.sql(
                            f"CREATE TABLE {db}.{t} ({cols}) USING "
                            f"parquet LOCATION '{loc}/{t}'"
                        )
                    spark.catalog.refreshTable(f"{db}.{t}")
                    spark.sql(f"DROP TABLE IF EXISTS {db}.{staged}")
                    recovered.append(t)
                continue
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
                _commit_stage(spark, db, t)
                recovered.append(t)
            else:
                # partial stage (no completion marker): live table is
                # still the source of truth — drop the stale stage
                shutil.rmtree(sdir, ignore_errors=True)
    return recovered


def move_table_files(
    spark: SparkSession,
    src_db: str,
    src_table: str,
    dst_db: str,
    dst_table: str,
) -> int:
    """Fold ``src`` into ``dst`` by MOVING its parquet files (same-volume
    ``os.rename`` per file) instead of a copy job + TRUNCATE — for folds
    whose semantics are a blind append (the near-dup delta→base fold;
    NOT the exact ledger's left_anti fold, which dedups on copy). Zero
    Spark write jobs, and strictly better crash behavior than
    copy-then-truncate: each row lives in exactly one layer at every
    instant (a crash mid-move leaves the tail rows in the delta, where
    the next fold trigger simply resumes; the old copy's crash window
    left the whole delta duplicated into the base until the truncate).
    Part-file names embed task UUIDs, so cross-layer collisions cannot
    occur; non-parquet bookkeeping files (``_SUCCESS``) stay behind.
    Returns the number of files moved. Caller holds the maintenance
    lease and refreshes both tables afterwards."""
    src = os.path.join(
        db_location(spark, src_db).removeprefix("file:"), src_table
    )
    dst = os.path.join(
        db_location(spark, dst_db).removeprefix("file:"), dst_table
    )
    n = 0
    if not os.path.isdir(src):
        return 0
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            os.rename(os.path.join(src, f), os.path.join(dst, f))
            n += 1
    return n


def _snap_root(spark: SparkSession, db: str) -> str:
    """``<db location>/_pristine`` — inside the database directory, so
    ``DROP DATABASE ... CASCADE`` (and bench.py's ``--fresh-indexes``
    rmtree) retires the snapshot together with the tables it mirrors;
    no table can be named ``_pristine`` (Spark's file listing skips
    underscore-prefixed paths), so it can never be adopted as data."""
    return os.path.join(
        db_location(spark, db).removeprefix("file:"), _SNAP_DIR
    )


def snapshot_tables(
    spark: SparkSession, db: str, tables: Sequence[str]
) -> None:
    """Hardlink-snapshot the named tables' CURRENT parquet files into
    the database's ``_pristine`` directory — to be called only when the
    caller has just verified the tables are in their canonical state
    (the auto-compacted demo queries' probe-clean base). Parquet files
    are immutable (appends/truncates create/unlink whole files, never
    rewrite in place), so hardlinks are snapshot-safe and cost no data
    copy. No-op if a complete snapshot already exists; a half-written
    one (no ``_SNAP_COMPLETE``) is discarded and retaken. Falls back to
    a byte copy on filesystems without hardlinks."""
    snap = _snap_root(spark, db)
    if os.path.isfile(os.path.join(snap, SNAP_COMPLETE_MARKER)):
        return
    shutil.rmtree(snap, ignore_errors=True)
    path = db_location(spark, db).removeprefix("file:")
    for t in tables:
        tdir = os.path.join(path, t)
        sdir = os.path.join(snap, t)
        os.makedirs(sdir, exist_ok=True)
        for f in os.listdir(tdir):
            if f.endswith(".parquet"):
                try:
                    os.link(os.path.join(tdir, f), os.path.join(sdir, f))
                except OSError:
                    shutil.copy2(os.path.join(tdir, f), os.path.join(sdir, f))
    with open(os.path.join(snap, SNAP_COMPLETE_MARKER), "w") as fh:
        fh.write("complete")


def drop_snapshot(spark: SparkSession, db: str) -> None:
    """Retire the pristine snapshot — called whenever the base tables
    are (re)built, so a schema/code migration can never restore a
    stale pristine set over the new build."""
    shutil.rmtree(_snap_root(spark, db), ignore_errors=True)


def restore_snapshot(
    spark: SparkSession, db: str, tables: Sequence[str]
) -> bool:
    """Restore the named tables to their pristine snapshot with ZERO
    Spark write jobs: hardlink the snapshot's files into a ``__staged``
    directory, mark it complete, and run the standard
    :func:`_commit_stage` rename — so the restore inherits the staged
    commit's crash durability window for window (a crash mid-hardlink
    leaves an unmarked partial stage that recovery clears; a crash
    after the marker is finished by :func:`recover_staged`). Returns
    False (caller falls back to depollute/rebuild) when no complete
    snapshot exists."""
    snap = _snap_root(spark, db)
    if not os.path.isfile(os.path.join(snap, SNAP_COMPLETE_MARKER)):
        return False
    path = db_location(spark, db).removeprefix("file:")
    with catalog_lock:
        for t in tables:
            staged = f"{t}__staged"
            clear_tables(spark, db, (staged,))
            sdir = os.path.join(path, staged)
            os.makedirs(sdir, exist_ok=True)
            for f in os.listdir(os.path.join(snap, t)):
                if f.endswith(".parquet"):
                    try:
                        os.link(
                            os.path.join(snap, t, f), os.path.join(sdir, f)
                        )
                    except OSError:
                        shutil.copy2(
                            os.path.join(snap, t, f), os.path.join(sdir, f)
                        )
            with open(
                os.path.join(sdir, STAGE_COMPLETE_MARKER), "w"
            ) as fh:
                fh.write("complete")
            loc = db_location(spark, db)
            spark.sql(
                f"CREATE TABLE {db}.{staged} USING parquet "
                f"LOCATION '{loc}/{staged}'"
            )
            _commit_stage(spark, db, t)
    return True


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
