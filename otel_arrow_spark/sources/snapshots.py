"""Snapshot-versioned parquet tables: the Iceberg commit model natively.

The sandbox has no Iceberg jar (sinks.py gates writeTo cleanly), but
the VALUE of a table format is not the jar — it is the commit protocol:

* readers resolve a single VERSION pointer to an immutable manifest (a
  file list), so a reader NEVER sees a half-written table — data files
  land first and are invisible until the manifest + pointer commit;
* every commit is a new manifest, so any historical version stays
  readable (time travel) and the pointer can move back (rollback);
* unreferenced data files are removed by an explicit vacuum, never as a
  side effect of a write.

This module implements exactly that over plain parquet + JSON
manifests, single-writer (the reference's pipelines are single-writer
per table; multi-writer needs a CAS primitive the filesystem lacks —
documented, not faked). File layout::

    table/
      data/batch-<version>/part-*.parquet   (immutable once committed)
      manifests/v<N>.json                   ({"files": [...], "rows": n})
      VERSION                               (atomic pointer: "N")

Scale notes: a manifest lists file paths — the same planning metadata
an Iceberg snapshot holds; reads are ``spark.read.parquet(*files)``, so
partition pruning/pushdown work unchanged. Commits are O(files) driver
metadata, data never rewrites on append. The pointer update is
``os.replace`` (atomic on POSIX).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DATA = "data"
_MANIFESTS = "manifests"
_POINTER = "VERSION"


def _ptr_path(table_dir: str) -> str:
    return os.path.join(table_dir, _POINTER)


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFESTS, f"v{version}.json")


def current_version(table_dir: str) -> int:
    """0 if the table has never committed."""
    try:
        with open(_ptr_path(table_dir)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def _atomic_write(path: str, content: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(content)
    os.replace(tmp, path)


def committed_meta(table_dir: str) -> list[dict]:
    """Every committed manifest's metadata (version order) — the replay
    ledger a streaming sink consults for batch-id idempotence."""
    out = []
    for p in sorted(
        glob.glob(os.path.join(table_dir, _MANIFESTS, "v*.json")),
        key=lambda p: int(os.path.basename(p)[1:-5]),
    ):
        with open(p) as f:
            m = json.load(f)
        m["version"] = int(os.path.basename(p)[1:-5])
        out.append(m)
    return out


def _commit(
    table_dir: str,
    df: DataFrame,
    mode: str,
    meta: dict | None = None,
    carry_files: list[str] | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    base = current_version(table_dir)
    # next version = beyond EVERY manifest ever written, not base+1 — a
    # commit after rollback must branch to a fresh number, never clobber
    # the abandoned version's (still readable) manifest or batch dir
    existing = [
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(table_dir, _MANIFESTS, "v*.json"))
    ]
    version = max([base, *existing], default=base) + 1
    batch_dir = os.path.join(table_dir, _DATA, f"batch-{version}")
    os.makedirs(os.path.join(table_dir, _MANIFESTS), exist_ok=True)
    # a leftover batch dir no manifest references is a crashed attempt's
    # orphan — removing it makes commit retries safe (committed batch
    # dirs can never match: their version number is already in use)
    if os.path.isdir(batch_dir):
        import shutil as _shutil

        _shutil.rmtree(batch_dir)
    # 1. data files land — invisible: no manifest references them yet
    df.write.mode("errorifexists").parquet(batch_dir)
    new_files = sorted(
        glob.glob(os.path.join(batch_dir, "*.parquet"))
    )
    prev_manifest = _read_manifest(table_dir, base) if base else {}
    prev = prev_manifest.get("files", [])
    files = (prev + new_files) if mode == "append" else new_files
    if carry_files:
        # file-scoped rewrite: untouched files of the parent version
        # carry into the new manifest verbatim, before the fresh batch
        files = list(carry_files) + new_files
    # per-file column bounds ride IN the manifest (Iceberg's file
    # statistics): computed once at commit over the fresh batch, carried
    # verbatim for inherited files — readers plan file pruning from the
    # manifest alone, no footer walking, no separate sidecar build
    file_stats: dict = {}
    inherit_from = prev_manifest.get("file_stats", {})
    cols = stats_cols or sorted(
        {c for st in inherit_from.values() for c in st}
    )
    for f in files:
        if f not in new_files and f in inherit_from:
            file_stats[f] = inherit_from[f]
    if cols and new_files:
        spark = df.sparkSession
        batch_frame = spark.read.parquet(*new_files)
        # an evolved batch may lack an inherited stats column: its rows
        # read as NULL there, so [None, None] bounds are the CORRECT
        # stats (a range predicate never matches NULL → prune), and the
        # aggregate must only name columns that exist
        present = [c for c in cols if c in batch_frame.columns]
        absent = [c for c in cols if c not in batch_frame.columns]
        aggs = []
        for c in present:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        rows = (
            batch_frame.groupBy(F.col("_metadata.file_path").alias("file"))
            .agg(*aggs)
            .collect()
            if present
            else [
                type("R", (), {"file": "file:" + f})() for f in new_files
            ]
        )
        for r in rows:
            st = {c: [r[f"lo_{c}"], r[f"hi_{c}"]] for c in present}
            st.update({c: [None, None] for c in absent})
            file_stats[r.file.removeprefix("file:")] = st
    # 2. immutable manifest for this version
    _atomic_write(
        _manifest_path(table_dir, version),
        json.dumps({"files": files, "parent": base, "mode": mode,
                    "file_stats": file_stats, **(meta or {})},
                   default=str),
    )
    # 3. the commit point: one atomic pointer swap
    _atomic_write(_ptr_path(table_dir), str(version))
    return version


def snapshot_append(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    meta: dict | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Commit ``df`` as a new version containing prior files + the new
    batch (``meta`` keys ride in the manifest — e.g. a streaming
    batch_id). ``stats_cols`` records per-file min/max for those columns
    in the manifest, enabling :func:`read_snapshot_pruned`; once a table
    has stats columns, later commits keep recording them automatically.
    Returns the committed version number."""
    return _commit(table_dir, df, "append", meta, stats_cols=stats_cols)


def snapshot_overwrite(spark: SparkSession, df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as a new version replacing the table contents.
    Old versions stay readable until vacuumed."""
    return _commit(table_dir, df, "overwrite")


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    evolve: bool = False,
) -> DataFrame:
    """The table as of ``version`` (default: current). An uncommitted
    crash (data files without a manifest/pointer) is invisible here by
    construction.

    ``evolve=True`` reads each committed batch under its OWN schema and
    unifies through the widening lattice (sources/evolution.py) —
    Iceberg's schema evolution over the snapshot history: a later batch
    may add columns (earlier rows read NULL) or widen numerics. The
    default single-scan path stays for same-schema tables (pushdown
    over one relation beats a union of per-batch scans)."""
    v = current_version(table_dir) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    m = _read_manifest(table_dir, v)
    if not m["files"]:
        raise ValueError(f"version {v} of {table_dir} is empty")
    if not evolve:
        return spark.read.parquet(*m["files"])
    from otel_arrow_spark.sources.evolution import evolved_union

    by_batch: dict[str, list[str]] = {}
    for f in m["files"]:
        by_batch.setdefault(os.path.dirname(f), []).append(f)
    gens = [spark.read.parquet(*fs) for fs in by_batch.values()]
    return evolved_union(*gens)


def read_snapshot_pruned(
    spark: SparkSession,
    table_dir: str,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
) -> tuple[DataFrame, dict]:
    """Range scan of a snapshot planned from the MANIFEST's per-file
    statistics: only files whose recorded [min, max] for ``col`` can
    overlap [lo, hi] are opened (files committed without stats are
    always read — pruning never loses rows), and the residual filter
    re-applies, so the result is row-identical to filtering
    :func:`read_snapshot`. Returns (frame, {files_total, files_read}).
    This is the Iceberg scan-planning path: pointer → manifest →
    pruned file list, zero data I/O before the final scan."""
    v = current_version(table_dir) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    m = _read_manifest(table_dir, v)
    stats = m.get("file_stats", {})
    keep = []
    for f in m["files"]:
        b = stats.get(f, {}).get(col)
        if b is None:
            keep.append(f)  # no stats: must read
            continue
        f_lo, f_hi = b
        if f_lo is None or f_hi is None:
            continue  # all-NULL file: a range predicate never matches

        def _cmp_ok(bound, probe):
            # bounds pass through JSON (numerics native, anything else
            # stringified): only prune on comparisons within one type
            # family — a str-vs-number comparison would be lexicographic
            # nonsense, so such files are read instead (never lost)
            num = (int, float)
            return (isinstance(bound, num) and isinstance(probe, num)) or (
                isinstance(bound, str) and isinstance(probe, str)
            )

        if lo is not None and _cmp_ok(f_hi, lo) and lo > f_hi:
            continue
        if hi is not None and _cmp_ok(f_lo, hi) and hi < f_lo:
            continue
        keep.append(f)
    info = {"files_total": len(m["files"]), "files_read": len(keep)}
    if not keep:
        out = read_snapshot(spark, table_dir, v).limit(0)
    else:
        out = spark.read.parquet(*keep)
    if lo is not None:
        out = out.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        out = out.filter(F.col(col) <= F.lit(hi))
    return out, info


def _read_files_evolved(spark: SparkSession, files: list[str]) -> DataFrame:
    """Read a manifest file list with per-batch schemas unified through
    the widening lattice — the safe way for maintenance jobs (compact,
    merge) to read a possibly schema-evolved table; a plain multi-path
    read would silently drop later batches' added columns."""
    from otel_arrow_spark.sources.evolution import evolved_union

    by_batch: dict[str, list[str]] = {}
    for f in files:
        by_batch.setdefault(os.path.dirname(f), []).append(f)
    return evolved_union(*[spark.read.parquet(*fs) for fs in by_batch.values()])


def snapshot_merge(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    scope: str = "table",
) -> int:
    """Keyed upsert (Delta/Iceberg ``MERGE INTO`` semantics) as one
    copy-on-write commit: rows of ``updates`` replace current rows with
    the same key, unmatched updates insert, and rows whose
    ``delete_col`` is true delete their key. Returns the new version;
    the pre-merge table stays readable at the previous version (and
    restorable via rollback — MERGE mistakes are not fatal).

    ``scope`` picks the COW granularity:

    * ``"table"`` — survivors + upserts rewrite into one fresh batch
      (simple, one full-table rewrite);
    * ``"files"`` — Iceberg's actual copy-on-write: per-file min/max
      bounds of the FIRST key column (one ``_metadata.file_path``
      aggregate over the current snapshot) pick the files any update
      key can touch; only those rewrite, every untouched file carries
      into the new manifest verbatim. A merge touching one hot key
      rewrites one file, not the table. Falls back to table scope when
      the first key column's bounds cannot discriminate (all files
      touched).

    Rewriting is one left_anti on the key columns + a union — no wide
    shuffle beyond the key join.
    """
    from pyspark import StorageLevel

    # the update batch is consumed by the dup check, the touched-file
    # probe, the survivor anti join and the rewrite union — persist it
    # once (merge-batch-sized by contract, far smaller than the table)
    # so its source plan executes once, not once per consumer
    # (guide §1.2); released after the commit
    updates = updates.persist(StorageLevel.MEMORY_AND_DISK)
    if delete_col is not None:
        if delete_col not in updates.columns:
            raise ValueError(
                f"delete_col {delete_col!r} not in updates columns "
                f"{updates.columns}"
            )
        # NULL flags (e.g. from an outer-join-assembled frame) mean
        # "not a delete" — a bare where(col)/where(~col) pair would drop
        # NULL-flag rows from BOTH branches, silently losing upserts
        flag = F.coalesce(F.col(delete_col), F.lit(False))
        deletes = updates.where(flag).select(*key_cols)
        upserts = updates.where(~flag).drop(delete_col)
    else:
        deletes = None
        upserts = updates
    # Delta/Iceberg MERGE errors on multiple source rows per key — match
    # that instead of silently writing duplicate-key rows
    dup = (
        upserts.groupBy(*key_cols).count().where(F.col("count") > 1).limit(1)
    ).collect()
    if dup:
        raise ValueError(
            f"updates contain multiple rows for key {[dup[0][k] for k in key_cols]}"
        )
    all_keys = upserts.select(*key_cols)
    if deletes is not None:
        all_keys = all_keys.unionByName(deletes)

    carried: list[str] = []
    m = _read_manifest(table_dir, current_version(table_dir))
    cur = read_snapshot(spark, table_dir, evolve=True)
    if scope == "files":
        k0 = key_cols[0]
        stats = m.get("file_stats", {})
        stat_bounds = [
            (f, stats[f][k0][0], stats[f][k0][1])
            for f in m["files"]
            if k0 in stats.get(f, {})
        ]
        statless = [f for f in m["files"] if k0 not in stats.get(f, {})]
        if statless:
            # only files WITHOUT manifest stats pay a bounds scan; a
            # stats-enabled table plans entirely from the manifest
            scanned = (
                spark.read.parquet(*statless)
                .select(F.col("_metadata.file_path").alias("file"), F.col(k0))
                .groupBy("file")
                .agg(F.min(k0).alias("lo"), F.max(k0).alias("hi"))
                .collect()
            )
            # _metadata.file_path is a file: URI; manifests hold plain paths
            stat_bounds += [
                (r.file.removeprefix("file:"), r.lo, r.hi) for r in scanned
            ]
        if len(stat_bounds) <= 256:
            # few files: ONE shuffle-free pass over the update keys — a
            # per-file "any key in [lo, hi]" boolean max — instead of a
            # distinct (full shuffle of every key) feeding a nested-loop
            # semi join (guide §2.4: remove shuffles outright)
            probes = all_keys.agg(
                *[
                    F.max(
                        (F.col(k0) >= F.lit(lo)) & (F.col(k0) <= F.lit(hi))
                    ).alias(f"_t{i}")
                    for i, (_, lo, hi) in enumerate(stat_bounds)
                ]
            ).head()
            touched = {
                f for i, (f, _, _) in enumerate(stat_bounds) if probes[f"_t{i}"]
            }
        else:
            bounds = spark.createDataFrame(
                stat_bounds, ["file", "lo", "hi"]
            )
            touched = {
                r.file
                for r in bounds.join(
                    all_keys.select(k0).distinct(),
                    (F.col(k0) >= F.col("lo")) & (F.col(k0) <= F.col("hi")),
                    "left_semi",
                ).collect()
            }
        carried = [f for f in m["files"] if f not in touched]
        if touched:
            cur = _read_files_evolved(spark, sorted(touched))
        else:
            cur = cur.limit(0)
    # ONE anti join against the union of upsert + delete keys — removing
    # a row because its key is upserted or because it is deleted is the
    # same predicate, so two anti passes over the survivors collapse
    # into one (guide §1.2)
    keep = cur.join(all_keys, key_cols, "left_anti")
    # evolved tables may carry columns the updates lack (and vice versa
    # when updates introduce a column): union by name with NULL fill,
    # the same absent-column semantics the evolution reader defines
    merged = keep.unionByName(upserts, allowMissingColumns=True)
    try:
        return _commit(
            table_dir,
            merged,
            "overwrite",
            {"merge_on": key_cols, "carried_files": carried} if carried
            else {"merge_on": key_cols},
            carry_files=carried,
        )
    finally:
        updates.unpersist(False)


def snapshot_compact(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Small-file compaction as a COMMIT (Iceberg rewrite_data_files):
    the current version's rows rewrite into ~target-sized files and
    commit as a new overwrite version — logically identical data, new
    layout. Unlike the in-place directory swap (sinks.py
    compact_parquet_dir), history is preserved: the fragmented version
    stays readable/rollbackable until vacuumed, and a reader mid-query
    on the old file list is never yanked out from under (its files
    outlive the commit). Manifest stats recompute over the new files
    automatically."""
    import math

    v = current_version(table_dir)
    if v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    m = _read_manifest(table_dir, v)
    bytes_now = sum(os.path.getsize(f) for f in m["files"])
    n_out = max(1, math.ceil(bytes_now / target_file_bytes))
    # evolved read: a plain multi-path scan of a schema-evolved table
    # samples one schema and silently DROPS later batches' columns —
    # compaction would then commit the lossy rewrite as current
    df = _read_files_evolved(spark, m["files"]).repartition(n_out)
    return _commit(
        table_dir, df, "overwrite",
        {"compacted_from": v, "files_before": len(m["files"])},
    )


def snapshot_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """The table's commit log as a frame: ``(version, mode, n_files,
    parent, is_current, batch_id)`` — the observability face of the
    manifest directory (Iceberg's ``table.history()``)."""
    cur = current_version(table_dir)
    rows = [
        (
            m["version"],
            m.get("mode"),
            len(m.get("files", [])),
            m.get("parent"),
            m["version"] == cur,
            m.get("batch_id"),
        )
        for m in committed_meta(table_dir)
    ]
    return spark.createDataFrame(
        rows,
        "version long, mode string, n_files long, parent long, "
        "is_current boolean, batch_id long",
    )


def rollback(table_dir: str, version: int) -> None:
    """Point the table back at an earlier committed version. The
    abandoned versions' manifests remain until vacuum (re-rollforward
    stays possible)."""
    if not os.path.exists(_manifest_path(table_dir, version)):
        raise FileNotFoundError(f"version {version} was never committed")
    _atomic_write(_ptr_path(table_dir), str(version))


def expire_snapshots(table_dir: str, keep_last: int = 1) -> dict:
    """Vacuum: drop all but the last ``keep_last`` manifests at or below
    the current pointer, then delete data files no surviving manifest
    references. Files are only removed here — never by a write."""
    if keep_last < 1:
        raise ValueError(
            f"keep_last must be >= 1 (got {keep_last}): the current "
            "version is always retained"
        )
    cur = current_version(table_dir)
    all_versions = sorted(
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(table_dir, _MANIFESTS, "v*.json"))
    )
    keep = [v for v in all_versions if v <= cur][-keep_last:]
    keep += [v for v in all_versions if v > cur]  # rolled-back-from: keep
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_read_manifest(table_dir, v)["files"])
    dropped_files = 0
    for f in glob.glob(os.path.join(table_dir, _DATA, "*", "*.parquet")):
        if f not in referenced:
            os.remove(f)
            dropped_files += 1
    dropped_manifests = 0
    for v in all_versions:
        if v not in keep:
            os.remove(_manifest_path(table_dir, v))
            dropped_manifests += 1
    return {
        "kept_versions": keep,
        "dropped_manifests": dropped_manifests,
        "dropped_files": dropped_files,
    }
