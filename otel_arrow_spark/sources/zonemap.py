"""Zone-map data skipping: file-level min/max manifests over plain
parquet, and a scan planner that prunes files before Spark ever opens
them.

This re-expresses the table-format value proposition the reference
reaches through Iceberg (SURVEY §7.0 — the Iceberg exporter's manifest
lists carry per-file column bounds so the query planner skips files)
over a directory of plain parquet: a sidecar manifest with per-file
column ranges, consulted at planning time.

Why it matters at 100 TB: parquet footers already hold row-group
min/max, but Spark only exploits them AFTER listing and opening every
file — at ~10⁶ files that is a metadata storm per query. A zone map
turns planning into one small manifest read: O(files) rows of bounds,
filtered down to the files whose range can overlap the predicate. The
residual filter is always re-applied, so pruning is a pure optimization
and can never change results (test-pinned).

Building the manifest is itself a distributed Spark job: ONE scan of
the data grouped by the `_metadata.file_path` hidden column — no
driver-side footer walking. The one driver-side materialization is the
pruned FILE LIST (the same bounded planning metadata an Iceberg driver
holds); manifests are per-partition-directory at fleet scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_zonemap"


def build_zonemap(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file bounds manifest: one row per parquet file with
    (n_rows, min_<c>, max_<c>, nnull_<c> for each stat column).
    One distributed scan; min/max/count are algebraic (partial+final)."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nnull_{c}"),
        ]
    return (
        df.select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def write_zonemap(spark: SparkSession, path: str, cols: list[str]) -> str:
    """Materialize the manifest beside the data (``<path>/_zonemap``,
    underscore-prefixed so data scans ignore it). Returns the manifest
    path. Rebuild after appending files."""
    out = os.path.join(path, MANIFEST_DIR)
    build_zonemap(spark, path, cols).coalesce(1).write.mode("overwrite").parquet(out)
    return out


def pruned_scan_multi(
    spark: SparkSession,
    path: str,
    preds: dict,
    zonemap: DataFrame | None = None,
) -> tuple[DataFrame, dict]:
    """Conjunctive range scan: ``preds`` maps column → (lo, hi) (either
    bound may be None); a file survives only if EVERY predicate's range
    can overlap its zone — the compound pruning a z-ordered layout
    (sources/clustering.py) exists to serve, where each predicate alone
    keeps many files but their intersection keeps few. Residual filters
    re-apply, so the result is row-identical to a full-scan AND-filter.
    The manifest must carry stats for every predicate column."""
    zm = zonemap
    if zm is None:
        mpath = os.path.join(path, MANIFEST_DIR)
        zm = (
            spark.read.parquet(mpath)
            if os.path.isdir(mpath)
            else build_zonemap(spark, path, list(preds))
        )
    # consulted twice (file-list collect + files_total count): materialize
    # the bounded planning metadata once so a lazily-built manifest's scan
    # does not execute per reference (guide §1.2)
    zm = zm.localCheckpoint()
    keep = zm
    for col, (lo, hi) in preds.items():
        if lo is not None:
            keep = keep.filter(F.col(f"max_{col}") >= F.lit(lo))
        if hi is not None:
            keep = keep.filter(F.col(f"min_{col}") <= F.lit(hi))
    files = [r.file for r in keep.select("file").collect()]
    stats = {"files_total": zm.count(), "files_read": len(files)}
    if not files:
        out = spark.createDataFrame([], spark.read.parquet(path).schema)
    else:
        out = spark.read.parquet(*files)
    for col, (lo, hi) in preds.items():
        if lo is not None:
            out = out.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            out = out.filter(F.col(col) <= F.lit(hi))
    return out, stats


def pruned_scan(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
    zonemap: DataFrame | None = None,
) -> tuple[DataFrame, dict]:
    """Scan ``path`` for rows with ``col`` in [lo, hi] (either bound may
    be None), reading ONLY the files whose zone can overlap. Returns
    (frame, stats) where stats records files_total/files_read. The range
    filter is re-applied to the surviving files, so the result is
    row-identical to a full-scan filter regardless of manifest staleness
    toward deletions (missing files raise; appended-but-unmapped files
    are the caller's rebuild obligation, as with any external index).

    All-null zones carry NULL bounds: a range predicate can never select
    NULL, so those files are skipped (comparison yields NULL → filtered).
    """
    zm = zonemap
    if zm is None:
        mpath = os.path.join(path, MANIFEST_DIR)
        zm = (
            spark.read.parquet(mpath)
            if os.path.isdir(mpath)
            else build_zonemap(spark, path, [col])
        )
    # same two-reference materialization as pruned_scan_multi
    zm = zm.localCheckpoint()
    keep = zm
    if lo is not None:
        keep = keep.filter(F.col(f"max_{col}") >= F.lit(lo))
    if hi is not None:
        keep = keep.filter(F.col(f"min_{col}") <= F.lit(hi))
    files = [r.file for r in keep.select("file").collect()]
    total = zm.count()
    stats = {"files_total": total, "files_read": len(files)}
    if not files:
        empty = spark.createDataFrame([], spark.read.parquet(path).schema)
        return empty, stats
    out = spark.read.parquet(*files)
    if lo is not None:
        out = out.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        out = out.filter(F.col(col) <= F.lit(hi))
    return out, stats
