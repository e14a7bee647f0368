"""spark-submit entry point for table maintenance: the periodic jobs a
100 TB store runs nightly against its parquet/snapshot tables.

Actions (one per invocation):

    compact    — small-file rewrite; snapshot tables commit a new
                 version (history preserved), plain dirs swap in place
                 and refresh their skipping sidecars
    vacuum     — snapshot tables only: expire old manifests + delete
                 unreferenced data files
    zonemap    — (re)build the min/max sidecar for given columns
    bloom      — (re)build the bloom membership sidecar for a column
    expire     — plain hive-layout dirs: drop partition directories
                 below a retention watermark

Usage (cluster, POSIX-visible storage — NFS/local/fuse mounts):
    spark-submit --py-files otel_arrow_spark.zip jobs/table_maintenance.py \
        --table /mnt/tables/events --action compact [--target-mb 512]

Object stores (s3://, hdfs://) are NOT supported by this CLI: snapshot
detection and manifest/vacuum bookkeeping use POSIX file APIs (the
snapshot layer's documented scope); routing an s3:// snapshot table
here would mis-detect it as a plain directory. Port the bookkeeping to
the Hadoop FileSystem API before pointing it at remote storage.

Usage (sandbox):
    python jobs/table_maintenance.py --table /tmp/t --action zonemap \
        --columns user_id,ts --master 'local[8]'

Prints the action's stats as JSON; exit 0 on success.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _is_snapshot_table(path: str) -> bool:
    return os.path.exists(os.path.join(path, "VERSION"))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="table maintenance")
    ap.add_argument("--table", required=True, help="table directory")
    ap.add_argument(
        "--action", required=True,
        choices=["compact", "vacuum", "zonemap", "bloom", "expire"],
    )
    ap.add_argument("--target-mb", type=int, default=512,
                    help="compact: target file size")
    ap.add_argument("--keep-last", type=int, default=2,
                    help="vacuum: versions to retain")
    ap.add_argument("--columns", default=None,
                    help="zonemap: comma-separated stat columns; "
                         "bloom: the single sketched column")
    ap.add_argument("--partition-col", default=None, help="expire")
    ap.add_argument("--keep-from", default=None,
                    help="expire: lowest partition value kept")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from otel_arrow_spark.session import get_spark

    if args.master:
        spark = get_spark(app_name="table-maintenance", master=args.master)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("table-maintenance").getOrCreate()

    target_bytes = args.target_mb * 1024 * 1024
    if args.action == "compact":
        if _is_snapshot_table(args.table):
            from otel_arrow_spark.sources.snapshots import snapshot_compact

            v = snapshot_compact(spark, args.table, target_bytes)
            stats = {"table_kind": "snapshot", "committed_version": v}
        else:
            from otel_arrow_spark.sinks import compact_parquet_dir

            stats = compact_parquet_dir(spark, args.table, target_bytes)
            stats["table_kind"] = "parquet_dir"
    elif args.action == "vacuum":
        if not _is_snapshot_table(args.table):
            print("vacuum requires a snapshot table", file=sys.stderr)
            return 2
        from otel_arrow_spark.sources.snapshots import expire_snapshots

        stats = expire_snapshots(args.table, keep_last=args.keep_last)
    elif args.action == "zonemap":
        if not args.columns:
            ap.error("--columns required for zonemap")
        from otel_arrow_spark.sources.zonemap import write_zonemap

        out = write_zonemap(spark, args.table, args.columns.split(","))
        stats = {"manifest": out}
    elif args.action == "bloom":
        if not args.columns or "," in args.columns:
            ap.error("--columns must name exactly one column for bloom")
        from otel_arrow_spark.sources.bloomskip import write_bloom_manifest

        out = write_bloom_manifest(spark, args.table, args.columns)
        stats = {"manifest": out}
    else:  # expire
        if not (args.partition_col and args.keep_from):
            ap.error("--partition-col and --keep-from required for expire")
        from otel_arrow_spark.sinks import expire_partitions

        stats = expire_partitions(
            spark, args.table, args.partition_col, args.keep_from
        )
    print(json.dumps({"action": args.action, **stats}, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
