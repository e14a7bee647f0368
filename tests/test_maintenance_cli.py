"""Table-maintenance CLI (jobs/table_maintenance.py) — invoked
in-process; without --master the job's getOrCreate reuses the test
session, the same reuse spark-submit gives it on a cluster."""

import json

from pyspark.sql import functions as F


def _main(capsys, argv):
    from jobs.table_maintenance import main

    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


class TestMaintenanceCli:
    def test_compact_plain_dir_with_sidecar_refresh(self, spark, workdir, capsys):
        from otel_arrow_spark.sources.zonemap import write_zonemap

        p = f"{workdir}/mnt_plain"
        spark.range(2000).selectExpr("id as k").repartition(25).write.parquet(p)
        write_zonemap(spark, p, ["k"])
        rc, stats = _main(capsys, ["--table", p, "--action", "compact"])
        assert rc == 0 and stats["table_kind"] == "parquet_dir"
        assert stats["files_after"] < stats["files_before"]
        assert stats["sidecars_refreshed"] == ["zonemap"]
        assert spark.read.parquet(p).count() == 2000

    def test_compact_and_vacuum_snapshot_table(self, spark, workdir, capsys):
        from otel_arrow_spark.sources.snapshots import (
            read_snapshot,
            snapshot_append,
        )

        t = f"{workdir}/mnt_snap"
        for lo in (0, 500):
            snapshot_append(
                spark, spark.range(lo, lo + 500).repartition(6), t
            )
        rc, stats = _main(capsys, ["--table", t, "--action", "compact"])
        assert rc == 0 and stats["table_kind"] == "snapshot"
        assert stats["committed_version"] == 3
        assert read_snapshot(spark, t).count() == 1000
        rc, stats = _main(
            capsys, ["--table", t, "--action", "vacuum", "--keep-last", "1"]
        )
        assert rc == 0 and stats["dropped_manifests"] == 2
        assert read_snapshot(spark, t).count() == 1000

    def test_sidecar_builds_and_vacuum_guard(self, spark, workdir, capsys):
        p = f"{workdir}/mnt_sidecars"
        spark.range(1000).selectExpr("id as k", "id % 7 as v") \
            .repartition(8, "k").write.parquet(p)
        rc, stats = _main(
            capsys, ["--table", p, "--action", "zonemap", "--columns", "k,v"]
        )
        assert rc == 0 and stats["manifest"].endswith("_zonemap")
        rc, stats = _main(
            capsys, ["--table", p, "--action", "bloom", "--columns", "k"]
        )
        assert rc == 0 and stats["manifest"].endswith("_bloomskip")
        from jobs.table_maintenance import main

        assert main(["--table", p, "--action", "vacuum"]) == 2

    def test_expire_partitions(self, spark, workdir, capsys):
        p = f"{workdir}/mnt_expire"
        spark.createDataFrame(
            [(d, i) for d in ("2026-01-01", "2026-01-02", "2026-01-03")
             for i in range(5)],
            "day string, x int",
        ).write.partitionBy("day").parquet(p)
        rc, stats = _main(capsys, [
            "--table", p, "--action", "expire",
            "--partition-col", "day", "--keep-from", "2026-01-02",
        ])
        assert rc == 0
        assert spark.read.parquet(p).select("day").distinct().count() == 2
