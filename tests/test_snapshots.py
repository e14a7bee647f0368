"""Snapshot-versioned table tests (sources/snapshots.py)."""

import os

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.sources.snapshots import (
    current_version,
    expire_snapshots,
    read_snapshot,
    rollback,
    snapshot_append,
    snapshot_overwrite,
)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


class TestSnapshots:
    def test_append_and_time_travel(self, spark, workdir):
        t = f"{workdir}/snap_t1"
        v1 = snapshot_append(spark, _batch(spark, 0, 100), t)
        v2 = snapshot_append(spark, _batch(spark, 100, 150), t)
        assert (v1, v2) == (1, 2) and current_version(t) == 2
        assert read_snapshot(spark, t).count() == 150
        assert read_snapshot(spark, t, version=1).count() == 100

    def test_overwrite_keeps_history(self, spark, workdir):
        t = f"{workdir}/snap_t2"
        snapshot_append(spark, _batch(spark, 0, 100), t)
        snapshot_overwrite(spark, _batch(spark, 500, 510), t)
        assert read_snapshot(spark, t).count() == 10
        assert read_snapshot(spark, t, version=1).count() == 100

    def test_uncommitted_data_is_invisible(self, spark, workdir):
        """The commit-protocol property: data files on disk without a
        manifest+pointer never reach a reader."""
        t = f"{workdir}/snap_t3"
        snapshot_append(spark, _batch(spark, 0, 50), t)
        # simulate a crash mid-commit: data landed, manifest/pointer didn't
        _batch(spark, 50, 99).write.parquet(f"{t}/data/batch-99")
        assert read_snapshot(spark, t).count() == 50
        # and the next real commit is unaffected (its own batch dir)
        snapshot_append(spark, _batch(spark, 100, 110), t)
        assert read_snapshot(spark, t).count() == 60

    def test_rollback_and_rollforward(self, spark, workdir):
        t = f"{workdir}/snap_t4"
        snapshot_append(spark, _batch(spark, 0, 10), t)
        snapshot_append(spark, _batch(spark, 10, 30), t)
        rollback(t, 1)
        assert read_snapshot(spark, t).count() == 10
        rollback(t, 2)
        assert read_snapshot(spark, t).count() == 30
        with pytest.raises(FileNotFoundError):
            rollback(t, 9)

    def test_commit_after_rollback_branches_cleanly(self, spark, workdir):
        t = f"{workdir}/snap_t5"
        snapshot_append(spark, _batch(spark, 0, 10), t)      # v1
        snapshot_append(spark, _batch(spark, 10, 20), t)     # v2
        rollback(t, 1)
        v3 = snapshot_append(spark, _batch(spark, 20, 25), t)  # v1 + new
        assert v3 == 3  # never reuses the abandoned version number
        assert read_snapshot(spark, t).count() == 15
        assert read_snapshot(spark, t, version=2).count() == 20  # still there

    def test_vacuum_drops_only_unreferenced(self, spark, workdir):
        t = f"{workdir}/snap_t6"
        snapshot_append(spark, _batch(spark, 0, 100), t)
        snapshot_overwrite(spark, _batch(spark, 0, 10), t)
        snapshot_append(spark, _batch(spark, 10, 20), t)   # v3 = v2 files + new
        stats = expire_snapshots(t, keep_last=1)
        assert stats["kept_versions"] == [3]
        assert stats["dropped_manifests"] == 2
        assert stats["dropped_files"] > 0       # v1's orphaned batch
        assert read_snapshot(spark, t).count() == 20  # current unharmed
        with pytest.raises(FileNotFoundError):
            read_snapshot(spark, t, version=1)

    def test_vacuum_rejects_keep_last_zero(self, spark, workdir):
        t = f"{workdir}/snap_t7"
        snapshot_append(spark, _batch(spark, 0, 5), t)
        with pytest.raises(ValueError, match="keep_last"):
            expire_snapshots(t, keep_last=0)

    def test_empty_table_raises(self, spark, workdir):
        with pytest.raises(FileNotFoundError):
            read_snapshot(spark, f"{workdir}/snap_never")

    def test_schema_evolution_across_versions(self, spark, workdir):
        """evolve=True unifies batches committed under different
        schemas: added column reads NULL for older rows, int widens to
        long — the Iceberg evolution story over the snapshot history."""
        t = f"{workdir}/snap_evolve"
        g1 = spark.createDataFrame([(1, 10)], "id long, v int")
        g2 = spark.createDataFrame(
            [(2, 2**40, "x")], "id long, v long, tag string"
        )
        snapshot_append(spark, g1, t)
        snapshot_append(spark, g2, t)
        got = read_snapshot(spark, t, evolve=True).orderBy("id").collect()
        assert [r.v for r in got] == [10, 2**40]
        assert [r.tag for r in got] == [None, "x"]
        assert dict(read_snapshot(spark, t, evolve=True).dtypes)["v"] == "bigint"
        # time travel composes: v1 alone has the original schema
        assert read_snapshot(spark, t, version=1, evolve=True).columns == [
            "id", "v"]

    def test_merge_upsert_insert_delete(self, spark, workdir):
        """MERGE semantics: matched keys update, unmatched insert,
        delete-flagged keys vanish — one COW commit, pre-merge version
        still readable."""
        from otel_arrow_spark.sources.snapshots import (
            snapshot_history,
            snapshot_merge,
        )

        t = f"{workdir}/snap_merge"
        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        )
        snapshot_append(spark, base, t)
        updates = spark.createDataFrame(
            [(2, "B", False), (4, "d", False), (3, None, True)],
            "id long, v string, _deleted boolean",
        )
        v = snapshot_merge(spark, t, updates, ["id"], delete_col="_deleted")
        got = {r.id: r.v for r in read_snapshot(spark, t).collect()}
        assert got == {1: "a", 2: "B", 4: "d"}
        # time travel to the pre-merge state
        assert {r.id for r in read_snapshot(spark, t, version=1).collect()} \
            == {1, 2, 3}
        h = {r.version: (r.mode, r.is_current)
             for r in snapshot_history(spark, t).collect()}
        assert h[1] == ("append", False) and h[v] == ("overwrite", True)

    def test_merge_without_delete_col(self, spark, workdir):
        from otel_arrow_spark.sources.snapshots import snapshot_merge

        t = f"{workdir}/snap_merge2"
        snapshot_append(
            spark,
            spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"),
            t,
        )
        snapshot_merge(
            spark, t,
            spark.createDataFrame([(2, 99), (5, 50)], "id long, v long"),
            ["id"],
        )
        got = {r.id: r.v for r in read_snapshot(spark, t).collect()}
        assert got == {1: 10, 2: 99, 5: 50}

    def test_file_scoped_merge_rewrites_only_touched_files(self, spark, workdir):
        """scope='files': a merge touching keys in one file carries the
        other files into the new manifest verbatim (Iceberg COW), with
        content identical to a table-scoped merge."""
        from otel_arrow_spark.sources.snapshots import (
            committed_meta,
            snapshot_merge,
        )

        t = f"{workdir}/snap_merge_files"
        base = spark.range(400).select(
            F.col("id"), (F.col("id") * 3).alias("v")
        )
        # 4 range-clustered files → tight per-file id bounds
        base.repartitionByRange(4, "id").write.parquet(f"{workdir}/smf_stage")
        snapshot_append(
            spark, spark.read.parquet(f"{workdir}/smf_stage"), t
        )
        m1 = committed_meta(t)[-1]
        assert len(m1["files"]) == 4
        updates = spark.createDataFrame(
            [(5, 999), (7, 777)], "id long, v long"
        )
        snapshot_merge(spark, t, updates, ["id"], scope="files")
        m2 = committed_meta(t)[-1]
        carried = set(m2["files"]) & set(m1["files"])
        assert len(carried) == 3  # only the low-id file rewrote
        got = {r.id: r.v for r in read_snapshot(spark, t).collect()}
        assert got[5] == 999 and got[7] == 777 and got[0] == 0
        assert len(got) == 400

    def test_file_scoped_merge_with_deletes_and_inserts(self, spark, workdir):
        from otel_arrow_spark.sources.snapshots import snapshot_merge

        t = f"{workdir}/snap_merge_files2"
        spark.range(100).selectExpr("id", "id * 2 as v") \
            .repartitionByRange(4, "id").write.parquet(f"{workdir}/smf2_stage")
        snapshot_append(spark, spark.read.parquet(f"{workdir}/smf2_stage"), t)
        updates = spark.createDataFrame(
            [(3, 33, False), (500, 5000, False), (4, None, True)],
            "id long, v long, _del boolean",
        )
        snapshot_merge(
            spark, t, updates, ["id"], delete_col="_del", scope="files"
        )
        got = {r.id: r.v for r in read_snapshot(spark, t).collect()}
        assert got[3] == 33 and got[500] == 5000 and 4 not in got
        assert len(got) == 100  # 100 - 1 delete + 1 insert

    def test_manifest_stats_prune_reads(self, spark, workdir):
        """Per-file column bounds recorded at commit plan the scan from
        the manifest alone: a range read opens fewer files and stays
        row-identical to filtering the full snapshot."""
        from otel_arrow_spark.sources.snapshots import read_snapshot_pruned

        t = f"{workdir}/snap_stats"
        df = spark.range(400).select(F.col("id"), (F.col("id") % 7).alias("v"))
        df.repartitionByRange(4, "id").write.parquet(f"{workdir}/ss_stage")
        snapshot_append(
            spark, spark.read.parquet(f"{workdir}/ss_stage"), t,
            stats_cols=["id"],
        )
        out, info = read_snapshot_pruned(spark, t, "id", lo=120, hi=180)
        assert info["files_read"] < info["files_total"] == 4
        assert sorted(r.id for r in out.collect()) == list(range(120, 181))

    def test_stats_survive_append_and_file_scoped_merge(self, spark, workdir):
        """Later commits keep recording stats automatically; a file-
        scoped merge carries untouched files' stats verbatim and
        re-stats the rewritten batch — pruned reads stay correct."""
        from otel_arrow_spark.sources.snapshots import (
            committed_meta,
            read_snapshot_pruned,
            snapshot_merge,
        )

        t = f"{workdir}/snap_stats2"
        spark.range(100).selectExpr("id", "id as v") \
            .repartitionByRange(2, "id").write.parquet(f"{workdir}/ss2_a")
        snapshot_append(
            spark, spark.read.parquet(f"{workdir}/ss2_a"), t, stats_cols=["id"]
        )
        # append WITHOUT naming stats cols: inherited automatically
        spark.range(100, 200).selectExpr("id", "id as v") \
            .coalesce(1).write.parquet(f"{workdir}/ss2_b")
        snapshot_append(spark, spark.read.parquet(f"{workdir}/ss2_b"), t)
        m = committed_meta(t)[-1]
        assert all(f in m["file_stats"] for f in m["files"])
        out, info = read_snapshot_pruned(spark, t, "id", lo=150, hi=160)
        assert info["files_read"] == 1 and out.count() == 11
        # merge one low key; high files carry their stats untouched
        snapshot_merge(
            spark, t,
            spark.createDataFrame([(5, 999)], "id long, v long"),
            ["id"], scope="files",
        )
        out, info = read_snapshot_pruned(spark, t, "id", lo=150, hi=160)
        assert info["files_read"] == 1 and out.count() == 11
        got = {r.id: r.v for r in
               read_snapshot_pruned(spark, t, "id", lo=5, hi=5)[0].collect()}
        assert got == {5: 999}

    def test_statless_manifest_reads_everything(self, spark, workdir):
        from otel_arrow_spark.sources.snapshots import read_snapshot_pruned

        t = f"{workdir}/snap_nostats"
        snapshot_append(spark, _batch(spark, 0, 50), t)
        out, info = read_snapshot_pruned(spark, t, "id", lo=0, hi=9)
        assert info["files_read"] == info["files_total"]
        assert out.count() == 10

    def test_compact_is_a_commit_history_preserved(self, spark, workdir):
        """snapshot_compact rewrites the layout as a NEW version: fewer
        files, identical rows, fragmented version still readable, stats
        recomputed over the new files."""
        from otel_arrow_spark.sources.snapshots import (
            committed_meta,
            read_snapshot_pruned,
            snapshot_compact,
        )

        t = f"{workdir}/snap_compact"
        frag = spark.range(1000).selectExpr("id", "id * 2 as v") \
            .repartition(20)
        frag.write.parquet(f"{workdir}/sc_stage")
        snapshot_append(
            spark, spark.read.parquet(f"{workdir}/sc_stage"), t,
            stats_cols=["id"],
        )
        n_files_before = len(committed_meta(t)[-1]["files"])
        assert n_files_before > 1  # AQE may coalesce the staged 20
        v = snapshot_compact(spark, t, target_file_bytes=1 << 30)
        m = committed_meta(t)[-1]
        assert m["version"] == v and m["compacted_from"] == 1
        assert len(m["files"]) == 1
        assert read_snapshot(spark, t).count() == 1000
        assert read_snapshot(spark, t, version=1).count() == 1000
        # stats recomputed for the new layout: pruned read still exact
        out, info = read_snapshot_pruned(spark, t, "id", lo=10, hi=19)
        assert out.count() == 10 and info["files_total"] == 1

    def test_merge_null_delete_flag_is_upsert(self, spark, workdir):
        """A NULL delete flag (outer-join-assembled updates) means 'not
        a delete' — the row must upsert, not vanish."""
        from otel_arrow_spark.sources.snapshots import snapshot_merge

        t = f"{workdir}/snap_merge_null"
        snapshot_append(
            spark, spark.createDataFrame([(1, 10)], "id long, v long"), t
        )
        updates = spark.createDataFrame(
            [(1, 11, None), (2, 20, True)],
            "id long, v long, _del boolean",
        )
        snapshot_merge(spark, t, updates, ["id"], delete_col="_del")
        got = {r.id: r.v for r in read_snapshot(spark, t).collect()}
        assert got == {1: 11}

    def test_merge_rejects_duplicate_keys_and_missing_flag_col(self, spark, workdir):
        from otel_arrow_spark.sources.snapshots import snapshot_merge

        t = f"{workdir}/snap_merge_dup"
        snapshot_append(
            spark, spark.createDataFrame([(1, 10)], "id long, v long"), t
        )
        dup = spark.createDataFrame([(2, 1), (2, 2)], "id long, v long")
        with pytest.raises(ValueError, match="multiple rows"):
            snapshot_merge(spark, t, dup, ["id"])
        with pytest.raises(ValueError, match="delete_col"):
            snapshot_merge(
                spark, t,
                spark.createDataFrame([(2, 1)], "id long, v long"),
                ["id"], delete_col="_missing",
            )

    def test_compact_preserves_evolved_schema(self, spark, workdir):
        """Compaction of a schema-evolved table must carry later
        batches' added columns into the rewrite (a plain multi-path
        read would silently drop them and vacuum would then lose the
        data forever)."""
        from otel_arrow_spark.sources.snapshots import snapshot_compact

        t = f"{workdir}/snap_compact_ev"
        snapshot_append(
            spark, spark.createDataFrame([(1, 10)], "id long, v int"), t
        )
        snapshot_append(
            spark,
            spark.createDataFrame([(2, 2**40, "x")],
                                  "id long, v long, tag string"),
            t,
        )
        snapshot_compact(spark, t, target_file_bytes=1 << 30)
        got = read_snapshot(spark, t).orderBy("id").collect()
        assert [r.tag for r in got] == [None, "x"]
        assert [r.v for r in got] == [10, 2**40]

    def test_file_scoped_merge_plans_from_manifest_stats(self, spark, workdir):
        """On a stats-enabled table the file-scoped merge picks touched
        files from the manifest bounds (no stat-less fallback scan) —
        carried files still verbatim, content right."""
        from otel_arrow_spark.sources.snapshots import (
            committed_meta,
            snapshot_merge,
        )

        t = f"{workdir}/snap_merge_stats"
        spark.range(200).selectExpr("id", "id as v") \
            .repartitionByRange(4, "id").write.parquet(f"{workdir}/sms_stage")
        snapshot_append(
            spark, spark.read.parquet(f"{workdir}/sms_stage"), t,
            stats_cols=["id"],
        )
        before = committed_meta(t)[-1]["files"]
        snapshot_merge(
            spark, t, spark.createDataFrame([(5, 99)], "id long, v long"),
            ["id"], scope="files",
        )
        after = committed_meta(t)[-1]
        assert len(set(after["files"]) & set(before)) == 3
        # carried files' manifest stats survive for future planning
        assert sum(1 for f in after["files"] if "id" in
                   after["file_stats"].get(f, {})) == len(after["files"])
        got = {r.id: r.v for r in read_snapshot(spark, t).collect()}
        assert got[5] == 99 and len(got) == 200
