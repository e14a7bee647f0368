"""Zone-map data-skipping tests (sources/zonemap.py)."""

from pyspark.sql import functions as F

from otel_arrow_spark.sources.zonemap import (
    build_zonemap,
    pruned_scan,
    write_zonemap,
)


def _write_clustered(spark, path, n=1000, files=8):
    """n rows range-clustered on k into `files` files → tight zones."""
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    df.repartitionByRange(files, "k").write.mode("overwrite").parquet(path)
    return df


class TestZoneMap:
    def test_manifest_shape_and_counts(self, spark, workdir):
        p = f"{workdir}/zm1"
        _write_clustered(spark, p)
        zm = build_zonemap(spark, p, ["k"])
        rows = zm.collect()
        assert len(rows) == 8
        assert sum(r.n_rows for r in rows) == 1000
        for r in rows:
            assert r.min_k <= r.max_k and r.nnull_k == 0

    def test_prune_reads_fewer_files_same_rows(self, spark, workdir):
        p = f"{workdir}/zm2"
        _write_clustered(spark, p)
        write_zonemap(spark, p, ["k"])
        out, stats = pruned_scan(spark, p, "k", lo=100, hi=150)
        assert stats["files_read"] < stats["files_total"]
        full = spark.read.parquet(p).filter("k >= 100 and k <= 150")
        assert sorted(r.k for r in out.collect()) == sorted(
            r.k for r in full.collect()
        )

    def test_open_bounds(self, spark, workdir):
        p = f"{workdir}/zm3"
        _write_clustered(spark, p)
        zm = build_zonemap(spark, p, ["k"])
        hi_only, s1 = pruned_scan(spark, p, "k", hi=10, zonemap=zm)
        assert hi_only.count() == 11 and s1["files_read"] == 1
        lo_only, s2 = pruned_scan(spark, p, "k", lo=990, zonemap=zm)
        assert lo_only.count() == 10 and s2["files_read"] == 1

    def test_empty_selection_keeps_schema(self, spark, workdir):
        p = f"{workdir}/zm4"
        _write_clustered(spark, p)
        zm = build_zonemap(spark, p, ["k"])
        out, stats = pruned_scan(spark, p, "k", lo=5000, hi=6000, zonemap=zm)
        assert stats["files_read"] == 0
        assert out.count() == 0
        assert out.columns == ["k", "v"]

    def test_all_null_zone_skipped_not_wrong(self, spark, workdir):
        p = f"{workdir}/zm5"
        a = spark.range(10).select(F.col("id").cast("long").alias("k"))
        b = spark.sql("select cast(null as long) k from range(5)")
        a.coalesce(1).write.parquet(p)
        b.coalesce(1).write.mode("append").parquet(p)
        zm = build_zonemap(spark, p, ["k"])
        out, stats = pruned_scan(spark, p, "k", lo=0, hi=100, zonemap=zm)
        assert stats["files_read"] == 1  # the all-null file pruned
        assert out.count() == 10  # identical to full-scan filter (NULL never matches)

    def test_manifest_sidecar_ignored_by_data_scans(self, spark, workdir):
        p = f"{workdir}/zm6"
        _write_clustered(spark, p)
        write_zonemap(spark, p, ["k"])
        # underscore-prefixed dir is invisible to a plain read
        assert spark.read.parquet(p).count() == 1000
