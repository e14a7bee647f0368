"""Bloom-filter data-skipping tests (sources/bloomskip.py)."""

from pyspark.sql import functions as F

from otel_arrow_spark.sources.bloomskip import (
    bloom_pruned_scan,
    build_bloom_manifest,
    write_bloom_manifest,
)


def _write_hash_clustered(spark, path, n=1000, files=8):
    """n rows HASH-clustered on k — every file's [min, max] spans the
    whole domain, so a zone map cannot prune; the bloom can."""
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    df.repartition(files, "k").write.mode("overwrite").parquet(path)
    return df


class TestBloomSkip:
    def test_manifest_bounded_and_parameterized(self, spark, workdir):
        p = f"{workdir}/bl1"
        _write_hash_clustered(spark, p)
        zm = build_bloom_manifest(spark, p, "k", m_bits=1024, k=3)
        rows = zm.collect()
        assert len({r.file for r in rows}) == 8
        # long format is bounded by m_bits/64 words per file
        assert all(0 <= r.word < 1024 // 64 for r in rows)
        assert all(r.m_bits == 1024 and r.k == 3 for r in rows)

    def test_point_lookup_prunes_and_matches_full_scan(self, spark, workdir):
        p = f"{workdir}/bl2"
        _write_hash_clustered(spark, p)
        write_bloom_manifest(spark, p, "k")
        out, stats = bloom_pruned_scan(spark, p, "k", [97])
        assert stats["files_read"] < stats["files_total"] == 8
        assert [r.k for r in out.collect()] == [97]

    def test_no_false_negatives_across_all_values(self, spark, workdir):
        """Every present value must be found — blooms can over-read,
        never under-read. Probes all 200 keys in one IN-scan."""
        p = f"{workdir}/bl3"
        _write_hash_clustered(spark, p, n=200, files=4)
        zm = build_bloom_manifest(spark, p, "k", m_bits=2048, k=4)
        out, stats = bloom_pruned_scan(
            spark, p, "k", list(range(200)), manifest=zm
        )
        assert out.count() == 200
        assert stats["files_read"] == 4  # all files genuinely needed

    def test_absent_value_reads_few_or_no_files(self, spark, workdir):
        p = f"{workdir}/bl4"
        _write_hash_clustered(spark, p)
        zm = build_bloom_manifest(spark, p, "k")
        out, stats = bloom_pruned_scan(
            spark, p, "k", [10**12], manifest=zm
        )
        assert out.count() == 0
        assert out.columns == ["k", "v"]
        # 4096-bit bloom at ~125 values/file: false-positive odds are
        # small; allow at most one accidental file
        assert stats["files_read"] <= 1

    def test_string_column(self, spark, workdir):
        p = f"{workdir}/bl5"
        df = spark.range(300).select(
            F.concat(F.lit("user-"), F.col("id")).alias("u"),
            F.col("id").alias("n"),
        )
        df.repartition(6, "u").write.mode("overwrite").parquet(p)
        zm = build_bloom_manifest(spark, p, "u")
        out, stats = bloom_pruned_scan(
            spark, p, "u", ["user-7", "user-250"], manifest=zm
        )
        assert sorted(r.u for r in out.collect()) == ["user-250", "user-7"]
        assert stats["files_read"] < stats["files_total"]

    def test_zonemap_cannot_prune_this_layout(self, spark, workdir):
        """The motivating contrast: same layout, range sidecar reads
        every file for a point predicate; the bloom reads fewer."""
        from otel_arrow_spark.sources.zonemap import build_zonemap, pruned_scan

        p = f"{workdir}/bl6"
        _write_hash_clustered(spark, p)
        zm_range = build_zonemap(spark, p, ["k"])
        _, s_range = pruned_scan(spark, p, "k", lo=97, hi=97, zonemap=zm_range)
        zm_bloom = build_bloom_manifest(spark, p, "k")
        _, s_bloom = bloom_pruned_scan(spark, p, "k", [97], manifest=zm_bloom)
        assert s_range["files_read"] == s_range["files_total"]
        assert s_bloom["files_read"] < s_bloom["files_total"]

    def test_fuzz_never_false_negative(self, spark, workdir):
        """Hypothesis: random value sets, random bloom geometry — every
        present value must survive pruning (blooms only over-read)."""
        from hypothesis import given, settings, strategies as st

        p = f"{workdir}/bl_fuzz"

        @settings(max_examples=5, deadline=None)
        @given(
            vals=st.lists(st.integers(-(2**40), 2**40), min_size=1,
                          max_size=40, unique=True),
            m_bits=st.sampled_from([256, 1024, 4096]),
            k=st.integers(2, 6),
        )
        def run(vals, m_bits, k):
            df = spark.createDataFrame([(v,) for v in vals], "k long")
            df.repartition(3, "k").write.mode("overwrite").parquet(p)
            zm = build_bloom_manifest(spark, p, "k", m_bits=m_bits, k=k)
            probe = vals[:: max(1, len(vals) // 7)]
            out, _ = bloom_pruned_scan(spark, p, "k", probe, manifest=zm)
            assert sorted(r.k for r in out.collect()) == sorted(probe)

        run()

    def test_sidecar_ignored_by_data_scans(self, spark, workdir):
        p = f"{workdir}/bl7"
        _write_hash_clustered(spark, p)
        write_bloom_manifest(spark, p, "k")
        assert spark.read.parquet(p).count() == 1000

    def test_null_rows_excluded_from_manifest(self, spark, workdir):
        """NULL column values carry no membership info (an IN predicate
        can never select them) and Spark's xxhash64 folds only the seed
        for NULL — left in the manifest they would inflate every
        NULL-bearing file's false-positive rate. They must be excluded,
        and scans over NULL-bearing data stay row-identical."""
        p = f"{workdir}/bl_nulls"
        df = spark.sql(
            "select case when id % 3 = 0 then null else id end as k "
            "from range(300)"
        )
        df.repartition(4, "k").write.mode("overwrite").parquet(p)
        zm = build_bloom_manifest(spark, p, "k", m_bits=1024, k=3)
        out, stats = bloom_pruned_scan(spark, p, "k", [7, 11], manifest=zm)
        assert sorted(r.k for r in out.collect()) == [7, 11]
        assert stats["files_read"] < stats["files_total"]
