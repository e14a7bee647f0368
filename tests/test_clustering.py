"""Z-order clustering tests (sources/clustering.py)."""

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.sources.clustering import write_zordered, zorder_key
from otel_arrow_spark.sources.zonemap import pruned_scan


def _grid(spark, n=64):
    """The full n x n integer grid — every (x, y) combination."""
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )


class TestZorderKey:
    def test_hand_interleave(self, spark):
        # 2 bits, bounds [0,3]: quantized value == raw value; x takes
        # even bit positions, y odd
        df = spark.createDataFrame(
            [(0, 0), (3, 0), (0, 3), (3, 3), (1, 2)], "x long, y long"
        )
        z = df.select(
            "x", "y",
            zorder_key({"x": (0, 3), "y": (0, 3)}, bits=2).alias("z"),
        )
        got = {(r.x, r.y): r.z for r in z.collect()}
        # quantization: floor(v/4 * 4) clamped to 3 → q == v here
        assert got[(0, 0)] == 0b0000
        assert got[(3, 0)] == 0b0101          # x bits at 0 and 2
        assert got[(0, 3)] == 0b1010          # y bits at 1 and 3
        assert got[(3, 3)] == 0b1111
        assert got[(1, 2)] == 0b1001          # x=01 -> bit0; y=10 -> bit3

    def test_rejects_bad_geometry(self, spark):
        with pytest.raises(ValueError):
            zorder_key({"x": (0, 1)}, bits=8)
        with pytest.raises(ValueError):
            zorder_key({"x": (0, 1), "y": (0, 1), "z": (0, 1)}, bits=22)


class TestZorderLayout:
    def test_both_columns_prune_linear_sort_only_one(self, spark, workdir):
        """The motivating contrast: z-ordered layout prunes on x AND y;
        a linear sort on x prunes only on x."""
        df = _grid(spark)
        zp = f"{workdir}/zordered"
        write_zordered(spark, df, zp, ["x", "y"], files=16, bits=6)

        lp = f"{workdir}/linear"
        df.repartitionByRange(16, "x").write.parquet(lp)
        from otel_arrow_spark.sources.zonemap import write_zonemap

        write_zonemap(spark, lp, ["x", "y"])

        for col in ("x", "y"):
            out, s = pruned_scan(spark, zp, col, lo=10, hi=17)
            assert s["files_read"] < s["files_total"], (col, s)
            assert out.count() == 8 * 64  # row-identical to full filter
        _, s_lx = pruned_scan(spark, lp, "x", lo=10, hi=17)
        _, s_ly = pruned_scan(spark, lp, "y", lo=10, hi=17)
        assert s_lx["files_read"] < s_lx["files_total"]
        assert s_ly["files_read"] == s_ly["files_total"]  # y can't prune

    def test_rectangle_query_compounds(self, spark, workdir):
        """A small (x, y) rectangle touches few z-ranges: the compound
        multi-predicate prune intersects per-column survivors and beats
        (or equals) either single-column prune."""
        from otel_arrow_spark.sources.zonemap import pruned_scan_multi

        df = _grid(spark)
        zp = f"{workdir}/zorder_rect"
        write_zordered(spark, df, zp, ["x", "y"], files=16, bits=6)
        out, s = pruned_scan_multi(
            spark, zp, {"x": (4, 7), "y": (4, 7)}
        )
        assert out.count() == 16  # row-identical to the AND filter
        _, sx = pruned_scan(spark, zp, "x", lo=4, hi=7)
        _, sy = pruned_scan(spark, zp, "y", lo=4, hi=7)
        assert s["files_read"] <= min(sx["files_read"], sy["files_read"])
        assert s["files_read"] < s["files_total"] // 2

    def test_constant_and_all_null_columns_tolerated(self, spark, workdir):
        df = spark.range(100).select(
            F.lit(5).cast("long").alias("x"), F.col("id").alias("y")
        )
        p = f"{workdir}/zorder_const"
        info = write_zordered(spark, df, p, ["x", "y"], files=4, bits=8)
        assert info["bounds"]["x"] == (5, 5)
        out, _ = pruned_scan(spark, p, "y", lo=0, hi=9)
        assert out.count() == 10
        # all-NULL column contributes nothing instead of crashing; NULL
        # values in a live column quantize to bucket 0 (greatest skips
        # NULL), so the other column's clustering survives
        df2 = spark.range(100).select(
            F.lit(None).cast("long").alias("x"), F.col("id").alias("y")
        )
        p2 = f"{workdir}/zorder_null"
        info2 = write_zordered(spark, df2, p2, ["x", "y"], files=4, bits=8)
        assert info2["bounds"]["x"] == (None, None)
        out, s = pruned_scan(spark, p2, "y", lo=0, hi=9)
        assert out.count() == 10 and s["files_read"] < s["files_total"]
