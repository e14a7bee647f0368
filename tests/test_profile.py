"""Table profiling + mergeable distinct-count sketches
(operators/profile.py)."""

from pyspark.sql import functions as F

from otel_arrow_spark.operators.profile import (
    distinct_sketches,
    merge_distinct_sketches,
    profile_table,
)


def _days(spark, n=3000):
    """n rows across 3 'days' with overlapping user populations."""
    return spark.range(n).select(
        (F.col("id") % 3).alias("day"),
        # day d sees users in [100*d, 100*d + 500): heavy overlap
        ((F.col("id") * 37) % 500 + (F.col("id") % 3) * 100).alias("user_id"),
    )


class TestProfileTable:
    def test_one_row_per_column_exact(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (2, "b")], "k long, s string"
        )
        got = {r.column: r for r in profile_table(df).collect()}
        assert got["k"].n_rows == 3 and got["k"].n_nulls == 0
        assert got["k"].n_distinct == 2
        assert got["s"].n_nulls == 1 and got["s"].n_distinct == 2
        assert got["s"].min_str == "a" and got["s"].max_str == "b"


class TestDistinctSketches:
    def test_union_of_parts_tracks_whole(self, spark):
        """Merging per-day sketches answers like one sketch over all
        days (to the HLL error bound — sparse-mode promotion forbids a
        bitwise promise, see docstring)."""
        df = _days(spark)
        per_day = distinct_sketches(df, "user_id", by=("day",))
        merged = merge_distinct_sketches(per_day).collect()[0]
        whole = distinct_sketches(df, "user_id").collect()[0]
        assert abs(merged.estimate - whole.estimate) <= 0.03 * whole.estimate
        assert merged.n_rows == 3000

    def test_estimates_within_hll_error(self, spark):
        df = _days(spark)
        exact = df.select("user_id").distinct().count()
        est = merge_distinct_sketches(
            distinct_sketches(df, "user_id", by=("day",))
        ).collect()[0].estimate
        assert abs(est - exact) / exact < 0.05, (est, exact)

    def test_persisted_round_trip_and_incremental_append(self, spark, workdir):
        """The cross-batch loop: write day sketches as they arrive,
        answer the all-time distinct question from the sketch store."""
        p = f"{workdir}/sketches"
        df = _days(spark)
        for d in (0, 1):
            distinct_sketches(
                df.where(F.col("day") == d), "user_id", by=("day",)
            ).write.mode("append").parquet(p)
        two = merge_distinct_sketches(spark.read.parquet(p)).collect()[0]
        distinct_sketches(
            df.where(F.col("day") == 2), "user_id", by=("day",)
        ).write.mode("append").parquet(p)
        three = merge_distinct_sketches(spark.read.parquet(p)).collect()[0]
        whole = distinct_sketches(df, "user_id").collect()[0]
        assert abs(three.estimate - whole.estimate) <= 0.03 * whole.estimate
        assert three.n_rows == 3000 and two.n_rows == 2000
        # duplicate-insert idempotence on the registers: re-merging a
        # day already covered cannot raise the estimate
        dup = merge_distinct_sketches(
            spark.read.parquet(p).unionByName(
                spark.read.parquet(p).where(F.col("day") == 0)
            )
        ).collect()[0]
        assert dup.estimate == three.estimate

    def test_groupwise_rollup(self, spark):
        """by on both sides: sketch at (day, shard), roll up to day.
        Sparse-mode promotion differs between a 4-way union and one
        direct sketch (see docstring), so equality holds to the error
        bound, not bitwise."""
        df = _days(spark).withColumn("shard", F.col("user_id") % 4)
        fine = distinct_sketches(df, "user_id", by=("day", "shard"))
        per_day = {
            r.day: r.estimate
            for r in merge_distinct_sketches(fine, by=("day",)).collect()
        }
        direct = {
            r.day: r.estimate
            for r in distinct_sketches(df, "user_id", by=("day",)).collect()
        }
        exact = {
            r.day: r.n
            for r in df.groupBy("day")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert per_day.keys() == direct.keys() == exact.keys()
        for d in exact:
            assert abs(per_day[d] - exact[d]) / exact[d] < 0.05
            assert abs(direct[d] - exact[d]) / exact[d] < 0.05
