"""KLL quantile + theta set-operation sketch tests
(operators/sketches.py)."""

from pyspark.sql import functions as F

from otel_arrow_spark.operators.sketches import (
    merge_quantile_sketches,
    quantile_sketches,
    retention_estimates,
    theta_sketches,
)


def _valued(spark, n=6000):
    """Values 0..n-1 scattered over 3 days — exact percentiles known in
    closed form."""
    return spark.range(n).select(
        (F.col("id") % 3).alias("day"),
        # bijective scramble keeps per-day value sets interleaved
        ((F.col("id") * 2654435761) % n).alias("v"),
    )


class TestKllQuantiles:
    def test_merged_quantiles_within_rank_error(self, spark, workdir):
        df = _valued(spark)
        p = f"{workdir}/kll"
        quantile_sketches(df, "v", by=("day",)).write.parquet(p)
        got = merge_quantile_sketches(spark.read.parquet(p)).collect()[0]
        assert got.n_rows == 6000
        n = 6000
        for q, est in ((0.5, got.q_0_5), (0.95, got.q_0_95),
                       (0.99, got.q_0_99)):
            # guard on RANK (the KLL guarantee): the exact rank of the
            # estimated value must sit within eps of q
            rank = df.where(F.col("v") <= est).count() / n
            assert abs(rank - q) < 0.03, (q, est, rank)

    def test_merge_across_groups_equals_regrouping(self, spark):
        """Merging (day, shard) sketches up to day answers like day-level
        sketches — within rank error on each day."""
        df = _valued(spark).withColumn("shard", F.col("v") % 4)
        fine = quantile_sketches(df, "v", by=("day", "shard"))
        per_day = {r.day: r.q_0_5 for r in
                   merge_quantile_sketches(fine, (0.5,), by=("day",)).collect()}
        for d, est in per_day.items():
            sub = df.where(F.col("day") == d)
            rank = sub.where(F.col("v") <= est).count() / sub.count()
            assert abs(rank - 0.5) < 0.03, (d, est, rank)

    def test_plan_single_aggregate(self, spark):
        df = _valued(spark)
        plan = quantile_sketches(df, "v", by=("day",))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") == 1 and "EvalPython" not in plan


class TestThetaSetOps:
    def test_retention_matches_exact_at_this_scale(self, spark, workdir):
        """3 days with engineered overlap; at a few hundred distinct
        values theta sketches are in exact mode, so the estimates equal
        the true set sizes."""
        rows = []
        for d, lo, hi in ((0, 0, 300), (1, 100, 400), (2, 350, 500)):
            rows += [(d, u) for u in range(lo, hi)]
        df = spark.createDataFrame(rows, "day int, user long")
        p = f"{workdir}/theta"
        theta_sketches(df, "user", by=("day",)).write.parquet(p)
        got = {r.day: (r.est_users, r.est_retained, r.est_new)
               for r in retention_estimates(
                   spark.read.parquet(p), "day").collect()}
        # day1: 300 users, ∩ day0 = [100,300) = 200, new = 100
        assert got[1] == (300, 200, 100)
        # day2: 150 users, ∩ day1 = [350,400) = 50, new = 100
        assert got[2] == (150, 50, 100)

    def test_union_and_estimate_track_exact_when_large(self, spark):
        df = spark.range(20000).select(
            (F.col("id") % 2).alias("day"),
            ((F.col("id") * 7919) % 9000).alias("user"),
        )
        sk = theta_sketches(df, "user", by=("day",))
        merged = sk.agg(
            F.theta_sketch_estimate(
                F.theta_union_agg(F.col("tsketch"))
            ).alias("est")
        ).collect()[0].est
        exact = df.select("user").distinct().count()
        assert abs(merged - exact) / exact < 0.05, (merged, exact)
