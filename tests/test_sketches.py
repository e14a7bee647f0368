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


class TestCountMin:
    """Count-min frequency sketch (operators/sketches.py): one-sided
    guarantee, mergeability, exactness when wide enough, and the
    bounded-output plan contract."""

    def test_never_underestimates(self, spark):
        from otel_arrow_spark.operators.sketches import (
            countmin_lookup, countmin_sketch)

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        sk = countmin_sketch(ev, "user_id", w=16, d=3)  # heavy collisions
        est = countmin_lookup(
            sk, ev.select("user_id").distinct(), "user_id", w=16, d=3)
        exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
        rows = est.join(exact, "user_id").collect()
        assert len(rows) > 10
        assert all(r["est_count"] >= r["x"] for r in rows)

    def test_exact_when_no_collisions(self, spark):
        from otel_arrow_spark.operators.sketches import (
            countmin_lookup, countmin_sketch)

        # 5 keys into w=4096 buckets: the chance any of d=4 rows collides
        # is negligible and md5 is fixed — this data has no collisions,
        # so min-over-rows recovers exact counts
        rows = [(k,) for k in ["a", "b", "c", "d", "e"] for _ in range(ord(k) - 96)]
        df = spark.createDataFrame(rows, "k string")
        sk = countmin_sketch(df, "k", w=4096, d=4)
        est = {r["k"]: r["est_count"] for r in countmin_lookup(
            sk, df.select("k").distinct(), "k", w=4096, d=4).collect()}
        assert est == {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}

    def test_merge_is_counter_sum(self, spark):
        from otel_arrow_spark.operators.sketches import countmin_sketch

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        a = ev.where(F.col("event_id") % 2 == 0)
        b = ev.where(F.col("event_id") % 2 == 1)
        merged = (
            countmin_sketch(a, "user_id", w=32, d=3)
            .unionByName(countmin_sketch(b, "user_id", w=32, d=3))
            .groupBy("j", "bucket").agg(F.sum("c").alias("c"))
        )
        whole = countmin_sketch(ev, "user_id", w=32, d=3)
        got = sorted(tuple(r) for r in merged.collect())
        exp = sorted(tuple(r) for r in whole.collect())
        assert got == exp

    def test_output_bounded_and_no_python(self, spark):
        from otel_arrow_spark.operators.sketches import countmin_sketch

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        sk = countmin_sketch(ev, "user_id", w=8, d=2)
        assert sk.count() <= 8 * 2  # d*w cap regardless of input size
        plan = sk._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert plan.count("Exchange hashpartitioning") == 1  # partial+final

    def test_lookup_broadcasts_sketch_not_probes(self, spark):
        from otel_arrow_spark.operators.sketches import (
            countmin_lookup, countmin_sketch)

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        sk = countmin_sketch(ev, "user_id", w=32, d=3)
        plan = countmin_lookup(
            sk, ev.select("user_id").distinct(), "user_id", w=32, d=3
        )._jdf.queryExecution().executedPlan().toString()
        # the d*w-bounded sketch is the build side; the unbounded key
        # universe streams through without a join shuffle
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
