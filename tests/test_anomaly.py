"""Rolling z-score anomaly detection (operators/anomaly.py)."""

import datetime as dt

from pyspark.sql import functions as F

from otel_arrow_spark.operators.anomaly import rolling_zscore_anomalies

T0 = dt.datetime(2026, 1, 1)


def _series(values, key="cpu"):
    return [
        (key, T0 + dt.timedelta(seconds=i), i, float(v))
        for i, v in enumerate(values)
    ]


class TestRollingZscore:
    def test_spike_flagged_baseline_quiet(self, spark):
        # 30 quiet points around 100 then one 10x spike
        vals = [100 + (i % 5) for i in range(30)] + [1000.0]
        df = spark.createDataFrame(
            _series(vals), "k string, ts timestamp, event_id long, v double"
        )
        out = rolling_zscore_anomalies(
            df, key_cols=("k",), ts_col="ts", value_col="v",
            lookback=20, min_points=10, z_thresh=3.0, tiebreak=("event_id",),
        ).collect()
        assert [r.event_id for r in out] == [30]
        assert out[0].z > 100  # ~636 sigma on this baseline

    def test_spike_does_not_mask_itself(self, spark):
        # two consecutive spikes: the second's baseline includes the
        # first, but with a trailing-only frame BOTH must be flagged
        vals = [100.0] * 25 + [1000.0, 1000.0]
        # constant baseline has zero variance -> never flagged; add jitter
        vals = [v + (i % 3) for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            _series(vals), "k string, ts timestamp, event_id long, v double"
        )
        out = rolling_zscore_anomalies(
            df, key_cols=("k",), ts_col="ts", value_col="v",
            lookback=20, min_points=10, z_thresh=3.0, tiebreak=("event_id",),
        ).collect()
        assert {r.event_id for r in out} == {25, 26}

    def test_zero_variance_and_min_points_guards(self, spark):
        # constant series: variance 0 -> nothing flagged, no div-by-zero;
        # short series: fewer than min_points -> nothing flagged
        const = _series([5.0] * 40, key="flat")
        short = _series([1, 2, 100], key="short")
        df = spark.createDataFrame(
            const + short, "k string, ts timestamp, event_id long, v double"
        )
        out = rolling_zscore_anomalies(
            df, key_cols=("k",), ts_col="ts", value_col="v",
            lookback=20, min_points=10, z_thresh=3.0, tiebreak=("event_id",),
        )
        assert out.count() == 0

    def test_single_window_stage_plan(self, spark):
        ev = spark.createDataFrame(
            _series(range(100)), "k string, ts timestamp, event_id long, v double"
        )
        plan = (
            rolling_zscore_anomalies(
                ev, key_cols=("k",), ts_col="ts", value_col="v",
                tiebreak=("event_id",),
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Window") == 1, "one window stage, all stats share it"
        assert plan.count("Exchange") == 1, "one shuffle on the series key"
        assert "EvalPython" not in plan

    def test_multi_key_series_isolated(self, spark):
        # a spike in one series must not contaminate another's baseline
        a = _series([100 + (i % 5) for i in range(30)] + [1000.0], key="a")
        b = _series([100 + (i % 5) for i in range(31)], key="b")
        df = spark.createDataFrame(
            a + b, "k string, ts timestamp, event_id long, v double"
        )
        out = rolling_zscore_anomalies(
            df, key_cols=("k",), ts_col="ts", value_col="v",
            lookback=20, min_points=10, z_thresh=3.0, tiebreak=("event_id",),
        ).collect()
        assert [(r.k, r.event_id) for r in out] == [("a", 30)]


class TestEwmaSmooth:
    """EWMA smoothing (anomaly.py ewma_smooth): hand-computed values,
    pandas parity, truncation bound, and the one-window plan pin."""

    def test_hand_computed_alpha_half(self, spark):
        from otel_arrow_spark.operators.anomaly import ewma_smooth

        df = spark.createDataFrame(
            [("k", i, float(v)) for i, v in enumerate([4, 8, 2])],
            "k string, secs long, value double",
        ).withColumn("ts", F.timestamp_seconds(F.col("secs")))
        got = {r["secs"]: r["ewma"] for r in
               ewma_smooth(df, ("k",), alpha=0.5).collect()}
        # adjust=True: s0=4; s1=(8+.5*4)/1.5; s2=(2+.5*8+.25*4)/1.75
        assert got[0] == 4.0
        assert abs(got[1] - 10 / 1.5) < 1e-12
        assert abs(got[2] - 7 / 1.75) < 1e-12

    def test_matches_pandas_ewm(self, spark):
        import pandas as pd

        from otel_arrow_spark.operators.anomaly import ewma_smooth

        vals = [float((7 * i) % 23) for i in range(40)]
        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)],
            "k string, secs long, value double",
        ).withColumn("ts", F.timestamp_seconds(F.col("secs")))
        got = [r["ewma"] for r in ewma_smooth(
            df, ("k",), alpha=0.3, lookback=64).orderBy("secs").collect()]
        exp = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean().tolist()
        assert all(abs(a - b) < 1e-9 for a, b in zip(got, exp))

    def test_truncation_negligible_at_defaults(self, spark):
        import pandas as pd

        from otel_arrow_spark.operators.anomaly import ewma_smooth

        # 200 points >> lookback=64: the dropped tail is q^64 ≈ 5e-20
        vals = [float((13 * i) % 101) for i in range(200)]
        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)],
            "k string, secs long, value double",
        ).withColumn("ts", F.timestamp_seconds(F.col("secs")))
        got = [r["ewma"] for r in ewma_smooth(
            df, ("k",), alpha=0.5, lookback=64).orderBy("secs").collect()]
        exp = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean().tolist()
        assert all(abs(a - b) < 1e-9 for a, b in zip(got, exp))

    def test_one_window_no_join_no_python(self, spark):
        from otel_arrow_spark.operators.anomaly import ewma_smooth

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        plan = ewma_smooth(
            ev, ("event_type",), tiebreak=("event_id",)
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan
        assert "EvalPython" not in plan

    def test_rejects_bad_params(self, spark):
        import pytest as _pytest

        from otel_arrow_spark.operators.anomaly import ewma_smooth

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        with _pytest.raises(ValueError):
            ewma_smooth(ev, ("event_type",), alpha=0.0)
        with _pytest.raises(ValueError):
            ewma_smooth(ev, ("event_type",), lookback=0)
