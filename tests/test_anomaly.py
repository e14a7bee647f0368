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
