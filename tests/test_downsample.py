"""M4 downsampling tests (operators/downsample.py — Jugel et al. VLDB'14)."""

import datetime

from otel_arrow_spark.operators.downsample import m4_downsample


def ts(sec):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=sec)


class TestM4Downsample:
    def _df(self, spark):
        rows = [("m", ts(0), 5.0), ("m", ts(10), 1.0), ("m", ts(20), 9.0),
                ("m", ts(30), 1.0),  # ties min: earliest (t=10) must win
                ("m", ts(40), 9.0),  # ties max: earliest (t=20) must win
                ("m", ts(50), 4.0),
                ("m", ts(70), 2.0)]  # second bucket
        return spark.createDataFrame(
            rows, "metric_name string, ts timestamp, double_value double"
        )

    def test_four_anchors_and_tie_rules(self, spark):
        out = {str(r.window_start): r for r in
               m4_downsample(self._df(spark), "60 seconds").collect()}
        b = out["2026-01-01 00:00:00"]
        assert (str(b.first_ts), b.first_v) == ("2026-01-01 00:00:00", 5.0)
        assert (str(b.last_ts), b.last_v) == ("2026-01-01 00:00:50", 4.0)
        assert (str(b.min_ts), b.min_v) == ("2026-01-01 00:00:10", 1.0)
        assert (str(b.max_ts), b.max_v) == ("2026-01-01 00:00:20", 9.0)

    def test_singleton_bucket_collapses_to_one_point(self, spark):
        out = {str(r.window_start): r for r in
               m4_downsample(self._df(spark), "60 seconds").collect()}
        b2 = out["2026-01-01 00:01:00"]
        assert b2.first_v == b2.last_v == b2.min_v == b2.max_v == 2.0
        assert str(b2.first_ts) == str(b2.max_ts) == "2026-01-01 00:01:10"

    def test_series_independent(self, spark):
        df = self._df(spark).union(
            self._df(spark).selectExpr(
                "'n' as metric_name", "ts", "double_value * 100 as double_value"
            )
        )
        out = m4_downsample(df, "60 seconds").collect()
        got = {(r.metric_name, str(r.window_start)): r.max_v for r in out}
        assert got[("m", "2026-01-01 00:00:00")] == 9.0
        assert got[("n", "2026-01-01 00:00:00")] == 900.0

    def test_plan_partial_final_no_python(self, spark):
        plan = m4_downsample(self._df(spark), "60 seconds")._jdf \
            .queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        # algebraic aggregate: map-side partial before the single Exchange
        assert plan.count("Exchange") == 1
        assert "partial_min" in plan or "partial_max" in plan or \
            plan.lower().count("hashaggregate") >= 2
