"""M4 time-series downsampling for dashboard rendering.

M4 (Jugel et al., "M4: A Visualization-Oriented Time Series Data
Aggregation", VLDB 2014 — public method) reduces each series to at most
4 points per pixel-column bucket: the first, last, minimum and maximum
points. Those four are exactly the points a line-chart rasterization can
distinguish, so the downsampled series renders pixel-identically to the
full one at the target width.

This is the read-side consumer the reference's temporal reaggregation
feeds (temporal_reaggregation_processor — per-window state the dashboard
then draws); M4 is the step between the reaggregated table and the
chart.

Spark realization: ONE hash aggregate per (series, bucket) —
``min_by``/``max_by`` over struct orderings, partial+final, no window
funnel, no Python. Scale: state is O(4 × buckets × series) regardless of
input rows, the aggregation is algebraic (map-side combine collapses
each partition to ≤4 candidates per group before the shuffle), and the
group key includes the bucket so hot series spread across time.

Determinism: ties on value are broken by (value, ts) struct ordering and
ties on time cannot occur within a series (ts is the series' event
time); every selected point is therefore engine-unique and the result
hash-comparable against a row_number-based SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    period: str = "15 minutes",
    keys: tuple[str, ...] = ("metric_name",),
    ts_col: str = "ts",
    value_col: str = "double_value",
) -> DataFrame:
    """Reduce each (keys) series to ≤4 points per ``period`` bucket.

    Emits one row per (keys, bucket) carrying the four M4 anchors —
    (first_ts, first_v), (last_ts, last_v), (min_ts, min_v),
    (max_ts, max_v) — where min/max select the EARLIEST point achieving
    the extreme value (deterministic (value, ts) struct order).
    """
    t = F.col(ts_col)
    v = F.col(value_col)
    win = F.window(t, period)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(
            F.min(t).alias("first_ts"),
            F.min_by(v, t).alias("first_v"),
            F.max(t).alias("last_ts"),
            F.max_by(v, t).alias("last_v"),
            F.min_by(t, F.struct(v.alias("v"), t.alias("t"))).alias("min_ts"),
            F.min(v).alias("min_v"),
            F.max_by(t, F.struct(v.alias("v"), (-F.unix_micros(
                t.cast("timestamp"))).alias("t"))).alias("max_ts"),
            F.max(v).alias("max_v"),
        )
        .select(F.col("w.start").alias("window_start"), *keys,
                "first_ts", "first_v", "last_ts", "last_v",
                "min_ts", "min_v", "max_ts", "max_v")
    )
