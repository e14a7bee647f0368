"""SLO burn-rate analytics: multi-window error-budget burn over an event
stream — the alerting math a telemetry pipeline's aggregate sinks feed
(reference analog: the per-sink severity/error aggregates the dataflow
engine publishes for exactly this downstream use; the burn-rate form is
the public multiwindow/multi-burn-rate method from the Google SRE
workbook, ch. 5).

``burn = error_ratio / (1 - slo)``: burn 1.0 consumes the error budget
exactly at the sustainable rate; a fast-burn alert requires BOTH a short
window (reacts quickly) and a long window (filters blips) above the
threshold.

Plan shape: one partial+final aggregate over the raw events to the short
buckets, then the long window re-aggregates the SHORT BUCKET COUNTS via
an unordered window on the long bucket — the second pass touches rows
``(span of data) / short_window`` in number, orders of magnitude smaller
than the input, so the raw table is scanned exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def burn_rate(
    events: DataFrame,
    error_pred,
    slo: float = 0.75,
    short: str = "hour",
    long: str = "day",
    threshold: float = 2.0,
    ts_col: str = "ts",
) -> DataFrame:
    """One row per short bucket: counts, short/long burn, alert flag.

    ``short``/``long`` are calendar truncation units (``hour`` into
    ``day`` by default) — short buckets tile long ones exactly, so the
    long ratio is an exact re-sum of short-bucket counts. Burn values are
    single IEEE divisions of exact integer counts — bit-identical in any
    engine, so replay needs no rounding convention.
    """
    budget = 1.0 - slo
    bucketed = events.groupBy(
        F.date_trunc(short, F.col(ts_col)).alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(error_pred.cast("long")).alias("n_errors"),
    )
    wl = Window.partitionBy(F.date_trunc(long, F.col("bucket_start")))
    long_events = F.sum("n_events").over(wl)
    long_errors = F.sum("n_errors").over(wl)
    short_burn = F.col("n_errors") / F.col("n_events") / F.lit(budget)
    long_burn = long_errors / long_events / F.lit(budget)
    return bucketed.select(
        "bucket_start",
        "n_events",
        "n_errors",
        short_burn.alias("short_burn"),
        long_burn.alias("long_burn"),
        ((short_burn > threshold) & (long_burn > F.lit(1.0))).alias("alert"),
    )
