"""Span-metrics connector: RED metrics (Rate, Errors, Duration) derived
from the spans table — the spanmetrics-connector pattern from the OTel
collector ecosystem, recast over the traces star schema this repo
generates (sources/spans.py).

Per (service dimension, span name, 15-min window): call count, error
count/ratio, and a full latency HISTOGRAM (not just avg — the downstream
p99 question needs buckets). Built entirely from existing operators:
``points_to_histogram`` one-hots each span's duration into OTel-rule
buckets at the scan, then ``histogram_delta_merge`` folds them per group
— so the span→metric derivation IS a delta histogram stream and composes
with everything that consumes one (temporal reagg, histogram_quantile,
the streaming jobs).

Scale shape: one narrow projection (one-hot arrays) + ONE shuffle (the
delta merge's groupBy) + a broadcast of the scope/resource dimension.
Zero Python; every aggregate partial+final (a hot span name collapses
map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_arrow_spark.operators.metrics import (
    histogram_delta_merge,
    points_to_histogram,
)

DEFAULT_LATENCY_BOUNDS = [2.0, 8.0, 32.0, 128.0, 512.0]  # ms


def span_red_metrics(
    spans: DataFrame,
    dim: DataFrame | None = None,
    dim_key: str = "resource_id",
    period: str = "15 minutes",
    bounds: list[float] | None = None,
) -> DataFrame:
    """spans (id, name, status_code, start_ts, duration_ms[, dim_key]) →
    RED rows per (dim columns..., span name, window): n_calls, n_errors,
    error_ratio, duration histogram (h_*, bounds, bucket_counts).

    ``dim`` (optional, broadcast): a small dimension keyed by ``dim_key``
    (e.g. the service pivot of resource_attrs) whose remaining columns
    become group keys — the dictionary-enrich pattern.
    """
    bounds = bounds or DEFAULT_LATENCY_BOUNDS
    df = spans
    extra_keys: tuple[str, ...] = ()
    if dim is not None:
        extra_keys = tuple(c for c in dim.columns if c != dim_key)
        df = df.join(F.broadcast(dim), dim_key)
    pts = points_to_histogram(
        df.select(
            *extra_keys,
            "name",
            F.col("start_ts").alias("ts"),
            "status_code",
            "duration_ms",
        ),
        "duration_ms",
        bounds,
    ).withColumn("_is_err", (F.col("status_code") == 2).cast("long"))
    # error counts ride the merge's own groupBy (extra_aggs) — ONE
    # aggregate total, no second aggregation joined back; this is also
    # what keeps the operator streaming-safe (stream aggregate-join is
    # unsupported in append mode)
    merged = histogram_delta_merge(
        pts, period, keys=(*extra_keys, "name"),
        extra_aggs={"n_errors": F.sum("_is_err")},
    )
    return merged.select(
        *extra_keys,
        "name",
        "window_start",
        F.col("h_count").alias("n_calls"),
        "n_errors",
        F.round(F.col("n_errors") / F.col("h_count"), 6).alias("error_ratio"),
        F.round("h_sum", 6).alias("total_ms"),
        "h_min",
        "h_max",
        "bounds",
        "bucket_counts",
    )


def stream_span_red_metrics(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    dim: DataFrame | None = None,
    period: str = "15 minutes",
    watermark: str = "10 minutes",
    available_now: bool = True,
):
    """Streaming RED derivation: the SAME span_red_metrics plan over a
    watermarked span file-stream (single aggregate — the extra_aggs fold
    is what makes this legal in append mode), windows emitted once closed
    by the watermark, exactly-once parquet sink. The connector pattern
    run the way a collector actually runs it: continuously."""
    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withColumn("start_ts", F.col("start_ts").cast("timestamp"))
        .withWatermark("start_ts", watermark)
    )
    red = span_red_metrics(stream, dim=dim, period=period)
    writer = (
        red.writeStream.format("parquet")
        .option("path", f"{output_dir}/red")
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
