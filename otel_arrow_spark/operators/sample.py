"""Sampling operators: the log-sampling processor's zip and ratio samplers.

Reference: processors/log_sampling_processor/samplers/zip.rs:4-18 (emit at
most N records per time window via a selection vector) and ratio.rs:4-59
(closed-form emit-k-of-n per batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zip_sample(
    df: DataFrame,
    n_per_window: int,
    window_duration: str = "60 seconds",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Top-N rows per tumbling time window (zip.rs analog).

    Deterministic: rows ranked by (ts, order_cols) within each window.
    One shuffle on the window key — unavoidable for exact per-window caps;
    at scale prefer :func:`ratio_sample` which is shuffle-free.
    """
    w = Window.partitionBy(F.window(F.col(ts_col), window_duration)).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_window)
        .drop("_rn")
    )


def ratio_sample(df: DataFrame, emit: int, out_of: int, key_cols: tuple[str, ...]) -> DataFrame:
    """Deterministic emit-k-of-n sampling (ratio.rs analog).

    The reference computes a closed-form selection per batch; the
    distributed equivalent is a stable hash bucket test on the row key —
    shuffle-free, reproducible across runs and partitionings (unlike
    ``df.sample`` whose output depends on partition layout).
    """
    h = F.xxhash64(*[F.col(c) for c in key_cols])
    return df.filter(F.pmod(h, F.lit(out_of)) < emit)


def tail_sample(
    spans: DataFrame,
    trace_col: str = "trace_id",
    error_pred=None,
    latency_ms: int = 500,
    keep_prefix: str = "10",
    start_col: str = "start_ts",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Tail-based trace sampling: the whole-trace keep/drop decision made
    AFTER all of a trace's spans are visible (the OTel collector's
    tailsampling processor policy model, re-expressed as one window pass).

    Policies, in precedence order, each labeling ``sample_policy``:

    - ``error``   — any span of the trace matches ``error_pred``
      (default ``status_code = 2``);
    - ``latency`` — the trace's wall span (max span end − min span start)
      exceeds ``latency_ms``;
    - ``prob``    — deterministic hash fallback: the md5 of the trace id
      starts below ``keep_prefix`` (two hex chars → keep ≈ int(prefix,16)/256).
      md5-on-string is engine-portable, so an external replay (DuckDB,
      Trino) reproduces the exact keep set — unlike rand()- or
      xxhash-based sampling.

    Plan shape: every policy is an aggregate over the SAME unordered
    window on ``trace_col`` — ONE Exchange, no self-join, no collect; the
    decision column rides along with the span rows, so kept traces come
    back whole (the tail sampler's contract) without a second pass.
    Skew bound = spans of one trace, the same bound any per-trace op has.
    """
    if error_pred is None:
        error_pred = F.col("status_code") == 2
    w = Window.partitionBy(trace_col)
    end_us = F.unix_micros(F.col(start_col).cast("timestamp")) + (
        F.col(duration_col).cast("long") * 1000
    )
    start_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    # differences of unix_micros cancel the session-timezone shift an
    # NTZ→timestamp cast introduces, so latency is tz-invariant
    trace_ms = (F.max(end_us).over(w) - F.min(start_us).over(w)) / F.lit(1000.0)
    has_error = F.max(error_pred.cast("int")).over(w) == 1
    prob_keep = F.substring(F.md5(F.col(trace_col)), 1, 2) < F.lit(keep_prefix)
    policy = (
        F.when(has_error, F.lit("error"))
        .when(trace_ms > latency_ms, F.lit("latency"))
        .when(prob_keep, F.lit("prob"))
    )
    return spans.withColumn("sample_policy", policy).filter(
        F.col("sample_policy").isNotNull()
    )


def throttle(
    df: DataFrame,
    keys: tuple[str, ...],
    max_per_window: int,
    window_duration: str = "60 seconds",
    ts_col: str = "ts",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Per-key rate limiting: at most ``max_per_window`` rows per (key,
    tumbling window), keeping the EARLIEST rows — a per-tenant quota, the
    keyed generalization of :func:`zip_sample` (zip.rs caps per window
    only; real log pipelines cap per tenant/source so one hot emitter
    cannot crowd out the rest).

    Deterministic: ordering is (ts, tiebreak) — pass a unique tiebreak
    column whenever the output is compared across engines. One shuffle on
    (keys, window); skew is bounded per (key, window), which is exactly
    the quantity being capped.
    """
    w = Window.partitionBy(
        *[F.col(k) for k in keys], F.window(F.col(ts_col), window_duration)
    ).orderBy(F.col(ts_col), *[F.col(c) for c in tiebreak])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_window)
        .drop("_rn")
    )
