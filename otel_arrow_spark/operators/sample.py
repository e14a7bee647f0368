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
