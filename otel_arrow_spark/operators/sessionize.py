"""Batch gap-based sessionization — the batch counterpart of the
streaming sessionizer (streaming/stateful.py sessionize_conversations,
reference analog: OTel span/session grouping semantics).

Classic telemetry/analytics op: rows of one key become sessions split
wherever the gap between consecutive timestamps exceeds ``gap_seconds``.
Expressed as two window functions over ONE shuffle on the key — lag to
flag session starts, a running sum to number them — both computed in the
same window stage (same partitioning + ordering → Spark reuses the sort).
Skew is bounded by a single key's row count, same contract as any
per-entity window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(col: str):
    # unix_micros rejects TIMESTAMP_NTZ (the parquet default) — cast first
    return F.unix_micros(F.col(col).cast("timestamp"))


def sessionize(
    df: DataFrame,
    by: Sequence[str],
    on: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Add a ``session_idx`` column (0-based per key, in time order):
    a new session starts at the first row of a key and whenever the gap
    since the previous row exceeds ``gap_seconds``.

    ``tiebreak`` columns extend the per-key ordering so equal timestamps
    sort deterministically — required whenever the output is compared
    across engines (two engines are free to order ties differently, so an
    oracle replay must pin the same total order on both sides).

    The gap test is native interval arithmetic (``ts - lag(ts) >
    INTERVAL``): no epoch extraction, so it is insensitive to the session
    timezone even for TIMESTAMP_NTZ inputs (an NTZ→epoch cast would shift
    with ``spark.sql.session.timeZone``; pure subtraction cancels it).
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(on, *tiebreak)
    gap = F.expr(f"INTERVAL '{int(gap_seconds)}' SECOND")
    new_session = (
        F.coalesce(
            (F.col(on) - F.lag(F.col(on)).over(w)) > gap, F.lit(True)
        )
    ).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # two projections (window-in-window is illegal in one expression), but
    # identical partitioning + ordering → one Exchange, one sort
    return (
        df.withColumn("_new_s", new_session)
        .withColumn("session_idx", F.sum("_new_s").over(run) - 1)
        .drop("_new_s")
    )


def session_summaries(
    df: DataFrame,
    by: Sequence[str],
    on: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """One row per (key, session): event count, bounds, duration.

    ``duration_us`` is the integer-microsecond duration — the value to
    compare across engines (an integer has no rounding convention, unlike
    a rounded float where Spark's shortest-decimal half-up and another
    engine's binary-double rounding can disagree at the .xxx5 boundary).
    ``duration_sec`` stays for human consumption.
    """
    by = list(by)
    return (
        sessionize(df, by, on, gap_seconds, tiebreak=tiebreak)
        .groupBy(*by, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(on).alias("session_start"),
            F.max(on).alias("session_end"),
            (F.max(_us(on)) - F.min(_us(on))).alias("duration_us"),
            ((F.max(_us(on)) - F.min(_us(on))) / F.lit(1_000_000.0)).alias(
                "duration_sec"
            ),
        )
    )
