"""Conversation-level data validation: per-conversation health report
for the transcript table.

The ingest-validation counterpart of per-column profiling
(operators/profile.py): the transcript contract — turn_idx is a dense
0-based sequence, timestamps are monotone in turn order, roles
alternate rather than repeat, bodies are non-empty — is CONVERSATION-
level, invisible to any per-column statistic. One report row per
conversation makes violations addressable (which conv, which defect)
instead of a corpus-wide boolean.

Reference analog: the OTAP decoder validates record batches
structurally on receive; this is the same gate for the transcripts
payload, run as analytics instead of wire-time checks.

Scale shape: one shuffle on conv_id; the sequence checks (timestamp
regressions, role repeats) are lag-window expressions sharing a single
window (same partitioning + ordering → one Exchange + one Sort), the
rest are plain aggregates over the same pass. Skew is bounded by one
conversation's turn count — the same contract as any per-entity window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_health(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """One row per conversation: ``(conv_id, n_turns, n_dup_idx,
    n_idx_gaps, n_ts_regressions, n_role_repeats, n_empty_text,
    is_healthy)``.

    Turn order is ``(turn_idx, ts, role)`` — turn_idx is the intended
    order, the extra keys make the sequence checks deterministic when a
    defective conversation duplicates an index. Timestamp-regression
    counts are tie-order-insensitive by construction (the sorted ts
    sequence is unique even when rows tie).
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col, ts_col, role_col)
    seq = df.select(
        conv_col,
        idx_col,
        ts_col,
        role_col,
        text_col,
        (F.col(ts_col) < F.lag(ts_col).over(w)).cast("long").alias("_ts_reg"),
        (F.col(role_col) == F.lag(role_col).over(w)).cast("long").alias(
            "_role_rep"
        ),
    )
    out = seq.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        (F.count(F.lit(1)) - F.countDistinct(idx_col)).alias("n_dup_idx"),
        # dense 0-BASED contract: distinct indexes missing from
        # [0, max] — anchored at zero so a head-truncated conversation
        # (turns 3,4,5) counts its lost leading turns; dup-insensitive
        (F.max(idx_col) + 1 - F.countDistinct(idx_col)).alias("n_idx_gaps"),
        F.coalesce(F.sum("_ts_reg"), F.lit(0)).alias("n_ts_regressions"),
        F.coalesce(F.sum("_role_rep"), F.lit(0)).alias("n_role_repeats"),
        # NULL bodies are missing bodies: count them with the blank ones
        # (a bare comparison would skip NULLs, and an all-NULL conv
        # would sum to NULL instead of its turn count)
        F.coalesce(
            F.sum(
                (
                    F.col(text_col).isNull()
                    | (F.trim(F.col(text_col)) == "")
                ).cast("long")
            ),
            F.lit(0),
        ).alias("n_empty_text"),
    )
    return out.withColumn(
        "is_healthy",
        (F.col("n_dup_idx") == 0)
        & (F.col("n_idx_gaps") == 0)
        & (F.col("n_ts_regressions") == 0)
        & (F.col("n_empty_text") == 0),
    )
