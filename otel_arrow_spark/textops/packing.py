"""Sequence packing: assign documents to fixed-token-budget training
bins (the batching step between a cleaned corpus and a trainer).

Contiguous greedy packing — documents are concatenated in a deterministic
order within each pack group and chunked into ``seq_len``-token bins; each
document gets the bin it STARTS in plus its offset, which is all a
downstream tokenize-and-concat writer needs. This is the streaming
concat-then-chunk packing used by large LM data pipelines (e.g. GPT-style
pretraining batching), not bin-packing-optimal — optimal packing is
NP-hard and order-dependent, while contiguous fill wastes at most one
partial bin per group and stays embarrassingly parallel.

Scale design: ONE window (running sum of token counts) per pack group —
one shuffle on the group key, linear scan per group. A single global
order would funnel the whole corpus through one task; callers pick group
keys that bound group size (source × language here; at 100 TB add a
hash-shard component to the key — any deterministic column works, the
packing stays valid because bins never span groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    tokens_col: str,
    seq_len: int = 2048,
) -> DataFrame:
    """Add ``bin_idx`` / ``bin_offset``: the bin the document starts in
    and its token offset there, under contiguous greedy packing of
    ``tokens_col`` in ``order_col`` order within each group."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumns(
        {
            "bin_idx": F.floor(prev / F.lit(seq_len)),
            "bin_offset": prev % F.lit(seq_len),
        }
    )


def packing_summary(
    packed: DataFrame, group_cols: list[str], tokens_col: str, seq_len: int = 2048
) -> DataFrame:
    """Per-group packing stats: docs, tokens, bins used, and fill ratio =
    fraction of the total allocated bin budget (ALL bins, including the
    final partial one) covered by tokens — 1.0 only when tokens exactly
    fill every bin."""
    return packed.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).alias("n_tokens"),
        (F.ceil(F.sum(tokens_col) / F.lit(seq_len))).alias("n_bins"),
        F.round(
            F.sum(tokens_col) / (F.ceil(F.sum(tokens_col) / F.lit(seq_len)) * seq_len),
            6,
        ).alias("fill_ratio"),
    )
