"""Sliding-window document chunking: split long documents into
fixed-token-window chunks with overlap — the segmentation step feeding
embedding models and context-bounded trainers (RAG indexing, long-doc
pretraining), sitting between cleaning (scrub/dedup) and packing.

Semantics: tokens are the whitespace split (the ``n_tokens_ws``
convention of textops/analysis.py); chunk ``i`` covers tokens
``[i*stride, i*stride + window)`` where ``stride = window - overlap``;
the last chunk may be short but every token belongs to ≥1 chunk and
consecutive chunks share exactly ``overlap`` tokens. A document shorter
than one window yields exactly one chunk (itself).

Scale shape — pure JVM expressions, zero Python:
* tokenization is ONE ``split`` per document, projected BELOW the
  Generate node — the exploded chunk rows reference the materialized
  array, not the split expression, so the regex runs once per document,
  not once per chunk (the CollapseProject re-inline trap measured on the
  parse path does not apply across Generate);
* the explode factor is ``ceil(max(n-overlap,1)/stride)`` — bounded by
  document length over stride, and each output row carries only its own
  chunk text (``slice`` + ``array_join``), so shuffle-free and linear in
  output size. No window functions, no shuffle at all.

Reference analog: none (the reference has no text segmentation) — this
is the training-data surface (SURVEY §2.13); semantics follow the
standard overlapping-window chunkers (e.g. LangChain token splitters),
and the DuckDB oracle replays them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    window: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Output: ``id_col``, ``chunk_idx``, ``chunk_text``, ``n_chunk_tokens``
    (the original columns are dropped — chunking changes the grain; join
    back on ``id_col`` for metadata).
    """
    if not 0 <= overlap < window:
        raise ValueError(f"need 0 <= overlap < window, got {overlap}/{window}")
    stride = window - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    # number of windows covering n tokens at this stride (≥1)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    base = df.select(
        F.col(id_col), toks.alias("_toks"), n.alias("_n"), n_chunks.alias("_nc")
    )
    chunks = base.select(
        id_col,
        "_toks",
        "_n",
        F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride  # 0-based; slice() is 1-based
    length = F.least(F.lit(window), F.col("_n") - start)
    return chunks.select(
        id_col,
        "chunk_idx",
        F.array_join(F.slice("_toks", start + 1, length), " ").alias("chunk_text"),
        length.cast("int").alias("n_chunk_tokens"),
    )
