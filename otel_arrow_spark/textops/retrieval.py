"""Lexical retrieval scoring: corpus-scale BM25 for a literal query.

The lexical half of the retrieval pair (textops/similarity.py holds the
embedding half): score every document against a fixed bag of query
terms with BM25 (Robertson/Sparck Jones idf, k1/b length normalization)
— the classic pre-filter in front of a training-data curation or RAG
pipeline ("pull the candidate set lexically, re-rank by embedding").

Scale design — the query is a LITERAL, so no inverted index and no
join is needed at all:

* per-term term frequencies are ``size(filter(tokens, t -> t = term))``
  — one pure expression per query term over the scan, zero shuffle,
  column-pruned to the text column;
* corpus statistics (N, avgdl, per-term document frequencies) are ONE
  algebraic aggregate producing ONE row, broadcast back via a cross
  join — the standard tiny-dimension pattern, never a collect;
* the score itself is arithmetic over (tf_i, dl, the stats row):
  whole-stage-codegen expressions end to end. Two passes over the
  corpus total (stats + score), both full scans Spark pipelines
  independently; at 100 TB the second scan re-reads only the text
  column and never shuffles.

Tokenization is lowercase whitespace splitting, matching the repo's
token_stats/vocab conventions (and replayable verbatim in DuckDB).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tf_cols(text: F.Column, terms: Sequence[str]) -> list[F.Column]:
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    # '' splits to [''] — treat as the empty document
    empty = F.trim(text) == ""
    dl = F.when(empty, F.lit(0)).otherwise(F.size(toks))
    def tf(w: str) -> F.Column:
        # single-arg lambda: a second parameter would make F.filter pass
        # the element INDEX into it; terms lowercase to match the
        # lowercased token stream (an uppercase query term would
        # otherwise silently score 0 everywhere)
        return F.when(empty, F.lit(0)).otherwise(
            F.size(F.filter(toks, lambda t: t == F.lit(w.lower())))
        )

    tfs = [tf(w).alias(f"tf_{i}") for i, w in enumerate(terms)]
    return [dl.alias("dl"), *tfs]


def bm25_score(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    out_col: str = "bm25",
) -> DataFrame:
    """Score every row of ``df`` against ``query_terms``; returns
    (id_col, dl, out_col). Standard BM25:

    ``score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1-b+b·dl/avgdl))``
    with ``idf_t = ln(1 + (N-df_t+0.5)/(df_t+0.5))`` (the +1 keeps idf
    positive for terms in more than half the corpus). A term absent from
    the whole corpus contributes 0 everywhere (tf_t = 0), so its idf
    never produces NaN/∞ rows.
    """
    terms = list(query_terms)
    if not terms:
        raise ValueError("query_terms must be non-empty")
    proj = df.select(F.col(id_col), *_tf_cols(F.col(text_col), terms))
    stats = proj.agg(
        F.count(F.lit(1)).alias("N"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = proj.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        dfc = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("N") - dfc + F.lit(0.5)) / (dfc + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / norm
    return scored.select(id_col, "dl", score.alias(out_col))


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Top-k rows by BM25 score, id asc as the deterministic tiebreak —
    orderBy+limit plans as TakeOrderedAndProject (per-partition top-k,
    single merge of k-row partials, never a global sort)."""
    scored = bm25_score(df, query_terms, text_col, id_col, **kw)
    out = scored.schema[-1].name
    return scored.orderBy(F.col(out).desc(), F.col(id_col).asc()).limit(k)
