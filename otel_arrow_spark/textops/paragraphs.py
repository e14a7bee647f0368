"""Paragraph-level exact deduplication (C4 / RefinedWeb style).

LLM training pipelines dedup *within* documents at paragraph granularity:
boilerplate paragraphs (cookie banners, license headers, navigation resin)
repeat across millions of pages, and the cleaners keep only the first
occurrence corpus-wide, then stitch each document back together from its
surviving paragraphs (C4: Raffel et al. 2020 §2.2 "three-sentence spans";
RefinedWeb: Penedo et al. 2023 §3.3 exact line dedup). The reference engine
has no such operator — this is part of the training-data surface this repo
adds on top of parity (README "LLM data ops").

Scale design (the part that must survive 100 TB):

* keep-first is ``groupBy(phash).agg(min(struct(doc_id, pos)))`` — an
  algebraic aggregate that combines map-side, so a paragraph duplicated a
  billion times ("All rights reserved.") reduces to one partial row per map
  task before the shuffle. A window ``row_number() over (partition by
  phash)`` would funnel that billion-row group through one task — rejected.
* the explode ships (doc_id, pos, phash) plus the paragraph text once; the
  keeper join is phash↔phash equi-join (co-partitioned with the aggregate's
  shuffle, AQE coalesces), never text↔text.
* reconstruction shuffles once on doc_id with ``collect_list`` of
  (pos, para) structs — bounded by the document length, not the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

PARA_SEP = "\n\n"


def split_paragraphs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    sep: str = PARA_SEP,
) -> DataFrame:
    """Explode documents into (id, pos, para, phash) rows; blank
    paragraphs (pure whitespace) carry no signal and are dropped."""
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
        )
        .where(F.trim("para") != "")
        .withColumn("phash", F.md5("para"))
    )


def paragraph_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    sep: str = PARA_SEP,
) -> DataFrame:
    """Corpus-wide keep-first paragraph dedup; returns one row per input
    document: (id, n_paras, n_kept, text_dedup).

    The keeper of each distinct paragraph is its first occurrence in
    (doc_id, pos) order — deterministic because (doc_id, pos) is unique.
    Documents whose every paragraph was seen earlier come back with
    n_kept = 0 and an empty text (the caller's drop-or-keep policy).
    """
    paras = split_paragraphs(df, id_col, text_col, sep)
    keepers = paras.groupBy("phash").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("k")
    )
    surviving = (
        paras.join(keepers, "phash")
        .where((F.col(id_col) == F.col("k.i")) & (F.col("pos") == F.col("k.p")))
    )
    kept = surviving.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text_dedup"),
    )
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paras"))
    return (
        totals.join(kept, id_col, "left")
        .select(
            id_col,
            "n_paras",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


def boilerplate_remove(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    sep: str = PARA_SEP, min_df: int = 5,
) -> DataFrame:
    """Corpus-wide boilerplate removal (CCNet: Wenzek et al. 2020 §4.1
    line-frequency filtering; RefinedWeb §3.3): drop EVERY occurrence of a
    paragraph whose document frequency reaches ``min_df`` — cookie banners,
    license headers, navigation resin that repeats across the corpus.
    Distinct policy from :func:`paragraph_dedup` (which KEEPS the first
    occurrence): boilerplate carries no training signal anywhere, so all
    copies go. Returns one row per input document:
    (id, n_paras, n_boiler, text_clean).

    Scale design: document frequency is ``groupBy(phash).countDistinct``
    — two partial-combining hash aggregates, never a window, so a
    paragraph in a billion docs reduces map-side. The boilerplate set is
    the high-DF tail of a Zipfian distribution — tiny relative to the
    corpus — so AQE turns the left_anti join into a broadcast at runtime;
    restitching shuffles once on doc id, bounded by document length.
    Documents whose text is entirely whitespace produce no paragraph rows
    and are absent from the output (same contract as paragraph_dedup).
    """
    paras = split_paragraphs(df, id_col, text_col, sep)
    boiler = (
        paras.groupBy("phash")
        .agg(F.countDistinct(id_col).alias("_df"))
        .where(F.col("_df") >= min_df)
        .select("phash")
    )
    surviving = paras.join(boiler, "phash", "left_anti")
    kept = surviving.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text_clean"),
    )
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paras"))
    return totals.join(kept, id_col, "left").select(
        id_col,
        "n_paras",
        (F.col("n_paras") - F.coalesce("n_kept", F.lit(0))).alias("n_boiler"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


# ---------------------------------------------------------------------------
# Deterministic multi-paragraph corpus (the documents testdata table is
# single-line word salad, so paragraph structure is synthesized — same
# generated-input-oracle pattern as sources/transcripts.py: the corpus is
# written to parquet once and BOTH engines read the identical bytes).

_WORDS = (
    "data spark table query scan join merge window batch stream column row "
    "filter group sort hash key value index plan stage shuffle agg cache"
).split()


def write_paragraph_corpus(
    out_dir: str, n_docs: int, seed: int = 7, n_boiler: int = 40
) -> str:
    """Write ``n_docs`` documents of 3-8 paragraphs each; ~40% of
    paragraphs are drawn from a shared boilerplate pool (cross-document
    duplicates), the rest are made unique by a per-instance marker.
    Idempotent via a marker file."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, f"_SUCCESS.{n_docs}.{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    boiler = [
        " ".join(rng.choice(_WORDS, size=int(rng.integers(8, 21))))
        for _ in range(n_boiler)
    ]
    doc_ids, texts = [], []
    for d in range(n_docs):
        n_p = int(rng.integers(3, 9))
        paras = []
        for p in range(n_p):
            if rng.random() < 0.4:
                paras.append(boiler[int(rng.integers(0, n_boiler))])
            else:
                words = " ".join(rng.choice(_WORDS, size=int(rng.integers(6, 16))))
                paras.append(f"{words} u{d}x{p}")
        doc_ids.append(f"pd{d:07d}")
        texts.append(PARA_SEP.join(paras))
    tbl = pa.table({"doc_id": pa.array(doc_ids), "text": pa.array(texts)})
    pq.write_table(tbl, os.path.join(out_dir, "part-0.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
