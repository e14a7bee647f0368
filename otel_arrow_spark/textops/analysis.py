"""Text analysis: language ID, quality scoring, token counting, document
fingerprinting — all pure Spark expressions (whole-stage codegen, no UDF).

These mirror the shape of the reference's per-record enrichment processors
(attributes_processor computed fields) applied to a documents table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Frequent-word lists per language for the n-gram/stopword heuristic.
# Deliberately tiny: the operator's job is the plumbing (scoring columns,
# argmax) — swap in real frequency tables for production.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour"],
}


def _tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: per-language stopword-hit ratio → argmax.

    score(lang) = |tokens ∩ markers(lang)| / |tokens|; prediction is the
    max-scoring language, NULL when no marker hits at all (unknown).
    One pass, array intrinsics only.
    """
    toks = _tokens(F.col(text_col))
    scores = [
        (
            lang,
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
            / F.greatest(F.size(toks), F.lit(1)),
        )
        for lang, words in _LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit(None).cast("string")
    for lang, s in reversed(scores):
        pred = F.when(s == best, F.lit(lang)).otherwise(pred)
    out = df.withColumn(out_col, F.when(best > 0, pred))
    return out


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish subword estimate.

    ``n_tokens_ws``  — whitespace split count;
    ``n_tokens_bpe`` — count of word/number/punctuation chunks by the
    common GPT-style pre-tokenizer regex (contractions, letter runs,
    digit runs, punctuation runs) — a deterministic stand-in for a real
    BPE vocab, computed with regexp_count (JVM).
    """
    t = F.col(text_col)
    bpe_re = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    return df.withColumns(
        {
            "n_chars_obs": F.length(t),
            "n_tokens_ws": F.when(
                F.length(F.trim(t)) == 0, F.lit(0)
            ).otherwise(F.size(F.split(F.trim(t), r"\s+"))),
            "n_tokens_bpe": F.regexp_count(t, F.lit(bpe_re)),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality features + composite score ∈ [0,1].

    Features: length band, alpha ratio, punctuation ratio, stopword ratio,
    mean word length band — the standard pretraining-filter signals,
    each a pure expression.
    """
    t = F.col(text_col)
    n = F.greatest(F.length(t), F.lit(1))
    toks = _tokens(t)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    alpha_ratio = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / n
    punct_ratio = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()-]", "")) / n
    stop = F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]])
    stop_hits = F.size(F.filter(toks, lambda w: F.array_contains(stop, w)))
    stop_ratio = stop_hits / n_toks
    mean_word_len = (F.length(F.regexp_replace(t, r"\s+", ""))) / n_toks
    len_ok = (F.length(t) >= 20) & (F.length(t) <= 20000)
    word_len_ok = (mean_word_len >= 2.0) & (mean_word_len <= 12.0)
    score = (
        len_ok.cast("double") * 0.25
        + word_len_ok.cast("double") * 0.25
        + F.least(alpha_ratio * 1.25, F.lit(1.0)) * 0.25
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.15
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.10
    )
    return df.withColumns(
        {
            "alpha_ratio": alpha_ratio,
            "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio,
            "mean_word_len": mean_word_len,
            "quality": score,
        }
    )


def document_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint"
) -> DataFrame:
    """Canonical-form fingerprint: lowercase, strip non-alphanumerics,
    collapse whitespace, md5. Two documents differing only in case/
    punctuation/spacing share a fingerprint (the cheap canonicalization
    used before exact dedup)."""
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )
    return df.withColumn(out_col, F.md5(canon))


def stratified_sample(
    df: DataFrame,
    strata_cols: tuple[str, ...],
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling for dataset mixing: keep at most
    ``n_per_stratum`` documents per stratum, selected by a seeded hash
    order (md5 of the id — reproducible across engines and runs, unlike
    ``rand()``), so recipe weights like "equal parts per language ×
    quality bucket" are one call.

    One window function per stratum partition — shuffles (id, strata)
    only; the surviving ids semi-join the full rows back so document
    bodies never enter the shuffle.
    """
    from pyspark.sql import Window

    order_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        order_key, F.col(id_col)
    )
    ids = (
        df.select(id_col, *strata_cols)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .select(id_col)
    )
    return df.join(ids, id_col, "left_semi")


def temperature_mixing_sample(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    total_docs: int = 1000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted dataset mixing (the multinomial up/down-
    sampling of T5/XLM-R/LLaMA-style pretraining mixes): source ``s``
    gets a quota ∝ ``n_s^alpha`` — ``alpha=1`` is proportional (natural)
    mixing, ``alpha=0`` equal parts, in between up-weights small sources
    without letting the largest source drown the mix. Within each source
    the quota is filled in deterministic md5-of-id order (reproducible
    across engines, the ``stratified_sample`` recipe).

    Quota arithmetic: ``floor(round(total_docs * n_s^alpha / Σ n_t^alpha,
    6))``, capped at ``n_s`` — the round-before-floor makes the floor
    boundary identical in any engine replaying the formula (raw doubles
    agree to ~1e-12; 6 dp absorbs summation-order noise), so the DuckDB
    oracle recomputes quotas bit-identically; the floor means the
    realized total can undershoot by at most one doc per source.

    Scale shape: ONE tiny aggregate for the per-source counts (collected —
    the source dimension is small by construction), quotas computed
    driver-side into a broadcast literal map, then the stratified window
    over (id, source) pairs; bodies semi-join back.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    from pyspark.sql import Window

    # NULL sources are a real corpus condition but an illegal map key for
    # the F.create_map quota lookup — coalesce to a sentinel consistently
    # on BOTH the counts and the lookup so a missing source is just one
    # more stratum (an actual "\x00<null>" source value would share it;
    # that collision is accepted and documented here).
    src = F.coalesce(F.col(source_col), F.lit("\x00<null>"))
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(src.alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    denom = sum(sorted(n ** alpha for n in counts.values()))
    quotas = {
        s: min(int(round(total_docs * (n ** alpha) / denom, 6)), n)
        for s, n in counts.items()
    }
    quota_col = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )[src]
    order_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(src).orderBy(order_key, F.col(id_col))
    ids = (
        df.select(id_col, source_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota_col)
        .select(id_col)
    )
    return df.join(ids, id_col, "left_semi")


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    strata_cols: tuple[str, ...] = (),
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row draws a uniform ``u`` and ranks by
    ``u^(1/w)``; the ``k`` largest per stratum are an exact weighted
    sample — the standard one-pass distributed formulation (a heap per
    partition in the textbook; a per-stratum rank window here, which is
    the same contract with partial top-k pushed below the shuffle by
    Spark's TakeOrdered/Window machinery).

    ``u`` is NOT ``rand()``: it derives from ``md5(id)`` — the first 15
    hex chars as a 60-bit integer over ``2^60`` — so the draw is
    reproducible across runs AND engines (DuckDB replays it as
    ``CAST('0x' || substr(md5(id),1,15) AS BIGINT)``; both engines agree
    on md5 of the canonical string form). Ranking uses the monotone
    log form ``ln(u)/w`` (all ≤ 0, larger is better) to avoid pow
    underflow for tiny weights; ties (engineered-equal keys) break on
    ``id`` so the selection is a total order.

    Rows with NULL or non-positive weight are excluded — a weight of 0
    means "never sample" in A-ES and a negative weight is undefined.

    Scale shape: the rank window shuffles (id, strata, key) triples only;
    document bodies re-join by semi-join, same as stratified_sample. Used
    for length- or quality-weighted corpus subsampling where uniform
    sampling would under-represent long/high-quality documents.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    from otel_arrow_spark.functions.scalar import md5_long60

    v = md5_long60(F.col(id_col).cast("string"))
    u = (v + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(
        *[F.col(c) for c in strata_cols]
    ).orderBy(F.desc("_aes_key"), F.col(id_col))
    ids = (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(id_col, *strata_cols, key.alias("_aes_key"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(id_col)
    )
    return df.join(ids, id_col, "left_semi")


def classifier_score(
    df: DataFrame,
    weights: dict[int, float],
    dim: int = 64,
    bias: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """Linear text-classifier scoring (the fastText-style quality-model
    inference step of a training-data pipeline): tokens hash into ``dim``
    buckets, the score is the weight sum of present buckets plus bias,
    squashed by a sigmoid.

    Engine-portable feature hash: bucket = first 8 md5 hex chars mod dim
    (identical in DuckDB, so the oracle recomputes scores bit-for-bit).
    Pure expressions — transform + aggregate over the token array; the
    weight table rides in the plan as a literal array (a broadcast-free
    map-side lookup; real models at dim≤10^6 still fit a literal/broadcast).
    """
    wvec = [float(weights.get(i, 0.0)) for i in range(dim)]
    warr = F.array(*[F.lit(v) for v in wvec])
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    bucket = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % dim  # noqa: E731
    score = F.aggregate(
        toks,
        F.lit(float(bias)),
        lambda acc, t: acc + F.element_at(warr, (bucket(t) + 1).cast("int")),
    )
    return df.withColumn("clf_score", F.lit(1.0) / (F.lit(1.0) + F.exp(-score)))


def vocabulary_stats(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Corpus-wide token vocabulary: the ``top_k`` most frequent
    whitespace tokens (lowercased) with counts and a deterministic rank —
    the vocabulary-building / coverage-report step of a tokenizer
    pipeline.

    Scale shape: explode → ONE partial+final hash aggregate on the token
    (map-side combine absorbs the per-document repetition), then a global
    top-k which Spark plans as TakeOrderedAndProject — each partition
    keeps only its local top-k, the driver merges k·p rows, never a full
    sort. Rank ties break on the token string so the output is total-
    ordered and engine-replayable.
    """
    toks = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("token")
    counts = (
        df.select(toks)
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(top_k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
    out_col: str = "split",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row hashes into one
    of ``buckets`` cells (md5 of salt+id — engine-portable, the
    classifier_score recipe) and the cells partition into the weighted
    splits in dict order. Stable across runs, engines, partitioning, and
    corpus growth (a document's split never changes when other documents
    are added — the property a random split lacks); changing ``salt``
    draws a fresh assignment.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    cell = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % buckets
    )
    expr = None
    acc = 0.0
    *head, (last_name, _) = list(weights.items())
    for name, wgt in head:
        acc += wgt
        bound = int(round(acc * buckets))
        cond = cell < bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn(out_col, expr)


def unigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Unigram language-model scoring — the order-1, exactly-computable
    form of perplexity-based quality filtering (public method: CCNet /
    Wenzek et al. 2020 filter web text by KenLM perplexity; a unigram LM
    keeps the same shape with no external model artifact, so the score is
    deterministic and engine-replayable).

    Per document: ``avg_logprob = (1/|d|) Σ_t ln((c(t)+α) / (N+αV))``
    with corpus-wide token counts c, total N, vocab size V and add-α
    smoothing. Because the denominator is constant, it factors out:
    one Σ ln(c+α) per doc minus a broadcast scalar — no per-token
    division.

    Scale shape: tokenize (same convention as vocabulary_stats) → ONE
    hash aggregate for the vocab counts → tokens⋈counts equi-join on the
    token (AQE broadcasts when the vocab is small; at web scale it
    shuffles both sides on the token — the join IS the model lookup) →
    one per-doc aggregate → a 1-row totals crossJoin (broadcast).
    Low-probability docs (gibberish) sort to the bottom; integer
    ``sum_cnt``/``min_cnt`` ride along so cross-engine comparison has
    float-free anchors.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token"),
    ).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").cast("double").alias("_N"),
        F.count(F.lit(1)).cast("double").alias("_V"),
    )
    per_doc = (
        toks.join(counts, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(F.col("cnt") + F.lit(alpha))).alias("_s"),
            F.sum("cnt").cast("long").alias("sum_cnt"),
            F.min("cnt").cast("long").alias("min_cnt"),
        )
    )
    return per_doc.crossJoin(F.broadcast(totals)).select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "sum_cnt",
        "min_cnt",
        F.round(
            F.col("_s") / F.col("n_tokens")
            - F.log(F.col("_N") + F.lit(alpha) * F.col("_V")),
            6,
        ).alias("avg_logprob_r"),
    )
