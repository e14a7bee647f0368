"""Training-data scrubbing operators: PII redaction, benchmark
decontamination, and repetition-based quality rules.

These are the standard pre-training corpus hygiene passes (the C4/Gopher
lineage of filters) expressed Spark-first:

* PII redaction — pure ``regexp_replace`` chains (JVM, codegen'd); the
  match counts ride along so lineage can report how much was scrubbed;
* decontamination — documents containing any n-gram from a benchmark set
  are flagged via an inverted-index equi-join against the (broadcast)
  benchmark n-gram table — never a cross join, never a Python loop;
* repetition rules — duplicate-line fraction and top-bigram fraction as
  array-expression aggregates per document (explode-free).

Everything here is oracle-able in plain SQL, and every operator keeps the
original text column untouched next to its derived columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from otel_arrow_spark.textops.dedup import token_ngrams

# PII patterns: deliberately conservative/deterministic (no lookbehind so
# the same pattern runs identically in Spark, RE2 and DuckDB oracles)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"

DEFAULT_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("ssn", SSN_RE, "<SSN>"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    rules: list[tuple[str, str, str]] | None = None,
    out_col: str = "text_redacted",
) -> DataFrame:
    """Apply the ordered redaction rule list; adds ``out_col`` plus one
    ``n_<rule>`` match-count column per rule (the scrub lineage an audit
    needs). All-occurrence ``regexp_replace`` chains — one Project, no UDF.
    """
    rules = DEFAULT_RULES if rules is None else rules
    out = F.col(text_col)
    counts: dict[str, Column] = {}
    for name, pat, repl in rules:
        counts[f"n_{name}"] = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
        )
        out = F.regexp_replace(out, pat, repl)
    return df.withColumns({out_col: out, **counts})


def benchmark_ngrams(bench: DataFrame, text_col: str = "text", n: int = 8) -> DataFrame:
    """Distinct token n-grams of a benchmark/eval set — the contamination
    fingerprint table. Small by construction (benchmarks are ~10⁴ docs);
    broadcast it at the join site."""
    return (
        bench.select(F.explode(token_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def flag_contaminated(
    corpus: DataFrame,
    bench_grams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Decontamination: flag corpus documents sharing ANY ``n``-gram with
    the benchmark set.

    Shape: explode corpus n-grams → equi-join the broadcast benchmark gram
    table → distinct contaminated ids → left-semi-style flag join. The
    corpus-side shuffle carries (id, gram) pairs only; at 100 TB the
    benchmark side is dictionary-sized, so the join is map-side.
    Returns the corpus with ``is_contaminated`` + ``n_hits``.
    """
    posting = corpus.select(
        F.col(id_col), F.explode(token_ngrams(F.col(text_col), n)).alias("gram")
    )
    hits = (
        posting.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        corpus.join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
        .withColumn("is_contaminated", F.col("n_hits") > 0)
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document, explode-free:

    * ``dup_line_frac`` — fraction of lines that are duplicates of an
      earlier line (1 - distinct/total);
    * ``top_bigram_frac`` — occurrences of the most frequent word bigram
      over total bigrams;
    * ``mean_word_len`` — mean token length (the degenerate-text signal).

    The top-bigram count is O(distinct × total) per document as a pure
    expression — fine for web-document lengths (≤ a few k tokens); for
    book-length texts switch to the explode → groupBy(doc, bigram) →
    max(count) form, which shuffles but is linear per document.
    """
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines)
    dup_line = F.when(n_lines > 0,
                      1.0 - F.size(F.array_distinct(lines)) / n_lines
                      ).otherwise(F.lit(0.0))

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    bigrams = token_ngrams(F.col(text_col), 2)  # distinct bigrams
    # bigram i = tokens[i], tokens[i+1] for i in 0..size-2 → size-1 bigrams
    all_bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - F.lit(2)),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
    )
    n_bi = F.size(toks) - 1
    top_count = F.array_max(
        F.transform(
            bigrams,
            lambda g: F.size(F.filter(all_bigrams, lambda x: x == g)),
        )
    )
    top_bigram = F.when(F.size(toks) >= 2, top_count / n_bi).otherwise(F.lit(0.0))

    mean_wl = F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
        / F.size(toks),
    ).otherwise(F.lit(0.0))

    return df.withColumns(
        {
            "dup_line_frac": dup_line,
            "top_bigram_frac": top_bigram,
            "mean_word_len": mean_wl,
        }
    )
