"""Scrubbing-operator tests: PII redaction vs Python re oracles,
decontamination planted-overlap fixture, repetition stats vs hand
computation."""

import re

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.textops.scrub import (
    DEFAULT_RULES,
    benchmark_ngrams,
    flag_contaminated,
    redact_pii,
    repetition_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "contact bob@example.com or +1 555-123-4567 now"),
        (2, "server 10.0.0.1 responded; ssn 123-45-6789 leaked"),
        (3, "clean text with no identifiers at all"),
        (4, "two mails a@b.io c@d.org and ip 192.168.0.1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRedact:
    def test_matches_python_re(self, docs):
        out = {r.doc_id: r for r in redact_pii(docs).collect()}
        for r in docs.collect():
            red = r.text
            for name, pat, repl in DEFAULT_RULES:
                n = len(re.findall(pat, r.text))
                assert out[r.doc_id][f"n_{name}"] == n, (r.doc_id, name)
                red = re.sub(pat, repl, red)
            assert out[r.doc_id].text_redacted == red

    def test_original_text_untouched(self, docs):
        out = redact_pii(docs)
        assert {r.text for r in out.collect()} == {r.text for r in docs.collect()}

    def test_counts(self, docs):
        out = {r.doc_id: r for r in redact_pii(docs).collect()}
        assert out[1].n_email == 1 and out[1].n_phone == 1
        assert out[2].n_ipv4 == 1 and out[2].n_ssn == 1
        assert out[3].n_email == out[3].n_ipv4 == 0
        assert out[4].n_email == 2


class TestDecontamination:
    def test_planted_overlap(self, spark):
        bench = spark.createDataFrame(
            [("the quick brown fox jumps over the lazy dog near the river bank",)],
            "text string",
        )
        corpus = spark.createDataFrame(
            [
                (1, "prefix words the quick brown fox jumps over the lazy dog suffix"),
                (2, "totally unrelated content about spark partitions and shuffles"),
                (3, "the quick brown fox appears but the full eight gram does not"),
            ],
            "doc_id long, text string",
        )
        grams = benchmark_ngrams(bench, n=8)
        out = {r.doc_id: r for r in flag_contaminated(corpus, grams, n=8).collect()}
        assert out[1].is_contaminated and out[1].n_hits > 0
        assert not out[2].is_contaminated and out[2].n_hits == 0
        assert not out[3].is_contaminated  # shares <8-gram overlap only

    def test_no_rows_dropped(self, spark):
        bench = spark.createDataFrame([("a b c d e f g h",)], "text string")
        corpus = spark.createDataFrame(
            [(i, f"doc {i} body text") for i in range(20)], "doc_id long, text string"
        )
        out = flag_contaminated(corpus, benchmark_ngrams(bench, n=8), n=8)
        assert out.count() == 20


class TestRepetition:
    def test_hand_oracle(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b\na b\nc d"),          # 3 lines, 1 dup
                (2, "x y x y x y"),            # top bigram "x y" = 3 of 5
                (3, "unique words only here"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in repetition_stats(df).collect()}
        assert abs(out[1].dup_line_frac - 1 / 3) < 1e-9
        assert abs(out[2].top_bigram_frac - 3 / 5) < 1e-9
        assert out[3].dup_line_frac == 0.0
        # mean word length: "unique words only here" → (6+5+4+4)/4
        assert abs(out[3].mean_word_len - 19 / 4) < 1e-9


class TestHashedGrams:
    def test_hashed_grams_flag_same_docs_as_string_grams(self, spark):
        """token_ngram_hashes is a drop-in for token_ngrams in equality
        joins: identical contamination verdicts on a corpus with planted
        overlaps (collisions are ~2^-53 per pair)."""
        from pyspark.sql import functions as F

        from otel_arrow_spark.textops.dedup import token_ngram_hashes, token_ngrams

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        bench = docs.orderBy("doc_id").limit(3).select("text")

        def flagged(gram_fn):
            bg = bench.select(F.explode(gram_fn(F.col("text"), 8)).alias("g")).distinct()
            pg = docs.select("doc_id", F.explode(gram_fn(F.col("text"), 8)).alias("g"))
            return {r["doc_id"] for r in pg.join(bg, "g").select("doc_id").distinct().collect()}

        a, b = flagged(token_ngrams), flagged(token_ngram_hashes)
        assert a == b and len(a) >= 3  # bench docs flag themselves

    def test_short_doc_has_no_grams(self, spark):
        from pyspark.sql import functions as F

        from otel_arrow_spark.textops.dedup import token_ngram_hashes

        df = spark.createDataFrame([("a b c",), ("",)], "text string")
        out = df.select(F.size(token_ngram_hashes(F.col("text"), 8)).alias("n")).collect()
        assert [r["n"] for r in out] == [0, 0]
