"""Sliding-window chunking: brute-force parity, coverage/overlap
invariants, and the zero-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.textops.chunking import chunk_documents

DOCS = "/root/testdata/sf0.001/documents.parquet"


def brute(text: str, window: int, overlap: int):
    toks = text.strip().split()
    stride = window - overlap
    n = len(toks)
    import math

    nc = max(math.ceil(max(n - overlap, 0) / stride), 1)
    out = []
    for i in range(nc):
        c = toks[i * stride: i * stride + window]
        out.append((i, " ".join(c), len(c)))
    return out


class TestChunking:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.read.parquet(DOCS)

    def test_matches_bruteforce(self, spark, docs):
        rows = docs.select("doc_id", "text").limit(50).collect()
        got = {
            (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chunk_tokens)
            for r in chunk_documents(
                docs.limit(50), window=32, overlap=8
            ).collect()
        }
        want = {}
        for r in rows:
            for i, txt, n in brute(r.text, 32, 8):
                want[(r.doc_id, i)] = (txt, n)
        assert got == want and len(got) > 50

    def test_every_token_covered_and_overlap_exact(self, spark, docs):
        """Re-concatenating chunk[0] + the non-overlap tail of each later
        chunk reproduces the token stream exactly."""
        ch = chunk_documents(docs, window=16, overlap=4).withColumn(
            "tail",
            F.when(
                F.col("chunk_idx") == 0, F.col("chunk_text")
            ).otherwise(
                F.array_join(
                    F.slice(F.split(F.col("chunk_text"), " "), 5, 16), " "
                )
            ),
        )
        rebuilt = (
            ch.groupBy("doc_id")
            .agg(
                F.array_join(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "tail"))
                    ).getField("tail"),
                    " ",
                ).alias("rebuilt")
            )
        )
        orig = docs.select(
            "doc_id",
            F.array_join(F.split(F.trim("text"), r"\s+"), " ").alias("norm"),
        )
        bad = rebuilt.join(orig, "doc_id").where(
            F.col("rebuilt") != F.col("norm")
        )
        assert bad.count() == 0

    def test_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        out = chunk_documents(df, window=64, overlap=16).collect()
        assert len(out) == 1
        assert out[0].chunk_text == "a b c" and out[0].n_chunk_tokens == 3

    def test_bad_params_rejected(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, window=16, overlap=16)

    def test_plan_no_shuffle_no_python(self, docs):
        plan = (
            chunk_documents(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "EvalPython" not in plan
