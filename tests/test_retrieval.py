"""BM25 lexical retrieval tests (textops/retrieval.py)."""

import math

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.textops.retrieval import bm25_score, bm25_topk


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "spark shuffle join hash join"),
        (2, "hash table scan"),
        (3, "sort merge join strategy for big tables"),
        (4, "unrelated text about nothing"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_bm25(rows, terms, k1=1.2, b=0.75):
    docs = {i: t.lower().strip().split() if t.strip() else [] for i, t in rows}
    N = len(docs)
    avgdl = sum(len(d) for d in docs.values()) / N
    out = {}
    for i, toks in docs.items():
        s = 0.0
        for w in terms:
            tf = toks.count(w)
            dfw = sum(1 for d in docs.values() if w in d)
            idf = math.log(1 + (N - dfw + 0.5) / (dfw + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        out[i] = s
    return out


class TestBm25:
    def test_matches_python_replay(self, spark, corpus):
        rows = [(r.doc_id, r.text) for r in corpus.collect()]
        want = _py_bm25(rows, ["join", "hash"])
        got = {r.doc_id: r.bm25 for r in bm25_score(corpus, ["join", "hash"]).collect()}
        assert got.keys() == want.keys()
        for i in want:
            assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])

    def test_ranking_and_zero_scores(self, spark, corpus):
        got = {r.doc_id: r.bm25 for r in bm25_score(corpus, ["join"]).collect()}
        # doc 1 has tf=2, doc 3 tf=1 but longer; 2/4/5 never mention it
        assert got[1] > got[3] > 0
        assert got[2] == got[4] == got[5] == 0.0

    def test_absent_term_contributes_zero_not_nan(self, spark, corpus):
        got = bm25_score(corpus, ["zzzmissing"]).collect()
        assert all(r.bm25 == 0.0 for r in got)

    def test_topk_order_and_tiebreak(self, spark, corpus):
        top = bm25_topk(corpus, ["join", "hash"], k=3).collect()
        assert [r.doc_id for r in top][0] == 1
        assert len(top) == 3
        # zero-score ties (if any reach k) break id-asc — exercise with a
        # term nobody has: pure tiebreak ordering
        t0 = bm25_topk(corpus, ["zzz"], k=5).collect()
        assert [r.doc_id for r in t0] == [1, 2, 3, 4, 5]

    def test_rejects_empty_query(self, spark, corpus):
        with pytest.raises(ValueError):
            bm25_score(corpus, [])

    def test_plan_shape(self, spark, corpus):
        """Stats come back via broadcast (never a shuffle join), the
        score side is expression-only: no SortMergeJoin, no Python."""
        df = bm25_topk(corpus, ["join", "hash"], k=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan and "EvalPython" not in plan
        assert "TakeOrdered" in plan
