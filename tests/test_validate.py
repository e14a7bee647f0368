"""Conversation-health validation tests (operators/validate.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from otel_arrow_spark.operators.validate import conversation_health


def ts(s):
    return datetime(2026, 1, 1, 0, 0, s)


def _corpus(spark):
    rows = [
        # healthy: dense 0..2, monotone ts, alternating, bodies present
        ("ok", 0, ts(0), "user", "hi"),
        ("ok", 1, ts(1), "assistant", "hello"),
        ("ok", 2, ts(2), "user", "bye"),
        # dup turn_idx 1 + role repeat (two assistants in a row)
        ("dup", 0, ts(0), "user", "q"),
        ("dup", 1, ts(1), "assistant", "a1"),
        ("dup", 1, ts(2), "assistant", "a2"),
        # index gap (0, 2) + timestamp regression + empty body
        ("gap", 0, ts(5), "user", "q"),
        ("gap", 2, ts(3), "assistant", "   "),
        # head-truncated (turns 3,4) + NULL body: both must flag
        ("trunc", 3, ts(0), "user", None),
        ("trunc", 4, ts(1), "assistant", "late"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, role string, text string"
    )


class TestConversationHealth:
    def test_flags_each_defect_class(self, spark):
        got = {r.conv_id: r for r in conversation_health(_corpus(spark)).collect()}
        ok, dup, gap = got["ok"], got["dup"], got["gap"]
        trunc = got["trunc"]
        # 0-based anchor: lost leading turns count as gaps; NULL body
        # counts as empty
        assert trunc.n_idx_gaps == 3 and trunc.n_empty_text == 1
        assert not trunc.is_healthy
        assert ok.is_healthy and ok.n_turns == 3
        assert (ok.n_dup_idx, ok.n_idx_gaps, ok.n_ts_regressions,
                ok.n_role_repeats, ok.n_empty_text) == (0, 0, 0, 0, 0)
        assert not dup.is_healthy
        assert dup.n_dup_idx == 1 and dup.n_role_repeats == 1
        assert not gap.is_healthy
        assert gap.n_idx_gaps == 1 and gap.n_ts_regressions == 1
        assert gap.n_empty_text == 1

    def test_role_repeats_informational_not_gating(self, spark):
        """Tool-call bursts legitimately repeat roles — repeats are
        reported but never fail is_healthy on their own."""
        rows = [("t", i, ts(i), "tool", f"call {i}") for i in range(3)]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, ts timestamp, role string, text string"
        )
        r = conversation_health(df).collect()[0]
        assert r.n_role_repeats == 2 and r.is_healthy

    def test_single_exchange_plan(self, spark):
        """The lag window and the per-conv aggregate share one
        hash(conv_id) distribution: exactly one Exchange, no Python."""
        plan = conversation_health(_corpus(spark))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") == 1 and "EvalPython" not in plan

    def test_generated_corpus_structure_clean_chaos_detected(self, spark, workdir):
        """The generator's conversations are structurally sound (dense
        indexes, monotone ts) but its chaos grammar plants empty bodies
        — the validator must pass the former and catch the latter."""
        from otel_arrow_spark.sources.transcripts import (
            write_transcripts_parquet,
        )

        p = write_transcripts_parquet(f"{workdir}/vh_transcripts", 4000)
        rep = conversation_health(spark.read.parquet(p))
        structural = rep.where(
            (F.col("n_dup_idx") > 0)
            | (F.col("n_idx_gaps") > 0)
            | (F.col("n_ts_regressions") > 0)
        )
        assert structural.count() == 0
        assert rep.agg(F.sum("n_empty_text")).collect()[0][0] > 0
