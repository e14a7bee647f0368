"""Tests for topics, AnyValue, and the chaos/property fuzz of the parser —
the validation_process.md chaos-decoding analog driven by hypothesis."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from otel_arrow_spark.functions.anyvalue import (
    any_bool,
    any_bytes,
    any_int,
    any_str,
    any_value_as_string,
    any_value_is,
)
from otel_arrow_spark.sources.topics import list_topics, publish_topic, subscribe_topic


class TestTopics:
    def test_publish_subscribe_composes(self, spark):
        df = spark.range(100).toDF("x")
        publish_topic(df.filter("x >= 50"), "hot")
        sub = subscribe_topic(spark, "hot").filter("x < 60")
        assert sub.count() == 10
        assert "hot" in list_topics(spark)


class TestAnyValue:
    def test_round_trip_typed_branches(self, spark):
        df = spark.createDataFrame(
            [(1, "s", 7, True, b"\xca\xfe")], "id int, s string, i int, b boolean, by binary"
        )
        out = df.select(
            any_value_as_string(any_str(F.col("s"))).alias("vs"),
            any_value_as_string(any_int(F.col("i"))).alias("vi"),
            any_value_as_string(any_bool(F.col("b"))).alias("vb"),
            any_value_as_string(any_bytes(F.col("by"))).alias("vby"),
            any_value_is(any_int(F.col("i")), "integer").alias("is_int"),
            any_value_is(any_int(F.col("i")), "string").alias("is_str"),
        ).collect()[0]
        assert (out.vs, out.vi, out.vb, out.vby) == ("s", "7", "true", "cafe")
        assert out.is_int is True and out.is_str is False


# chaos fuzz: arbitrary text (including adversarial near-matches of the
# three grammars) must never raise, and both parse engines must agree.
_adversarial = st.one_of(
    st.text(max_size=60),
    st.from_regex(r"(CALL tool=|span trace=|ERROR \[)?[a-z0-9 =\[\]._-]{0,40}", fullmatch=True),
    st.sampled_from([
        "", " ", "\n", "CALL tool=", "CALL tool=x args_len=y status=z dur_ms=0",
        "ERROR [x] ", "ERROR [X] msg", "span trace=deadbeef span=beef event=a.b",
        "INFO [ok] fine", "FATAL [io] down",
    ]),
)


@settings(max_examples=20, deadline=None)
@given(texts=st.lists(_adversarial, min_size=1, max_size=30))
def test_parse_chaos_never_raises_and_engines_agree(spark, texts):
    from otel_arrow_spark.operators.parse import parse_transcripts

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = parse_transcripts(df, engine="native").orderBy("text").collect()
    b = parse_transcripts(df, engine="pandas").orderBy("text").collect()
    assert a == b


class TestReaders:
    def test_json_csv_parquet_agree(self, spark, tiny_transcripts, workdir):
        from otel_arrow_spark.sources.readers import (
            conform_transcripts,
            read_transcripts,
            validation_report,
        )

        base = read_transcripts(spark, tiny_transcripts, "parquet")
        # round-trip the same corpus through json and csv encodings
        base.write.mode("overwrite").json(f"{workdir}/tj")
        jdf = read_transcripts(spark, f"{workdir}/tj", "json")
        assert jdf.count() == base.count()
        a = base.select("conv_id", "turn_idx", "text").exceptAll(
            jdf.select("conv_id", "turn_idx", "text")
        )
        assert a.count() == 0

        rep = validation_report(base)
        assert rep["rows"] == base.count() and rep["null_conv_id"] == 0
        assert rep["n_conversations"] > 0

    def test_conform_rejects_missing_required(self, spark):
        from otel_arrow_spark.sources.readers import conform_transcripts

        df = spark.createDataFrame([(1,)], "x int")
        import pytest as _pt

        with _pt.raises(ValueError, match="missing required"):
            conform_transcripts(df)

    def test_conform_nulls_bad_casts_and_adds_tool(self, spark):
        from otel_arrow_spark.sources.readers import conform_transcripts

        df = spark.createDataFrame(
            [("c1", "not_an_int", "user", "hi", "2026-01-01 00:00:00")],
            "conv_id string, turn_idx string, role string, text string, ts string",
        )
        row = conform_transcripts(df).collect()[0]
        assert row.turn_idx is None  # failed cast → null, never raises
        assert row.tool is None  # optional column synthesized
        assert row.ts is not None
