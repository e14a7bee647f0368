"""Parse-stage tests: engine parity, severity mapping, chaos handling.

Mirrors the reference's parser unit suites (syslog_cef_receiver/parser/
rfc5424.rs tests) and its UnknownFormat tolerance (parser/mod.rs:41-43).
"""

import re

from pyspark.sql import functions as F

from otel_arrow_spark.operators.parse import (
    CALL_RE,
    SEVERITY_RE,
    SPAN_RE,
    parse_transcripts,
)
from tests.conftest import assert_df_equal


def test_native_and_pandas_engines_identical(spark, tiny_transcripts):
    df = spark.read.parquet(tiny_transcripts)
    native = parse_transcripts(df, engine="native").orderBy("conv_id", "turn_idx")
    pandas = parse_transcripts(df, engine="pandas").orderBy("conv_id", "turn_idx")
    assert_df_equal(native, pandas, "parse engine parity")


def test_parse_against_python_re_oracle(spark, tiny_transcripts):
    """Independent oracle: re-parse a sample with Python's re module."""
    df = spark.read.parquet(tiny_transcripts)
    parsed = parse_transcripts(df).select(
        "text", "severity_text", "tool_called", "trace_id", "is_parsed"
    )
    rows = parsed.limit(500).collect()
    for r in rows:
        sev = re.match(SEVERITY_RE, r.text or "")
        call = re.match(CALL_RE + r"\Z", r.text or "")
        span = re.match(SPAN_RE + r"\Z", r.text or "")
        assert r.severity_text == (sev.group(1) if sev else None)
        assert r.tool_called == (call.group(1) if call else None)
        assert r.trace_id == (span.group(1) if span else None)
        assert r.is_parsed == bool(sev or call or span)


def test_severity_numbers_follow_otel_appendix_b(spark):
    data = [(f"{lvl} [io] x",) for lvl in ["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"]]
    df = spark.createDataFrame(data, "text string")
    got = {
        r.severity_text: r.severity_number
        for r in parse_transcripts(df).select("severity_text", "severity_number").collect()
    }
    assert got == {"TRACE": 1, "DEBUG": 5, "INFO": 9, "WARN": 13, "ERROR": 17, "FATAL": 21}


def test_chaos_rows_parse_to_nulls_not_errors(spark):
    """Unparseable input must yield null fields, never raise — the
    chaos-decoding analog (docs/validation_process.md:37-45)."""
    data = [("",), (None,), ("free\nform\ntext",), ("ERRORX [bad] nope",), ("CALL tool=",)]
    df = spark.createDataFrame(data, "text string")
    out = parse_transcripts(df)
    assert out.filter(F.col("is_parsed")).count() == 0
    assert out.count() == 5


def test_text_column_untouched(spark, tiny_transcripts):
    df = spark.read.parquet(tiny_transcripts)
    out = parse_transcripts(df).select("conv_id", "turn_idx", "text")
    assert_df_equal(df.select("conv_id", "turn_idx", "text"), out, "text round-trip")
