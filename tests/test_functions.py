"""Scalar-function tests: OPL semantics vs independent Python oracles."""

import hashlib
import re
import uuid

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.functions import (
    contains,
    ends_with,
    fnv64,
    format_datetime,
    ieq,
    matches,
    opl_coalesce,
    opl_concat,
    opl_encode,
    opl_join,
    opl_replace,
    opl_substring,
    regexp_capture,
    regexp_substr,
    sha1,
    sha256,
    starts_with,
    uuid7,
    xxh64,
)


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(
        [("Hello World", "hello world"), ("abc123def456", "zzz"), (None, "x")],
        "a string, b string",
    )


def _one(df, col):
    return df.select(col.alias("v")).collect()


def test_string_predicates(sdf):
    rows = _one(sdf, contains("a", "World"))
    assert [r.v for r in rows] == [True, False, None]
    assert _one(sdf, starts_with("a", "Hello"))[0].v is True
    assert _one(sdf, ends_with("a", "World"))[0].v is True
    assert _one(sdf, matches("a", r"\d{3}def"))[1].v is True
    assert _one(sdf, ieq("a", "b"))[0].v is True  # =~ case-insensitive


def test_substring_zero_indexed(sdf):
    # OPL substring("Hello World", 0, 5) == "Hello" (0-indexed)
    assert _one(sdf, opl_substring("a", 0, 5))[0].v == "Hello"
    assert _one(sdf, opl_substring("a", 6, 5))[0].v == "World"
    assert _one(sdf, opl_substring("a", 6))[0].v == "World"


def test_concat_join_replace(sdf):
    assert _one(sdf, opl_concat("a", F.lit("!")))[0].v == "Hello World!"
    assert _one(sdf, opl_join("-", F.lit("a"), F.lit("b")))[0].v == "a-b"
    assert _one(sdf, opl_replace("a", F.lit("World"), F.lit("OPL")))[0].v == "Hello OPL"


def test_regexp_capture_null_on_no_match(sdf):
    rows = _one(sdf, regexp_capture("a", r"(\d+)def", 1))
    assert [r.v for r in rows] == [None, "123", None]


def test_regexp_substr_nth_occurrence(sdf):
    # reference order: (str, pattern, start, occurrence, flags, group)
    assert _one(sdf, regexp_substr("a", r"\d+"))[1].v == "123"
    assert _one(sdf, regexp_substr("a", r"\d+", 1, 2))[1].v == "456"
    # start: 1-based position; searching "abc123def456" from pos 5 skips "1"
    assert _one(sdf, regexp_substr("a", r"\d+", 5))[1].v == "23"
    # flags: case-insensitive
    assert _one(sdf, regexp_substr("a", r"HELLO", 1, 1, "i"))[0].v == "Hello"
    # group: capture group extraction
    assert _one(sdf, regexp_substr("a", r"(\d+)def", 1, 1, None, 1))[1].v == "123"
    # occurrence beyond match count → NULL, not an error
    assert _one(sdf, regexp_substr("a", r"\d+", 1, 9))[1].v is None


def test_hashes_vs_python(sdf):
    got = _one(sdf, sha256("a"))[0].v
    assert got == hashlib.sha256(b"Hello World").hexdigest()
    assert _one(sdf, sha1("a"))[0].v == hashlib.sha1(b"Hello World").hexdigest()
    # FNV-1a 64 oracle
    def fnv_py(s):
        h = 0xCBF29CE484222325
        for byte in s.encode():
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h - (1 << 64) if h >= (1 << 63) else h

    assert _one(sdf, fnv64("a"))[0].v == fnv_py("Hello World")
    assert _one(sdf, fnv64("a"))[2].v is None
    # xxh64/murmur3 smoke: deterministic, non-null
    assert _one(sdf, xxh64("a"))[0].v == _one(sdf, xxh64("a"))[0].v


def test_encode(sdf):
    assert _one(sdf, opl_encode(F.lit("hi").cast("binary"), "hex"))[0].v == "6869"
    assert _one(sdf, opl_encode(F.lit("hi").cast("binary"), "base64"))[0].v == "aGk="


def test_format_datetime_and_coalesce(spark):
    df = spark.createDataFrame([("2026-01-02 03:04:05",)], "t string").select(
        F.col("t").cast("timestamp").alias("ts")
    )
    assert _one(df, format_datetime("ts", "yyyy/MM/dd HH:mm"))[0].v == "2026/01/02 03:04"
    assert _one(df, opl_coalesce(F.lit(None), F.lit("x")))[0].v == "x"


def test_uuid7_shape_and_time_ordering(spark):
    df = spark.createDataFrame(
        [("2026-01-02 00:00:00", "e1"), ("2026-01-02 00:00:01", "e2")],
        "t string, e string",
    ).select(F.col("t").cast("timestamp").alias("ts"), "e")
    rows = _one(df, uuid7("ts", "e"))
    for r in rows:
        u = uuid.UUID(r.v)
        assert u.version == 7
        assert r.v[19] in "89ab"
    assert rows[0].v < rows[1].v  # time-ordered
    # deterministic
    rows2 = _one(df, uuid7("ts", "e"))
    assert [r.v for r in rows] == [r.v for r in rows2]


class TestParseTraceparent:
    CASES = [
        # (header, valid, sampled)
        ("00-" + "ab" * 16 + "-" + "cd" * 8 + "-01", True, True),
        ("00-" + "ab" * 16 + "-" + "cd" * 8 + "-00", True, False),
        ("01-" + "ab" * 16 + "-" + "cd" * 8 + "-ff", True, True),  # future version ok
        ("ff-" + "ab" * 16 + "-" + "cd" * 8 + "-01", False, None),  # version ff forbidden
        ("00-" + "0" * 32 + "-" + "cd" * 8 + "-01", False, None),  # zero trace id
        ("00-" + "ab" * 16 + "-" + "0" * 16 + "-01", False, None),  # zero span id
        ("00-" + "AB" * 16 + "-" + "cd" * 8 + "-01", False, None),  # uppercase hex
        ("garbage", False, None),
        (None, False, None),
    ]

    def test_spec_cases(self, spark):
        from otel_arrow_spark.functions import parse_traceparent

        df = spark.createDataFrame(
            [(i, h) for i, (h, _, _) in enumerate(self.CASES)], "i int, tp string"
        )
        out = {
            r.i: r
            for r in df.select("i", parse_traceparent("tp").alias("c"))
            .select("i", "c.*")
            .collect()
        }
        for i, (hdr, valid, sampled) in enumerate(self.CASES):
            assert out[i].valid is valid, hdr
            assert out[i].sampled == sampled if sampled is not None else out[i].sampled is None
            if valid:
                assert out[i].trace_id == hdr[3:35]
                assert out[i].span_id == hdr[36:52]
            else:
                assert out[i].trace_id is None and out[i].span_id is None
