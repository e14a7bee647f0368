"""LOGS star encode/decode round-trip — the Spark analog of the
reference's encode/decode batch-equivalence tests (go/pkg/otel/assert
Equiv over OTLP→OTAP→OTLP; logs.go / otlp/logs.go)."""

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.operators.logs_star import (
    LogsStarSpec,
    decode_logs_star,
    encode_logs_star,
)
from otel_arrow_spark.operators.parse import parse_transcripts


@pytest.fixture(scope="module")
def parsed(spark, tiny_transcripts):
    from otel_arrow_spark.operators.enrich import enrich

    df = spark.read.parquet(tiny_transcripts)
    return enrich(parse_transcripts(df), spark).localCheckpoint()


@pytest.fixture(scope="module")
def star(parsed):
    return {k: v.localCheckpoint() for k, v in encode_logs_star(parsed).items()}


class TestEncodeShape:
    def test_sparse_attrs_drop_nulls(self, parsed, star):
        """A null attribute emits NO row (optional-column semantics):
        total LOG_ATTRS rows == total non-null attr values."""
        spec = LogsStarSpec()
        want = sum(
            parsed.where(F.col(c).isNotNull()).count() for c in spec.attr_cols
        )
        assert star["log_attrs"].count() == want

    def test_dictionary_dims_are_tiny(self, parsed, star):
        """Resource/scope dims carry one id per DISTINCT value combo —
        the dictionary-encoding property that keeps them broadcastable."""
        # the all-null combo gets an id but (sparsely) zero attr rows, so
        # the attrs table carries one parent per distinct NON-null value
        assert (
            star["resource_attrs"].select("parent_id").distinct().count()
            == parsed.where(F.col("owner").isNotNull())
            .select("owner").distinct().count()
        )
        assert (
            star["scope_attrs"].select("parent_id").distinct().count()
            == parsed.select("role_class").distinct().count()
        )

    def test_log_ids_unique_and_stable(self, parsed, star):
        n = parsed.count()
        assert star["logs"].select("id").distinct().count() == n
        again = encode_logs_star(parsed)["logs"]
        assert star["logs"].select("id").exceptAll(again.select("id")).count() == 0

    def test_encode_plan_no_shuffle_on_logs(self, parsed):
        """The LOGS projection itself is narrow: no Exchange before the
        scan-side projection (hash ids, no row_number funnel)."""
        plan = (
            encode_logs_star(parsed)["logs"]
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestRoundTrip:
    def test_decode_restores_rows(self, parsed, star):
        """encode → decode == original on every mapped column (body,
        severity, trace ids, attrs-as-strings)."""
        spec = LogsStarSpec()
        back = decode_logs_star(star, spec)
        orig = parsed.select(
            F.xxhash64("conv_id", "turn_idx").alias("id"),
            F.col("ts"),
            F.col("severity_number").cast("int").alias("severity_number"),
            "severity_text",
            "trace_id",
            "span_id",
            F.col("text"),
            *[F.col(c).cast("string").alias(c) for c in spec.attr_cols],
        )
        got = back.select(*orig.columns)
        assert got.exceptAll(orig).count() == 0
        assert orig.exceptAll(got).count() == 0

    def test_decode_single_attrs_shuffle_and_broadcast_dims(self, star):
        plan = (
            decode_logs_star(star)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("BroadcastHashJoin") >= 2  # both dims broadcast


def test_spec_generic_over_syslog_shape(spark):
    """LogsStarSpec is column-mapping-generic: parsed syslog frames (a
    different parse surface entirely) encode into the same star layout
    and round-trip losslessly."""
    from otel_arrow_spark.operators.logs_star import LogsStarSpec
    from otel_arrow_spark.sources.syslog import generate_syslog_lines, parse_syslog

    lines = generate_syslog_lines(400)
    parsed = parse_syslog(
        spark.createDataFrame(
            [(i, l) for i, l in enumerate(lines)], "line_no long, line string"
        )
    ).where(F.col("format") != "unknown").localCheckpoint()
    spec = LogsStarSpec(
        key_cols=("line_no",),
        ts_col="line_no",          # any orderable column serves as ts here
        body_col="message",
        severity_text_col="severity_text",
        severity_number_col="severity_number",
        trace_id_col=None,
        span_id_col=None,
        attr_cols=("hostname", "app_name", "proc_id"),
        resource_cols=("facility",),
        scope_cols=("format",),  # the parse format IS the "scope"
    )
    star = encode_logs_star(parsed, spec)
    back = decode_logs_star(star, spec)
    orig = parsed.select(
        F.xxhash64("line_no").alias("id"),
        F.col("severity_text"),
        F.col("message"),
        *[F.col(c).cast("string").alias(c)
          for c in ("hostname", "app_name", "proc_id", "format")],  # format via scope dim
    )
    got = back.select(*orig.columns)
    assert got.exceptAll(orig).count() == 0
    assert orig.exceptAll(got).count() == 0
    # the format scope dim is tiny and dictionary-encoded
    assert star["scope_attrs"].count() == 3  # rfc5424 / rfc3164 / cef
