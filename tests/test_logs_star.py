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
        ids = star["logs"].select("id_hi", "id_lo")
        assert ids.distinct().count() == n
        again = encode_logs_star(parsed)["logs"]
        assert ids.exceptAll(again.select("id_hi", "id_lo")).count() == 0

    def test_id_halves_are_independent(self, star):
        """id_lo is a SECOND independent hash (salted), not a copy — the
        128-bit width is real. No fixture row has id_hi == id_lo, and the
        lo half alone is already unique here."""
        ids = star["logs"].select("id_hi", "id_lo").localCheckpoint()
        assert ids.where(F.col("id_hi") == F.col("id_lo")).count() == 0
        assert ids.select("id_lo").distinct().count() == ids.count()

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
        from otel_arrow_spark.operators.logs_star import _ID_LO_SALT

        spec = LogsStarSpec()
        back = decode_logs_star(star, spec)
        orig = parsed.select(
            F.xxhash64("conv_id", "turn_idx").alias("id_hi"),
            F.xxhash64(F.lit(_ID_LO_SALT), "conv_id", "turn_idx").alias("id_lo"),
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

    def test_decode_strategies_agree(self, star):
        """union-agg (one-shuffle default) and join (the bucketed-layout
        path) are the same decode."""
        a = decode_logs_star(star, strategy="union-agg")
        b = decode_logs_star(star, strategy="join").select(*a.columns)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_decode_single_shuffle_and_broadcast_dims(self, star):
        plan = (
            decode_logs_star(star)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("BroadcastHashJoin") >= 2  # both dims broadcast
        # union-agg decode: the fact side is ONE shuffle (partial+final
        # aggregate over the union) — no SortMergeJoin anywhere
        assert "SortMergeJoin" not in plan

    def test_64bit_collision_does_not_merge_rows(self, spark):
        """Two DISTINCT log rows whose id_hi collides (engineered star
        input) must stay two rows with their own attrs — the reason the
        id is 128-bit: keyed on the (hi, lo) pair, a single-half
        collision cannot merge unrelated rows' attributes."""
        logs = spark.createDataFrame(
            [(7, 1, 0, 0, "a-body"), (7, 2, 0, 0, "b-body")],
            "id_hi long, id_lo long, resource_id long, scope_id long, body_str string",
        ).select(
            "id_hi", "id_lo", "resource_id", "scope_id",
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit(None).cast("int").alias("severity_number"),
            F.lit(None).cast("string").alias("severity_text"),
            F.lit(None).cast("string").alias("trace_id"),
            F.lit(None).cast("string").alias("span_id"),
            F.lit(1).cast("int").alias("body_type"),
            "body_str",
        )
        attrs = spark.createDataFrame(
            [(7, 1, "tool", 1, "tool-of-a", None),
             (7, 2, "tool", 1, "tool-of-b", None)],
            "parent_id_hi long, parent_id_lo long, key string, type int, "
            "str string, int long",
        )
        empty_dim = attrs.where(F.lit(False)).select(
            F.col("parent_id_hi").alias("parent_id"), "key", "type", "str", "int"
        )
        star = {"logs": logs, "log_attrs": attrs,
                "resource_attrs": empty_dim, "scope_attrs": empty_dim}
        for strategy in ("union-agg", "join"):
            got = {(r["id_hi"], r["id_lo"]): (r["text"], r["tool"])
                   for r in decode_logs_star(star, strategy=strategy).collect()}
            assert got == {(7, 1): ("a-body", "tool-of-a"),
                           (7, 2): ("b-body", "tool-of-b")}, strategy


def test_bucketed_star_decode_zero_exchange(spark, parsed, star):
    """Star tables persisted with write_logs_star_bucketed decode via the
    join strategy with ZERO shuffle on the fact side: the bucketed layout
    pre-partitions both the attrs pivot's groupBy and the logs⋈attrs
    equi-join (the dims still broadcast)."""
    from otel_arrow_spark.operators.logs_star import (
        read_logs_star_tables,
        write_logs_star_bucketed,
    )

    names = write_logs_star_bucketed(star, prefix="t_star_bkt", n_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        loaded = read_logs_star_tables(spark, names)
        back = decode_logs_star(loaded, strategy="join")
        plan = back._jdf.queryExecution().executedPlan().toString()
        # the only shuffles are the two TINY dim pivots inside the
        # broadcast subtrees; the fact-side pivot groupBy and the
        # logs⋈attrs SortMergeJoin run on the bucketed scans directly
        assert plan.count("Exchange hashpartitioning") == 2
        assert plan.count("Bucketed: true") == 2
        assert "SortMergeJoin" in plan  # the co-located fact join
        # and it is still the same decode
        want = decode_logs_star(star)
        got = back.select(*want.columns)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")


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
    from otel_arrow_spark.operators.logs_star import _ID_LO_SALT

    orig = parsed.select(
        F.xxhash64("line_no").alias("id_hi"),
        F.xxhash64(F.lit(_ID_LO_SALT), "line_no").alias("id_lo"),
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


class TestDecodePruning:
    def test_consumer_projection_prunes_decode_aggregates(self, spark):
        """A consumer reading ONE column through the union-agg decode must
        pay ONE conditional-first aggregate (plus body_type, which the
        left-join-semantics filter needs) — not the full star width."""
        import re

        from otel_arrow_spark.operators.logs_star import (
            decode_logs_star,
            encode_logs_star,
        )

        df = spark.createDataFrame(
            [(f"c{i}", i, "2026-01-01", "INFO", 9, "t" * 8, "s" * 8,
              "hello", "bash", "core", "ls", "ok", "alice", "agent")
             for i in range(50)],
            "conv_id string, turn_idx int, ts string, severity_text string, "
            "severity_number int, trace_id string, span_id string, "
            "text string, tool string, component string, tool_called string, "
            "call_status string, owner string, role_class string",
        )
        back = decode_logs_star(encode_logs_star(df))
        plan = (
            back.select("severity_text")
            .groupBy("severity_text")
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        survivors = sorted(set(re.findall(r"first\((\w+)", plan)))
        assert survivors == ["body_type", "severity_text"], survivors
