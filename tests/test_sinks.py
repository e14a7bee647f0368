"""Sink + retry tests (parquet exporter / retry processor analogs)."""

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.sinks import noop_sink, retry_with_backoff, write_table


def test_write_table_partitioned_and_ordered(spark, tiny_transcripts, workdir):
    from otel_arrow_spark.plans.pipeline import PipelineConfig, build_routed

    routed = build_routed(
        spark, PipelineConfig(input_path=tiny_transcripts, output_dir="/unused")
    )
    out = write_table(routed, f"{workdir}/wt", partition_by=("signal_class",))
    back = spark.read.parquet(out)
    assert back.count() == routed.count()
    assert set(r.signal_class for r in back.select("signal_class").distinct().collect()) \
        == {"error", "warn", "tool_call", "span", "chat"}


def test_noop_sink(spark):
    noop_sink(spark.range(10).toDF("x"))


class TestRetry:
    def test_succeeds_after_failures(self):
        calls = {"n": 0}
        sleeps = []

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise OSError("transient")
            return "ok"

        out = retry_with_backoff(flaky, initial_interval=1.0, sleep=sleeps.append)
        assert out == "ok" and calls["n"] == 3
        assert sleeps == [1.0, 2.0]  # exponential

    def test_exhausts_and_reraises(self):
        def always():
            raise OSError("permanent")

        with pytest.raises(OSError):
            retry_with_backoff(always, max_attempts=3, sleep=lambda s: None)

    def test_respects_max_elapsed(self):
        def always():
            raise OSError("x")

        with pytest.raises(OSError):
            retry_with_backoff(
                always, max_attempts=100, initial_interval=1000.0,
                max_elapsed=0.1, sleep=lambda s: None,
            )


def test_kafka_source_gated_with_clear_error(spark):
    """The contrib Kafka helper is gated: without the spark-sql-kafka
    package it raises a RuntimeError naming the missing package instead of
    an opaque classpath failure (contrib receiver surface)."""
    import pytest as _pytest

    from otel_arrow_spark.sinks import kafka_stream_source

    with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_stream_source(spark, "localhost:9092", "t")


def test_write_table_zstd_roundtrip(spark, tiny_transcripts, workdir):
    """compression='zstd' writes readable parquet smaller than snappy."""
    import os

    from otel_arrow_spark.sinks import write_table

    df = spark.read.parquet(tiny_transcripts)
    a = write_table(df, f"{workdir}/comp_snappy", sort_cols=("conv_id", "turn_idx"))
    b = write_table(
        df, f"{workdir}/comp_zstd", sort_cols=("conv_id", "turn_idx"),
        compression="zstd",
    )
    assert spark.read.parquet(b).count() == df.count()

    def size(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p) for f in fs if f.endswith(".parquet")
        )

    assert size(b) < size(a)
