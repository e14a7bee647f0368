"""Transcript table readers: parquet/Iceberg, JSON-lines, CSV — all
normalized to the canonical schema with validation.

Reference analog: the receiver suite accepts multiple wire encodings of the
same logical data (OTLP protobuf, OTAP Arrow IPC, syslog text, journald
export) and normalizes them to one internal representation
(OtapArrowRecords). Here the internal representation is a DataFrame with
the canonical transcript schema (BASELINE.json input_hint); every reader
ends with the same ``conform`` step: required columns present, types cast,
extras dropped, and a validation report (the chaos-tolerance stance:
malformed rows null out, never raise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otel_arrow_spark.sources.transcripts import transcripts_schema

CANONICAL_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def conform_transcripts(df: DataFrame) -> DataFrame:
    """Cast/select to the canonical transcript schema.

    Missing optional column (`tool`) → null column; missing required
    column → error (the schema contract is the input_hint). Extra columns
    drop. Values that fail the cast become null (try_cast semantics),
    mirroring UnknownFormat degradation.
    """
    schema = transcripts_schema()
    required = {"conv_id", "turn_idx", "role", "text", "ts"}
    missing = required - set(df.columns)
    if missing:
        raise ValueError(f"transcript input missing required columns: {sorted(missing)}")
    out = df
    if "tool" not in out.columns:
        out = out.withColumn("tool", F.lit(None).cast("string"))
    cols = []
    for field in schema.fields:
        cols.append(
            F.col(field.name).try_cast(field.dataType).alias(field.name)
        )
    return out.select(*cols)


def read_transcripts(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a transcript table in any supported encoding → canonical schema."""
    if fmt == "parquet":
        return conform_transcripts(spark.read.parquet(path))
    if fmt == "iceberg":
        return conform_transcripts(spark.read.table(path))
    if fmt == "json":
        # JSON-lines with permissive mode: corrupt lines land in
        # _corrupt_record and conform to all-null rows (never raise)
        return conform_transcripts(
            spark.read.schema(transcripts_schema()).json(path)
        )
    if fmt == "csv":
        return conform_transcripts(
            spark.read.options(header=True, mode="PERMISSIVE")
            .schema(transcripts_schema())
            .csv(path)
        )
    raise ValueError(f"unsupported transcript format: {fmt!r}")


def validation_report(df: DataFrame) -> dict:
    """One-pass data-quality counters for an incoming transcript table —
    the ingest-side lineage the pipeline manifest extends."""
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("conv_id").isNull().cast("long")).alias("null_conv_id"),
        F.sum(F.col("turn_idx").isNull().cast("long")).alias("null_turn_idx"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        F.sum(F.col("ts").isNull().cast("long")).alias("null_ts"),
        F.countDistinct("conv_id").alias("n_conversations"),
    ).first()
    return {k: (int(v) if v is not None else 0) for k, v in row.asDict().items()}
