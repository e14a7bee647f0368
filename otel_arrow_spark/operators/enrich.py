"""Enrich stage: broadcast-hash dictionary lookups.

Reference analog: otel-arrow's dictionary encoding of attribute columns
(go/pkg/otel/common/arrow/attributes_16.go:64 — small keyed value tables
attached to columns) and the attributes processor's insert/upsert actions
(processors/attributes_processor/mod.rs:77). A dictionary is a small keyed
lookup table; the Spark-native realization is a broadcast hash join — the
dictionary ships to every executor once, the probe stays narrow (no
shuffle), and the join is whole-stage-codegen'd.

Unknown keys enrich to NULL via left join; rows are never dropped
(FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from otel_arrow_spark.sources.transcripts import role_dict_rows, tool_dict_rows

ROLE_DICT_SCHEMA = T.StructType(
    [
        T.StructField("role", T.StringType()),
        T.StructField("role_class", T.StringType()),
        T.StructField("is_human", T.BooleanType()),
    ]
)

TOOL_DICT_SCHEMA = T.StructType(
    [
        T.StructField("tool", T.StringType()),
        T.StructField("tool_family", T.StringType()),
        T.StructField("risk_tier", T.StringType()),
        T.StructField("owner", T.StringType()),
    ]
)


def role_dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(role_dict_rows(), ROLE_DICT_SCHEMA)


def tool_dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(tool_dict_rows(), TOOL_DICT_SCHEMA)


def enrich_with_dict(df: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Left broadcast-join ``df`` against a dictionary table on ``key``.

    ``F.broadcast`` is an explicit hint: dictionary tables must never be
    the shuffled side of a join at 10^12-row scale.
    """
    return df.join(F.broadcast(dim), on=key, how="left")


def enrich(df: DataFrame, spark: SparkSession | None = None) -> DataFrame:
    """Standard transcript enrichment: role dictionary + tool dictionary.

    The tool join keys on the *parsed* tool name (``tool_called``) coalesced
    with the raw ``tool`` column, mirroring the attributes processor's
    upsert-over-existing semantics (attributes_processor/mod.rs:77).
    """
    spark = spark or df.sparkSession
    out = enrich_with_dict(df, role_dict_df(spark), "role")
    tool_key = (
        F.coalesce(F.col("tool_called"), F.col("tool"))
        if "tool_called" in df.columns
        else F.col("tool")
    )
    out = out.withColumn("tool_key", tool_key)
    dim = tool_dict_df(spark).withColumnRenamed("tool", "tool_key")
    return out.join(F.broadcast(dim), on="tool_key", how="left").drop("tool_key")
