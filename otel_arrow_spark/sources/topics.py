"""Topics: in-process pipeline-to-pipeline handoff.

Reference: topic receiver/exporter (receivers/topic_receiver/mod.rs:1,
exporters/topic_exporter/mod.rs:1) — a named in-process pub/sub channel
connecting pipelines. The Spark analog is a named temp view: the publisher
registers its DataFrame (a logical plan, so subscribers compose onto it and
Catalyst optimizes across the boundary), subscribers read it by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TOPIC_PREFIX = "topic_"


def publish_topic(df: DataFrame, name: str) -> None:
    """Publish a DataFrame under a topic name (global temp view)."""
    df.createOrReplaceGlobalTempView(f"{_TOPIC_PREFIX}{name}")


def subscribe_topic(spark: SparkSession, name: str) -> DataFrame:
    """Subscribe to a published topic; composes lazily onto the
    publisher's plan (no materialization at the boundary)."""
    return spark.table(f"global_temp.{_TOPIC_PREFIX}{name}")


def list_topics(spark: SparkSession) -> list[str]:
    return [
        t.name[len(_TOPIC_PREFIX):]
        for t in spark.catalog.listTables("global_temp")
        if t.name.startswith(_TOPIC_PREFIX)
    ]
