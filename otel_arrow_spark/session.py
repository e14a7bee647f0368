"""SparkSession factory with the engine's standard configuration profile.

The reference engine is thread-per-core shared-nothing with explicit batch
sizing (rust/otap-dataflow/README.md:52-58; batching.rs:12-33). The Spark
analog is: AQE on (runtime re-planning ≈ the reference's lazy replanning,
query-engine/src/pipeline.rs:44-63), shuffle partitions sized to cores,
Arrow-batched Python I/O for the vectorized UDF path, and broadcast joins
for dictionary-sized lookups.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the sandbox (local[32], 128 GiB). On a real cluster these are
# overridden by spark-submit conf; the session-level defaults below are the
# ones that matter for plan shape (AQE, broadcast threshold, Arrow batching),
# not sizing.
_PLAN_SHAPE_CONF = {
    # AQE: runtime partition coalescing + skew-join splitting. This is the
    # Spark-native answer to the reference's batch split/concatenate kernels
    # (pdata/src/otap/transform/{split,concatenate}.rs) and its hot-key
    # partition processor (processors/partition_processor/mod.rs:1).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dictionary-sized enrich tables must broadcast, never shuffle.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow transfer for pandas UDFs (the vectorized parse path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Deterministic timestamp semantics.
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "otel-arrow-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine profile.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in the sandbox; on a cluster pass ``None`` and let spark-submit decide.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    if master.startswith("local"):
        # In local mode the driver JVM is the executor. The 1g default heap
        # thrashes GC at bench scale — but oversizing is far worse: a 48g
        # G1 heap spent 60-70% of the machine in kernel time (lazy
        # first-touch page faults + region management), tripling wall time
        # versus 8g on identical runs. Size to the working set.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )

    if shuffle_partitions is None:
        # local[N] → N shuffle partitions: one reducer per core, mirroring
        # the reference's one-runtime-per-core layout (engine/README.md:10-18).
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else int(n)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))

    for k, v in _PLAN_SHAPE_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
