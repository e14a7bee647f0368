"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (mirrors how the reference treats payloads it does not interpret —
OtapPdata carries raw OTLP bytes lazily, converting only when touched,
rust/otap-dataflow/README.md:63-80): media is an opaque ``binary`` column
plus a typed metadata struct; all Spark-side plumbing (schema, batch
shaping, partition sizing) is real, while the codec step is a pluggable
Arrow-batched function. In this container no image/audio libraries exist,
so the default codec is a clearly-marked deterministic fake; swapping in
PIL/torchaudio is a one-function change, not a pipeline change.

Scale notes: binary payloads dominate row size → ``media_repartition``
targets a bytes-per-partition budget instead of a row count, and decode
runs in ``mapInPandas`` so one task streams Arrow batches without
materializing the whole partition.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive cheap metadata (size, magic-byte sniffed mime) without
    decoding — pure expressions over the binary column."""
    p = F.col(payload_col)
    mime = (
        F.when(F.startswith(p, F.lit(bytes([0xFF, 0xD8, 0xFF]))), "image/jpeg")
        .when(F.startswith(p, F.lit(b"\x89PNG")), "image/png")
        .when(F.startswith(p, F.lit(b"RIFF")), "audio/wav")
        .otherwise("application/octet-stream")
    )
    return df.withColumns({"n_bytes": F.length(p).cast("long"), "mime_sniffed": mime})


def media_repartition(
    df: DataFrame,
    payload_col: str,
    target_partition_bytes: int,
    total_bytes: int | None = None,
) -> DataFrame:
    """Repartition by payload volume, not row count (the batch-split-by-size
    analog, pdata/src/otap/transform/split.rs:57).

    Sizing never scans the data: the caller may pass ``total_bytes``
    (e.g. from a catalog), otherwise the scan's input files are stat'ed
    from filesystem metadata — local files via os.stat, remote schemes
    (s3a/hdfs/abfs/…) via the Hadoop FileSystem metadata RPC
    (scanmeta.input_file_sizes) — binary payloads dominate the file bytes
    and barely compress, so file size is a faithful estimate. When neither
    is available (in-memory relation) the default parallelism is used. No
    Spark job runs either way; the byte-sum aggregate this replaces was a
    full extra pass over the heaviest column.
    """
    if total_bytes is None:
        from otel_arrow_spark.scanmeta import input_file_sizes

        total_bytes = sum(s for _, s in input_file_sizes(df))
    if total_bytes > 0:
        n = max(1, int(total_bytes // target_partition_bytes) + 1)
    else:
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def _fake_image_decode(payload: bytes, dim: int) -> list[float]:
    """STUB codec — deterministic fake. Replace with a real decoder (PIL
    etc.) in production; deliberately NOT importable libs in this
    container. Features derive from byte histogram so they are stable
    and content-dependent."""
    hist = [0] * dim
    for i, b in enumerate(payload[:4096]):
        hist[(b + i) % dim] += 1
    s = sum(hist) or 1
    return [h / s for h in hist]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 16,
    codec: Callable[[bytes, int], list[float]] | None = None,
) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    ``codec`` is the pluggable decode step; the default is the deterministic
    fake above. The Arrow batch shape (binary column in, float array out)
    is exactly what a real decoder needs — tested end-to-end.
    """
    import pandas as pd

    the_codec = codec or _fake_image_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "feature": pdf[payload_col].map(lambda b: the_codec(bytes(b), dim)),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int, duration_col: str = "duration_ms"
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (explode of a sequence) — the decode of each frame is the stubbed codec
    step. Demonstrates the fan-out shape without a video library."""
    n_frames = (F.col(duration_col) / every_ms).cast("int")
    last_ts = F.greatest(n_frames - 1, F.lit(0)) * every_ms
    return df.withColumn(
        "frame_ts_ms", F.explode(F.sequence(F.lit(0), last_ts, F.lit(every_ms)))
    )
