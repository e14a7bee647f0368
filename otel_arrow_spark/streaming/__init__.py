"""Structured Streaming variants of the pipeline (SURVEY.md §2.11).

The reference's streaming semantics — micro-batch flush triggers
(batch_processor), tumbling-window temporal reaggregation, WAL-backed
durable buffering, stream-cardinality caps — map onto Structured
Streaming's trigger intervals, window()+watermark aggregation,
checkpointLocation, and applyInPandasWithState respectively.
"""

from otel_arrow_spark.streaming.jobs import (  # noqa: F401
    stream_pipeline,
    stream_temporal_reaggregation,
    stream_transcripts_source,
)
