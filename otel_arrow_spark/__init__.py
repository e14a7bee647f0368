"""otel_arrow_spark — a PySpark-native telemetry analytics engine.

A from-scratch rebuild of the capabilities of jmacd/otel-arrow (the OTAP
dataflow engine: receivers → processors → exporters over Arrow record
batches) re-expressed as idiomatic Spark DataFrame pipelines:

    parse → enrich → route → aggregate

over tables of multi-turn conversation/agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Nothing in this package is a translation of the reference's Rust/Go code;
each module cites the reference file whose *behavior* it reproduces and
implements it with stock DataFrame/Catalyst primitives (see SURVEY.md §2).
"""

__version__ = "0.1.0"

from otel_arrow_spark.session import get_spark  # noqa: F401
