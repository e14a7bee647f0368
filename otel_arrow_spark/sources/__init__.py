"""Sources: deterministic synthetic transcript generation and table readers.

Reference analogs: the traffic generator receiver
(rust/otap-dataflow/crates/core-nodes/src/receivers/traffic_generator/mod.rs:1)
and the Go datagen package (go/pkg/datagen/logs.go:24-31) — seeded synthetic
data feeding logical-equivalence oracles.
"""

from otel_arrow_spark.sources.transcripts import (  # noqa: F401
    generate_transcripts_pandas,
    role_dict_rows,
    tool_dict_rows,
    transcripts_schema,
    write_transcripts_parquet,
)
