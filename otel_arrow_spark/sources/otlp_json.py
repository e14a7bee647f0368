"""OTLP/JSON logs ingestion: ExportLogsServiceRequest payloads → flat rows.

The reference's entire input side is OTLP — its receivers decode
ResourceLogs / ScopeLogs / LogRecord batches into columns
(rust/otap-dataflow/crates/pdata/src/views/otlp/proto/logs.rs:154-220:
time_unix_nano, severity_number, severity_text, body, attributes,
dropped_attributes_count, trace_id, span_id; go/pkg/otel/logs/otlp/logs.go
is the Arrow→OTLP inverse). This module is the Spark-native equivalent for
the protocol's public JSON encoding (OTLP/JSON, the collector's HTTP
encoding): one `from_json` with a typed schema plus three `explode`s —
pure JVM expression work inside whole-stage codegen, zero Python on the
hot path. The nested-batch → flat-rows unnest is exactly the reference's
"row-oriented OTLP → columnar" step, with Catalyst doing the decoding.

Proto3 JSON mapping notes baked into the schema (public protobuf spec):
* field names are lowerCamelCase (`resourceLogs`, `timeUnixNano`);
* int64/uint64 (`timeUnixNano`, AnyValue `intValue`) arrive as JSON
  *strings* — declared STRING here and cast to BIGINT after parse;
* absent fields (empty trace/span ids, zero dropped counts) are omitted
  from the wire entirely and surface as NULL.

Generation is the same deterministic-corpus pattern as sources/syslog.py:
a seeded numpy/pandas builder whose parquet output both the Spark path and
the DuckDB oracle read, so cross-engine comparison sees identical bytes.
"""

from __future__ import annotations

import json

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SERVICES = [f"service_{k}" for k in range(8)]
ENVIRONMENTS = ["prod", "staging"]
SCOPES = [("app", "1.0.0"), ("db", "2.3.1"), ("net", "0.9.7")]
SEVERITIES = [(9, "INFO"), (13, "WARN"), (17, "ERROR"), (5, "DEBUG"), (21, "FATAL")]
BODY_WORDS = (
    "accepted rejected retried flushed routed enriched parsed dropped "
    "buffered acked committed replayed"
).split()

# epoch 2026-01-01T00:00:00Z in nanoseconds
_EPOCH_NANOS = 1_767_225_600_000_000_000


def _kv_str(key: str, val: str) -> dict:
    return {"key": key, "value": {"stringValue": val}}


def _kv_int(key: str, val: int) -> dict:
    # proto3 JSON: int64 AnyValue serializes as a quoted string
    return {"key": key, "value": {"intValue": str(val)}}


def generate_otlp_json_requests(n_records: int, seed: int = 42) -> list[str]:
    """Deterministic ExportLogsServiceRequest JSON payloads totalling
    exactly ``n_records`` LogRecords, batched 4-24 records per request
    (the reference's traffic_generator produces the same shape on the
    wire, core-nodes/src/receivers/traffic_generator/producer.rs)."""
    rng = np.random.RandomState(seed)

    sizes: list[int] = []
    left = n_records
    while left > 0:
        s = int(rng.randint(4, 25))
        sizes.append(min(s, left))
        left -= min(s, left)

    n = n_records
    svc = rng.randint(0, len(SERVICES), size=len(sizes))
    env = rng.randint(0, 2, size=len(sizes))
    scope_pick = rng.randint(0, len(SCOPES), size=n)
    sev_pick = rng.randint(0, len(SEVERITIES), size=n)
    body_pick = rng.randint(0, len(BODY_WORDS), size=(n, 3))
    t_off = np.cumsum(rng.randint(1_000, 5_000_000, size=n).astype(np.int64))
    has_trace = rng.random_sample(n) < 0.7
    has_dropped = rng.random_sample(n) < 0.1
    dropped = rng.randint(1, 9, size=n)
    hexd = np.array(list("0123456789abcdef"))
    tr = rng.randint(0, 16, size=(n, 32))
    sp = rng.randint(0, 16, size=(n, 16))

    out: list[str] = []
    rec_i = 0
    for req_i, size in enumerate(sizes):
        records = []
        for _ in range(size):
            i = rec_i
            sev_no, sev_txt = SEVERITIES[sev_pick[i]]
            rec = {
                "timeUnixNano": str(_EPOCH_NANOS + int(t_off[i])),
                "severityNumber": sev_no,
                "severityText": sev_txt,
                "body": {
                    "stringValue": " ".join(
                        BODY_WORDS[w] for w in body_pick[i]
                    )
                },
                "attributes": [
                    _kv_str("event.domain", "pipeline"),
                    _kv_int("event.index", i),
                ],
            }
            if has_trace[i]:
                rec["traceId"] = "".join(hexd[tr[i]])
                rec["spanId"] = "".join(hexd[sp[i]])
            if has_dropped[i]:
                rec["droppedAttributesCount"] = int(dropped[i])
            records.append(rec)
            rec_i += 1
        # split each request's records across 1-2 scopes deterministically
        n_scopes = 1 + (req_i % 2)
        cut = len(records) // 2 if n_scopes == 2 else len(records)
        scope_logs = []
        for s_i, chunk in enumerate([records[:cut], records[cut:]][:n_scopes]):
            if not chunk:
                continue
            name, ver = SCOPES[(scope_pick[rec_i - 1] + s_i) % len(SCOPES)]
            scope_logs.append(
                {"scope": {"name": name, "version": ver}, "logRecords": chunk}
            )
        req = {
            "resourceLogs": [
                {
                    "resource": {
                        "attributes": [
                            _kv_str("service.name", SERVICES[svc[req_i]]),
                            _kv_str(
                                "deployment.environment",
                                ENVIRONMENTS[env[req_i]],
                            ),
                        ]
                    },
                    "scopeLogs": scope_logs,
                }
            ]
        }
        out.append(json.dumps(req, separators=(",", ":")))
    return out


def _anyvalue_struct() -> T.StructType:
    # the AnyValue oneof's sparse-union analog: one nullable field per
    # branch actually used by the corpus (from_json leaves absent ones NULL)
    return T.StructType(
        [
            T.StructField("stringValue", T.StringType()),
            T.StructField("intValue", T.StringType()),  # int64 → JSON string
        ]
    )


def _kv_list() -> T.ArrayType:
    return T.ArrayType(
        T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField("value", _anyvalue_struct()),
            ]
        )
    )


OTLP_EXPORT_LOGS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceLogs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType(
                                [T.StructField("attributes", _kv_list())]
                            ),
                        ),
                        T.StructField(
                            "scopeLogs",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "name", T.StringType()
                                                    ),
                                                    T.StructField(
                                                        "version",
                                                        T.StringType(),
                                                    ),
                                                ]
                                            ),
                                        ),
                                        T.StructField(
                                            "logRecords",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "timeUnixNano",
                                                            T.StringType(),
                                                        ),
                                                        T.StructField(
                                                            "severityNumber",
                                                            T.IntegerType(),
                                                        ),
                                                        T.StructField(
                                                            "severityText",
                                                            T.StringType(),
                                                        ),
                                                        T.StructField(
                                                            "body",
                                                            _anyvalue_struct(),
                                                        ),
                                                        T.StructField(
                                                            "attributes",
                                                            _kv_list(),
                                                        ),
                                                        T.StructField(
                                                            "traceId",
                                                            T.StringType(),
                                                        ),
                                                        T.StructField(
                                                            "spanId",
                                                            T.StringType(),
                                                        ),
                                                        T.StructField(
                                                            "droppedAttributesCount",
                                                            T.IntegerType(),
                                                        ),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _attr(entries, key: str):
    """First value for ``key`` in a KeyValue list — string branch first,
    int branch as fallback (the corpus never uses both on one key).
    ``F.get`` (not ``[0]``) so an absent key or empty attribute list is
    NULL instead of an ANSI INVALID_ARRAY_INDEX error."""
    hit = F.get(F.filter(entries, lambda a: a["key"] == F.lit(key)), 0)["value"]
    return F.coalesce(hit["stringValue"], hit["intValue"])


def parse_otlp_json(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode a column of OTLP/JSON ExportLogsServiceRequest payloads into
    one flat row per LogRecord.

    Plan shape: `from_json` → 3 nested `explode`s (Generate nodes) → one
    projection; everything stays in whole-stage codegen, and the explode
    fan-out is bounded by the request batch size, never the corpus. At
    100 TB this is a scan-side decode with no shuffle at all — the exact
    role of the reference's OTLP receiver (views/otlp/proto/logs.rs).
    """
    req = F.from_json(F.col(payload_col), OTLP_EXPORT_LOGS_SCHEMA)
    rl = df.withColumn("_rl", F.explode(req["resourceLogs"]))
    sl = rl.select(
        F.col("_rl")["resource"]["attributes"].alias("_res_attrs"),
        F.explode(F.col("_rl")["scopeLogs"]).alias("_sl"),
    )
    rec = sl.select(
        "_res_attrs",
        F.col("_sl")["scope"]["name"].alias("scope_name"),
        F.col("_sl")["scope"]["version"].alias("scope_version"),
        F.explode(F.col("_sl")["logRecords"]).alias("_rec"),
    )
    r = F.col("_rec")
    return rec.select(
        _attr(F.col("_res_attrs"), "service.name").alias("service_name"),
        _attr(F.col("_res_attrs"), "deployment.environment").alias(
            "environment"
        ),
        "scope_name",
        "scope_version",
        r["timeUnixNano"].cast("long").alias("time_unix_nano"),
        r["severityNumber"].alias("severity_number"),
        r["severityText"].alias("severity_text"),
        r["body"]["stringValue"].alias("body"),
        r["traceId"].alias("trace_id"),
        r["spanId"].alias("span_id"),
        F.coalesce(r["droppedAttributesCount"], F.lit(0)).alias(
            "dropped_attributes_count"
        ),
        _attr(r["attributes"], "event.index").cast("long").alias(
            "event_index"
        ),
        F.map_from_entries(
            F.transform(
                r["attributes"],
                lambda a: F.struct(
                    a["key"].alias("key"),
                    F.coalesce(
                        a["value"]["stringValue"], a["value"]["intValue"]
                    ).alias("value"),
                ),
            )
        ).alias("attributes"),
    )


# --- traces ------------------------------------------------------------------

SPAN_NAMES = ["GET /api", "POST /ingest", "db.query", "cache.get", "publish"]
# proto SpanKind: INTERNAL=1 SERVER=2 CLIENT=3 PRODUCER=4 CONSUMER=5
SPAN_KINDS = [1, 2, 3, 4, 5]


def generate_otlp_json_trace_requests(n_spans: int, seed: int = 43) -> list[str]:
    """Deterministic ExportTraceServiceRequest payloads totalling exactly
    ``n_spans`` spans (views/otlp/proto/trace.rs:203: the span field set).
    Each request is one trace: a root span plus children whose parent is a
    uniformly chosen earlier span in the same request — small trees, the
    shape the trace-assembly operators consume."""
    rng = np.random.RandomState(seed)

    sizes: list[int] = []
    left = n_spans
    while left > 0:
        s = int(rng.randint(2, 13))
        sizes.append(min(s, left))
        left -= min(s, left)

    n = n_spans
    svc = rng.randint(0, len(SERVICES), size=len(sizes))
    scope_pick = rng.randint(0, len(SCOPES), size=len(sizes))
    name_pick = rng.randint(0, len(SPAN_NAMES), size=n)
    kind_pick = rng.randint(0, len(SPAN_KINDS), size=n)
    start_off = np.cumsum(rng.randint(1_000, 2_000_000, size=n).astype(np.int64))
    dur = rng.randint(10_000, 500_000_000, size=n).astype(np.int64)
    is_error = rng.random_sample(n) < 0.08
    hexd = np.array(list("0123456789abcdef"))
    tr = rng.randint(0, 16, size=(len(sizes), 32))
    sp = rng.randint(0, 16, size=(n, 16))
    parent_pick = rng.randint(0, 1 << 30, size=n)

    out: list[str] = []
    span_i = 0
    for req_i, size in enumerate(sizes):
        trace_id = "".join(hexd[tr[req_i]])
        span_ids = ["".join(hexd[sp[span_i + k]]) for k in range(size)]
        spans = []
        for k in range(size):
            i = span_i + k
            span = {
                "traceId": trace_id,
                "spanId": span_ids[k],
                "name": SPAN_NAMES[name_pick[i]],
                "kind": SPAN_KINDS[kind_pick[i]],
                "startTimeUnixNano": str(_EPOCH_NANOS + int(start_off[i])),
                "endTimeUnixNano": str(_EPOCH_NANOS + int(start_off[i]) + int(dur[i])),
                "attributes": [
                    _kv_str("peer.service", SERVICES[(svc[req_i] + 1) % len(SERVICES)]),
                    _kv_int("span.seq", i),
                ],
                "status": (
                    {"code": 2, "message": "error"} if is_error[i] else {"code": 1}
                ),
            }
            if k > 0:  # root omits parentSpanId (proto3 omits empties)
                span["parentSpanId"] = span_ids[parent_pick[i] % k]
            spans.append(span)
        name, ver = SCOPES[scope_pick[req_i]]
        out.append(
            json.dumps(
                {
                    "resourceSpans": [
                        {
                            "resource": {
                                "attributes": [
                                    _kv_str("service.name", SERVICES[svc[req_i]])
                                ]
                            },
                            "scopeSpans": [
                                {
                                    "scope": {"name": name, "version": ver},
                                    "spans": spans,
                                }
                            ],
                        }
                    ]
                },
                separators=(",", ":"),
            )
        )
        span_i += size
    return out


OTLP_EXPORT_TRACES_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceSpans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", _kv_list())]),
                        ),
                        T.StructField(
                            "scopeSpans",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField("name", T.StringType()),
                                                    T.StructField("version", T.StringType()),
                                                ]
                                            ),
                                        ),
                                        T.StructField(
                                            "spans",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("traceId", T.StringType()),
                                                        T.StructField("spanId", T.StringType()),
                                                        T.StructField("parentSpanId", T.StringType()),
                                                        T.StructField("name", T.StringType()),
                                                        T.StructField("kind", T.IntegerType()),
                                                        T.StructField("startTimeUnixNano", T.StringType()),
                                                        T.StructField("endTimeUnixNano", T.StringType()),
                                                        T.StructField("attributes", _kv_list()),
                                                        T.StructField(
                                                            "status",
                                                            T.StructType(
                                                                [
                                                                    T.StructField("code", T.IntegerType()),
                                                                    T.StructField("message", T.StringType()),
                                                                ]
                                                            ),
                                                        ),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def parse_otlp_traces_json(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode OTLP/JSON ExportTraceServiceRequest payloads into one flat
    row per span — the traces twin of :func:`parse_otlp_json`, same
    zero-Python zero-shuffle scan-side plan. ``status.code`` defaults to
    0 (UNSET) when omitted, per the proto3 default; a missing
    ``parentSpanId`` stays NULL (root span)."""
    req = F.from_json(F.col(payload_col), OTLP_EXPORT_TRACES_SCHEMA)
    rs = df.withColumn("_rs", F.explode(req["resourceSpans"]))
    ss = rs.select(
        F.col("_rs")["resource"]["attributes"].alias("_res_attrs"),
        F.explode(F.col("_rs")["scopeSpans"]).alias("_ss"),
    )
    sp = ss.select(
        "_res_attrs",
        F.col("_ss")["scope"]["name"].alias("scope_name"),
        F.col("_ss")["scope"]["version"].alias("scope_version"),
        F.explode(F.col("_ss")["spans"]).alias("_sp"),
    )
    s = F.col("_sp")
    start = s["startTimeUnixNano"].cast("long")
    end = s["endTimeUnixNano"].cast("long")
    return sp.select(
        _attr(F.col("_res_attrs"), "service.name").alias("service_name"),
        "scope_name",
        "scope_version",
        s["traceId"].alias("trace_id"),
        s["spanId"].alias("span_id"),
        s["parentSpanId"].alias("parent_span_id"),
        s["name"].alias("name"),
        s["kind"].alias("kind"),
        start.alias("start_unix_nano"),
        end.alias("end_unix_nano"),
        (end - start).alias("duration_ns"),
        F.coalesce(s["status"]["code"], F.lit(0)).alias("status_code"),
        s["status"]["message"].alias("status_message"),
        _attr(s["attributes"], "peer.service").alias("peer_service"),
        _attr(s["attributes"], "span.seq").cast("long").alias("span_seq"),
    )


# --- metrics ------------------------------------------------------------------

# (name, unit, kind); kind picks the Metric `data` oneof branch
METRIC_DEFS = [
    ("system.cpu.time", "s", "sum"),
    ("http.server.request.count", "1", "sum"),
    ("process.memory.usage", "By", "gauge"),
    ("system.disk.io_ratio", "1", "gauge"),
    ("http.server.duration", "ms", "histogram"),
    ("db.client.latency", "ms", "histogram"),
    ("rpc.server.duration", "ms", "exp_histogram"),
    ("http.client.request.size", "By", "summary"),
]
HIST_BOUNDS = [5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 500.0, 1000.0]
# proto AggregationTemporality: DELTA=1 CUMULATIVE=2
TEMPORALITIES = [1, 2]


def generate_otlp_json_metric_requests(n_points: int, seed: int = 44) -> list[str]:
    """Deterministic ExportMetricsServiceRequest payloads totalling exactly
    ``n_points`` data points across all five Metric `data` oneof branches —
    gauge / sum / histogram / exponentialHistogram / summary
    (views/otlp/proto/metrics.rs:10-110: the NumberDataPoint /
    HistogramDataPoint / ExponentialHistogramDataPoint / SummaryDataPoint
    view field sets). Per the OTLP/JSON spec: uint64 fields
    (`timeUnixNano`, `asInt`, `count`, `bucketCounts`, `zeroCount`)
    serialize as JSON strings, enums (`aggregationTemporality`) as
    integers, and absent oneof branches / empty sub-messages (a
    zero-bucket `negative` side) are omitted entirely."""
    rng = np.random.RandomState(seed)

    sizes: list[int] = []
    left = n_points
    while left > 0:
        s = int(rng.randint(3, 13))
        sizes.append(min(s, left))
        left -= min(s, left)

    n = n_points
    svc = rng.randint(0, len(SERVICES), size=len(sizes))
    scope_pick = rng.randint(0, len(SCOPES), size=len(sizes))
    mdef_pick = rng.randint(0, len(METRIC_DEFS), size=len(sizes))
    temp_pick = rng.randint(0, 2, size=len(sizes))
    # ~0.5 s mean step: 20k points span ~3 h, so minute-windowed
    # downstream reaggregation sees hundreds of windows, not one
    t_off = np.cumsum(rng.randint(1_000, 1_000_000_000, size=n).astype(np.int64))
    dval = np.round(rng.random_sample(n) * 1000.0, 3)
    ival = rng.randint(0, 1 << 40, size=n)
    use_int = rng.random_sample(n) < 0.4
    bkt = rng.randint(0, 500, size=(n, len(HIST_BOUNDS) + 1))
    exp_scale = rng.randint(0, 5, size=len(sizes))

    out: list[str] = []
    pt_i = 0
    for req_i, size in enumerate(sizes):
        name, unit, kind = METRIC_DEFS[mdef_pick[req_i]]
        pts = []
        for k in range(size):
            i = pt_i + k
            pt: dict = {
                "timeUnixNano": str(_EPOCH_NANOS + int(t_off[i])),
                "attributes": [
                    _kv_str("host.name", f"host-{i % 17:02d}"),
                    _kv_int("point.seq", i),
                ],
            }
            if kind == "histogram":
                counts = bkt[i]
                pt["count"] = str(int(counts.sum()))
                pt["sum"] = float(np.round(counts.sum() * dval[i] / 100.0, 3))
                pt["bucketCounts"] = [str(int(c)) for c in counts]
                pt["explicitBounds"] = HIST_BOUNDS
            elif kind == "exp_histogram":
                counts = bkt[i][:6]
                zero = int(bkt[i][6] % 50)
                pt["count"] = str(int(counts.sum()) + zero)
                pt["sum"] = float(np.round(counts.sum() * dval[i] / 100.0, 3))
                pt["scale"] = int(exp_scale[req_i])
                pt["zeroCount"] = str(zero)
                # durations are positive: the negative side is the empty
                # message, omitted from the wire per proto3 JSON
                pt["positive"] = {
                    "offset": int(ival[i] % 10),
                    "bucketCounts": [str(int(c)) for c in counts],
                }
            elif kind == "summary":
                pt["count"] = str(int(bkt[i].sum()))
                pt["sum"] = float(np.round(bkt[i].sum() * dval[i] / 100.0, 3))
                pt["quantileValues"] = [
                    {"quantile": 0.5, "value": float(np.round(dval[i] * 0.5, 3))},
                    {"quantile": 0.9, "value": float(np.round(dval[i] * 0.9, 3))},
                    {"quantile": 0.99, "value": float(np.round(dval[i] * 0.99, 3))},
                ]
            elif use_int[i]:
                pt["asInt"] = str(int(ival[i]))
            else:
                pt["asDouble"] = float(dval[i])
            pts.append(pt)
        pt_i += size

        metric: dict = {"name": name, "unit": unit}
        if kind == "gauge":
            metric["gauge"] = {"dataPoints": pts}
        elif kind == "sum":
            metric["sum"] = {
                "dataPoints": pts,
                "aggregationTemporality": TEMPORALITIES[temp_pick[req_i]],
                "isMonotonic": name.endswith(("count", "time")),
            }
        elif kind == "exp_histogram":
            metric["exponentialHistogram"] = {
                "dataPoints": pts,
                "aggregationTemporality": TEMPORALITIES[temp_pick[req_i]],
            }
        elif kind == "summary":
            metric["summary"] = {"dataPoints": pts}
        else:
            metric["histogram"] = {
                "dataPoints": pts,
                "aggregationTemporality": TEMPORALITIES[temp_pick[req_i]],
            }
        s_name, s_ver = SCOPES[scope_pick[req_i]]
        out.append(
            json.dumps(
                {
                    "resourceMetrics": [
                        {
                            "resource": {
                                "attributes": [
                                    _kv_str("service.name", SERVICES[svc[req_i]])
                                ]
                            },
                            "scopeMetrics": [
                                {
                                    "scope": {"name": s_name, "version": s_ver},
                                    "metrics": [metric],
                                }
                            ],
                        }
                    ]
                },
                separators=(",", ":"),
            )
        )
    return out


def _number_dp_schema() -> T.ArrayType:
    return T.ArrayType(
        T.StructType(
            [
                T.StructField("timeUnixNano", T.StringType()),
                T.StructField("asDouble", T.DoubleType()),
                T.StructField("asInt", T.StringType()),  # uint64 → JSON string
                T.StructField("attributes", _kv_list()),
            ]
        )
    )


METRIC_BRANCHES = ("gauge", "sum", "histogram", "exp_histogram", "summary")


def _metrics_schema(branches: tuple[str, ...]) -> T.StructType:
    """The ExportMetricsServiceRequest read schema restricted to the
    requested Metric-oneof ``branches``. from_json skips JSON subtrees
    absent from the schema without materializing them, so a
    single-branch consumer (e.g. a histogram pipeline) decodes ~3x
    faster than through the full five-branch schema — the from_json
    analog of parquet column pruning (guide §6: pruning must reach the
    scan; Catalyst's JSON schema pruning cannot see through the
    generator chain, so the caller states its branches)."""
    metric_fields = [
        T.StructField("name", T.StringType()),
        T.StructField("unit", T.StringType()),
    ]
    if "gauge" in branches:
        metric_fields.append(
            T.StructField(
                "gauge",
                T.StructType([T.StructField("dataPoints", _number_dp_schema())]),
            )
        )
    if "sum" in branches:
        metric_fields.append(
            T.StructField(
                "sum",
                T.StructType(
                    [
                        T.StructField("dataPoints", _number_dp_schema()),
                        T.StructField("aggregationTemporality", T.IntegerType()),
                        T.StructField("isMonotonic", T.BooleanType()),
                    ]
                ),
            )
        )
    if "histogram" in branches:
        metric_fields.append(
            T.StructField(
                "histogram",
                T.StructType(
                    [
                        T.StructField(
                            "dataPoints",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("timeUnixNano", T.StringType()),
                                        T.StructField("count", T.StringType()),
                                        T.StructField("sum", T.DoubleType()),
                                        T.StructField("bucketCounts", T.ArrayType(T.StringType())),
                                        T.StructField("explicitBounds", T.ArrayType(T.DoubleType())),
                                        T.StructField("attributes", _kv_list()),
                                    ]
                                )
                            ),
                        ),
                        T.StructField("aggregationTemporality", T.IntegerType()),
                    ]
                ),
            )
        )
    if "exp_histogram" in branches:
        metric_fields.append(
            T.StructField(
                "exponentialHistogram",
                T.StructType(
                    [
                        T.StructField(
                            "dataPoints",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("timeUnixNano", T.StringType()),
                                        T.StructField("count", T.StringType()),
                                        T.StructField("sum", T.DoubleType()),
                                        T.StructField("scale", T.IntegerType()),
                                        T.StructField("zeroCount", T.StringType()),
                                        T.StructField(
                                            "positive",
                                            T.StructType(
                                                [
                                                    T.StructField("offset", T.IntegerType()),
                                                    T.StructField("bucketCounts", T.ArrayType(T.StringType())),
                                                ]
                                            ),
                                        ),
                                        T.StructField("attributes", _kv_list()),
                                    ]
                                )
                            ),
                        ),
                        T.StructField("aggregationTemporality", T.IntegerType()),
                    ]
                ),
            )
        )
    if "summary" in branches:
        metric_fields.append(
            T.StructField(
                "summary",
                T.StructType(
                    [
                        T.StructField(
                            "dataPoints",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("timeUnixNano", T.StringType()),
                                        T.StructField("count", T.StringType()),
                                        T.StructField("sum", T.DoubleType()),
                                        T.StructField(
                                            "quantileValues",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("quantile", T.DoubleType()),
                                                        T.StructField("value", T.DoubleType()),
                                                    ]
                                                )
                                            ),
                                        ),
                                        T.StructField("attributes", _kv_list()),
                                    ]
                                )
                            ),
                        ),
                    ]
                ),
            )
        )
    return T.StructType(
        [
            T.StructField(
                "resourceMetrics",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "resource",
                                T.StructType([T.StructField("attributes", _kv_list())]),
                            ),
                            T.StructField(
                                "scopeMetrics",
                                T.ArrayType(
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "scope",
                                                T.StructType(
                                                    [
                                                        T.StructField("name", T.StringType()),
                                                        T.StructField("version", T.StringType()),
                                                    ]
                                                ),
                                            ),
                                            T.StructField(
                                                "metrics",
                                                T.ArrayType(T.StructType(metric_fields)),
                                            ),
                                        ]
                                    )
                                ),
                            ),
                        ]
                    )
                ),
            )
        ]
    )


OTLP_EXPORT_METRICS_SCHEMA = _metrics_schema(METRIC_BRANCHES)


def parse_otlp_metrics_json(
    df: DataFrame,
    payload_col: str = "payload",
    branches: tuple[str, ...] = METRIC_BRANCHES,
) -> DataFrame:
    """Decode OTLP/JSON ExportMetricsServiceRequest payloads into one flat
    row per data point, across all five Metric `data` oneof branches
    (gauge / sum / histogram / exponentialHistogram / summary).

    The oneof is normalized scan-side: each branch's dataPoints array is
    `transform`ed into ONE common point struct (number branches fill the
    value field, histogram fills count/sum/buckets, exp-histogram fills
    scale/zero/positive-side, summary fills the quantile snapshot) and
    the five are `concat`ed, so a single `explode` handles every metric
    kind — still from_json + 4 Generates, zero shuffle, zero Python,
    exactly like the logs/traces decoders. Branch tags: metric_type from
    whichever oneof field is non-NULL; temporality/monotonic NULL where
    the proto lacks them (gauge, summary).

    ``branches`` restricts BOTH the from_json read schema and the point
    normalization to the named oneof branches: a consumer that only needs
    one metric kind (a histogram-percentile pipeline, say) skips decoding
    the other four subtrees entirely — measured ~3x on the decode.
    Points of excluded branches simply never materialize (their
    dataPoints are absent from the schema), so filtering on
    ``metric_type`` after a restricted decode equals filtering after the
    full decode. Output schema is identical for every branch choice."""
    _dn = F.lit(None).cast("double")
    _ln = F.lit(None).cast("long")
    _in = F.lit(None).cast("int")
    _an = F.lit(None).cast("array<bigint>")
    _bn = F.lit(None).cast("array<double>")
    _qn = F.lit(None).cast("array<struct<quantile:double,value:double>>")

    def _num_pt(p):
        return F.struct(
            p["timeUnixNano"].alias("t"),
            F.coalesce(p["asDouble"], p["asInt"].cast("double")).alias("value"),
            _ln.alias("count"),
            _dn.alias("sum"),
            _an.alias("bucket_counts"),
            _bn.alias("explicit_bounds"),
            _in.alias("scale"),
            _ln.alias("zero_count"),
            _in.alias("pos_offset"),
            _an.alias("pos_bucket_counts"),
            _qn.alias("quantiles"),
            p["attributes"].alias("attrs"),
        )

    def _hist_pt(p):
        return F.struct(
            p["timeUnixNano"].alias("t"),
            _dn.alias("value"),
            p["count"].cast("long").alias("count"),
            p["sum"].alias("sum"),
            F.transform(p["bucketCounts"], lambda c: c.cast("long")).alias(
                "bucket_counts"
            ),
            p["explicitBounds"].alias("explicit_bounds"),
            _in.alias("scale"),
            _ln.alias("zero_count"),
            _in.alias("pos_offset"),
            _an.alias("pos_bucket_counts"),
            _qn.alias("quantiles"),
            p["attributes"].alias("attrs"),
        )

    def _exp_pt(p):
        return F.struct(
            p["timeUnixNano"].alias("t"),
            _dn.alias("value"),
            p["count"].cast("long").alias("count"),
            p["sum"].alias("sum"),
            _an.alias("bucket_counts"),
            _bn.alias("explicit_bounds"),
            p["scale"].alias("scale"),
            p["zeroCount"].cast("long").alias("zero_count"),
            p["positive"]["offset"].alias("pos_offset"),
            F.transform(
                p["positive"]["bucketCounts"], lambda c: c.cast("long")
            ).alias("pos_bucket_counts"),
            _qn.alias("quantiles"),
            p["attributes"].alias("attrs"),
        )

    def _summary_pt(p):
        return F.struct(
            p["timeUnixNano"].alias("t"),
            _dn.alias("value"),
            p["count"].cast("long").alias("count"),
            p["sum"].alias("sum"),
            _an.alias("bucket_counts"),
            _bn.alias("explicit_bounds"),
            _in.alias("scale"),
            _ln.alias("zero_count"),
            _in.alias("pos_offset"),
            _an.alias("pos_bucket_counts"),
            p["quantileValues"].alias("quantiles"),
            p["attributes"].alias("attrs"),
        )

    _empty = F.array().cast(
        "array<struct<t:string,value:double,count:bigint,sum:double,"
        "bucket_counts:array<bigint>,explicit_bounds:array<double>,"
        "scale:int,zero_count:bigint,pos_offset:int,"
        "pos_bucket_counts:array<bigint>,"
        "quantiles:array<struct<quantile:double,value:double>>,"
        "attrs:array<struct<key:string,value:struct<stringValue:string,intValue:string>>>>>"
    )

    unknown = set(branches) - set(METRIC_BRANCHES)
    if unknown:
        raise ValueError(f"unknown metric branches: {sorted(unknown)}")
    if not branches:
        raise ValueError("at least one metric branch is required")
    req = F.from_json(F.col(payload_col), _metrics_schema(branches))
    rm = df.withColumn("_rm", F.explode(req["resourceMetrics"]))
    sm = rm.select(
        F.col("_rm")["resource"]["attributes"].alias("_res_attrs"),
        F.explode(F.col("_rm")["scopeMetrics"]).alias("_sm"),
    )
    m = sm.select(
        "_res_attrs",
        F.col("_sm")["scope"]["name"].alias("scope_name"),
        F.col("_sm")["scope"]["version"].alias("scope_version"),
        F.explode(F.col("_sm")["metrics"]).alias("_m"),
    )
    mc = F.col("_m")
    # metric_type / temporality / monotonic / point expansion over the
    # DECODED branches only (expressions must not name absent fields);
    # the when-chain order and the histogram `otherwise` match the
    # all-branch form exactly when every branch is requested
    type_when = F.when(F.lit(False), F.lit(None).cast("string"))
    if "gauge" in branches:
        type_when = type_when.when(mc["gauge"].isNotNull(), F.lit("gauge"))
    if "sum" in branches:
        type_when = type_when.when(mc["sum"].isNotNull(), F.lit("sum"))
    if "exp_histogram" in branches:
        type_when = type_when.when(
            mc["exponentialHistogram"].isNotNull(), F.lit("exp_histogram")
        )
    if "summary" in branches:
        type_when = type_when.when(mc["summary"].isNotNull(), F.lit("summary"))
    metric_type = (
        type_when.otherwise(F.lit("histogram"))
        if "histogram" in branches
        else type_when
    )
    temporality_members = [
        mc["sum"]["aggregationTemporality"] if "sum" in branches else None,
        mc["histogram"]["aggregationTemporality"]
        if "histogram" in branches
        else None,
        mc["exponentialHistogram"]["aggregationTemporality"]
        if "exp_histogram" in branches
        else None,
    ]
    temporality_members = [c for c in temporality_members if c is not None]
    temporality = (
        F.coalesce(*temporality_members)
        if temporality_members
        else F.lit(None).cast("int")
    )
    point_arrays = []
    if "gauge" in branches:
        point_arrays.append(
            F.coalesce(F.transform(mc["gauge"]["dataPoints"], _num_pt), _empty)
        )
    if "sum" in branches:
        point_arrays.append(
            F.coalesce(F.transform(mc["sum"]["dataPoints"], _num_pt), _empty)
        )
    if "histogram" in branches:
        point_arrays.append(
            F.coalesce(F.transform(mc["histogram"]["dataPoints"], _hist_pt), _empty)
        )
    if "exp_histogram" in branches:
        point_arrays.append(
            F.coalesce(
                F.transform(mc["exponentialHistogram"]["dataPoints"], _exp_pt),
                _empty,
            )
        )
    if "summary" in branches:
        point_arrays.append(
            F.coalesce(F.transform(mc["summary"]["dataPoints"], _summary_pt), _empty)
        )
    pts = m.select(
        "_res_attrs",
        "scope_name",
        "scope_version",
        mc["name"].alias("metric_name"),
        mc["unit"].alias("metric_unit"),
        metric_type.alias("metric_type"),
        temporality.alias("temporality"),
        (
            mc["sum"]["isMonotonic"]
            if "sum" in branches
            else F.lit(None).cast("boolean")
        ).alias("is_monotonic"),
        F.explode(
            F.concat(*point_arrays)
            if len(point_arrays) > 1
            else point_arrays[0]
        ).alias("_p"),
    )
    p = F.col("_p")
    return pts.select(
        _attr(F.col("_res_attrs"), "service.name").alias("service_name"),
        "scope_name",
        "scope_version",
        "metric_name",
        "metric_unit",
        "metric_type",
        "temporality",
        "is_monotonic",
        p["t"].cast("long").alias("time_unix_nano"),
        p["value"].alias("value"),
        p["count"].alias("count"),
        p["sum"].alias("sum_value"),
        p["bucket_counts"].alias("bucket_counts"),
        p["explicit_bounds"].alias("explicit_bounds"),
        p["scale"].alias("scale"),
        p["zero_count"].alias("zero_count"),
        p["pos_offset"].alias("pos_offset"),
        p["pos_bucket_counts"].alias("pos_bucket_counts"),
        p["quantiles"].alias("quantiles"),
        _attr(p["attrs"], "host.name").alias("host_name"),
        _attr(p["attrs"], "point.seq").cast("long").alias("point_seq"),
    )


# --- encode (exporter side) ---------------------------------------------------


def encode_otlp_json(
    df: DataFrame,
    n_buckets: int = 64,
    int_attr_keys: tuple[str, ...] = ("event.index",),
) -> DataFrame:
    """Inverse of :func:`parse_otlp_json`: flat log rows back to OTLP/JSON
    ExportLogsServiceRequest payloads — the exporter half of the protocol
    (go/pkg/otel/logs/otlp/logs.go is the reference's columnar→OTLP
    inverse; this is the same re-nesting with Catalyst building the
    batches). One request per (resource attributes, scope, bucket): rows
    sharing a resource+scope re-batch together, the bucket (a stable hash
    of the timestamp) bounding request size — exactly the exporter's
    batching shuffle, the ONE shuffle this op needs at any scale.

    Proto3 JSON fidelity: int64s re-serialize as strings (`timeUnixNano`
    stays the string form of the BIGINT), AnyValue branches are rebuilt
    from the flat map (`int_attr_keys` go back to ``intValue``, the rest
    to ``stringValue``), and absent-on-the-wire fields (NULL trace ids,
    zero droppedAttributesCount) are omitted again because ``to_json``
    drops NULL fields — so parse∘encode∘parse is row-identical even
    though record order inside a payload is nondeterministic
    (collect_list order).

    Returns a DataFrame with a single ``payload`` string column.
    """
    attr_entries = F.transform(
        F.map_entries(F.col("attributes")),
        lambda e: F.struct(
            e["key"].alias("key"),
            F.struct(
                F.when(~e["key"].isin(*int_attr_keys), e["value"]).alias(
                    "stringValue"
                ),
                F.when(e["key"].isin(*int_attr_keys), e["value"]).alias(
                    "intValue"
                ),
            ).alias("value"),
        ),
    )
    record = F.struct(
        F.col("time_unix_nano").cast("string").alias("timeUnixNano"),
        F.col("severity_number").alias("severityNumber"),
        F.col("severity_text").alias("severityText"),
        F.struct(F.col("body").alias("stringValue")).alias("body"),
        attr_entries.alias("attributes"),
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"),
        F.when(
            F.col("dropped_attributes_count") > 0,
            F.col("dropped_attributes_count"),
        ).alias("droppedAttributesCount"),
    )

    def _kv(key: str, val):
        return F.struct(
            F.lit(key).alias("key"),
            F.struct(val.alias("stringValue")).alias("value"),
        )

    grouped = (
        df.withColumn("_rec", record)
        .withColumn(
            "_bucket", F.pmod(F.xxhash64("time_unix_nano"), F.lit(n_buckets))
        )
        .groupBy(
            "service_name", "environment", "scope_name", "scope_version",
            "_bucket",
        )
        .agg(F.collect_list("_rec").alias("_recs"))
    )
    payload = F.to_json(
        F.struct(
            F.array(
                F.struct(
                    F.struct(
                        F.array(
                            _kv("service.name", F.col("service_name")),
                            _kv("deployment.environment", F.col("environment")),
                        ).alias("attributes")
                    ).alias("resource"),
                    F.array(
                        F.struct(
                            F.struct(
                                F.col("scope_name").alias("name"),
                                F.col("scope_version").alias("version"),
                            ).alias("scope"),
                            F.col("_recs").alias("logRecords"),
                        )
                    ).alias("scopeLogs"),
                )
            ).alias("resourceLogs")
        )
    )
    return grouped.select(payload.alias("payload"))


def encode_otlp_traces_json(df: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Inverse of :func:`parse_otlp_traces_json`: flat span rows back to
    OTLP/JSON ExportTraceServiceRequest payloads — the traces twin of
    :func:`encode_otlp_json` (go/pkg/otel/traces/otlp is the reference's
    inverse direction). Batching: one request per (resource, scope,
    trace-id hash bucket) — spans of one trace always land in ONE request
    (trace-coherent batching, what a tail-sampling exporter needs), with
    the bucket bounding request size. Same single batching shuffle.

    Proto3 fidelity: NULL parentSpanId (roots) and empty status messages
    are omitted from the wire; status is re-nested; the span attributes
    are rebuilt from the typed flat columns.
    """
    record = F.struct(
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"),
        F.col("parent_span_id").alias("parentSpanId"),
        F.col("name").alias("name"),
        F.col("kind").alias("kind"),
        F.col("start_unix_nano").cast("string").alias("startTimeUnixNano"),
        F.col("end_unix_nano").cast("string").alias("endTimeUnixNano"),
        F.array(
            F.struct(
                F.lit("peer.service").alias("key"),
                F.struct(
                    F.col("peer_service").alias("stringValue"),
                    F.lit(None).cast("string").alias("intValue"),
                ).alias("value"),
            ),
            F.struct(
                F.lit("span.seq").alias("key"),
                F.struct(
                    F.lit(None).cast("string").alias("stringValue"),
                    F.col("span_seq").cast("string").alias("intValue"),
                ).alias("value"),
            ),
        ).alias("attributes"),
        F.struct(
            F.when(F.col("status_code") != 0, F.col("status_code")).alias(
                "code"
            ),
            F.col("status_message").alias("message"),
        ).alias("status"),
    )
    grouped = (
        df.withColumn("_rec", record)
        .withColumn(
            "_bucket", F.pmod(F.xxhash64("trace_id"), F.lit(n_buckets))
        )
        .groupBy("service_name", "scope_name", "scope_version", "_bucket")
        .agg(F.collect_list("_rec").alias("_recs"))
    )
    payload = F.to_json(
        F.struct(
            F.array(
                F.struct(
                    F.struct(
                        F.array(
                            F.struct(
                                F.lit("service.name").alias("key"),
                                F.struct(
                                    F.col("service_name").alias("stringValue")
                                ).alias("value"),
                            )
                        ).alias("attributes")
                    ).alias("resource"),
                    F.array(
                        F.struct(
                            F.struct(
                                F.col("scope_name").alias("name"),
                                F.col("scope_version").alias("version"),
                            ).alias("scope"),
                            F.col("_recs").alias("spans"),
                        )
                    ).alias("scopeSpans"),
                )
            ).alias("resourceSpans")
        )
    )
    return grouped.select(payload.alias("payload"))


def encode_otlp_metrics_json(df: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Inverse of :func:`parse_otlp_metrics_json`: flat data-point rows
    back to OTLP/JSON ExportMetricsServiceRequest payloads across all
    five Metric oneof branches — completing the bidirectional OTLP
    surface for the third signal (go/pkg/otel/metrics is the reference's
    inverse direction). One request per (resource, scope, metric,
    branch metadata, time-hash bucket); the branch struct is rebuilt
    conditionally and ``to_json`` drops the four absent oneof fields.

    Number points re-serialize as ``asDouble`` regardless of the
    original wire branch: the parse coalesces asInt/asDouble into one
    double, so the int-vs-double distinction is wire-level only — the
    FLAT rows round-trip exactly (doubles are lossless for |v| < 2^53,
    and OTLP consumers treat the two branches as the same number).
    """
    is_num = F.col("metric_type").isin("gauge", "sum")
    is_hist = F.col("metric_type") == "histogram"
    is_exp = F.col("metric_type") == "exp_histogram"
    is_summary = F.col("metric_type") == "summary"
    _sn = F.lit(None).cast("string")

    point = F.struct(
        F.col("time_unix_nano").cast("string").alias("timeUnixNano"),
        F.when(is_num, F.col("value")).alias("asDouble"),
        F.when(~is_num, F.col("count").cast("string")).alias("count"),
        F.when(~is_num, F.col("sum_value")).alias("sum"),
        F.when(
            is_hist,
            F.transform(F.col("bucket_counts"), lambda c: c.cast("string")),
        ).alias("bucketCounts"),
        F.when(is_hist, F.col("explicit_bounds")).alias("explicitBounds"),
        F.when(is_exp, F.col("scale")).alias("scale"),
        F.when(is_exp, F.col("zero_count").cast("string")).alias("zeroCount"),
        F.when(
            is_exp,
            F.struct(
                F.col("pos_offset").alias("offset"),
                F.transform(
                    F.col("pos_bucket_counts"), lambda c: c.cast("string")
                ).alias("bucketCounts"),
            ),
        ).alias("positive"),
        F.when(is_summary, F.col("quantiles")).alias("quantileValues"),
        F.array(
            F.struct(
                F.lit("host.name").alias("key"),
                F.struct(
                    F.col("host_name").alias("stringValue"),
                    _sn.alias("intValue"),
                ).alias("value"),
            ),
            F.struct(
                F.lit("point.seq").alias("key"),
                F.struct(
                    _sn.alias("stringValue"),
                    F.col("point_seq").cast("string").alias("intValue"),
                ).alias("value"),
            ),
        ).alias("attributes"),
    )
    grouped = (
        df.withColumn("_pt", point)
        .withColumn(
            "_bucket", F.pmod(F.xxhash64("time_unix_nano"), F.lit(n_buckets))
        )
        .groupBy(
            "service_name", "scope_name", "scope_version", "metric_name",
            "metric_unit", "metric_type", "temporality", "is_monotonic",
            "_bucket",
        )
        .agg(F.collect_list("_pt").alias("_pts"))
    )
    t = F.col("metric_type")
    metric = F.struct(
        F.col("metric_name").alias("name"),
        F.col("metric_unit").alias("unit"),
        F.when(t == "gauge", F.struct(F.col("_pts").alias("dataPoints"))).alias(
            "gauge"
        ),
        F.when(
            t == "sum",
            F.struct(
                F.col("_pts").alias("dataPoints"),
                F.col("temporality").alias("aggregationTemporality"),
                F.col("is_monotonic").alias("isMonotonic"),
            ),
        ).alias("sum"),
        F.when(
            t == "histogram",
            F.struct(
                F.col("_pts").alias("dataPoints"),
                F.col("temporality").alias("aggregationTemporality"),
            ),
        ).alias("histogram"),
        F.when(
            t == "exp_histogram",
            F.struct(
                F.col("_pts").alias("dataPoints"),
                F.col("temporality").alias("aggregationTemporality"),
            ),
        ).alias("exponentialHistogram"),
        F.when(
            t == "summary", F.struct(F.col("_pts").alias("dataPoints"))
        ).alias("summary"),
    )
    payload = F.to_json(
        F.struct(
            F.array(
                F.struct(
                    F.struct(
                        F.array(
                            F.struct(
                                F.lit("service.name").alias("key"),
                                F.struct(
                                    F.col("service_name").alias("stringValue")
                                ).alias("value"),
                            )
                        ).alias("attributes")
                    ).alias("resource"),
                    F.array(
                        F.struct(
                            F.struct(
                                F.col("scope_name").alias("name"),
                                F.col("scope_version").alias("version"),
                            ).alias("scope"),
                            F.array(metric).alias("metrics"),
                        )
                    ).alias("scopeMetrics"),
                )
            ).alias("resourceMetrics")
        )
    )
    return grouped.select(payload.alias("payload"))
