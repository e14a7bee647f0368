"""LOGS star-schema encode/decode: flat log rows ↔ the reference's
normalized Arrow layout (LOGS + LOG_ATTRS + RESOURCE_ATTRS + SCOPE_ATTRS,
docs/data_model.md:245-307).

This is the row-to-columnar encode at the heart of the reference (the
OTLP→OTAP encoder, go/pkg/otel/logs/arrow/logs.go; decode is
otlp/logs.go) re-expressed as DataFrame transforms:

* **ids without a global ordering funnel**: the reference assigns dense
  u16 ids sequentially per batch — a per-batch counter. The distributed
  analog is a STABLE HASH of the row's natural key (``xxhash64``): no
  shuffle, no row_number-over-everything single task, deterministic
  across runs and engines. Resource/scope ids hash their defining
  attribute values — the dictionary-encoding analog (equal dicts share
  an id, so the dims stay tiny and broadcastable).
* **sparse attrs**: LOG_ATTRS holds one (parent_id, key, type, str, int)
  row per NON-NULL attribute — null attributes produce no row, exactly
  like the reference's optional columns (attributes_16.go accumulator
  skips absent keys).
* **AnyValue body**: body_type + body_str columns (type 1 = str), the
  flattened AnyValue convention of functions/anyvalue.py.

Scale shape: encode is narrow (projections + one explode for attrs; the
dims are a distinct over their few columns — tiny, map-side combinable).
Decode pivots LOG_ATTRS with ONE shuffle on parent_id (conditional
aggregation per known key, no per-key join) and broadcast-joins the two
dims. Round-tripping 10^12 rows is therefore one shuffle total.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class LogsStarSpec:
    """Column mapping from a flat log frame into the star layout."""

    key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    ts_col: str = "ts"
    body_col: str = "text"
    severity_text_col: str | None = "severity_text"
    severity_number_col: str | None = "severity_number"
    trace_id_col: str | None = "trace_id"
    span_id_col: str | None = "span_id"
    attr_cols: tuple[str, ...] = ("tool", "component", "tool_called", "call_status")
    resource_cols: tuple[str, ...] = ("owner",)
    scope_cols: tuple[str, ...] = ("role_class",)
    int_attr_cols: tuple[str, ...] = field(default=(), repr=False)


def _attr_rows(df: DataFrame, parent: F.Column, cols: tuple[str, ...],
               int_cols: tuple[str, ...]) -> DataFrame:
    """Explode selected columns into sparse (parent_id, key, type, str,
    int) rows, dropping nulls (the optional-column analog)."""
    entries = []
    for c in cols:
        is_int = c in int_cols or isinstance(
            df.schema[c].dataType, (T.IntegerType, T.LongType, T.ShortType)
        )
        entries.append(
            F.struct(
                F.lit(c).alias("key"),
                F.lit(2 if is_int else 1).cast("int").alias("type"),
                (F.lit(None).cast("string") if is_int
                 else F.col(c).cast("string")).alias("str"),
                (F.col(c).cast("long") if is_int
                 else F.lit(None).cast("long")).alias("int"),
            )
        )
    return (
        df.select(parent.alias("parent_id"), F.inline(F.array(*entries)))
        .where(F.col("str").isNotNull() | F.col("int").isNotNull())
    )


def encode_logs_star(df: DataFrame, spec: LogsStarSpec | None = None
                     ) -> dict[str, DataFrame]:
    """Flat rows → {logs, log_attrs, resource_attrs, scope_attrs}."""
    spec = spec or LogsStarSpec()
    log_id = F.xxhash64(*[F.col(c) for c in spec.key_cols])
    resource_id = F.xxhash64(*[F.col(c) for c in spec.resource_cols])
    scope_id = F.xxhash64(*[F.col(c) for c in spec.scope_cols])

    def opt(col_name: str | None, out: str, typ: str) -> F.Column:
        c = F.col(col_name) if col_name else F.lit(None)
        return c.cast(typ).alias(out)

    logs = df.select(
        log_id.alias("id"),
        resource_id.alias("resource_id"),
        scope_id.alias("scope_id"),
        F.col(spec.ts_col).alias("ts"),
        opt(spec.severity_number_col, "severity_number", "int"),
        opt(spec.severity_text_col, "severity_text", "string"),
        opt(spec.trace_id_col, "trace_id", "string"),
        opt(spec.span_id_col, "span_id", "string"),
        F.lit(1).cast("int").alias("body_type"),  # 1 = str (anyvalue.py)
        F.col(spec.body_col).cast("string").alias("body_str"),
    )
    log_attrs = _attr_rows(df, log_id, spec.attr_cols, spec.int_attr_cols)
    resource_attrs = _attr_rows(
        df.select(*spec.resource_cols).distinct(),
        F.xxhash64(*[F.col(c) for c in spec.resource_cols]),
        spec.resource_cols, spec.int_attr_cols,
    )
    scope_attrs = _attr_rows(
        df.select(*spec.scope_cols).distinct(),
        F.xxhash64(*[F.col(c) for c in spec.scope_cols]),
        spec.scope_cols, spec.int_attr_cols,
    )
    return {
        "logs": logs,
        "log_attrs": log_attrs,
        "resource_attrs": resource_attrs,
        "scope_attrs": scope_attrs,
    }


def _pivot_attrs(attrs: DataFrame, cols: tuple[str, ...],
                 parent_out: str) -> DataFrame:
    """(parent_id, key, type, str, int) rows → one row per parent with a
    typed column per key: ONE hash aggregate (conditional first per key),
    never a join per key."""
    aggs = []
    for c in cols:
        val = F.when(
            F.col("key") == c,
            F.when(F.col("type") == 2, F.col("int").cast("string")).otherwise(
                F.col("str")
            ),
        )
        aggs.append(F.first(val, ignorenulls=True).alias(c))
    return attrs.groupBy(F.col("parent_id").alias(parent_out)).agg(*aggs)


def decode_logs_star(tables: dict[str, DataFrame],
                     spec: LogsStarSpec | None = None) -> DataFrame:
    """{logs, log_attrs, resource_attrs, scope_attrs} → flat rows (the
    OTAP→OTLP decode analog). Attribute values come back as strings
    (type info preserved in the star, callers re-cast as needed); the
    natural key columns are not recoverable from the hash id — decode
    returns the star id alongside the payload columns."""
    spec = spec or LogsStarSpec()
    logs = tables["logs"]
    flat = logs.join(
        _pivot_attrs(tables["log_attrs"], spec.attr_cols, "id"), "id", "left"
    )
    flat = flat.join(
        F.broadcast(
            _pivot_attrs(tables["resource_attrs"], spec.resource_cols,
                         "resource_id")
        ),
        "resource_id", "left",
    )
    flat = flat.join(
        F.broadcast(
            _pivot_attrs(tables["scope_attrs"], spec.scope_cols, "scope_id")
        ),
        "scope_id", "left",
    )
    return flat.drop("resource_id", "scope_id", "body_type").withColumnRenamed(
        "body_str", spec.body_col
    )
