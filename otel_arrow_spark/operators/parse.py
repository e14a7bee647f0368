"""Parse stage: structured extraction from the raw ``text`` column.

Reference analog: the syslog/CEF receiver's structural parser — format
auto-detection (parser/mod.rs:46-104), severity mapping
(parser/parsed_message.rs:426-436), CEF key=value extension parsing
(parser/cef.rs:226-260) — which turns raw bytes directly into typed,
dictionary-encoded Arrow columns (arrow_records_encoder.rs:18-81).

Two interchangeable engines with identical output schema:

* ``engine="pandas"`` (default) — one Arrow-batched ``pandas_udf`` applying
  compiled regexes with ``Series.str.extract``. Measured 4x faster than the
  native path at 2M rows: the Arrow eval node is a materialization barrier,
  so each regex runs exactly once per row, and all ten fields come out of
  one pass. Also the extension point for grok patterns Java regex can't
  express. (Vectorized per the input_hint mandate — never per-row Python.)
* ``engine="native"`` — pure Catalyst expressions (rlike validation +
  split/str_to_map extraction), whole-stage codegen, zero Python workers.
  Faster for small batches (no worker spin-up) and for plans where the
  parse predicate should push down; slower when many downstream references
  cause CollapseProject to re-inline the parse expressions.

Unparseable rows (the ~5% chaos fraction) yield all-null parsed fields and
``is_parsed = false`` — the analog of UnknownFormat handling
(parser/mod.rs:41-43); they are *kept* and routed to the default sink,
and counted as ``rows_unparsed`` in the lineage manifest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Template-family regexes (anchored; Java and Python `re` compatible).
SEVERITY_RE = r"^(TRACE|DEBUG|INFO|WARN|ERROR|FATAL) \[([a-z]+)\] ([\s\S]*)$"
CALL_RE = r"^CALL tool=(\w+) args_len=(\d+) status=(\w+) dur_ms=(\d+)$"
SPAN_RE = r"^span trace=([0-9a-f]{32}) span=([0-9a-f]{16}) event=(\w+\.\w+)$"

# OTel Appendix-B severity numbers, as used by the reference's severity map
# (parser/parsed_message.rs:426-436).
SEVERITY_NUMBER = {"TRACE": 1, "DEBUG": 5, "INFO": 9, "WARN": 13, "ERROR": 17, "FATAL": 21}

PARSED_FIELDS: list[tuple[str, T.DataType]] = [
    ("severity_text", T.StringType()),
    ("component", T.StringType()),
    ("message", T.StringType()),
    ("tool_called", T.StringType()),
    ("args_len", T.IntegerType()),
    ("call_status", T.StringType()),
    ("duration_ms", T.IntegerType()),
    ("trace_id", T.StringType()),
    ("span_id", T.StringType()),
    ("event_name", T.StringType()),
]

_PARSED_STRUCT = T.StructType([T.StructField(n, t) for n, t in PARSED_FIELDS])


def _x(text: Column, pattern: str, group: int) -> Column:
    """regexp_extract with empty-match → NULL (regexp_extract returns '')."""
    return F.nullif(F.regexp_extract(text, pattern, group), F.lit(""))


def severity_number_col(severity_text: Column) -> Column:
    """Severity text → OTel number via a literal-map lookup (JVM-side).

    Mirrors parsed_message.rs:426-436. Uses element_at on a map literal so
    the mapping stays a single expression (no UDF, no join).
    """
    pairs: list[Column] = []
    for k, v in SEVERITY_NUMBER.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.element_at(F.create_map(*pairs), severity_text)


def _parse_native(df: DataFrame, text_col: str) -> DataFrame:
    """One anchored rlike per template family + cheap split/str_to_map field
    extraction.

    Why not ten regexp_extract calls: Catalyst's CollapseProject inlines a
    projected expression into every downstream reference, so a parsed field
    used by routing and is_parsed re-evaluates its regex each time — the
    measured cost was ~15 regex evaluations per row. Here each family costs
    exactly one full-validation regex match (boolean, no group capture),
    short-circuited behind a literal-prefix test, and the fields come from
    substring/split/str_to_map kernels that are an order of magnitude
    cheaper than Java regex capture.
    """
    t = F.col(text_col)

    # -- severity family: "<LEVEL> [component] message..."
    first = F.substring_index(t, " ", 1)
    is_sev = first.isin(*SEVERITY_NUMBER.keys()) & t.rlike(SEVERITY_RE)
    rest = F.expr(f"substring({text_col}, length(substring_index({text_col}, ' ', 1)) + 2)")
    comp = F.substring(F.substring_index(rest, "]", 1), 2, 1 << 30)
    msg = F.expr(
        f"substring({text_col}, length(substring_index({text_col}, ']', 1)) + 3)"
    )

    # -- tool-call family: "CALL tool=<w> args_len=<d> status=<w> dur_ms=<d>"
    is_call = t.startswith("CALL tool=") & t.rlike(CALL_RE)
    kv = F.str_to_map(F.substring(t, 6, 1 << 30), F.lit(" "), F.lit("="))

    # -- span family: "span trace=<32hex> span=<16hex> event=<w.w>"
    is_span = t.startswith("span trace=") & t.rlike(SPAN_RE)
    skv = F.str_to_map(F.substring(t, 6, 1 << 30), F.lit(" "), F.lit("="))

    return df.withColumns(
        {
            "severity_text": F.when(is_sev, first),
            "component": F.when(is_sev, comp),
            "message": F.when(is_sev, msg),
            "tool_called": F.when(is_call, kv["tool"]),
            "args_len": F.when(is_call, kv["args_len"].cast("int")),
            "call_status": F.when(is_call, kv["status"]),
            "duration_ms": F.when(is_call, kv["dur_ms"].cast("int")),
            "trace_id": F.when(is_span, skv["trace"]),
            "span_id": F.when(is_span, skv["span"]),
            "event_name": F.when(is_span, skv["event"]),
        }
    )


def _parse_pandas(df: DataFrame, text_col: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NOTE: hints must be real classes (not `from __future__ import
    # annotations` strings) for pandas_udf eval-type inference, so the
    # wrapped function is defined via exec-free local binding here.
    # Literal prefixes gate each family's regex (the same short-circuit the
    # native engine uses, and the reference's format auto-detection,
    # parser/mod.rs:46-104): each regex runs only on its candidate rows —
    # notably the severity regex (whose [\s\S]* capture must scan the whole
    # message) never touches CALL/span rows. A prefixed-but-malformed row
    # still fails its full regex → all-null, identical semantics.
    sev_prefixes = tuple(f"{k} [" for k in SEVERITY_NUMBER)

    def _parse_batch(text):
        # Compiled once per Arrow batch stream; Series.str.extract is the
        # vectorized-pandas analog of the reference's per-format parsers.
        text = text.fillna("")
        idx = text.index
        sev = text[text.str.startswith(sev_prefixes)].str.extract(
            SEVERITY_RE).reindex(idx)
        call = text[text.str.startswith("CALL tool=")].str.extract(
            CALL_RE).reindex(idx)
        span = text[text.str.startswith("span trace=")].str.extract(
            SPAN_RE).reindex(idx)
        return pd.DataFrame(
            {
                "severity_text": sev[0],
                "component": sev[1],
                "message": sev[2],
                "tool_called": call[0],
                "args_len": pd.to_numeric(call[1], errors="coerce").astype("Int32"),
                "call_status": call[2],
                "duration_ms": pd.to_numeric(call[3], errors="coerce").astype("Int32"),
                "trace_id": span[0],
                "span_id": span[1],
                "event_name": span[2],
            }
        )

    _parse_batch.__annotations__ = {"text": pd.Series, "return": pd.DataFrame}
    parse_udf = pandas_udf(_PARSED_STRUCT)(_parse_batch)

    parsed = df.withColumn("_parsed", parse_udf(F.col(text_col)))
    for name, _ in PARSED_FIELDS:
        parsed = parsed.withColumn(name, F.col(f"_parsed.{name}"))
    return parsed.drop("_parsed")


def parse_transcripts(df: DataFrame, text_col: str = "text", engine: str = "pandas") -> DataFrame:
    """Extract structured signal fields from ``text``.

    Adds PARSED_FIELDS plus ``severity_number`` and ``is_parsed``. The input
    ``text`` column is retained untouched — the per-turn text-equality
    round-trip invariant (pdata/src/testing/round_trip.rs:112 analog) is
    checked against it downstream.
    """
    if engine == "native":
        out = _parse_native(df, text_col)
    elif engine == "pandas":
        out = _parse_pandas(df, text_col)
    else:
        raise ValueError(f"unknown parse engine: {engine!r}")
    out = out.withColumn("severity_number", severity_number_col(F.col("severity_text")))
    return out.withColumn(
        "is_parsed",
        F.col("severity_text").isNotNull()
        | F.col("tool_called").isNotNull()
        | F.col("trace_id").isNotNull(),
    )
