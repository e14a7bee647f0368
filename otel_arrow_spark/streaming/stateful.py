"""Custom stateful streaming operator: conversation sessionization via
``applyInPandasWithState``.

Reference analog: the temporal reaggregation processor's stateful stream
builder — an in-memory map keyed by stream identity, merged per batch,
flushed on timer or cardinality overflow (temporal_reaggregation_processor/
builder.rs:58-128 Checkpoint/MetricSignalBuilder; identity.rs:28-60). Here
the stream identity is the conversation, the merge is a running per-
conversation summary, and the flush timer is an event-time timeout (the
conversation has been idle longer than ``gap``).

This is the (b) tier of the custom-operator policy: semantics Spark's
built-in operators cannot express (emit-on-idle with arbitrary merge
state), implemented as an Arrow-batched stateful pandas transform — never
per-row Python over the wire.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("n_tool_calls", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("n_tool_calls", T.LongType()),
        T.StructField("first_ts_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _session_fn(gap_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            n, errs, calls, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n],
                    "n_errors": [errs],
                    "n_tool_calls": [calls],
                    "first_ts": [pd.Timestamp(first_us * 1000)],
                    "last_ts": [pd.Timestamp(last_us * 1000)],
                }
            )
            return
        n = errs = calls = 0
        first_us = last_us = None
        if state.exists:
            n, errs, calls, first_us, last_us = state.get
        for pdf in pdfs:
            n += len(pdf)
            errs += int(pdf["signal_class"].eq("error").sum())
            calls += int(pdf["signal_class"].eq("tool_call").sum())
            ts_us = pdf["ts"].map(_us)
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, errs, calls, first_us, last_us))
        # flush when event time passes last activity + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        return
        yield  # pragma: no cover — makes fn a generator in both paths

    return fn


def sessionize_conversations(
    routed_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-conversation session summaries, emitted when a conversation has
    been idle for ``gap`` (event time).

    Input: the routed stream (needs conv_id, ts, signal_class). Output one
    row per closed session. State is bounded by the number of concurrently
    active conversations — the cardinality the reference caps at 16384
    (README.md:56-60); Spark's state store spills instead of flushing early.

    Batching caveat: rows of one conversation arriving in the SAME
    micro-batch fold into the open session regardless of internal gaps —
    the idle timeout only observes time BETWEEN batches. That is the right
    contract for this per-conversation rollup (a conversation replayed as
    one batch is one session), but for gap-exact sessions independent of
    batching use streaming/jobs.py ``stream_sessionize`` (native
    ``session_window`` state splits within-batch gaps too; stream==batch
    parity-tested against operators/sessionize.py).
    """
    gap_ms = {"30 minutes": 30 * 60_000, "1 hour": 3_600_000}.get(gap)
    if gap_ms is None:
        num, unit = gap.split()
        gap_ms = int(num) * {"seconds": 1_000, "minutes": 60_000, "hours": 3_600_000}[unit]
    stream = routed_stream.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return (
        stream.select("conv_id", "ts", "signal_class")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _session_fn(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
