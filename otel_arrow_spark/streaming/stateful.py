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


TAIL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_policy", T.StringType()),
    ]
)

TAIL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("statuses", T.ArrayType(T.IntegerType())),
        T.StructField("start_us", T.ArrayType(T.LongType())),
        T.StructField("dur_ms", T.ArrayType(T.LongType())),
    ]
)


def _tail_fn(latency_ms: int, keep_prefix: str, wait_ms: int):
    import hashlib

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        trace_id = key[0]
        if state.hasTimedOut:
            ids, statuses, start_us, dur_ms = state.get
            state.remove()
            # the whole-trace decision, same policy order as the batch
            # operator (operators/sample.py tail_sample)
            if any(s == 2 for s in statuses):
                policy = "error"
            else:
                wall_ms = (
                    max(su + dm * 1000 for su, dm in zip(start_us, dur_ms))
                    - min(start_us)
                ) / 1000.0
                if wall_ms > latency_ms:
                    policy = "latency"
                elif hashlib.md5(trace_id.encode()).hexdigest()[:2] < keep_prefix:
                    policy = "prob"
                else:
                    policy = None
            if policy is not None:
                yield pd.DataFrame(
                    {
                        "id": ids,
                        "trace_id": trace_id,
                        "status_code": statuses,
                        "start_ts": [pd.Timestamp(u * 1000) for u in start_us],
                        "duration_ms": dur_ms,
                        "sample_policy": policy,
                    }
                )
            return
        ids: list = []
        statuses: list = []
        start_us: list = []
        dur_ms: list = []
        if state.exists:
            ids, statuses, start_us, dur_ms = (list(x) for x in state.get)
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["id"])
            statuses.extend(int(x) for x in pdf["status_code"])
            start_us.extend(_us(x) for x in pdf["start_ts"])
            dur_ms.extend(int(x) for x in pdf["duration_ms"])
        state.update((ids, statuses, start_us, dur_ms))
        state.setTimeoutTimestamp(max(start_us) // 1000 + wait_ms)
        return
        yield  # pragma: no cover — makes fn a generator in both paths

    return fn


def tail_sample_stream(
    spans_stream: DataFrame,
    latency_ms: int = 500,
    keep_prefix: str = "10",
    decision_wait: str = "30 seconds",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming tail-based trace sampling: buffer each trace's spans in
    state, decide keep/drop once the trace has been idle for
    ``decision_wait`` (event time), and emit kept traces WHOLE — the OTel
    collector tailsampling processor's actual runtime shape (its
    ``decision_wait`` buffer), where the batch form
    (operators/sample.py:tail_sample) is the replay. Policies and their
    precedence are identical to the batch operator, so stream==batch
    parity holds per emitted trace (the md5 fallback uses the same
    hex-prefix rule; Python hashlib.md5 == Spark md5 on utf8).

    State is the spans of OPEN traces only — bounded by trace width ×
    concurrently-undecided traces, the same bound the collector's
    num_traces cap manages; decided traces drop their state immediately.
    """
    num, unit = decision_wait.split()
    wait_ms = int(num) * {"seconds": 1_000, "minutes": 60_000, "hours": 3_600_000}[unit]
    stream = spans_stream.withColumn(
        "start_ts", F.col("start_ts").cast("timestamp")
    ).withWatermark("start_ts", watermark)
    return (
        stream.select("id", "trace_id", "status_code", "start_ts", "duration_ms")
        .groupBy("trace_id")
        .applyInPandasWithState(
            _tail_fn(latency_ms, keep_prefix, wait_ms),
            outputStructType=TAIL_OUT_SCHEMA,
            stateStructType=TAIL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


D2C_OUT_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("stream", T.IntegerType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("double_value", T.DoubleType()),
    ]
)

D2C_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.DoubleType()),
        T.StructField("anchor_us", T.LongType()),
    ]
)


def _d2c_fn():
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        name, stream_id = key
        total, anchor_us = (state.get if state.exists else (0.0, None))
        rows = pd.concat(list(pdfs)).sort_values("ts")
        if anchor_us is None:
            anchor_us = _us(rows["ts"].iloc[0])
        # left-fold in ts order starting from the carried total — the
        # exact add sequence the batch running-sum window performs, so
        # stream == batch bit-for-bit under in-order arrival. The carry
        # must seed the fold (cumsum([total, v…])), NOT be added to each
        # prefix afterwards: (Σv)+total associates differently in IEEE
        # than ((total+v1)+v2)… and would drift off the batch fold.
        import numpy as np

        vals = rows["double_value"].astype("float64").to_numpy()
        cum = np.cumsum(np.concatenate(([total], vals)))[1:]
        state.update((float(cum[-1]), int(anchor_us)))
        yield pd.DataFrame(
            {
                "name": name,
                "stream": stream_id,
                "start_ts": pd.Timestamp(anchor_us * 1000),
                "ts": rows["ts"].values,
                "double_value": cum,
            }
        )

    return fn


def delta_to_cumulative_stream(delta_stream: DataFrame) -> DataFrame:
    """Streaming delta→cumulative conversion — the OTel collector's
    deltatocumulative processor in its ACTUAL runtime shape: a stateful
    per-stream accumulator that adds each arriving delta onto the running
    total and stamps every emitted point with the stream's first-observed
    anchor timestamp. The batch form (operators/metrics.py
    delta_to_cumulative) is the replay; under per-stream in-order arrival
    (the processor's own contract — it drops out-of-order points) the
    emitted points match the batch window fold bit-for-bit, because both
    are the same left-associated IEEE add sequence
    (test_streaming.test_d2c_stream_matches_batch).

    State per stream = (total, anchor) — two scalars, the collector's
    own per-stream memory bound; no timeout, matching its keep-alive
    default (add an event-time timeout for the max_stale eviction
    behavior if stream churn demands it).
    """
    return (
        delta_stream.select("name", "stream", "ts", "double_value")
        .groupBy("name", "stream")
        .applyInPandasWithState(
            _d2c_fn(),
            outputStructType=D2C_OUT_SCHEMA,
            stateStructType=D2C_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
