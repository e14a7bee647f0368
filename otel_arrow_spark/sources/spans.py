"""Deterministic synthetic TRACES star-schema generator.

Reference: the traces Arrow schema (docs/data_model.md:309-420) — SPANS
with child tables keyed by ``parent_id``: SPAN_ATTRS (parent_id → span id),
SPAN_EVENTS (own id, parent_id → span id), SPAN_EVENT_ATTRS (parent_id →
span-event id), SPAN_LINKS (own id, parent_id → span id, carrying the
linked span's trace_id/span_id) and SPAN_LINK_ATTRS (parent_id → link id)
— the full 6-table analytics slice of the 8-table traces model. This
generator materializes that multi-table layout so the id-bitmap cascade
(pdata/src/otap/filter.rs filter_otap_batch) can be exercised across all
levels with left-semi joins, and links resolve to real spans in the corpus
so trace-graph causality joins (span → link → target span) are exercisable.

Columns follow the reference's field names where they carry analytics
semantics (trace_id/span_id hex, name, kind, status_code,
start_time_unix_nano → ``start_ts``, duration); attrs use the exploded
(parent_id, key, type, str, int) layout of data_model.md's *_ATTRS tables.

Everything is vectorized numpy and fully deterministic (fixed seed/epoch).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

EPOCH = np.datetime64("2026-01-01T00:00:00", "us")

SPAN_NAMES = ["GET /api", "POST /api", "db.query", "cache.get", "render", "auth.check"]
EVENT_NAMES = ["exception", "retry", "gc", "log"]
ATTR_KEYS = ["http.method", "http.status_code", "db.system", "peer.service", "enduser.id"]
EVENT_ATTR_KEYS = ["exception.type", "exception.message", "retry.count", "log.severity"]


def _hex(rng: np.random.RandomState, n: int, nchars: int) -> np.ndarray:
    digits = np.array(list("0123456789abcdef"))
    idx = rng.randint(0, 16, size=(n, nchars))
    return np.array(["".join(row) for row in digits[idx]], dtype=object)


def generate_spans_tables(n_spans: int, seed: int = 42) -> dict[str, pd.DataFrame]:
    """Generate {spans, span_attrs, span_events, span_event_attrs} frames."""
    rng = np.random.RandomState(seed)

    span_id = np.arange(n_spans, dtype=np.int64)
    trace_ord = rng.randint(0, max(1, n_spans // 4), size=n_spans)
    name = np.array(SPAN_NAMES, dtype=object)[rng.randint(0, len(SPAN_NAMES), n_spans)]
    kind = rng.randint(1, 6, size=n_spans)
    # ~8% error spans (status_code 2 = ERROR)
    status_code = np.where(rng.random_sample(n_spans) < 0.08, 2,
                           np.where(rng.random_sample(n_spans) < 0.2, 1, 0))
    start_us = rng.randint(0, 3_600_000_000, size=n_spans)
    duration_ms = (rng.pareto(2.0, size=n_spans) * 20).astype(np.int64) + 1
    spans = pd.DataFrame(
        {
            "id": span_id,
            "trace_id": _hex(rng, max(1, n_spans // 4), 32)[trace_ord],
            "span_id_hex": _hex(rng, n_spans, 16),
            "name": name,
            "kind": kind.astype(np.int32),
            "status_code": status_code.astype(np.int32),
            "start_ts": EPOCH + start_us.astype("timedelta64[us]"),
            "duration_ms": duration_ms,
        }
    )

    # span attrs: 0-4 per span
    n_attrs = rng.randint(0, 5, size=n_spans)
    parent = np.repeat(span_id, n_attrs)
    m = len(parent)
    keys = np.array(ATTR_KEYS, dtype=object)[rng.randint(0, len(ATTR_KEYS), m)]
    ints = rng.randint(100, 600, size=m)
    strs = np.array(["GET", "POST", "mysql", "redis", "svc-a", "svc-b"], dtype=object)[
        rng.randint(0, 6, size=m)
    ]
    is_int = keys == "http.status_code"
    span_attrs = pd.DataFrame(
        {
            "parent_id": parent,
            "key": keys,
            "type": np.where(is_int, 2, 1).astype(np.int32),  # 1=str 2=int
            "str": np.where(is_int, None, strs),
            "int": np.where(is_int, ints, np.int64(0)),
        }
    )
    span_attrs["int"] = span_attrs["int"].where(is_int, other=pd.NA).astype("Int64")

    # span events: 0-3 per span; exceptions concentrated on error spans
    n_ev = rng.randint(0, 4, size=n_spans)
    ev_parent = np.repeat(span_id, n_ev)
    k = len(ev_parent)
    ev_id = np.arange(k, dtype=np.int64)
    ev_name = np.array(EVENT_NAMES, dtype=object)[rng.randint(0, len(EVENT_NAMES), k)]
    parent_status = status_code[ev_parent]
    force_exc = (parent_status == 2) & (rng.random_sample(k) < 0.5)
    ev_name = np.where(force_exc, "exception", ev_name)
    ev_time = EPOCH + (start_us[ev_parent] + rng.randint(0, 1000, size=k) * 1000).astype(
        "timedelta64[us]"
    )
    span_events = pd.DataFrame(
        {"id": ev_id, "parent_id": ev_parent, "time_ts": ev_time, "name": ev_name}
    )

    # span event attrs: 0-2 per event
    n_ea = rng.randint(0, 3, size=k)
    ea_parent = np.repeat(ev_id, n_ea)
    j = len(ea_parent)
    ea_keys = np.array(EVENT_ATTR_KEYS, dtype=object)[rng.randint(0, len(EVENT_ATTR_KEYS), j)]
    ea_vals = np.array(
        ["IOError", "timeout waiting", "3", "warn", "OOM", "disk full"], dtype=object
    )[rng.randint(0, 6, size=j)]
    span_event_attrs = pd.DataFrame(
        {
            "parent_id": ea_parent,
            "key": ea_keys,
            "type": np.full(j, 1, dtype=np.int32),
            "str": ea_vals,
        }
    )

    # span links: ~35% of spans carry 1-2 links that point at REAL other
    # spans (never self), so causality joins resolve; the link row carries
    # the target's trace_id/span_id exactly as the reference's SPAN_LINKS
    # table does (docs/data_model.md:309-420). Drawn strictly after the
    # original tables so those stay byte-identical across versions.
    n_links = np.where(rng.random_sample(n_spans) < 0.35,
                       rng.randint(1, 3, size=n_spans), 0)
    link_parent = np.repeat(span_id, n_links)
    nl = len(link_parent)
    link_id = np.arange(nl, dtype=np.int64)
    target = (link_parent + 1 + rng.randint(0, max(n_spans - 1, 1), size=nl)) % n_spans
    trace_state = np.array(["", "sampled=1", ""], dtype=object)[
        rng.randint(0, 3, size=nl)
    ]
    span_links = pd.DataFrame(
        {
            "id": link_id,
            "parent_id": link_parent,
            "trace_id": spans["trace_id"].to_numpy()[target],
            "span_id_hex": spans["span_id_hex"].to_numpy()[target],
            "trace_state": trace_state,
        }
    )

    # span link attrs: 0-2 per link
    n_la = rng.randint(0, 3, size=nl)
    la_parent = np.repeat(link_id, n_la)
    q = len(la_parent)
    la_keys = np.array(["link.type", "messaging.operation", "peer.service"],
                       dtype=object)[rng.randint(0, 3, size=q)]
    la_vals = np.array(["follows_from", "child_of", "remote", "publish", "svc-a"],
                       dtype=object)[rng.randint(0, 5, size=q)]
    span_link_attrs = pd.DataFrame(
        {
            "parent_id": la_parent,
            "key": la_keys,
            "type": np.full(q, 1, dtype=np.int32),
            "str": la_vals,
        }
    )

    # resource attrs (RESOURCE_ATTRS analog, data_model.md:346-356): spans
    # carry a resource_id; the attrs table is keyed by it. Enables
    # resource-scoped filtering (e.g. k8s.namespace.name = 'prod' → span
    # subset) — the resource-level id bitmap of filter_otap_batch. Drawn
    # after everything above. (SCOPE_ATTRS shares this exact shape.)
    n_resources = max(4, n_spans // 50)
    spans = spans.assign(
        resource_id=rng.randint(0, n_resources, size=n_spans).astype(np.int64)
    )
    ns = np.array(["prod", "staging", "dev"], dtype=object)[
        rng.randint(0, 3, size=n_resources)
    ]
    svc = np.array([f"svc-{i % 7}" for i in range(n_resources)], dtype=object)
    ver = np.array(["1.0", "1.1", "2.0"], dtype=object)[
        rng.randint(0, 3, size=n_resources)
    ]
    resource_attrs = pd.DataFrame(
        {
            "parent_id": np.repeat(np.arange(n_resources, dtype=np.int64), 3),
            "key": np.tile(
                np.array(["k8s.namespace.name", "service.name", "service.version"],
                         dtype=object),
                n_resources,
            ),
            "type": np.full(n_resources * 3, 1, dtype=np.int32),
            "str": np.stack([ns, svc, ver], axis=1).reshape(-1),
        }
    )

    # scope attrs (SCOPE_ATTRS analog, data_model.md:357-366): spans carry
    # a scope_id naming the instrumentation scope that produced them; the
    # attrs table is keyed by it (library name/version/telemetry.sdk).
    # Drawn strictly after everything above (v4).
    n_scopes = 6
    spans = spans.assign(
        scope_id=rng.randint(0, n_scopes, size=n_spans).astype(np.int64)
    )
    lib = np.array(
        ["io.opentelemetry.http", "io.opentelemetry.grpc", "io.opentelemetry.db",
         "custom.tracer", "io.opentelemetry.kafka", "io.opentelemetry.redis"],
        dtype=object,
    )[:n_scopes]
    lib_ver = np.array(["1.28.0", "1.29.0", "2.0.1"], dtype=object)[
        rng.randint(0, 3, size=n_scopes)
    ]
    sdk = np.array(["java", "go", "python"], dtype=object)[
        rng.randint(0, 3, size=n_scopes)
    ]
    scope_attrs = pd.DataFrame(
        {
            "parent_id": np.repeat(np.arange(n_scopes, dtype=np.int64), 3),
            "key": np.tile(
                np.array(["otel.library.name", "otel.library.version",
                          "telemetry.sdk.language"], dtype=object),
                n_scopes,
            ),
            "type": np.full(n_scopes * 3, 1, dtype=np.int32),
            "str": np.stack([lib, lib_ver, sdk], axis=1).reshape(-1),
        }
    )

    # parent_span_id (SPANS.parent_span_id, data_model.md:338): a real
    # tree per trace — the first span by start time is the root (null
    # parent), every other span picks a uniformly random EARLIER span of
    # its own trace, so depths vary and cycles are impossible. Drawn
    # strictly after everything above (v5).
    order = np.lexsort((start_us, trace_ord))  # by (trace, start)
    pos_in_trace = np.zeros(n_spans, dtype=np.int64)
    t_sorted = trace_ord[order]
    same_as_prev = np.concatenate(([False], t_sorted[1:] == t_sorted[:-1]))
    run = np.zeros(n_spans, dtype=np.int64)
    for i in range(1, n_spans):  # per-trace cumcount (traces are short)
        run[i] = run[i - 1] + 1 if same_as_prev[i] else 0
    pos_in_trace[order] = run
    pick = rng.random_sample(n_spans)
    parent_pos = np.floor(pick * np.maximum(pos_in_trace, 1)).astype(np.int64)
    # global index of the chosen parent: the span at (trace, parent_pos)
    starts_sorted = np.where(~same_as_prev)[0]  # order-index where each trace begins
    trace_first = np.repeat(
        starts_sorted, np.diff(np.append(starts_sorted, n_spans))
    )
    trace_first_global = np.empty(n_spans, dtype=np.int64)
    trace_first_global[order] = trace_first
    parent_global = order[trace_first_global[np.arange(n_spans)] + parent_pos]
    is_root = pos_in_trace == 0
    parent_hex = spans["span_id_hex"].to_numpy()[parent_global].astype(object)
    parent_hex[is_root] = None
    spans = spans.assign(parent_span_id=parent_hex)

    return {
        "spans": spans,
        "span_attrs": span_attrs,
        "span_events": span_events,
        "span_event_attrs": span_event_attrs,
        "span_links": span_links,
        "span_link_attrs": span_link_attrs,
        "resource_attrs": resource_attrs,
        "scope_attrs": scope_attrs,
    }


def write_spans_parquet(out_dir: str, n_spans: int, seed: int = 42) -> str:
    """Write all star tables as parquet under ``out_dir`` (idempotent)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # v2: span_links / span_link_attrs added; v3: resource_id + resource
    # attrs; v4: scope_id + scope attrs; v5: parent_span_id tree.
    # Versioned marker forces stale caches to regenerate.
    marker = os.path.join(out_dir, f"_SUCCESS.{n_spans}.{seed}.v5")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for name, pdf in generate_spans_tables(n_spans, seed).items():
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            os.path.join(out_dir, f"{name}.parquet"),
            row_group_size=62_500,
        )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
