"""Deterministic synthetic METRICS star-schema generator.

Reference: the metrics Arrow schema (docs/data_model.md:24-120) — METRICS
with up to 17 child payload tables. This generator materializes the
univariate-metric slice that carries the analytics semantics: METRICS →
NUMBER_DATA_POINTS (parent_id → metric id) → NUMBER_DP_ATTRS and
NUMBER_DP_EXEMPLARS (parent_id → data-point id), the 3-level id-cascade
shape shared with traces.

Cumulative sums are generated as monotone running totals per (metric,
stream attr) so the latest-wins reaggregation (operators/metrics.py
temporal_latest) has realistic cumulative inputs.

Everything is vectorized numpy and fully deterministic.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

EPOCH = np.datetime64("2026-01-01T00:00:00", "us")

METRIC_NAMES = [
    ("http.server.duration", "ms", 0),   # type 0 = gauge
    ("http.server.requests", "1", 1),    # type 1 = cumulative sum
    ("db.client.connections", "1", 0),
    ("process.cpu.time", "s", 1),
    ("queue.depth", "1", 0),
]
DP_ATTR_KEYS = ["http.status_code", "http.method", "service.name", "host.name"]


def generate_metrics_tables(n_dps: int, seed: int = 42) -> dict[str, pd.DataFrame]:
    """Generate {metrics, number_data_points, number_dp_attrs,
    number_dp_exemplars} frames with parent_id-keyed ancestry."""
    rng = np.random.RandomState(seed)

    metrics = pd.DataFrame(
        {
            "id": np.arange(len(METRIC_NAMES), dtype=np.int64),
            "name": [m[0] for m in METRIC_NAMES],
            "unit": [m[1] for m in METRIC_NAMES],
            "metric_type": np.array([m[2] for m in METRIC_NAMES], dtype=np.int32),
        }
    )

    dp_id = np.arange(n_dps, dtype=np.int64)
    parent = rng.randint(0, len(METRIC_NAMES), size=n_dps).astype(np.int64)
    stream = rng.randint(0, 8, size=n_dps)  # per-metric stream ordinal
    # one time slot per dp (slot + jitter < slot width) → globally unique
    # timestamps, so latest-wins reaggregation has no max_by ties
    slot = 3_600_000_000 // n_dps
    t_us = np.arange(n_dps) * slot + rng.randint(0, max(slot, 1), size=n_dps)
    is_sum = np.array([m[2] for m in METRIC_NAMES])[parent] == 1
    gauge_vals = np.round(rng.exponential(50.0, size=n_dps), 3)
    # cumulative streams: value grows with time so later points supersede
    cum_vals = np.round(t_us / 1e6 * (1 + stream), 3)
    number_data_points = pd.DataFrame(
        {
            "id": dp_id,
            "parent_id": parent,
            "start_ts": np.full(n_dps, EPOCH),
            "ts": EPOCH + t_us.astype("timedelta64[us]"),
            "double_value": np.where(is_sum, cum_vals, gauge_vals),
            "stream": stream.astype(np.int32),
        }
    )

    # dp attrs: 1-2 per dp
    n_attrs = rng.randint(1, 3, size=n_dps)
    a_parent = np.repeat(dp_id, n_attrs)
    m = len(a_parent)
    keys = np.array(DP_ATTR_KEYS, dtype=object)[rng.randint(0, len(DP_ATTR_KEYS), m)]
    vals = np.array(["200", "500", "GET", "POST", "svc-a", "svc-b", "h1", "h2"],
                    dtype=object)[rng.randint(0, 8, size=m)]
    number_dp_attrs = pd.DataFrame(
        {"parent_id": a_parent, "key": keys, "type": np.full(m, 1, dtype=np.int32),
         "str": vals}
    )

    # exemplars: ~20% of dps carry one
    has_ex = rng.random_sample(n_dps) < 0.2
    ex_parent = dp_id[has_ex]
    k = len(ex_parent)
    digits = np.array(list("0123456789abcdef"))
    trace = np.array(["".join(r) for r in digits[rng.randint(0, 16, size=(k, 32))]],
                     dtype=object)
    number_dp_exemplars = pd.DataFrame(
        {
            "id": np.arange(k, dtype=np.int64),
            "parent_id": ex_parent,
            "ts": EPOCH + (t_us[has_ex]).astype("timedelta64[us]"),
            "double_value": np.round(rng.exponential(50.0, size=k), 3),
            "trace_id": trace,
        }
    )

    return {
        "metrics": metrics,
        "number_data_points": number_data_points,
        "number_dp_attrs": number_dp_attrs,
        "number_dp_exemplars": number_dp_exemplars,
    }


def write_metrics_parquet(out_dir: str, n_dps: int, seed: int = 42) -> str:
    """Write the four tables as parquet under ``out_dir`` (idempotent)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, f"_SUCCESS.{n_dps}.{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for name, pdf in generate_metrics_tables(n_dps, seed).items():
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            os.path.join(out_dir, f"{name}.parquet"),
            row_group_size=62_500,
        )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
