"""Deterministic synthetic METRICS star-schema generator.

Reference: the metrics Arrow schema (docs/data_model.md:19-237) — METRICS
with up to 17 child payload tables, one set per point type. This generator
materializes the slices that carry the analytics semantics: METRICS →
NUMBER_DATA_POINTS (parent_id → metric id) → NUMBER_DP_ATTRS and
NUMBER_DP_EXEMPLARS (parent_id → data-point id), the 3-level id-cascade
shape shared with traces, plus the per-point-type tables HISTOGRAM_DP
(delta and cumulative temporality, with bounds/bucket_counts lists) →
HISTOGRAM_DP_ATTRS, and SUMMARY_DP (count/sum + quantile snapshot).

Cumulative streams (sums and histograms) are generated as monotone running
totals per (metric, stream attr) so the latest-wins reaggregation
(operators/metrics.py temporal_latest) has realistic cumulative inputs.

Everything is vectorized numpy and fully deterministic. New point-type
tables draw randomness strictly AFTER the original tables, so the original
tables are byte-identical across generator versions at the same seed.
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

# metric_type: 0=gauge 1=cumulative sum 2=delta histogram
# 3=cumulative histogram 4=summary (ids continue after METRIC_NAMES)
HIST_METRICS = [
    ("http.server.duration.hist", "ms", 2),
    ("rpc.server.duration.hist", "ms", 3),
]
SUMMARY_METRICS = [("http.client.latency.summary", "ms", 4)]
EXPH_METRICS = [("grpc.server.duration.exph", "ms", 5)]  # 5 = delta exp-histogram
HIST_BOUNDS = [5.0, 25.0, 125.0]  # 4 buckets incl. overflow
SUMMARY_QUANTILES = [0.5, 0.9, 0.99]


def generate_metrics_tables(n_dps: int, seed: int = 42) -> dict[str, pd.DataFrame]:
    """Generate the metrics star-schema frames (METRICS plus the
    number/histogram/summary/exp-histogram point tables and their
    attrs/exemplar children) with parent_id-keyed ancestry."""
    rng = np.random.RandomState(seed)

    all_metrics = METRIC_NAMES + HIST_METRICS + SUMMARY_METRICS + EXPH_METRICS
    metrics = pd.DataFrame(
        {
            "id": np.arange(len(all_metrics), dtype=np.int64),
            "name": [m[0] for m in all_metrics],
            "unit": [m[1] for m in all_metrics],
            "metric_type": np.array([m[2] for m in all_metrics], dtype=np.int32),
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

    # ---- histogram data points (HISTOGRAM_DP analog, data_model.md:124-183)
    # drawn strictly after the original tables so those stay byte-identical
    n_h = max(8, n_dps // 4)
    h_id = np.arange(n_h, dtype=np.int64)
    h_parent = (len(METRIC_NAMES) + rng.randint(0, len(HIST_METRICS), size=n_h)).astype(
        np.int64
    )
    h_stream = rng.randint(0, 4, size=n_h).astype(np.int32)
    h_slot = 3_600_000_000 // n_h
    h_t_us = np.arange(n_h) * h_slot + rng.randint(0, max(h_slot, 1), size=n_h)
    n_buckets = len(HIST_BOUNDS) + 1
    delta_counts = rng.randint(0, 9, size=(n_h, n_buckets)).astype(np.int64)
    # cumulative streams: counts grow with time (deterministic running total
    # per stream so latest-wins == max and the fixture needs no sorting)
    t_sec = (h_t_us // 1_000_000).astype(np.int64)
    cum_counts = (
        t_sec[:, None] * (h_stream[:, None] + 1) * np.arange(1, n_buckets + 1)[None, :]
    ).astype(np.int64)
    is_cum = np.array([m[2] for m in HIST_METRICS])[h_parent - len(METRIC_NAMES)] == 3
    counts = np.where(is_cum[:, None], cum_counts, delta_counts)
    h_sum_delta = np.round(rng.uniform(1, 500, size=n_h), 3)
    h_sum = np.where(is_cum, np.round(t_sec * (h_stream + 1) * 1.5, 3), h_sum_delta)
    h_min = np.round(rng.uniform(0, 5, size=n_h), 3)
    h_max = h_min + np.round(rng.uniform(0, 200, size=n_h), 3)
    histogram_dp = pd.DataFrame(
        {
            "id": h_id,
            "parent_id": h_parent,
            "start_ts": np.full(n_h, EPOCH),
            "ts": EPOCH + h_t_us.astype("timedelta64[us]"),
            "stream": h_stream,
            "h_count": counts.sum(axis=1),
            "h_sum": h_sum,
            "h_min": h_min,
            "h_max": h_max,
            "bounds": [HIST_BOUNDS] * n_h,
            "bucket_counts": [row.tolist() for row in counts],
        }
    )

    # histogram dp attrs: 1-2 per dp, same exploded layout
    n_ha = rng.randint(1, 3, size=n_h)
    ha_parent = np.repeat(h_id, n_ha)
    hm = len(ha_parent)
    ha_keys = np.array(DP_ATTR_KEYS, dtype=object)[rng.randint(0, len(DP_ATTR_KEYS), hm)]
    ha_vals = np.array(["200", "500", "GET", "POST", "svc-a", "svc-b", "h1", "h2"],
                       dtype=object)[rng.randint(0, 8, size=hm)]
    histogram_dp_attrs = pd.DataFrame(
        {"parent_id": ha_parent, "key": ha_keys,
         "type": np.full(hm, 1, dtype=np.int32), "str": ha_vals}
    )

    # ---- summary data points (SUMMARY_DP analog)
    n_s = max(8, n_dps // 8)
    s_parent = np.full(n_s, len(METRIC_NAMES) + len(HIST_METRICS), dtype=np.int64)
    s_stream = rng.randint(0, 4, size=n_s).astype(np.int32)
    s_slot = 3_600_000_000 // n_s
    s_t_us = np.arange(n_s) * s_slot + rng.randint(0, max(s_slot, 1), size=n_s)
    q_vals = np.round(np.sort(rng.uniform(1, 100, size=(n_s, len(SUMMARY_QUANTILES)))), 3)
    summary_dp = pd.DataFrame(
        {
            "id": np.arange(n_s, dtype=np.int64),
            "parent_id": s_parent,
            "start_ts": np.full(n_s, EPOCH),
            "ts": EPOCH + s_t_us.astype("timedelta64[us]"),
            "stream": s_stream,
            "s_count": rng.randint(1, 50, size=n_s).astype(np.int64),
            "s_sum": np.round(rng.uniform(10, 1000, size=n_s), 3),
            "quantiles": [SUMMARY_QUANTILES] * n_s,
            "values": [row.tolist() for row in q_vals],
        }
    )

    # ---- exponential-histogram data points (EXP_HISTOGRAM_DATA_POINTS
    # analog, data_model.md:211-227): ragged positive/negative bucket lists
    # at mixed scales so the merge's scale alignment is exercised. (The
    # per-point-type ATTRS cascade is demonstrated by histogram_dp_attrs;
    # exp-histogram attrs/exemplars share that exact shape.)
    n_e = max(8, n_dps // 8)
    e_parent = np.full(
        n_e, len(METRIC_NAMES) + len(HIST_METRICS) + len(SUMMARY_METRICS),
        dtype=np.int64,
    )
    e_stream = rng.randint(0, 4, size=n_e).astype(np.int32)
    e_slot = 3_600_000_000 // n_e
    e_t_us = np.arange(n_e) * e_slot + rng.randint(0, max(e_slot, 1), size=n_e)
    e_scale = rng.randint(0, 3, size=n_e).astype(np.int32)
    pos_len = rng.randint(0, 5, size=n_e)
    neg_len = rng.randint(0, 4, size=n_e)
    pos_pool = rng.randint(0, 7, size=int(pos_len.sum()))
    neg_pool = rng.randint(0, 7, size=int(neg_len.sum()))
    pos_split = np.split(pos_pool, np.cumsum(pos_len)[:-1])
    neg_split = np.split(neg_pool, np.cumsum(neg_len)[:-1])
    zero = rng.randint(0, 3, size=n_e).astype(np.int64)
    exp_histogram_dp = pd.DataFrame(
        {
            "id": np.arange(n_e, dtype=np.int64),
            "parent_id": e_parent,
            "start_ts": np.full(n_e, EPOCH),
            "ts": EPOCH + e_t_us.astype("timedelta64[us]"),
            "stream": e_stream,
            "e_count": np.array([c.sum() for c in pos_split], dtype=np.int64)
            + np.array([c.sum() for c in neg_split], dtype=np.int64)
            + zero,
            "e_sum": np.round(rng.uniform(-50, 500, size=n_e), 3),
            "scale": e_scale,
            "zero_count": zero,
            "pos_offset": rng.randint(-4, 10, size=n_e).astype(np.int32),
            "pos_counts": [c.astype(np.int64).tolist() for c in pos_split],
            "neg_offset": rng.randint(-4, 10, size=n_e).astype(np.int32),
            "neg_counts": [c.astype(np.int64).tolist() for c in neg_split],
        }
    )

    # ---- remaining per-point-type child instances (HISTOGRAM_DP_EXEMPLARS
    # data_model.md:191-199, EXP_HISTOGRAM_DP_EXEMPLARS :228-236,
    # SUMMARY_DP_ATTRS :152-160): same machinery as the number-point
    # children, keyed to their own point tables. Drawn strictly after all
    # v3 tables so those stay byte-identical at the same seed.
    def _exemplars(parent_ids: np.ndarray, parent_t_us: np.ndarray,
                   frac: float) -> pd.DataFrame:
        has = rng.random_sample(len(parent_ids)) < frac
        pids = parent_ids[has]
        kk = len(pids)
        tr = np.array(["".join(r) for r in digits[rng.randint(0, 16, size=(kk, 32))]],
                      dtype=object)
        sp = np.array(["".join(r) for r in digits[rng.randint(0, 16, size=(kk, 16))]],
                      dtype=object)
        return pd.DataFrame(
            {
                "id": np.arange(kk, dtype=np.int64),
                "parent_id": pids,
                "ts": EPOCH + parent_t_us[has].astype("timedelta64[us]"),
                "double_value": np.round(rng.exponential(50.0, size=kk), 3),
                "trace_id": tr,
                "span_id_hex": sp,
            }
        )

    histogram_dp_exemplars = _exemplars(h_id, h_t_us, 0.25)
    exp_histogram_dp_exemplars = _exemplars(
        np.arange(n_e, dtype=np.int64), e_t_us, 0.25
    )

    s_ids = np.arange(n_s, dtype=np.int64)
    n_sa = rng.randint(1, 3, size=n_s)
    sa_parent = np.repeat(s_ids, n_sa)
    sm = len(sa_parent)
    sa_keys = np.array(DP_ATTR_KEYS, dtype=object)[rng.randint(0, len(DP_ATTR_KEYS), sm)]
    sa_vals = np.array(["200", "500", "GET", "POST", "svc-a", "svc-b", "h1", "h2"],
                       dtype=object)[rng.randint(0, 8, size=sm)]
    summary_dp_attrs = pd.DataFrame(
        {"parent_id": sa_parent, "key": sa_keys,
         "type": np.full(sm, 1, dtype=np.int32), "str": sa_vals}
    )

    # ---- exemplar ATTRS instances (NUMBER_DP_EXEMPLAR_ATTRS
    # data_model.md:30, HISTOGRAM_DP_EXEMPLAR_ATTRS :37,
    # EXP_HISTOGRAM_DP_EXEMPLAR_ATTRS :41): the deepest leaves of the
    # 17-table metrics model — attrs hanging off the exemplars, four
    # levels below METRICS. Same exploded (parent_id, key, type, str)
    # shape as every other attrs table; drawn strictly AFTER all v4
    # tables (number → histogram → exp-histogram order) so those stay
    # byte-identical at the same seed.
    def _ex_attrs(ex_ids: np.ndarray) -> pd.DataFrame:
        per = rng.randint(1, 3, size=len(ex_ids))
        parent = np.repeat(ex_ids, per)
        me = len(parent)
        ks = np.array(DP_ATTR_KEYS, dtype=object)[
            rng.randint(0, len(DP_ATTR_KEYS), me)
        ]
        vs = np.array(["200", "500", "GET", "POST", "svc-a", "svc-b", "h1", "h2"],
                      dtype=object)[rng.randint(0, 8, size=me)]
        return pd.DataFrame(
            {"parent_id": parent, "key": ks,
             "type": np.full(me, 1, dtype=np.int32), "str": vs}
        )

    number_dp_exemplar_attrs = _ex_attrs(
        number_dp_exemplars["id"].to_numpy()
    )
    histogram_dp_exemplar_attrs = _ex_attrs(
        histogram_dp_exemplars["id"].to_numpy()
    )
    exp_histogram_dp_exemplar_attrs = _ex_attrs(
        exp_histogram_dp_exemplars["id"].to_numpy()
    )

    return {
        "metrics": metrics,
        "number_data_points": number_data_points,
        "number_dp_attrs": number_dp_attrs,
        "number_dp_exemplars": number_dp_exemplars,
        "histogram_dp": histogram_dp,
        "histogram_dp_attrs": histogram_dp_attrs,
        "summary_dp": summary_dp,
        "exp_histogram_dp": exp_histogram_dp,
        "histogram_dp_exemplars": histogram_dp_exemplars,
        "exp_histogram_dp_exemplars": exp_histogram_dp_exemplars,
        "summary_dp_attrs": summary_dp_attrs,
        "number_dp_exemplar_attrs": number_dp_exemplar_attrs,
        "histogram_dp_exemplar_attrs": histogram_dp_exemplar_attrs,
        "exp_histogram_dp_exemplar_attrs": exp_histogram_dp_exemplar_attrs,
    }


def write_metrics_parquet(out_dir: str, n_dps: int, seed: int = 42) -> str:
    """Write all star tables as parquet under ``out_dir`` (idempotent)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # v2: histogram_dp / histogram_dp_attrs / summary_dp added; v3:
    # exp_histogram_dp; v4: histogram/exp-histogram exemplars +
    # summary_dp_attrs; v5: the three exemplar-attrs leaf tables — the
    # 17-table model fully instantiated. Versioned marker forces stale
    # caches to regenerate.
    marker = os.path.join(out_dir, f"_SUCCESS.{n_dps}.{seed}.v5")
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
