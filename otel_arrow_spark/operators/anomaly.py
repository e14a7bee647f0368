"""Rolling z-score anomaly detection over metric/event series.

The KQL family's ``series_decompose_anomalies`` (public Azure Data
Explorer docs) reduces, for the un-seasonal case, to flagging points
far from a rolling baseline; the reference's query surface stops at
``summarize`` so this is a pure extension — but it's THE query an
alerting pipeline runs over the temporal-reaggregation output
(temporal_reaggregation_processor/mod.rs feeds exactly this consumer).

Scale shape: one window stage (partition by series key, order by time),
rows-frame of the trailing ``lookback`` points — a single Exchange on
the series key, no self-join, no collect; at 10^12 rows the state per
task is one frame, and skew is bounded by the widest single series.

Determinism: mean/variance are derived from EXPLICIT frame sums
(Σv, Σv², n) rather than ``avg``/``stddev`` window calls — engines
disagree on windowed-aggregate internals (streaming frames vs segment
trees accumulate in different orders), but integer-valued inputs make
Σv and Σv² exact in any order, so (v−μ)/σ is bit-identical across
engines. Callers wanting cross-engine-stable output should quantize
``value_col`` (e.g. cents) first; the driver query does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore_anomalies(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    lookback: int = 20,
    min_points: int = 10,
    z_thresh: float = 3.0,
    tiebreak: tuple[str, ...] = (),
    out_col: str = "z",
) -> DataFrame:
    """Flag rows whose value deviates more than ``z_thresh`` standard
    deviations from the mean of the PREVIOUS ``lookback`` points of the
    same series (the current point is excluded from its own baseline, so
    a spike cannot mask itself). Rows with fewer than ``min_points``
    trailing points, or a zero-variance baseline, are never flagged.

    ``tiebreak``: extra ordering columns for equal timestamps — required
    for cross-engine determinism (same lesson as sessionize: an
    untiebroken ORDER BY is nondeterministic under shuffle).
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = (
        Window.partitionBy(*[F.col(c) for c in key_cols])
        .orderBy(*order)
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col).cast("double")
    n = F.count(value_col).over(w)
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    # try_divide: the leading rows of every series have n = 0 or 1 and
    # would hit ANSI DIVIDE_BY_ZERO before the min_points filter runs
    mean = F.try_divide(s1, n)
    # sample variance from the exact sums; greatest() absorbs the tiny
    # negative that non-integer inputs could produce. The (s1*s1)/n
    # association is deliberate — it matches the oracle's literal
    # s1*s1/n so both engines evaluate the identical float expression.
    var = F.greatest(
        F.try_divide(s2 - F.try_divide(s1 * s1, n), n - 1), F.lit(0.0)
    )
    z = F.try_divide(v - mean, F.sqrt(var))
    # one select, not chained withColumn: all the window expressions
    # must land in a single Window node (chaining materializes one
    # Window stage per dependent projection — 3x the frame passes)
    flagged = (
        df.select(
            "*", n.alias("_n"), var.alias("_var"), z.alias(out_col)
        )
        .where(
            (F.col("_n") >= min_points)
            & (F.col("_var") > 0)
            & (F.abs(F.col(out_col)) > z_thresh)
        )
        .drop("_n", "_var")
    )
    return flagged


def ewma_smooth(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.5,
    lookback: int = 64,
    tiebreak: tuple[str, ...] = (),
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per series — the smoothing
    pass dashboards and alert baselines run over the temporal-reagg
    output (PromQL's holt_winters cousin; pandas ``ewm(adjust=True)``
    semantics): ``s_t = Σ_j q^j·x_{t-j} / Σ_j q^j`` with ``q = 1-α``,
    truncated at ``lookback`` points.

    The truncation is what makes this scale AND replay: the textbook
    recursion ``s_t = αx_t + (1-α)s_{t-1}`` is an unbounded sequential
    scan (and its prefix-sum rewrite overflows ``q^-t`` after ~700
    rows), while the truncated form drops only a ``q^lookback``
    (≈1e-19 at the defaults) tail and becomes ONE window stage: a
    trailing rows-frame collected in frame order, folded by a
    higher-order ``F.aggregate`` — no self-join, no Python, no
    recursion. The denominator uses the closed form ``(1-q^n)/(1-q)``
    so any engine replaying the query computes the identical
    expression.

    Cross-engine note: the weighted sum is float; compare rounded
    (CLAUDE.md rule) — the driver query rounds to 6 dp on both sides.
    Rows with a NULL value or NULL timestamp are EXCLUDED (from both
    the smoothing state and the output): a NULL value would poison the
    whole trailing frame, and NULL-timestamp ordering differs between
    engines. Impute upstream if they should participate.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0,1], got {alpha}")
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    q = 1.0 - alpha
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    wp = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    frame = wp.rowsBetween(-(lookback - 1), 0)
    v = F.col(value_col).cast("double")
    rn = F.row_number().over(wp)
    # NULL guard: a NULL value would poison the next `lookback` folds
    # with NULL (acc + NULL), and a NULL timestamp sorts NULLS FIRST
    # here but NULLS LAST in engines like DuckDB — excluding such rows
    # up front keeps the operator total and engine-replayable; callers
    # wanting them smoothed must impute first.
    df = df.where(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
    # two projections, one Exchange: same partitioning + ordering → Spark
    # reuses the sort (the sessionize precedent)
    with_rn = df.withColumn("_rn", rn)
    arr = F.collect_list(
        F.struct(F.col("_rn").alias("rn"), v.alias("v"))
    ).over(frame)
    num = F.aggregate(
        F.col("_arr"),
        F.lit(0.0),
        lambda acc, e: acc
        + F.pow(F.lit(q), (F.col("_rn") - e["rn"]).cast("double")) * e["v"],
    )
    # closed form Σ_{j<n} q^j; q ∈ [0,1) given α ∈ (0,1], and at α=1
    # pow(0, n≥1) = 0 makes this exactly 1 — no special case needed
    n = F.size(F.col("_arr")).cast("double")
    den = (1.0 - F.pow(F.lit(q), n)) / F.lit(1.0 - q)
    return (
        with_rn.withColumn("_arr", arr)
        .withColumn(out_col, num / den)
        .drop("_rn", "_arr")
    )
