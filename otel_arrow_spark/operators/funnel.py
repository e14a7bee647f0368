"""Ordered-conversion funnel analysis — which keys progress through an
ordered sequence of event types (view → click → purchase), and how fast.

The classic product/telemetry question the reference's pipeline feeds
downstream dashboards with (per-sink aggregates over routed signal
classes, otap-dataflow signal routing); here it is a first-class
operator so the answer is ONE shuffle instead of k self-joins.

Semantics: step ``k`` (0-based) is reached at the first event of type
``steps[k]`` that occurs STRICTLY AFTER the event that reached step
``k-1`` (step 0 at the key's earliest ``steps[0]`` event). Strictly-after
makes equal-timestamp ties irrelevant to the outcome, so the result is
deterministic across engines without a tiebreaker on the *comparison*
side (the internal sort still carries one for full replay determinism).

Scale shape: one ``groupBy(keys)`` shuffle carrying only (ts, tiebreak,
step-ordinal) triples — event payloads never enter the shuffle, and
non-step events are filtered BEFORE it (predicate reaches the scan). The
per-key state machine runs as a higher-order ``F.aggregate`` over the
sorted struct array — pure JVM expression, no Python, bounded by the
per-key step-event count (same contract as any per-entity window, e.g.
sessionize). At 10^12 rows this is a single map-side-pruned shuffle on
the funnel keys; skewed keys are bounded by their own event counts, not
by the corpus.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_progress(
    df: DataFrame,
    steps: Sequence[str],
    by: Sequence[str | Column],
    event_col: str = "event_type",
    on: str = "ts",
    tiebreak: str | None = None,
    horizon_seconds: int | None = None,
) -> DataFrame:
    """Per key: how many funnel ``steps`` were completed, in order.

    Returns one row per key that reached at least step 0, with

    * ``steps_completed`` — int in ``[1, len(steps)]``
    * ``funnel_us`` — integer microseconds from the step-0 event to the
      last completed step's event (0 when only step 0 was reached).
      Integer on purpose: a rounded float duration can diverge between
      engines at the decimal boundary (see operators/sessionize.py).

    Keys with no ``steps[0]`` event produce no row (the population is
    "entered the funnel"); left-join against the key universe if a
    zero-step row is wanted.

    ``by`` may mix column names and expressions (e.g. ``F.to_date("ts")
    .alias("day")``) — expressions MUST carry an alias.

    ``horizon_seconds`` bounds the whole conversion window: steps beyond
    step 0 count only within ``horizon_seconds`` of the step-0 event (the
    "converted within an hour" variant every funnel dashboard offers).
    ``None`` = unbounded. A too-late step does not close the funnel — a
    later in-horizon event of the same type can still advance it, which
    is exactly the first-qualifying-event semantics of the unbounded
    form restricted to the window.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")

    step_ord = F.when(F.col(event_col) == steps[0], F.lit(0))
    for i, s in enumerate(steps[1:], start=1):
        step_ord = step_ord.when(F.col(event_col) == s, F.lit(i))

    keyed = df.where(F.col(event_col).isin(steps)).select(
        *by,
        F.col(on).alias("_ts"),
        (F.col(tiebreak) if tiebreak else F.monotonically_increasing_id())
        .alias("_tb"),
        step_ord.alias("_step"),
    )
    key_names = [f.name for f in keyed.schema.fields[: len(list(by))]]
    ts_type = keyed.schema["_ts"].dataType

    # state machine over the time-sorted step events: advance exactly when
    # the next event's ordinal equals the number of steps already done AND
    # it is strictly after the previous advance (vacuously true for step 0)
    null_ts = F.lit(None).cast(ts_type)
    init = F.struct(
        F.lit(0).alias("n"), null_ts.alias("first"), null_ts.alias("last")
    )

    def advance(acc: Column, x: Column) -> Column:
        take = (x["_step"] == acc["n"]) & (
            acc["last"].isNull() | (x["_ts"] > acc["last"])
        )
        if horizon_seconds is not None:
            in_horizon = acc["first"].isNull() | (
                x["_ts"]
                <= acc["first"]
                + F.expr(f"INTERVAL '{int(horizon_seconds)}' SECOND")
            )
            take = take & in_horizon
        return F.when(
            take,
            F.struct(
                (acc["n"] + F.lit(1)).alias("n"),
                F.coalesce(acc["first"], x["_ts"]).alias("first"),
                x["_ts"].alias("last"),
            ),
        ).otherwise(acc)

    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    out = (
        keyed.groupBy(*key_names)
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("_ts", "_tb", "_step"))),
                init,
                advance,
            ).alias("_fs")
        )
        .where(F.col("_fs.n") >= 1)
        .select(
            *key_names,
            F.col("_fs.n").alias("steps_completed"),
            (us(F.col("_fs.last")) - us(F.col("_fs.first")))
            .cast("long")
            .alias("funnel_us"),
        )
    )
    return out


def funnel_summary(
    df: DataFrame,
    steps: Sequence[str],
    by: Sequence[str | Column],
    event_col: str = "event_type",
    on: str = "ts",
    tiebreak: str | None = None,
    horizon_seconds: int | None = None,
) -> DataFrame:
    """Per-step reach counts over :func:`funnel_progress`: one row per
    step — ALWAYS ``len(steps)`` rows, a step nobody reached shows
    ``n_reached = 0`` / ``conversion = 0.0`` rather than silently
    vanishing from the chart — with ``n_reached`` (keys completing ≥
    that step) and ``conversion`` (fraction of step-0 entrants). The
    classic funnel chart — a tiny second aggregate over the per-key
    result. With zero entrants the result is empty (no denominator to
    chart against)."""
    steps = list(steps)
    prog = funnel_progress(
        df, steps, by, event_col, on, tiebreak, horizon_seconds
    )
    reached = prog.select(
        F.explode(
            F.sequence(F.lit(1), F.col("steps_completed"))
        ).alias("step_idx")
    ).groupBy("step_idx").agg(F.count(F.lit(1)).alias("n_reached"))
    all_steps = df.sparkSession.range(1, len(steps) + 1).select(
        F.col("id").cast("int").alias("step_idx")
    )
    per_step = all_steps.join(F.broadcast(reached), "step_idx", "left") \
        .withColumn("n_reached", F.coalesce(F.col("n_reached"), F.lit(0)))
    entered = per_step.where(
        (F.col("step_idx") == 1) & (F.col("n_reached") > 0)
    ).select(F.col("n_reached").alias("_n0"))
    step_names = F.array(*[F.lit(s) for s in steps])
    return (
        per_step.crossJoin(F.broadcast(entered))
        .select(
            "step_idx",
            F.element_at(step_names, F.col("step_idx")).alias("step"),
            "n_reached",
            F.round(F.col("n_reached") / F.col("_n0"), 6).alias("conversion"),
        )
        .orderBy("step_idx")
    )


def cohort_retention(
    df: DataFrame,
    by: str = "user_id",
    on: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Exact cohort-retention matrix: keys cohorted by their FIRST active
    period, counted in every later period they reappear — the triangle
    chart behind every retention dashboard, and the exact counterpart of
    the theta-sketch retention estimates (operators/sketches.py
    retention_estimates answers the same question from kilobyte sidecars;
    this answers it exactly from the raw table).

    Returns ``(cohort, period_offset, n_active)``: of the keys first seen
    in ``cohort``, ``n_active`` were active ``period_offset`` periods
    later (offset 0 = the cohort's own size).

    Scale shape: ONE shuffle on the key — per key the aggregate keeps
    ``min(period)`` plus the distinct-period set (bounded by the calendar,
    not the row count: a year of weeks is ≤ 53 elements however many
    billion events the key has), the set explodes into (cohort, offset)
    pairs, and the final count groups a few hundred cells. No self-join,
    no distinct-before-join funnel.
    """
    if period not in ("week", "month", "day"):
        raise ValueError(f"period must be week|month|day, got {period}")
    p = F.date_trunc(period, F.col(on)).cast("date")
    per_key = (
        df.select(F.col(by).alias("_k"), p.alias("_p"))
        .groupBy("_k")
        .agg(
            F.min("_p").alias("_cohort"),
            F.collect_set("_p").alias("_periods"),
        )
    )
    diff = {
        "day": lambda a, b: F.datediff(a, b),
        "week": lambda a, b: (F.datediff(a, b) / 7).cast("int"),
        "month": lambda a, b: (
            F.months_between(a, b).cast("int")
        ),
    }[period]
    return (
        per_key.select(
            F.col("_cohort").alias("cohort"),
            F.explode("_periods").alias("_p"),
        )
        .select(
            "cohort",
            diff(F.col("_p"), F.col("cohort")).alias("period_offset"),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def ab_conversion(
    progress: DataFrame,
    variant_col: str = "variant",
    target_step: int = 2,
    progress_col: str = "steps_completed",
) -> DataFrame:
    """A/B experiment readout over :func:`funnel_progress` output:
    per variant, entrants / conversions (``progress_col >=
    target_step``) / conversion rate, plus the one-vs-rest
    two-proportion z-statistic (pooled standard error) — the classic
    experiment-dashboard significance column. One-vs-rest keeps the
    statistic well-defined for any number of variants; with exactly two
    it is the textbook two-sample z (equal magnitude, opposite sign).

    Scale shape: ONE aggregate to per-variant counts (partial+final),
    then the z arithmetic over the tiny per-variant table via an
    unpartitioned window — rows = number of variants, so the "global"
    window is constant-size; nothing is collected.
    """
    from pyspark.sql import Window

    if target_step < 1:
        raise ValueError(f"target_step must be >= 1, got {target_step}")
    agg = progress.groupBy(variant_col).agg(
        F.count(F.lit(1)).alias("n_entered"),
        F.sum(
            (F.col(progress_col) >= target_step).cast("long")
        ).alias("n_converted"),
    )
    w = Window.partitionBy()
    n, c = F.col("n_entered"), F.col("n_converted")
    n_rest = F.sum(n).over(w) - n
    c_rest = F.sum(c).over(w) - c
    p = c / n
    p_rest = c_rest / n_rest
    p_pool = (c + c_rest) / (n + n_rest)
    se = F.sqrt(p_pool * (1 - p_pool) * (1 / n + 1 / n_rest))
    return agg.select(
        variant_col,
        "n_entered",
        "n_converted",
        p.alias("conv_rate"),
        F.try_divide(p - p_rest, se).alias("z_vs_rest"),
    )
