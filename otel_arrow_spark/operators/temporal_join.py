"""Temporal joins Spark lacks as built-ins: as-of join and interval
(range) join, both expressed shuffle-minimally.

Telemetry correlation needs both constantly — "which deploy was live when
this error fired" (as-of), "which spans overlap this incident window"
(range) — and naive formulations are non-equi joins that Spark executes
as BroadcastNestedLoopJoin (a scan per probe row; dead at scale).

As-of (`asof_join`): the union-window formulation — tag both sides, union,
one window per key ordered by time, running `last(..., ignorenulls)` fills
each left row with the most recent right row's values. ONE shuffle on the
key, a linear scan per key series, and no join operator at all. Skew is
bounded by a single key's series length (a hot key's window is still
sorted locally, not funneled cross-partition).

Range (`interval_join`): bucketed equi-join — intervals explode to the
time buckets they cover, points map to exactly one bucket, the join is an
equi-join on (key, bucket) that Catalyst shuffles hash-partitioned, and
the exact containment predicate filters in the same stage. Each
(interval, point) pair meets in exactly one bucket, so no dedup pass.
Bucket width trades explode factor against join selectivity; pick it near
the median interval length.

Reference analog: the experimental query engine has no temporal join —
this is part of the training-/observability-pipeline surface added on top
of parity (README "LLM data ops"); semantics follow DuckDB's ASOF JOIN
(backward, inclusive), which is also the oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    on: str = "ts",
    right_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gains the values of ONE right row within
    the same ``by`` key — ``backward`` (default): the latest right with
    ``right.on <= left.on`` (``<`` when ``strict``); ``forward``: the
    earliest right with ``right.on >= left.on`` (``>`` when ``strict``).
    Nulls where no right row qualifies.

    Right-side (key, on) pairs should be unique for deterministic output
    (same contract as DuckDB ASOF JOIN, the oracle — DuckDB expresses
    direction via the inequality: ``l.ts >= r.ts`` backward,
    ``l.ts <= r.ts`` forward).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    right_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in by and c != on]
    )
    if not right_cols:
        return left
    l_struct = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    # All right columns travel as ONE struct populated only on right-side
    # rows: `last(_rrow, ignorenulls)` then fills whole rows, so a matched
    # right row with a legitimate NULL in one column keeps that NULL rather
    # than having the column backfilled from an older right row (per-column
    # fills would mix values across right rows — DuckDB ASOF JOIN, the
    # oracle, never does that).
    r_struct = F.struct(*[F.col(c) for c in right_cols]).alias("_rrow")
    r_struct_type = right.select(r_struct).schema["_rrow"].dataType
    lhs = left.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(1).alias("_is_left"),
        l_struct,
        F.lit(None).cast(r_struct_type).alias("_rrow"),
    )
    rhs = right.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(left.select(l_struct).schema["_lrow"].dataType).alias("_lrow"),
        r_struct,
    )
    # At equal timestamps the right row must be visible to the left row
    # for the inclusive form and hidden for strict. Backward scans the
    # frame (-∞, current] with last(); forward scans [current, +∞) with
    # first(); visibility at ties is the _is_left sort direction.
    if direction == "backward":
        order = [F.col("_ts")] + (
            [F.col("_is_left").desc()] if strict else [F.col("_is_left")]
        )
        frame = (Window.unboundedPreceding, Window.currentRow)
        fill = F.last("_rrow", ignorenulls=True)
    else:
        order = [F.col("_ts")] + (
            [F.col("_is_left")] if strict else [F.col("_is_left").desc()]
        )
        frame = (Window.currentRow, Window.unboundedFollowing)
        fill = F.first("_rrow", ignorenulls=True)
    w = Window.partitionBy(*by).orderBy(*order).rowsBetween(*frame)
    filled = lhs.unionByName(rhs).select(
        "_is_left",
        "_lrow",
        fill.over(w).alias("_asof"),
    )
    return filled.where(F.col("_is_left") == 1).select(
        "_lrow.*",
        *[F.col(f"_asof.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    by: Sequence[str],
    point_ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_seconds: int = 600,
) -> DataFrame:
    """Join each point to every interval containing it
    (``start <= point_ts <= end``, same ``by`` key) via a bucketed
    equi-join — never a nested-loop non-equi join.

    Returns points columns + interval columns (caller ensures disjoint
    names); inner semantics — aggregate and left-join back onto the
    intervals table to keep match-less intervals.
    """
    by = list(by)
    w_us = int(bucket_seconds) * 1_000_000

    def bucket(c: str):  # unix_micros rejects TIMESTAMP_NTZ (parquet default)
        return F.floor(F.unix_micros(F.col(c).cast("timestamp")) / F.lit(w_us))

    p = points.withColumn("_bucket", bucket(point_ts))
    i = intervals.withColumn(
        "_bucket", F.explode(F.sequence(bucket(start), bucket(end)))
    )
    cond = (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end))
    return p.join(i, on=by + ["_bucket"], how="inner").where(cond).drop("_bucket")
