"""Log-pattern analytics: template mining and staleness/gap detection.

Template mining is the classic log-parsing step (Drain, He et al., ICWS
2017 — public literature): collapse the variable fragments of a message so
structurally identical logs share one template, then rank templates by
support. The reference ships the same *masking* idea in its KQL recordset
engine's ``parse``/pattern operators and in the syslog receiver's
structured-field split (syslog_cef_receiver/parser/mod.rs:46-104 separates
the stable header from the free-form MSG); here the variable-run masking
is two native ``regexp_replace`` expressions — whole-stage codegen, no
Python, no shuffle until the final count.

Gap detection is the metrics-staleness dual of sessionization (PromQL's
``absent()``-family, public semantics): where sessionize *groups* rows
separated by small gaps, gap_report *emits* the large gaps themselves.
Same single-window plan: one shuffle on the key, lag, filter.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Masking order matters: long hex ids first (else their digit runs decay
# into `<N>` fragments), then digit runs. Both patterns are RE2-safe so
# the DuckDB oracle can apply the byte-identical regexes.
HEX_ID_RE = "[0-9a-f]{16,}"
NUM_RE = "[0-9]+"


def template_of(col, hex_token: str = "<ID>", num_token: str = "<N>"):
    """Column expression: the message with hex ids and digit runs masked."""
    return F.regexp_replace(
        F.regexp_replace(col, HEX_ID_RE, hex_token), NUM_RE, num_token
    )


def mine_templates(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "conv_id",
    min_count: int = 50,
) -> DataFrame:
    """Mask variable runs in ``text_col`` and return every template with
    support ≥ ``min_count``: (template, n, n_groups, example).

    ``example`` is the lexicographic-min raw message of the template —
    deterministic, so cross-engine comparison is exact. The exact
    ``countDistinct(group)`` plans as the standard two-phase distinct
    aggregate — partial on (template, group), exchange, final on
    template: two shuffles, but the FIRST already collapsed to
    (template, group) cardinality map-side, so both are sized by the
    pattern vocabulary, not the corpus — which is what makes the op
    usable at 10^12 rows (swap in approx_count_distinct to drop the
    second phase when an estimate suffices). The HAVING filter keeps the
    result proportional to the pattern population.
    """
    t = df.select(
        template_of(F.col(text_col)).alias("template"),
        F.col(text_col).alias("_raw"),
        F.col(group_col).alias("_grp"),
    )
    return (
        t.groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("_grp").alias("n_groups"),
            F.min("_raw").alias("example"),
        )
        .filter(F.col("n") >= min_count)
    )


def gap_report(
    df: DataFrame,
    by: Sequence[str],
    on: str = "ts",
    min_gap_seconds: int = 43_200,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """One row per (key, gap) where consecutive timestamps are more than
    ``min_gap_seconds`` apart: gap_start, gap_end, gap_us (BIGINT — the
    integer-microsecond convention of session_summaries, so engines can
    never disagree on rounding).

    ``tiebreak`` pins a total order for equal timestamps, same contract as
    sessionize. Plan: one Exchange on the key, one sort, lag, filter —
    the filter drops all non-gap rows before anything else happens, so the
    output is sized by the anomaly count, not the input.
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(on, *tiebreak)
    prev = F.lag(F.col(on)).over(w)
    gap = F.expr(f"INTERVAL '{int(min_gap_seconds)}' SECOND")
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    return (
        df.select(*by, F.col(on), prev.alias("_prev"))
        .filter(F.col("_prev").isNotNull() & ((F.col(on) - F.col("_prev")) > gap))
        .select(
            *by,
            F.col("_prev").alias("gap_start"),
            F.col(on).alias("gap_end"),
            (us(F.col(on)) - us(F.col("_prev"))).alias("gap_us"),
        )
    )


def stitch_multiline(
    df: DataFrame,
    order_col: str,
    by: Sequence[str] = (),
    line_col: str = "line",
    continuation: str = r"^\s",
    sep: str = "\n",
) -> DataFrame:
    """Reassemble multi-line logical log events (stack traces, wrapped
    messages) from physical lines — the multiline codec every log
    shipper needs (Filebeat/Fluentd ``multiline``; the reference's
    syslog receiver consumes one event per datagram and never sees
    splits, so this is the file-tail ingestion gap it leaves open,
    syslog_cef_receiver/parser/mod.rs:46).

    A line matching ``continuation`` (default: starts with whitespace)
    belongs to the event opened by the nearest preceding non-continuation
    line within the same ``by`` stream. Same single-window algebra as
    sessionize: flag event starts, running-sum them into ``event_idx``,
    then ONE group-by rebuilds each event — the line text is carried
    through sorted struct collection so the output is order-exact
    regardless of partitioning.

    A stream whose FIRST lines are continuations (a file split mid-event)
    yields ``event_idx = -1`` for that orphan prefix — kept, not dropped,
    so re-stitching after a concatenated upstream split loses nothing.

    Output: ``by…, event_idx, n_lines, first_<order_col>, text``.

    Scale shape: one window shuffle on ``by`` plus the group-by on
    (by, event_idx); both carry (order, line) pairs only. Per-event
    memory is bounded by the longest stack trace, not the stream.
    """
    # NULL lines normalize to "" BEFORE classification: '' does not
    # match a ^\s continuation pattern, so a NULL/empty line opens a new
    # (empty) event — the same verdict a SQL replay's CASE WHEN
    # regexp_matches(...) ELSE start gives for NULL, and without it the
    # NULL would silently attach to the previous event (rlike(NULL) is
    # NULL, which sum() skips) while leaving a NULL element for the
    # text join to drop.
    line = F.coalesce(F.col(line_col), F.lit(""))
    is_start = (~line.rlike(continuation)).cast("long")
    w = Window.partitionBy(*by).orderBy(order_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn(line_col, line)
        .withColumn("_evt", F.sum(is_start).over(run) - 1)
        .groupBy(*by, "_evt")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min(order_col).alias(f"first_{order_col}"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(order_col, line_col))
                    ),
                    lambda x: x[line_col],
                ),
                sep,
            ).alias("text"),
        )
        .withColumnRenamed("_evt", "event_idx")
    )
