"""Agent-trajectory analytics over transcript tables: tool-call transition
mining.

A multi-turn agent transcript is a sequence of tool invocations per
conversation; the (prev_tool → tool) bigram counts are the trajectory's
first-order Markov structure — the transcript analog of the reference's
service-graph connector, which builds (client → server) edges from span
parent/child pairs (our operators/trace_tree.py service_graph; reference
docs describe the same edge-aggregation connector family). Same plan
shape too: one window per conversation to find each call's predecessor,
then a hash aggregate on the edge.

Scale: the window shuffles on conv_id once (bounded by the longest
conversation, the same contract as every per-entity window here), and the
edge aggregate's cardinality is |tools|² — tiny — so the final shuffle is
negligible. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tool_transitions(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
    status_re: str = r"status=(\w+)",
    text_col: str = "text",
) -> DataFrame:
    """Tool-call bigram edges: (prev_tool, tool, n, n_error).

    Only tool turns participate (``tool_col`` non-null); the first call of
    each conversation has no predecessor and is dropped, exactly like the
    root span in a service graph. ``n_error`` counts transitions whose
    *destination* call failed (status extracted from the CALL line,
    sources/transcripts.py template family 2).
    """
    # the error test collapses to a boolean BEFORE the window shuffle
    # (guide §2.3: shuffle narrower types) — identical algebra, the
    # status string itself never crosses the exchange
    calls = df.filter(F.col(tool_col).isNotNull()).select(
        F.col(conv_col).alias("_conv"),
        F.col(order_col).alias("_ord"),
        F.col(tool_col).alias("tool"),
        (F.regexp_extract(F.col(text_col), status_re, 1) == "error").alias(
            "_is_err"
        ),
    )
    w = Window.partitionBy("_conv").orderBy("_ord")
    edges = calls.withColumn("prev_tool", F.lag("tool").over(w)).filter(
        F.col("prev_tool").isNotNull()
    )
    return edges.groupBy("prev_tool", "tool").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_is_err").cast("long")).alias("n_error"),
    )
