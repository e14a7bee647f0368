"""Plan-shape assertions: the scale-hygiene properties the engine promises
(SURVEY.md §4) — pushdown, pruning, broadcast, vectorized Python, and a
shuffle-free hot path — checked against .explain output so a regression
that silently changes the physical plan fails loudly.
"""

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.operators.enrich import enrich
from otel_arrow_spark.operators.parse import parse_transcripts
from otel_arrow_spark.operators.route import with_signal_class
from otel_arrow_spark.plans.pipeline import PipelineConfig, build_routed, run_pipeline


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def routed_plan(spark, tiny_transcripts):
    cfg = PipelineConfig(input_path=tiny_transcripts, output_dir="/unused")
    return build_routed(spark, cfg)


def test_filter_pushes_to_parquet_scan(spark, tiny_transcripts):
    df = spark.read.parquet(tiny_transcripts).filter(F.col("conv_id") == "conv-00000000")
    plan = plan_of(df)
    assert "PushedFilters" in plan and "conv_id" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark, tiny_transcripts):
    df = spark.read.parquet(tiny_transcripts).select("conv_id", "turn_idx")
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "conv_id" in read_schema and "turn_idx" in read_schema
    assert "text" not in read_schema, "projection must prune the fat text column"


def test_enrich_uses_broadcast_joins(spark, tiny_transcripts):
    parsed = parse_transcripts(spark.read.parquet(tiny_transcripts))
    plan = plan_of(enrich(parsed, spark))
    assert plan.count("BroadcastHashJoin") == 2, plan[:500]
    assert "SortMergeJoin" not in plan, "dictionary joins must never sort-merge"


def test_parse_is_arrow_vectorized_not_row_python(routed_plan):
    plan = plan_of(routed_plan)
    assert "ArrowEvalPython" in plan, "parse must go through Arrow batches"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in hot path"


def test_routed_hot_path_has_no_shuffle(routed_plan):
    """scan → parse → enrich → route must be narrow: the only Exchanges
    allowed are broadcast exchanges for the dictionary tables."""
    plan = plan_of(routed_plan)
    import re

    shuffles = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange (hash|range|rebalance|SinglePartition)", ln)
    ]
    assert not shuffles, f"unexpected shuffle in hot path: {shuffles}"


def test_aggregate_is_partial_then_final(spark, tiny_transcripts, workdir):
    """The sink aggregate must show map-side partial aggregation — the
    two-phase property that makes explicit salting unnecessary."""
    from otel_arrow_spark.operators.aggregate import sink_aggregate

    cfg = PipelineConfig(input_path=tiny_transcripts, output_dir="/unused")
    agg = sink_aggregate(build_routed(spark, cfg))
    plan = plan_of(agg)
    assert plan.count("HashAggregate") >= 2, "expected partial+final HashAggregate"


def test_partition_pruning_on_routed_sink(spark, tiny_transcripts, workdir):
    res = run_pipeline(
        spark, PipelineConfig(input_path=tiny_transcripts, output_dir=f"{workdir}/pp")
    )
    df = spark.read.parquet(res.routed_path).filter(F.col("signal_class") == "error")
    plan = plan_of(df)
    pf = plan.split("PartitionFilters:")[1].splitlines()[0] if "PartitionFilters:" in plan else ""
    assert "signal_class" in pf, f"partition filter missing: {plan[:400]}"
