"""Plans: end-to-end job orchestration (parse → enrich → route → aggregate).

The reference's pipeline runtime (engine/src/runtime_pipeline.rs:163,
controller run_forever) becomes plain job orchestration here: Catalyst owns
the DAG, this layer owns sinks, lineage manifests, and resume.
"""

from otel_arrow_spark.plans.pipeline import PipelineConfig, run_pipeline  # noqa: F401
