"""Plans: end-to-end job orchestration (parse → enrich → route → aggregate).

The reference's pipeline runtime (engine/src/runtime_pipeline.rs:163,
controller run_forever) becomes plain job orchestration here: Catalyst owns
the DAG, this layer owns sinks, lineage manifests, and resume.
"""

from otel_arrow_spark.plans.pipeline import PipelineConfig, run_pipeline  # noqa: F401
from otel_arrow_spark.plans.config import load_spec, run_from_spec, spec_to_config  # noqa: F401
from otel_arrow_spark.plans.opl import run_kql, run_opl  # noqa: F401
from otel_arrow_spark.plans.ottl import run_ottl  # noqa: F401
