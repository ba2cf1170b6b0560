"""Driver-side planning/orchestration: DAG executor, pipeline, state store."""

from bdq_spark.plans.dag import DAG, Node
from bdq_spark.plans.pipeline import (
    SparkPipeline,
    Step,
    register_spark_pipeline_step_implementation,
)
from bdq_spark.plans.plan_lint import (
    PlanFinding,
    PlanScaleError,
    assert_scalable,
    lint_plan,
    plan_fingerprint,
)
from bdq_spark.plans.statestore import CatalogPersistedStateStore
from bdq_spark.plans.ui_logger import SparkUILogger

__all__ = [
    "DAG",
    "Node",
    "SparkPipeline",
    "Step",
    "register_spark_pipeline_step_implementation",
    "CatalogPersistedStateStore",
    "SparkUILogger",
    "PlanFinding",
    "PlanScaleError",
    "lint_plan",
    "assert_scalable",
    "plan_fingerprint",
]
