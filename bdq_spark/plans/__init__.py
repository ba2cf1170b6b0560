"""Driver-side planning/orchestration: DAG executor, pipeline, state store."""

from bdq_spark.plans.dag import DAG, Node

__all__ = ["DAG", "Node"]
