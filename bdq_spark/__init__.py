"""bdq_spark — a PySpark-native data-quality & pipeline engine.

A from-scratch rebuild of the capabilities of ``grusin-db/bdq``
(`/root/reference/`, Apache-2.0) as an idiomatic, Databricks-free PySpark
package, extended with LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Unlike the reference's eager import-time session bootstrap
(`/root/reference/bdq/__init__.py:3-10`), importing this package creates
no SparkSession — sessions are acquired lazily via
:func:`bdq_spark.session.get_spark`.
"""

from bdq_spark.functions import NULL_STR_REPR, surrogate_key_hash, surrogate_key_string
from bdq_spark.operators import (
    compare_dataframes,
    display_compare_dataframes_results,
    fact_dim_broken_relationship,
    get_latest_records,
    get_latest_records_window,
    get_latest_records_with_pk_confict_detection_flag,
    get_latest_records_with_pk_conflict_detection_flag,
    uncache_compare_dataframes_results,
    validate_primary_key_candidate,
    validate_primary_key_candidate_combinations,
)
from bdq_spark.plans import (
    DAG,
    CatalogPersistedStateStore,
    Node,
    SparkPipeline,
    SparkUILogger,
    Step,
    register_spark_pipeline_step_implementation,
)
from bdq_spark.schema import (
    compare_schemas,
    dict_compare,
    get_column_names_combinations,
    get_column_names_from_schema,
    get_column_names_in_schema,
    get_column_names_not_in_schema,
    get_schema_from_ddl_string,
)
from bdq_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    # session
    "get_spark",
    # functions
    "surrogate_key_string",
    "surrogate_key_hash",
    "NULL_STR_REPR",
    # schema toolkit
    "compare_schemas",
    "dict_compare",
    "get_schema_from_ddl_string",
    "get_column_names_from_schema",
    "get_column_names_in_schema",
    "get_column_names_not_in_schema",
    "get_column_names_combinations",
    # dataframe operators
    "compare_dataframes",
    "uncache_compare_dataframes_results",
    "display_compare_dataframes_results",
    "fact_dim_broken_relationship",
    "get_latest_records_window",
    "get_latest_records",
    "get_latest_records_with_pk_confict_detection_flag",
    "get_latest_records_with_pk_conflict_detection_flag",
    "validate_primary_key_candidate",
    "validate_primary_key_candidate_combinations",
    # orchestration
    "DAG",
    "Node",
    "SparkPipeline",
    "Step",
    "register_spark_pipeline_step_implementation",
    "CatalogPersistedStateStore",
    "SparkUILogger",
]
