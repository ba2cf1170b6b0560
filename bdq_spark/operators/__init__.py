"""Relational / data-quality operators (lazy DataFrame transformations)."""

from bdq_spark.operators.diff import (
    compare_dataframes,
    display_compare_dataframes_results,
    uncache_compare_dataframes_results,
)
from bdq_spark.operators.integrity import fact_dim_broken_relationship
from bdq_spark.operators.latest import (
    get_latest_records,
    get_latest_records_window,
    get_latest_records_with_pk_confict_detection_flag,
    get_latest_records_with_pk_conflict_detection_flag,
)
from bdq_spark.operators.pk import (
    validate_primary_key_candidate,
    validate_primary_key_candidate_combinations,
)
from bdq_spark.operators.asof import asof_join
from bdq_spark.operators.joins import key_skew_report, range_join, salted_join
from bdq_spark.operators.components import (
    apply_dedup_clusters,
    connected_components,
)
from bdq_spark.operators.contamination import (
    contamination_check,
    contamination_spans,
)
from bdq_spark.operators.corpus import (
    chunk_documents,
    token_vocabulary,
    training_order_key,
    with_training_order,
)
from bdq_spark.operators.packing import pack_documents
from bdq_spark.operators.profile import profile_table
from bdq_spark.operators.splits import (
    deterministic_sample,
    deterministic_sample_by,
    hash_bucket_column,
    hash_split,
    hash_split_column,
    weighted_mixture,
)

__all__ = [
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
    "profile_table",
    "salted_join",
    "key_skew_report",
    "range_join",
    "asof_join",
    "hash_bucket_column",
    "hash_split_column",
    "hash_split",
    "deterministic_sample",
    "deterministic_sample_by",
    "weighted_mixture",
    "pack_documents",
    "chunk_documents",
    "token_vocabulary",
    "training_order_key",
    "with_training_order",
    "contamination_check",
    "contamination_spans",
    "connected_components",
    "apply_dedup_clusters",
]
