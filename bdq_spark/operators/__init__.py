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
    pagerank,
    pagerank_quantized,
    triangle_counts,
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
from bdq_spark.operators.cdc import apply_cdc, latest_changes, scd2_from_changes
from bdq_spark.operators.clustering import kmeans_quantized
from bdq_spark.operators.layout import zorder_key, zorder_layout
from bdq_spark.operators.matview import (
    agg_view,
    apply_deltas,
    maintain_agg_view,
    snapshot_changes,
    view_deltas,
)
from bdq_spark.operators.textsearch import (
    bm25_search,
    boolean_search,
    build_inverted_index,
    tokenize_docs,
)
from bdq_spark.operators.sketches import (
    countmin_cells,
    countmin_lookup,
    hll_distinct,
    hll_estimate,
    hll_registers,
    kmv_estimate_col,
    kmv_set_ops,
    kmv_sketch,
    sampled_quantiles,
)
from bdq_spark.operators.dedup import duplicate_spans, paragraph_dedup
from bdq_spark.operators.packing import pack_documents
from bdq_spark.operators.profile import (
    group_quantiles,
    numeric_correlations,
    numeric_histogram,
    profile_drift,
    profile_table,
)
from bdq_spark.operators.splits import (
    deterministic_sample,
    deterministic_sample_by,
    fixed_size_sample,
    hash_bucket_column,
    hash_split,
    hash_split_column,
    temperature_mixture,
    weighted_mixture,
)
from bdq_spark.operators.text_analysis import compression_ratio, gopher_quality
from bdq_spark.operators.tokenizer import bpe_segment_corpus, train_bpe

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
    "temperature_mixture",
    "fixed_size_sample",
    "numeric_correlations",
    "numeric_histogram",
    "profile_drift",
    "group_quantiles",
    "paragraph_dedup",
    "duplicate_spans",
    "gopher_quality",
    "compression_ratio",
    "train_bpe",
    "bpe_segment_corpus",
    "apply_cdc",
    "scd2_from_changes",
    "latest_changes",
    "pack_documents",
    "chunk_documents",
    "token_vocabulary",
    "training_order_key",
    "with_training_order",
    "contamination_check",
    "contamination_spans",
    "connected_components",
    "apply_dedup_clusters",
    "kmeans_quantized",
    "agg_view",
    "apply_deltas",
    "maintain_agg_view",
    "view_deltas",
    "snapshot_changes",
    "countmin_cells",
    "countmin_lookup",
    "hll_distinct",
    "hll_estimate",
    "hll_registers",
    "kmv_estimate_col",
    "kmv_set_ops",
    "kmv_sketch",
    "sampled_quantiles",
    "bm25_search",
    "boolean_search",
    "build_inverted_index",
    "tokenize_docs",
    "zorder_key",
    "zorder_layout",
    "pagerank",
    "pagerank_quantized",
    "triangle_counts",
]
