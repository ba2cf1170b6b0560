"""Round-scoped window policy declaration (VERDICT r9 item 3; bench
A/B rule added per VERDICT r10 item 2).

The r9 verdict's hard rule: any entry whose operator code changed
in-round must take a driver-window slot THAT round, before staleness
rotation.  This file is the declaration side of the invariant;
``tests/test_plan_regressions.py::test_changed_modules_gated_in_current_window``
is the enforcement side.  Ground truth of WHAT changed comes from
``git diff --name-only <last round-boundary commit>`` (so a module
edit can never silently skip the policy); the builder declares here
WHICH entries gate each changed module, and the test asserts every
one of those entries holds a ``_DRIVER_PRIORITY`` slot.

The r10 verdict added a second rule after the CC fuse's 2x bench-scale
cost shipped behind an x100-only A/B: any TOUCHED module whose gating
entries include a top-20-by-wall bench entry must also record a
same-box focused ``SPARK_GRAFT_BENCH_ONLY`` A/B (old round-boundary
rev in a worktree vs HEAD, machine-stamped) in ``BENCH_AB_r{N}.json``
before the round closes.
``tests/test_plan_regressions.py::test_hot_module_changes_carry_bench_ab``
enforces it.

Update this file every round, alongside the ``_DRIVER_PRIORITY``
rotation in ``bdq_spark/entry_queries.py``.
"""

# module path (repo-relative) -> the queries() entries that gate the
# change end-to-end through the driver's value-hash compare.  Every
# bdq_spark/ module that changed since the last round boundary MUST
# appear here (or in EXEMPT below with a reason) and every listed
# entry must be in the current _DRIVER_PRIORITY window.
#
# ROUND 13 (optimization round): every change below is an
# OPTIMIZATION — declared queries must compute byte-identical results
# (the gating entries' value hashes are exactly that check); see
# OPTIMIZATION_r13.md for the before/after evidence.
TOUCHED = {
    # Pre-round advisory fixes (rerank dropDuplicates, staged-index
    # re-check) + optimization: LSH bucket margins staged as one SQL
    # projection instead of per-plane interpreted aggregates evaluated
    # twice; hyperplane literals built as one SQL string (py4j
    # round-trips removed from DataFrame construction).
    "bdq_spark/operators/similarity.py": [
        "embedding_near_dup_pairs_multitable",
        "knn_rerank_embeddings",
        "persisted_vector_index_probe",
        "knn_lsh_embeddings",
        "knn_multiprobe_embeddings",
    ],
    # Optimization: minhash_signatures builds the 64 affine hashes in
    # one selectExpr; the private shingle set drops its trailing
    # distinct (min is multiplicity-insensitive — one exchange +
    # hash-agg removed); simhash per-bit votes/fingerprints as SQL
    # strings.  Gated by the minhash/simhash/embedding families.
    "bdq_spark/operators/dedup.py": [
        "embedding_near_dup_pairs_multitable",
        "embedding_near_dup_pairs",
        "embedding_dedup_clusters",
        "minhash_lsh_near_dup",
        "incremental_minhash_near_dup",
        "minhash_md5_near_dup",
        "simhash_pairs",
        "simhash_md5_pairs",
        "near_dup_jaccard",
    ],
    # Optimization: _dists_sql/_assign_frame build the centroid
    # distance array as ONE staged SQL expression (py4j literal-tree
    # assembly was ~1 s per k-means iteration at 8x64); per-iteration
    # sums one F.expr per component.
    "bdq_spark/operators/clustering.py": [
        "embedding_kmeans_quantized",
        "knn_quantized_embeddings",
    ],
    # Optimization: quantize in the projection that carries (id, vec)
    # instead of re-attaching via a self-join on id — one Exchange +
    # join removed per side; probe order over a staged distance array.
    "bdq_spark/operators/ivf.py": [
        "knn_ivf_quantized",
        "knn_ivf_embeddings",
    ],
    # Pre-round advisory fixes (replay guard, staging re-check,
    # corrected refusal message) + optimization: streaming vector index
    # consistency counts in one job, per-row norms staged below its
    # verify joins; streaming dedup index's new-file discovery via FS
    # listing + overlapped sidecar appends; pagerank entry's shared
    # lazy-checkpointed distinct.  Gated by the streaming/persisted
    # index family + the pagerank entry.
    "bdq_spark/entry_queries.py": [
        "streaming_ingest_vector_index",
        "persisted_vector_index_probe",
        "persisted_minhash_index_probe",
        "minhash_lsh_near_dup",
        "incremental_minhash_near_dup",
        "streaming_ingest_dedup_index",
        "pagerank_part_supplier",
    ],
    # Optimization: fused broadcast-regime CC round (one min-aggregate,
    # no merge join) + node-count-derived round conf pin; pagerank deg
    # carried on the rank relation + count-based dangling detection;
    # kcore small-regime peel actions halved; triangle_counts credits
    # corners via one explode instead of a 3-way union that planned
    # the wedge join three times.  Past-cutover paths
    # byte-unchanged.  Gated by the full graph family.
    "bdq_spark/operators/components.py": [
        "embedding_dedup_clusters",
        "documents_deduped",
        "near_dup_clusters",
        "pagerank_part_supplier",
        "near_dup_kcore",
        "docs_kcore_graph",
        "near_dup_triangles",
    ],
    # Optimization: train_bpe iteration loop under the AQE-off scope
    # (42 -> 22 jobs for 30 merges, merge table bit-identical) and the
    # post-coalesce re-checkpoint dropped.  Gated by the BPE family:
    # corpus_training_pipeline replays train->encode->pack end to end,
    # bpe_train_merges value-hashes the merge table itself.
    "bdq_spark/operators/tokenizer.py": [
        "corpus_training_pipeline",
        "bpe_train_merges",
        "doc_bpe_packing",
    ],
    # Optimization: running_zscore's batch path folds hash-bucketed key
    # groups in one vectorized pass (exact int64 prefix sums, overflow
    # fallback, Python round); sessionize's batch path gets the same
    # bucketed vectorization (gaps-and-islands over sorted (key, ts)
    # per bucket instead of one applyInPandas call per key).
    "bdq_spark/streaming/stateful.py": [
        "events_running_zscore",
        "stateful_running_counter",
        "stateful_sessionize",
    ],
    # Optimization: the combination sweep counts the table ONCE and
    # shares it across validators (record_count parameter) — the
    # per-candidate full-table count was a property of the df, not the
    # candidate.  pk_minimal_combinations exercises the shared-count
    # path end to end; the two O8 entries pin the default (count-
    # inside) path.
    "bdq_spark/operators/pk.py": [
        "pk_minimal_combinations",
        "pk_validate_lineitem_orderkey",
        "pk_validate_lineitem_composite",
    ],
    # Optimization: write/append sidecar summary counts from FS
    # listings (no sidecar re-read job) + count_appended opt-out;
    # sidecar reads with EXPLICIT schemas (static bloom DDL; zonemap
    # DDL recorded in _ZONEMAP_META.json at write time) so probes and
    # appends skip the footer-inference job.
    # Gated by the sidecar-indexed scan entries + the streaming ingest.
    "bdq_spark/sources/sinks.py": [
        "streaming_ingest_dedup_index",
        "zonemap_pruned_scan",
        "indexed_scan_orders",
        "bloom_pruned_scan",
    ],
    # Optimization: the partitioned CDC merge's empty-batch noop falls
    # out of the touched-bucket collect when the caller fixes the
    # column set — the separate per-trigger isEmpty job survives only
    # on the inferred-columns path, whose skip-on-empty schema-check
    # semantics it preserves.
    "bdq_spark/streaming/cdc_sink.py": [
        "streaming_cdc_merge",
    ],
}

# modules whose in-round change has no relational queries() surface —
# each needs a reason a reviewer can check
EXEMPT = {}

# TOUCHED modules whose gating entries intersect the top-20-by-wall
# bench set this round -> the BENCH_AB_r{N}.json artifact that records
# their same-box focused A/B.  The enforcement test recomputes the
# top-20 from BENCH_DETAIL.json and fails if an intersecting module is
# missing here or the artifact doesn't cover the intersecting entries.
BENCH_AB = {
    # r13 (optimization round): every touched module carries
    # optimization work whose gating entries intersect the top-20; the
    # round's final focused A/B vs the r12 boundary (57582a3) covers
    # the union of hot entries in the r13 artifact.
    "bdq_spark/operators/similarity.py": "BENCH_AB_r13.json",
    "bdq_spark/operators/dedup.py": "BENCH_AB_r13.json",
    "bdq_spark/operators/clustering.py": "BENCH_AB_r13.json",
    "bdq_spark/operators/ivf.py": "BENCH_AB_r13.json",
    "bdq_spark/entry_queries.py": "BENCH_AB_r13.json",
    "bdq_spark/operators/components.py": "BENCH_AB_r13.json",
    "bdq_spark/operators/tokenizer.py": "BENCH_AB_r13.json",
    "bdq_spark/streaming/stateful.py": "BENCH_AB_r13.json",
    "bdq_spark/sources/sinks.py": "BENCH_AB_r13.json",
}
