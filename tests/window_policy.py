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
TOUCHED = {
    # VERDICT r11 item 1: OR-ed multi-table LSH — _hyperplanes gained a
    # per-table seed, lsh_bucket_vectors / lsh_probe_buckets /
    # knn_lsh / knn_lsh_md5 gained num_tables with int64 namespaced
    # bucket ids (also the ADVICE int32-wrap fix).  Gated by the NEW
    # multi-table pair entry plus the md5 knn-LSH twins (single-table
    # path must be bit-identical: table 0 keeps the bare seed) and the
    # new persisted vector index (multi-table probe).
    "bdq_spark/operators/similarity.py": [
        "embedding_near_dup_pairs_multitable",
        "knn_rerank_embeddings",
        "persisted_vector_index_probe",
        "knn_lsh_embeddings",
        "knn_multiprobe_embeddings",
    ],
    # embedding_cosine_pairs gained num_tables (adaptive-geometry lsh
    # path now defaults to LSH_DEFAULT_TABLES=2 OR-tables; explicit
    # num_planes keeps the legacy single-table geometry), new
    # embedding_cosine_pairs_md5 operator, _adaptive_planes capped at
    # LSH_MAX_PLANES (ADVICE r11).  Driver-scale entries pin no-change
    # (exact/auto mode below the cutover); the new md5 entry gates the
    # multi-table candidate path by value.
    "bdq_spark/operators/dedup.py": [
        "embedding_near_dup_pairs_multitable",
        "embedding_near_dup_pairs",
        "embedding_dedup_clusters",
        "minhash_lsh_near_dup",
    ],
    # VERDICT r11 item 6: graph_session=False (default, byte-identical
    # path) / True (cloned-session isolation for the AQE scope) on all
    # four _aqe_disabled holders (CC, pagerank, pagerank_quantized,
    # kcore).  Additive parameter; gated by the graph family re-running
    # through the default path plus
    # test_components.py::test_graph_session_isolates_aqe_from_concurrent_queries.
    "bdq_spark/operators/components.py": [
        "embedding_dedup_clusters",
        "near_dup_clusters",
        "pagerank_part_supplier",
    ],
    # NEW entries (multi-table gate + persisted vector index, VERDICT
    # r11 items 1+3), the two rows-only -> value-hash oracle upgrades
    # (item 5: minhash_lsh_near_dup drops the engine-local est_jaccard
    # column, incremental_minhash_near_dup gains the exact-verify
    # stage), and the staged-index marker hardening (ADVICE r11:
    # data fingerprint + build params + atomic rename).
    "bdq_spark/entry_queries.py": [
        "embedding_near_dup_pairs_multitable",
        "knn_rerank_embeddings",
        "streaming_ingest_vector_index",
        "persisted_vector_index_probe",
        "persisted_minhash_index_probe",
        "minhash_lsh_near_dup",
        "incremental_minhash_near_dup",
    ],
}

# modules whose in-round change has no relational queries() surface —
# each needs a reason a reviewer can check
EXEMPT = {
    # ADVICE r11: checkpoint_partitions now EXCLUDES createDataFrame
    # (ParallelCollectionRDD-rooted) leaves, whose width is
    # defaultParallelism — a session/machine constant that made goldens
    # flag false regressions on a different box.  Introspection-only;
    # no query plan changes; gated by the regenerated plans_golden.json
    # (13 literal-fixture entries dropped 32/16 -> 0, real streaming
    # checkpoints kept) and test_plan_lint.py.
    "bdq_spark/plans/plan_lint.py": (
        "introspection-only (checkpoint_partitions ignores "
        "createDataFrame leaves); no relational surface; gated by "
        "plan-golden regen + test_plan_lint"
    ),
}

#   (similarity.py also gained rerank_topk/diagonal_metric_score —
#   VERDICT r11 item 7, the retrieve->re-rank hook — gated by the new
#   knn_rerank_embeddings entry whose oracle replays both stages)

# TOUCHED modules whose gating entries intersect the top-20-by-wall
# bench set this round -> the BENCH_AB_r{N}.json artifact that records
# their same-box focused A/B.  The enforcement test recomputes the
# top-20 from BENCH_DETAIL.json and fails if an intersecting module is
# missing here or the artifact doesn't cover the intersecting entries.
BENCH_AB = {
    # r13 (optimization round): similarity.py + entry_queries.py carry
    # the pre-round advisory fixes (rerank dedup, staging re-check,
    # replay guard) and the round's optimization work; their hot-entry
    # A/Bs are recorded vs the r12 boundary (57582a3) in the r13
    # artifact.  Modules untouched since the boundary keep their r12
    # rows for the archaeology.
    "bdq_spark/operators/similarity.py": "BENCH_AB_r13.json",
    "bdq_spark/entry_queries.py": "BENCH_AB_r13.json",
    "bdq_spark/operators/components.py": "BENCH_AB_r12.json",
    "bdq_spark/operators/dedup.py": "BENCH_AB_r12.json",
}
