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
    # VERDICT r10 item 1: the CC fused edge setup pinned small graphs
    # at the session shuffle partition count — dual-pathed
    # (connected_components pre-counts its checkpointed pair input;
    # pagerank/pagerank_quantized de-pin post-count); plus the
    # depth-counted _aqe_disabled scope (ADVICE medium), the
    # _shuffle_partitions "auto" fallback, and the kcore regime-split
    # documentation.  Gated by the full graph family.
    "bdq_spark/operators/components.py": [
        "embedding_dedup_clusters",
        "near_dup_clusters",
        "pagerank_part_supplier",
        "docs_kcore_graph",
        "near_dup_kcore",
    ],
    # adaptive LSH plane sizing for embedding_cosine_pairs' 100 TB path
    # (the x100 sweep measured the fixed-8-plane path quadratic,
    # last-decade exponent 1.94 -> 0.34 after).  The adaptive branch is
    # REGISTRY-UNREACHABLE at driver scale (auto mode picks exact below
    # the 200k-row cutover; only the scale-only EXTRA query forces
    # lsh), so the gating entries pin no-change: embedding_dedup_clusters
    # (auto mode) and embedding_near_dup_pairs (pinned exact).
    "bdq_spark/operators/dedup.py": [
        "embedding_dedup_clusters",
        "embedding_near_dup_pairs",
    ],
    # PySpark-3.x localCheckpoint(storageLevel=...) guard (ADVICE r10)
    # — behavior-neutral on this runtime; gated through the serialized-
    # checkpoint consumers as in r10
    "bdq_spark/operators/_checkpoint.py": [
        "pagerank_part_supplier",
        "near_dup_triangles",
    ],
    # the r11 window rotation itself (gated by rotated-in entries —
    # deliberately NON-top-20 picks: a rotation reorders the window
    # without touching any query's code, so the bench-A/B rule has
    # nothing to measure for it) and the NEW persisted-index entry
    # (VERDICT r10 item 7), gated by its own value-hashed driver slot
    "bdq_spark/entry_queries.py": [
        "persisted_minhash_index_probe",
        "multimodal_decode",
        "orders_pit_scd2_join",
    ],
}

# modules whose in-round change has no relational queries() surface —
# each needs a reason a reviewer can check
EXEMPT = {
    # additive plan-introspection helper (checkpoint_partitions — the
    # fingerprint field VERDICT r10 item 3 asked for); no query
    # semantics changed; pinned by
    # test_components.py::test_small_graph_checkpoints_not_pinned_wide
    # and the regenerated plans_golden.json
    "bdq_spark/plans/plan_lint.py": (
        "additive introspection (checkpoint_partitions); no relational "
        "surface; gated by plan-golden regen + components pin test"
    ),
}

# TOUCHED modules whose gating entries intersect the top-20-by-wall
# bench set this round -> the BENCH_AB_r{N}.json artifact that records
# their same-box focused A/B.  The enforcement test recomputes the
# top-20 from BENCH_DETAIL.json and fails if an intersecting module is
# missing here or the artifact doesn't cover the intersecting entries.
BENCH_AB = {
    "bdq_spark/operators/components.py": "BENCH_AB_r11.json",
    "bdq_spark/operators/_checkpoint.py": "BENCH_AB_r11.json",
    "bdq_spark/operators/dedup.py": "BENCH_AB_r11.json",
}
