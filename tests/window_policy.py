"""Round-scoped window policy declaration (VERDICT r9 item 3).

The r9 verdict's hard rule: any entry whose operator code changed
in-round must take a driver-window slot THAT round, before staleness
rotation.  This file is the declaration side of the invariant;
``tests/test_plan_regressions.py::test_changed_modules_gated_in_current_window``
is the enforcement side.  Ground truth of WHAT changed comes from
``git diff --name-only <last round-boundary commit>`` (so a module
edit can never silently skip the policy); the builder declares here
WHICH entries gate each changed module, and the test asserts every
one of those entries holds a ``_DRIVER_PRIORITY`` slot.

Update this file every round, alongside the ``_DRIVER_PRIORITY``
rotation in ``bdq_spark/entry_queries.py``.
"""

# module path (repo-relative) -> the queries() entries that gate the
# change end-to-end through the driver's value-hash compare.  Every
# bdq_spark/ module that changed since the last round boundary MUST
# appear here (or in EXEMPT below with a reason) and every listed
# entry must be in the current _DRIVER_PRIORITY window.
TOUCHED = {
    # append_zonemap type-alignment guard (ADVICE r9) — gated by the
    # append-maintained index entry, which exercises append_zonemap +
    # append_bloom + merged-sidecar pruning end to end
    "bdq_spark/sources/sinks.py": ["indexed_append_scan_orders"],
    # staging v2: bloom bits sized from the full two-generation row
    # count (ADVICE r9); the window rotation itself; and the NEW
    # streaming ingest -> dedup -> index composition entry (VERDICT r9
    # item 6), gated by its own value-hashed driver slot
    "bdq_spark/entry_queries.py": [
        "indexed_append_scan_orders",
        "streaming_ingest_dedup_index",
    ],
    # (a) incremental_fingerprint_dedup gained the
    # corpus_fingerprint_column probe path (column-pruned 16-byte scan
    # instead of re-hashing the corpus text per trigger); default
    # behavior unchanged (pinned in test_text_dedup.py).  Gated by the
    # new streaming composition entry (stored-column path) and the
    # incremental batch entry (default path), both in the r10 window.
    # (b) shingle-scale checkpoints switched to serialized storage
    # (second-decade fix); storage level changes no values, and the
    # ngram-Jaccard path is gated end-to-end by near_dup_triangles
    # (exact Jaccard pairs producer), also in the window.
    "bdq_spark/operators/dedup.py": [
        "streaming_ingest_dedup_index",
        "incremental_dedup_batch",
        "near_dup_triangles",
    ],
    # serialized-checkpoint helper shared by components.py/dedup.py —
    # gated through the same entries as its two consumers
    "bdq_spark/operators/_checkpoint.py": [
        "pagerank_part_supplier",
        "near_dup_triangles",
    ],
    # co-partitioned shuffle path for graphs past the broadcast cutover
    # (second-decade walls from the sf1.0 sweep): pagerank/CC loop
    # restructure, kcore's zero-exchange mirror-broadcast peel.  Gated
    # by graph-family entries already holding r10 window slots —
    # pagerank (pagerank_part_supplier), triangles (near_dup_triangles),
    # kcore (docs_kcore_graph), connected components
    # (embedding_dedup_clusters).
    "bdq_spark/operators/components.py": [
        "pagerank_part_supplier",
        "near_dup_triangles",
        "docs_kcore_graph",
        "embedding_dedup_clusters",
    ],
}

# modules whose in-round change has no relational queries() surface —
# each needs a reason a reviewer can check
EXEMPT = {}
