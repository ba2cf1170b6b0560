#!/usr/bin/env python3
"""Physical-plan audit for the driver queries.

Checks the plan properties that matter at 100 TB:

- parquet scans prune columns (``ReadSchema`` should not contain columns
  the query never touches);
- filters reach the scan (``PushedFilters`` non-empty where applicable);
- small dimension joins broadcast (``BroadcastHashJoin``);
- no Cartesian products outside the intentional KNN cross joins.

Usage::

    python tools/explain_audit.py [query ...]   # audit (and diff vs snapshot)
    python tools/explain_audit.py --snapshot    # write plans_golden.json

The committed snapshot (``plans_golden.json``) records each query's plan
fingerprint (exchange/join/pushdown counts); the audit prints a DRIFT
marker when a fingerprint changes, so plan regressions (a lost broadcast,
an extra shuffle) show up in review diffs.

Truncation caveat, made explicit in the fingerprint: operators that
``localCheckpoint`` internally replace the materialized subtree with a
``Scan ExistingRDD`` leaf, so their explain output understates the real
work (an "exchanges=0" plan may hide a whole dedup funnel behind one
checkpoint scan).  The ``rdd_scans`` fingerprint field counts those
leaves — a query whose exchanges drop while ``rdd_scans`` rises has NOT
gotten cheaper, and either count drifting flags the plan for review.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "..", "plans_golden.json")

# queries where a full-column scan or cartesian join is by design
FULL_SCAN_OK = {
    "compare_orders_diff",      # diff compares every column by contract
    "latest_events_conflict",   # distinct over all selected columns
    "multimodal_decode",        # payload is the data
    "multimodal_audio_decode",  # payload is the data
    "fk_broken_sampled",        # sample_records carries full fact rows by contract
}
# queries where an unconditioned join is the intended plan: brute-force
# scoring (knn/near-dup verify) or a broadcast single-row aggregate
# attached to a tiny result (profile's exact decimal mean)
CARTESIAN_OK = {
    "knn_embeddings",
    "knn_quantized_embeddings",
    "knn_lsh_embeddings",
    "embedding_near_dup_pairs",
    "profile_orders_numeric",
    # IDF weighting attaches the 1-row train-corpus count N to every
    # probe shingle (contamination.py: join(F.broadcast(n_train))) — a
    # single broadcast row, constant-size at any corpus scale
    "doc_contamination_weighted",
    # same shape: the 1-row (total, V) scalar aggregate broadcast onto
    # the vocabulary before the smoothed log-prob projection
    "doc_lm_score",
    # same shape: the 1-row (total, n_keys) aggregate broadcast onto the
    # per-key counts before the share/skew projection
    "skew_report_lineitem_suppkey",
    # same shape: 1-row scalar-aggregate broadcasts (positive-balance
    # average / global max revenue / temperature normalizer) gating the
    # main relation
    "wealthy_low_activity_customers",
    "top_supplier_by_period_revenue",
    "doc_temperature_mixture",
    # same shape: the 1-row min/max bounds broadcast onto the scaled
    # values before bucketing
    "histogram_orders_totalprice",
    # same shape: the 1-row vocabulary-size V broadcast onto the bigram
    # vocabulary before the smoothed log-prob projection
    "doc_lm_score_bigram",
    # same shape: 1-row scalar broadcasts (corpus size N for idf /
    # vocabulary totals + head mass) onto small aggregates
    "doc_top_terms",
    "vocab_stats_documents",
    # same shape: the 1-row (N, V) train-corpus scalar broadcast onto
    # the scored trigrams for the backoff floor
    "doc_lm_score_trigram",
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    from bdq_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    args = sys.argv[1:]
    write_snapshot = "--snapshot" in args
    only = set(a for a in args if not a.startswith("--"))

    golden = {}
    if not write_snapshot and os.path.exists(SNAPSHOT_PATH):
        with open(SNAPSHOT_PATH) as f:
            golden = json.load(f)

    fingerprints = {}
    problems = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            plan = plan_of(fn(spark, SF_DIR))
        except Exception as e:
            problems.append((name, f"explain failed: {e}"))
            continue

        notes = []
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        wide_scans = [s for s in scans if s.count(",") >= 9]
        if wide_scans and name not in FULL_SCAN_OK:
            notes.append(f"wide scan ({wide_scans[0][:60]}...)")
        if "CartesianProduct" in plan and name not in CARTESIAN_OK:
            notes.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in CARTESIAN_OK:
            notes.append("BroadcastNestedLoopJoin")
        n_exchange = len(re.findall(r"Exchange", plan))
        n_bcast = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        n_rdd = len(re.findall(r"Scan ExistingRDD", plan))
        fp = {
            "exchanges": n_exchange,
            "broadcast_hash_joins": n_bcast,
            "sort_merge_joins": n_smj,
            "pushed_scans": n_pushed,
            "cartesian": "CartesianProduct" in plan,
            "rdd_scans": n_rdd,
        }
        fingerprints[name] = fp

        drift = ""
        if golden and not only:
            if name not in golden:
                drift = "DRIFT: new query (re-run --snapshot)"
            elif golden[name] != fp:
                diffs = [
                    f"{k} {golden[name][k]}->{fp[k]}"
                    for k in fp
                    if golden[name].get(k) != fp[k]
                ]
                drift = "DRIFT: " + ", ".join(diffs)
        if drift:
            notes.append(drift)

        status = "WARN" if notes else "ok"
        print(
            f"{status:4s} {name:34s} exchanges={n_exchange:2d} "
            f"bhj={n_bcast} smj={n_smj} pushed_scans={n_pushed} "
            f"rdd={n_rdd}"
            + (f"  <- {'; '.join(notes)}" if notes else "")
        )
        if notes:
            problems.append((name, "; ".join(notes)))

    if write_snapshot:
        with open(SNAPSHOT_PATH, "w") as f:
            json.dump(fingerprints, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"\nsnapshot written: {len(fingerprints)} queries")
        return 0

    print()
    if problems:
        print(f"{len(problems)} plan warning(s)")
    else:
        print("all plans clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
