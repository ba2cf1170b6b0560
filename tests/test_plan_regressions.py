"""Plan-shape regression gate (VERDICT r7 item 7) + registry-coverage
invariant (item 3).

``plans_golden.json`` used to be advisory: drift only surfaced if
someone re-ran ``tools/explain_audit.py`` by hand.  These tests make
the REGRESSION direction (an entry gaining exchanges / sort-merge
joins / rdd-scan truncation leaves / a cartesian product over its
committed golden) fail every pytest run over a cheap subset, and pin
the bookkeeping hole that let ``near_dup_kcore`` ship with neither a
plan golden nor a driver correctness row for three rounds.
"""

from __future__ import annotations

import importlib.util
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "explain_audit", os.path.join(REPO, "tools", "explain_audit.py")
)
explain_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(explain_audit)

# cheap pure-read entries: small plans, no execution at construction
# time (explain only), no sidecar writes — keeps the gate a few seconds
ASSERT_SUBSET = [
    "latest_events",
    "events_daily_by_type",
    "orders_rollup_by_year",
    "large_order_customers",
    "schema_diff_orders",
    "salted_join_revenue",
]


def _golden():
    with open(os.path.join(REPO, "plans_golden.json")) as f:
        return json.load(f)


def test_regression_classifier_direction():
    g = {"exchanges": 2, "sort_merge_joins": 0, "rdd_scans": 1,
         "cartesian": False, "broadcast_hash_joins": 2, "pushed_scans": 3}
    better = dict(g, exchanges=1, pushed_scans=4)
    assert explain_audit.regressions_vs_golden(g, better) == []
    worse = dict(g, exchanges=3, cartesian=True)
    regs = explain_audit.regressions_vs_golden(g, worse)
    assert regs == ["exchanges 2->3", "cartesian False->True"]
    # losing a broadcast usually shows up as smj/exchange growth
    assert explain_audit.regressions_vs_golden(
        g, dict(g, sort_merge_joins=1)
    ) == ["sort_merge_joins 0->1"]


def test_cheap_subset_matches_golden_in_assert_mode(spark):
    import __spark_entry__ as entrymod

    golden = _golden()
    assert set(ASSERT_SUBSET) <= set(golden)
    _, _, regressed = explain_audit.run_audit(
        spark, entrymod.queries(), only=ASSERT_SUBSET, golden=golden,
        quiet=True,
    )
    assert regressed == []


def test_every_entry_has_plan_golden_and_driver_coverage():
    """Every registered query must have (a) a plans_golden fingerprint
    and (b) either a recorded driver CORRECTNESS row or a slot in the
    current driver window — the two checklists ``near_dup_kcore``
    slipped through in r7."""
    from bdq_spark import entry_queries as eq

    golden = _golden()
    missing_golden = [n for n in eq.QUERIES if n not in golden]
    assert missing_golden == []

    checked = set()
    latest = {}
    newest_round = 0
    for r in range(1, 31):
        p = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(p):
            names = json.load(open(p))
            checked.update(names)
            newest_round = r
            for n in names:
                latest[n] = r
    window = set(eq._DRIVER_PRIORITY)
    uncovered = [
        n for n in eq.QUERIES if n not in checked and n not in window
    ]
    assert uncovered == []

    # rotation discipline: an entry outside the current window may not
    # have gone more than 3 rounds without a driver row — staleness
    # must be burned down every round, not allowed to accumulate.
    # Calibration: the threshold is newest-3 (not newest-2) because the
    # driver checks the CURRENT window only AFTER the build, so the
    # moment CORRECTNESS_r{N} lands, newest increments while the
    # not-in-window entries keep their old rows — a newest-2 threshold
    # would flip red at judge time for entries the NEXT round's window
    # is responsible for (verified: 29 r5-latest entries would do
    # exactly that the moment r08 landed).
    stale = [
        n
        for n in eq.QUERIES
        if n not in window and latest.get(n, 0) < newest_round - 3
    ]
    assert stale == [], f"rotate these into _DRIVER_PRIORITY: {stale}"


def test_changed_modules_gated_in_current_window():
    """VERDICT r9 item 3 (changed-code-first window policy): any entry
    whose operator code changed in-round must take a driver-window slot
    THAT round, before staleness rotation.  Enforcement: git names every
    ``bdq_spark/`` module that changed since the last round-boundary
    commit (``round N: verdict...``) including uncommitted edits; each
    must be declared in ``tests/window_policy.py`` mapping it to the
    entries that gate the change (or exempted with a reason); every
    declared gating entry must hold a ``_DRIVER_PRIORITY`` slot."""
    import subprocess

    from bdq_spark import entry_queries as eq

    wp_spec = importlib.util.spec_from_file_location(
        "window_policy",
        os.path.join(os.path.dirname(__file__), "window_policy.py"),
    )
    window_policy = importlib.util.module_from_spec(wp_spec)
    wp_spec.loader.exec_module(window_policy)

    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True,
    )
    if log.returncode != 0:
        pytest.skip("not a git checkout")
    boundary = None
    for line in log.stdout.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith("round ") and "verdict" in subject:
            boundary = sha
            break
    if boundary is None:
        pytest.skip("no round-boundary commit yet (round 1)")

    diff = subprocess.run(
        ["git", "diff", "--name-only", boundary, "--", "bdq_spark/"],
        cwd=REPO, capture_output=True, text=True,
    )
    assert diff.returncode == 0, diff.stderr
    changed = sorted(p for p in diff.stdout.splitlines() if p.endswith(".py"))

    undeclared = [
        p
        for p in changed
        if p not in window_policy.TOUCHED and p not in window_policy.EXEMPT
    ]
    assert undeclared == [], (
        f"modules changed in-round but not declared in "
        f"tests/window_policy.py: {undeclared} — map each to the entries "
        f"that gate it (and put those entries in _DRIVER_PRIORITY), or "
        f"exempt it with a reason"
    )

    window = set(eq._DRIVER_PRIORITY)
    for module, entries in window_policy.TOUCHED.items():
        assert entries, f"{module}: declare at least one gating entry"
        unknown = [e for e in entries if e not in eq.QUERIES]
        assert unknown == [], f"{module}: unknown entries {unknown}"
        out_of_window = [e for e in entries if e not in window]
        assert out_of_window == [], (
            f"{module} changed in-round but its gating entries "
            f"{out_of_window} are not in the current _DRIVER_PRIORITY "
            f"window — changed code takes a slot before staleness rotation"
        )
    for module, reason in window_policy.EXEMPT.items():
        assert isinstance(reason, str) and len(reason) >= 15, (
            f"{module}: exemption needs a checkable reason"
        )


@pytest.mark.slow
def test_full_registry_lints_error_free(spark):
    """VERDICT r8 item 3: EVERY registry entry's physical plan must be
    free of ERROR-severity scale hazards (cartesian product,
    row-at-a-time Python UDF, unreduced single-partition funnel) — as
    a pytest, so a new entry can't regress silently between rounds.
    Runs at sf0.001 (explain-only beyond what entry construction
    itself stages); WARN/INFO findings are the audit's business, not a
    failure here."""
    import __spark_entry__ as entrymod

    from bdq_spark.plans.plan_lint import lint_plan

    sf_dir = "/root/testdata/sf0.001"
    errors = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # construction failure is its own bug
            errors[name] = [f"entry construction failed: {e}"]
            continue
        bad = [
            f"{f.rule}: {f.message}"
            for f in lint_plan(df)
            if f.severity == "ERROR"
        ]
        if bad:
            errors[name] = bad
    assert errors == {}, f"scale-hazard ERRORs in {sorted(errors)}: {errors}"


def preexisting_entries(repo, boundary_round):
    """Entries recorded by a driver CORRECTNESS file from a round
    <= ``boundary_round`` — i.e. entries that provably existed at the
    old round-boundary rev.

    VERDICT r12 "what's wrong": the union used to cover ALL
    ``CORRECTNESS_r*.json`` on disk, so the moment the driver landed
    the CURRENT round's file (after the builder's battery), entries
    born in-round flipped to "preexisting" and the bench-A/B gate
    demanded an old-side number the old rev cannot produce.  Capping
    at the boundary round keeps the exemption exactly as scoped:
    born-in-round entries stay exempt until the NEXT round's boundary,
    when the old rev genuinely can run them.
    """
    out = set()
    for r in range(1, boundary_round + 1):
        p = os.path.join(repo, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(p):
            with open(p) as f:
                out.update(json.load(f))
    return out


def test_preexisting_union_capped_at_boundary_round():
    """Pin the post-round-landing scenario from VERDICT r12: after the
    driver writes CORRECTNESS_r12.json, the two entries born in round
    12 must still be exempt relative to the round-11 boundary, and
    only become pre-existing once the boundary advances to round 12."""
    born_r12 = {"embedding_near_dup_pairs_multitable", "knn_rerank_embeddings"}
    assert os.path.exists(os.path.join(REPO, "CORRECTNESS_r12.json"))
    at_r11_boundary = preexisting_entries(REPO, 11)
    assert not (born_r12 & at_r11_boundary), (
        "entries born in round 12 leaked into the round-11-boundary "
        f"preexisting set: {sorted(born_r12 & at_r11_boundary)}"
    )
    at_r12_boundary = preexisting_entries(REPO, 12)
    assert born_r12 <= at_r12_boundary


def test_hot_module_changes_carry_bench_ab():
    """VERDICT r10 item 2 (bench-scale A/B rule): the CC fuse's 2x
    bench-scale cost shipped because its only A/B ran at x100 — so any
    module changed in-round whose gating entries include a
    top-20-by-wall bench entry must record a same-box focused
    SPARK_GRAFT_BENCH_ONLY A/B (old round-boundary rev vs HEAD,
    machine-stamped) in BENCH_AB_r{N}.json, declared in
    tests/window_policy.py::BENCH_AB, covering every intersecting
    entry on BOTH sides."""
    import subprocess

    wp_spec = importlib.util.spec_from_file_location(
        "window_policy",
        os.path.join(os.path.dirname(__file__), "window_policy.py"),
    )
    window_policy = importlib.util.module_from_spec(wp_spec)
    wp_spec.loader.exec_module(window_policy)

    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True,
    )
    if log.returncode != 0:
        pytest.skip("not a git checkout")
    boundary = None
    boundary_round = None
    for line in log.stdout.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith("round ") and "verdict" in subject:
            boundary = sha
            m = re.match(r"round (\d+)", subject)
            assert m, f"unparseable round-boundary subject: {subject!r}"
            boundary_round = int(m.group(1))
            break
    if boundary is None:
        pytest.skip("no round-boundary commit yet (round 1)")
    diff = subprocess.run(
        ["git", "diff", "--name-only", boundary, "--", "bdq_spark/"],
        cwd=REPO, capture_output=True, text=True,
    )
    changed = {p for p in diff.stdout.splitlines() if p.endswith(".py")}

    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    if not os.path.exists(detail_path):
        pytest.skip("no BENCH_DETAIL.json yet")
    mins = json.load(open(detail_path))["min"]
    top20 = set(sorted(mins, key=mins.get, reverse=True)[:20])

    # an A/B of an entry that did not EXIST at the old round-boundary
    # rev is undefined (the old side's bench would reject the name), so
    # the rule applies to pre-existing entries only: an entry is
    # pre-existing iff a driver CORRECTNESS file from a round <= the
    # boundary round recorded it (capped — see preexisting_entries).
    # A NEW top-20 entry still cannot dodge scrutiny — it leads the
    # current window (changed-code-first), so its first driver round
    # value-hashes and times it from scratch.
    preexisting = preexisting_entries(REPO, boundary_round)

    for module, entries in window_policy.TOUCHED.items():
        if module not in changed:
            continue
        hot = sorted(set(entries) & top20 & preexisting)
        if not hot:
            continue
        artifact = window_policy.BENCH_AB.get(module)
        assert artifact, (
            f"{module} changed in-round and gates top-20 bench entries "
            f"{hot} — declare its same-box A/B artifact in "
            f"window_policy.BENCH_AB and record it"
        )
        path = os.path.join(REPO, artifact)
        assert os.path.exists(path), f"{module}: {artifact} missing"
        art = json.load(open(path))
        for side in ("old", "new"):
            assert "queries" in art.get(side, {}), (
                f"{artifact}: side '{side}' needs a bench 'queries' map"
            )
            missing = [e for e in hot if e not in art[side]["queries"]]
            assert missing == [], (
                f"{artifact}: side '{side}' missing A/B numbers for "
                f"hot entries {missing} of {module}"
            )
            assert "host" in art[side], (
                f"{artifact}: side '{side}' needs its machine stamp"
            )
        assert art.get("old_rev"), f"{artifact}: record the old rev"
