"""Delta-rule incremental view maintenance (operators/matview.py).

The IVM correctness criterion: after applying any consistent change
feed batch-by-batch, the maintained view equals a from-scratch
``agg_view`` of the final base state — including group-moving updates,
groups that appear mid-feed, and groups that empty out.
"""

from __future__ import annotations

import random
from decimal import Decimal

from pyspark.sql import Row

from bdq_spark.operators.matview import (
    agg_view,
    maintain_agg_view,
    view_deltas,
)

KEYS, MEAS = ["g"], ["x"]

_CHANGE_SCHEMA = (
    "op string, before_g string, before_x double, after_g string, after_x double"
)


def _row(op, bg=None, bx=None, ag=None, ax=None):
    return Row(op=op, before_g=bg, before_x=bx, after_g=ag, after_x=ax)


def _changes(spark, rows):
    return spark.createDataFrame(rows, _CHANGE_SCHEMA)


def _views_equal(spark, got, base_rows):
    want = agg_view(
        spark.createDataFrame(base_rows, "id long, g string, x double"),
        KEYS,
        MEAS,
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_insert_update_delete_roundtrip(spark):
    base = [Row(id=1, g="a", x=10.0), Row(id=2, g="a", x=5.0), Row(id=3, g="b", x=2.0)]
    view = agg_view(spark.createDataFrame(base), KEYS, MEAS)
    changes = _changes(
        spark,
        [
            _row("I", ag="c", ax=7.0),                       # new group
            _row("U", bg="a", bx=10.0, ag="b", ax=11.0),      # moves a -> b
            _row("D", bg="b", bx=2.0),                        # shrinks b
        ],
    )
    got = maintain_agg_view(view, changes, KEYS, MEAS)
    final = [
        Row(id=2, g="a", x=5.0),
        Row(id=1, g="b", x=11.0),
        Row(id=4, g="c", x=7.0),
    ]
    _views_equal(spark, got, final)


def test_group_empties_out_and_disappears(spark):
    base = [Row(id=1, g="solo", x=3.5), Row(id=2, g="keep", x=1.0)]
    view = agg_view(spark.createDataFrame(base), KEYS, MEAS)
    got = maintain_agg_view(
        view,
        _changes(spark, [_row("D", bg="solo", bx=3.5)]),
        KEYS,
        MEAS,
    )
    rows = got.collect()
    assert [r.g for r in rows] == ["keep"]
    # and the emptied group's sums were exactly zero before the drop
    deltas = view_deltas(
        _changes(spark, [_row("D", bg="solo", bx=3.5)]), KEYS, MEAS
    )
    undropped = view.join(deltas, "g").count()
    assert undropped == 1


def test_randomized_feed_matches_from_scratch(spark):
    """Property: simulate a random consistent feed in plain Python;
    batch-fold it through maintain_agg_view; compare to agg_view of
    the simulated final state.  Decimal measure arithmetic makes the
    match exact, not approximate."""
    rng = random.Random(7)
    state: dict[int, tuple[str, float]] = {
        i: (rng.choice("abcd"), round(rng.uniform(1, 99), 2))
        for i in range(40)
    }
    next_id = 40
    view = agg_view(
        spark.createDataFrame(
            [Row(id=i, g=g, x=x) for i, (g, x) in state.items()],
            "id long, g string, x double",
        ),
        KEYS,
        MEAS,
    )
    for _ in range(4):  # four batches
        batch = []
        for _ in range(15):
            kind = rng.choice("IUD")
            if kind == "I" or not state:
                g, x = rng.choice("abcde"), round(rng.uniform(1, 99), 2)
                state[next_id] = (g, x)
                next_id += 1
                batch.append(_row("I", ag=g, ax=x))
            elif kind == "U":
                rid = rng.choice(list(state))
                bg, bx = state[rid]
                ag, ax = rng.choice("abcde"), round(rng.uniform(1, 99), 2)
                state[rid] = (ag, ax)
                batch.append(_row("U", bg=bg, bx=bx, ag=ag, ax=ax))
            else:
                rid = rng.choice(list(state))
                bg, bx = state.pop(rid)
                batch.append(_row("D", bg=bg, bx=bx))
        view = maintain_agg_view(
            view,
            spark.createDataFrame(
                batch,
                "op string, before_g string, before_x double, "
                "after_g string, after_x double",
            ),
            KEYS,
            MEAS,
        ).localCheckpoint()  # keep lineage bounded across batches
    _views_equal(
        spark, view, [Row(id=i, g=g, x=x) for i, (g, x) in state.items()]
    )


def test_deltas_never_touch_base(spark):
    """The 100 TB property, enforced on the plan: view_deltas' physical
    plan contains scans of the change batch only (LocalTableScan here),
    no join and no second aggregate pass over anything else."""
    changes = _changes(spark, [_row("I", ag="a", ax=1.0)])
    deltas = view_deltas(changes, KEYS, MEAS)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        deltas.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    # exactly one aggregation (partial+final pair) over the union
    assert plan.count("HashAggregate") <= 4


def test_multi_measure_view(spark):
    base = [Row(id=1, g="a", x=2.0, y=10.0), Row(id=2, g="a", x=3.0, y=20.0)]
    view = agg_view(spark.createDataFrame(base), KEYS, ["x", "y"])
    got = maintain_agg_view(
        view,
        spark.createDataFrame(
            [
                Row(
                    op="U",
                    before_g="a",
                    before_x=2.0,
                    before_y=10.0,
                    after_g="a",
                    after_x=4.0,
                    after_y=10.0,
                )
            ]
        ),
        KEYS,
        ["x", "y"],
    ).collect()[0]
    assert (got.sum_x, got.sum_y, got.cnt) == (Decimal("7.00"), Decimal("30.00"), 2)


def test_snapshot_changes_roundtrip_and_classification(spark):
    """Diff two snapshots, feed the derived changes through the
    maintainer, land on the new snapshot's view exactly — plus op
    classification including NULL transitions and group moves."""
    from bdq_spark.operators.matview import snapshot_changes

    old_rows = [
        Row(id=1, g="a", x=10.0),
        Row(id=2, g="a", x=5.0),
        Row(id=3, g="b", x=2.0),
        Row(id=4, g="b", x=None),
    ]
    new_rows = [
        Row(id=1, g="b", x=10.0),   # group move
        Row(id=2, g="a", x=5.0),    # unchanged -> no feed row
        Row(id=4, g="b", x=7.0),    # NULL -> value = update
        Row(id=5, g="c", x=1.0),    # insert
    ]                               # id=3 deleted
    schema = "id long, g string, x double"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    feed = snapshot_changes(old, new, ["id"]).collect()
    ops = {r.before_id or r.after_id: r.op for r in feed}
    assert ops == {1: "U", 3: "D", 4: "U", 5: "I"}
    assert len(feed) == 4  # unchanged id=2 emits nothing
    # round-trip law — but x has a NULL, which agg_view's sum skips;
    # restrict the maintained view to the measure-bearing rows
    view_old = agg_view(old.where("x IS NOT NULL"), KEYS, MEAS)
    feed_df = snapshot_changes(
        old.where("x IS NOT NULL"), new, ["id"]
    )
    got = maintain_agg_view(view_old, feed_df, KEYS, MEAS)
    want = agg_view(new, KEYS, MEAS)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_snapshot_changes_compare_cols_subset_and_validation(spark):
    """Columns outside compare_cols are invisible to classification:
    a row differing only in an ignored column emits nothing."""
    from bdq_spark.operators.matview import snapshot_changes

    schema = "id long, g string, x double, note string"
    old = spark.createDataFrame(
        [Row(id=1, g="a", x=1.0, note="v1"), Row(id=2, g="a", x=2.0, note="v1")],
        schema,
    )
    new = spark.createDataFrame(
        [Row(id=1, g="a", x=1.0, note="v2"),   # only ignored col changed
         Row(id=2, g="b", x=2.0, note="v1")],  # compared col changed
        schema,
    )
    feed = snapshot_changes(old, new, ["id"], compare_cols=["g", "x"]).collect()
    assert len(feed) == 1
    r = feed[0]
    assert (r.op, r.before_id, r.before_g, r.after_g) == ("U", 2, "a", "b")
    import pytest as _p

    with _p.raises(ValueError):
        snapshot_changes(old, new, [])


def test_snapshot_changes_null_key_and_keys_only(spark):
    """ADVICE r7: NULL key values must match their counterpart
    (null-safe key equality), and a keys-only table must not crash on
    the empty compare-cols list."""
    import pytest
    from pyspark.sql import functions as F

    from bdq_spark.operators.matview import snapshot_changes

    # NULL-keyed row, unchanged value -> emits NOTHING (was: D+I pair)
    old = spark.createDataFrame(
        [Row(id=None, x=1), Row(id=1, x=10)], schema="id int, x int"
    )
    new = spark.createDataFrame(
        [Row(id=None, x=1), Row(id=1, x=11)], schema="id int, x int"
    )
    feed = snapshot_changes(old, new, ["id"]).collect()
    assert [(r.op, r.before_id, r.before_x, r.after_x) for r in feed] == [
        ("U", 1, 10, 11)
    ]
    # NULL-keyed row whose value changes -> a single U, images intact
    new2 = spark.createDataFrame(
        [Row(id=None, x=2), Row(id=1, x=10)], schema="id int, x int"
    )
    feed2 = snapshot_changes(old, new2, ["id"]).collect()
    assert [(r.op, r.before_id, r.before_x, r.after_x) for r in feed2] == [
        ("U", None, 1, 2)
    ]

    # keys-only table: I/D classify, in-both rows emit nothing
    ko_old = spark.createDataFrame([Row(k=1), Row(k=2)])
    ko_new = spark.createDataFrame([Row(k=2), Row(k=3)])
    ko = snapshot_changes(ko_old, ko_new, ["k"])
    assert sorted((r.op, r.before_k, r.after_k) for r in ko.collect()) == [
        ("D", 1, None),
        ("I", None, 3),
    ]
