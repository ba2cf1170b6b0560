"""CDC apply: upsert/delete semantics, latest-wins ordering, tie rules."""

import pytest

from bdq_spark.operators.cdc import apply_cdc, latest_changes


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, bal double",
    )


def test_apply_cdc_upsert_delete_insert(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, "U", 1),    # update
            (3, "c", 30.0, "D", 1),     # delete
            (4, "d", 40.0, "I", 1),     # insert
        ],
        "id long, name string, bal double, op string, ver long",
    )
    got = sorted(
        (r.id, r.name, r.bal)
        for r in apply_cdc(base, changes, ["id"], ["ver"]).collect()
    )
    assert got == [(1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0)]


def test_apply_cdc_latest_wins_and_delete_tie(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [
            (1, "a1", 11.0, "u", 1),
            (1, "a2", 12.0, "update", 2),   # latest update wins
            (2, "x", 0.0, "insert", 5),
            (2, "ignored", 0.0, "d", 5),    # same version: delete wins
            (4, "d", 40.0, "i", 1),
            (4, "d", 40.0, "delete", 2),    # inserted then deleted -> gone
        ],
        "id long, name string, bal double, op string, ver long",
    )
    got = sorted(
        (r.id, r.name, r.bal)
        for r in apply_cdc(base, changes, ["id"], ["ver"]).collect()
    )
    assert got == [(1, "a2", 12.0), (3, "c", 30.0)]


def test_apply_cdc_output_columns_and_validation(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [(1, "z", "U", 1)], "id long, name string, op string, ver long"
    )
    # changes lacks `bal` -> must either raise or be restricted
    with pytest.raises(ValueError, match="missing output columns"):
        apply_cdc(base, changes, ["id"], ["ver"])
    got = sorted(
        (r.id, r.name)
        for r in apply_cdc(
            base, changes, ["id"], ["ver"], columns=["id", "name"]
        ).collect()
    )
    assert got == [(1, "z"), (2, "b"), (3, "c")]
    with pytest.raises(ValueError, match="non-empty"):
        latest_changes(changes, [], ["ver"])


def test_apply_cdc_idempotent_replay(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [(2, "b9", 29.0, "U", 7), (3, "c", 0.0, "D", 7)],
        "id long, name string, bal double, op string, ver long",
    )
    once = apply_cdc(base, changes, ["id"], ["ver"])
    twice = apply_cdc(once, changes, ["id"], ["ver"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_apply_cdc_strict_rejects_unknown_ops(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [(2, "b2", 21.0, "truncate", 1)],
        "id long, name string, bal double, op string, ver long",
    )
    # default: unknown codes land as upserts (forgiving direction)
    got = {r.id: r.name for r in apply_cdc(base, changes, ["id"], ["ver"]).collect()}
    assert got[2] == "b2"
    # strict: the job fails at the first unrecognized code
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException), match="unknown op code"):
        apply_cdc(base, changes, ["id"], ["ver"], strict=True).collect()
    # strict with only known codes is a no-op on the result
    ok = spark.createDataFrame(
        [(2, "b3", 22.0, "U", 1)],
        "id long, name string, bal double, op string, ver long",
    )
    strict_rows = sorted(map(tuple, apply_cdc(base, ok, ["id"], ["ver"], strict=True).collect()))
    loose_rows = sorted(map(tuple, apply_cdc(base, ok, ["id"], ["ver"]).collect()))
    assert strict_rows == loose_rows


# ---------------------------------------------------------------------------
# scd2_from_changes — SCD Type-2 interval assembly from a change feed
# ---------------------------------------------------------------------------

_FEED_SCHEMA = "id long, name string, op string, ver long"


def _scd2(spark, rows):
    from bdq_spark.operators.cdc import scd2_from_changes

    return scd2_from_changes(
        spark.createDataFrame(rows, _FEED_SCHEMA), ["id"], "ver"
    )


def test_scd2_intervals_close_and_current(spark):
    got = {
        (r.id, r.valid_from): (r.name, r.valid_to, r.is_current)
        for r in _scd2(
            spark,
            [
                (1, "a1", "I", 1),
                (1, "a2", "U", 3),
                (1, "a3", "U", 7),
                (2, "b1", "I", 1),
            ],
        ).collect()
    }
    assert got[(1, 1)] == ("a1", 3, False)
    assert got[(1, 3)] == ("a2", 7, False)
    assert got[(1, 7)] == ("a3", None, True)
    assert got[(2, 1)] == ("b1", None, True)


def test_scd2_delete_closes_then_reinsert_reopens(spark):
    rows = _scd2(
        spark,
        [
            (1, "a1", "I", 1),
            (1, "a1", "D", 4),
            (1, "a2", "I", 9),
        ],
    ).collect()
    got = {(r.valid_from): (r.name, r.valid_to, r.is_current) for r in rows}
    assert len(rows) == 2  # the delete emits nothing
    assert got[1] == ("a1", 4, False)  # closed BY the delete
    assert got[9] == ("a2", None, True)  # reopened


def test_scd2_deleted_key_has_no_current_row(spark):
    rows = _scd2(spark, [(1, "a1", "I", 1), (1, "a1", "D", 2)]).collect()
    assert [(r.valid_from, r.valid_to, r.is_current) for r in rows] == [
        (1, 2, False)
    ]


def test_scd2_same_version_delete_ties_close_immediately(spark):
    # upsert + delete at the same version: delete orders last, so the
    # upsert's interval exists but is closed at its own version
    rows = _scd2(spark, [(1, "a1", "U", 5), (1, "a1", "D", 5)]).collect()
    assert [(r.valid_from, r.valid_to, r.is_current) for r in rows] == [
        (5, 5, False)
    ]


def test_scd2_requires_keys(spark):
    from bdq_spark.operators.cdc import scd2_from_changes

    with pytest.raises(ValueError):
        scd2_from_changes(
            spark.createDataFrame([(1, "a", "I", 1)], _FEED_SCHEMA), [], "ver"
        )
