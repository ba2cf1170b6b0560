"""As-of join semantics: inclusive ties, direction, tolerance, null and
unmatched handling; cross-checked against pandas ``merge_asof``."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bdq_spark.operators import asof_join


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts(5), 100.0),
            (2, "A", _ts(10), 101.0),
            (3, "B", _ts(7), 50.0),
            (4, "C", _ts(7), 7.0),      # key with no quotes at all
            (5, "A", _ts(2), 99.0),     # before every A quote
            (6, "A", None, 1.0),        # null trade time -> no match
        ],
        "trade_id long, sym string, t timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(4), 10.0),
            ("A", _ts(10), 11.0),       # exactly at trade 2's time (tie)
            ("A", _ts(12), 12.0),
            ("B", _ts(1), 5.0),
            ("B", None, 6.0),           # null quote time -> never matches
        ],
        "sym string, t timestamp, bid double",
    )
    return trades, quotes


def test_backward_inclusive_and_unmatched(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], left_time="t")
    rows = {r.trade_id: r for r in out.collect()}
    assert len(rows) == 6  # left join keeps everything
    assert rows[1].bid == 10.0          # _ts(4) <= _ts(5)
    assert rows[2].bid == 11.0          # tie at _ts(10) matches inclusively
    assert rows[3].bid == 5.0
    assert rows[4].bid is None          # no quotes for C
    assert rows[5].bid is None          # trade before any quote
    assert rows[6].bid is None          # null trade time
    # right time column exposed with collision suffix
    assert rows[1].t_right == _ts(4)
    assert out.columns == ["trade_id", "sym", "t", "price", "t_right", "bid"]


def test_forward_direction(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], left_time="t", direction="forward")
    rows = {r.trade_id: r for r in out.collect()}
    assert rows[1].bid == 11.0          # next A quote at _ts(10)
    assert rows[2].bid == 11.0          # tie matches inclusively forward too
    assert rows[5].bid == 10.0
    assert rows[3].bid is None          # no B quote after _ts(7)
    assert rows[4].bid is None          # no quotes for C
    assert rows[6].bid is None          # null trade time never matches forward


def test_tolerance_and_inner(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_time="t",
        tolerance_seconds=2 * 86400.0,
    )
    rows = {r.trade_id: r for r in out.collect()}
    assert rows[1].bid == 10.0          # 1 day old: kept
    assert rows[2].bid == 11.0          # 0 old: kept
    assert rows[3].bid is None          # 6 days old: dropped

    inner = asof_join(trades, quotes, on=["sym"], left_time="t", join_type="inner")
    assert {r.trade_id for r in inner.collect()} == {1, 2, 3}


def test_validation_errors(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on=["sym"], left_time="t", direction="sideways")
    with pytest.raises(ValueError, match="join_type"):
        asof_join(trades, quotes, on=["sym"], left_time="t", join_type="outer")
    with pytest.raises(ValueError, match="missing"):
        asof_join(trades, quotes, on=["nope"], left_time="t")
    with pytest.raises(ValueError, match="tolerance_seconds requires"):
        # right_time that is a key column has no payload field to diff against
        asof_join(
            trades, quotes, on=["sym"], left_time="t", right_time="sym",
            tolerance_seconds=1.0,
        )


def test_matches_pandas_merge_asof(spark):
    """Randomized cross-check on real testdata: clicks asof-joined to
    prior purchases per user == pandas merge_asof by group."""
    from bdq_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("value").alias("pvalue")
    )
    got = (
        asof_join(clicks, purchases, on=["user_id"], left_time="ts",
                  right_time="pts")
        .select("event_id", "pts", "pvalue")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    lp = clicks.toPandas().sort_values("ts")
    rp = purchases.toPandas().sort_values("pts")
    want = (
        pd.merge_asof(lp, rp, left_on="ts", right_on="pts", by="user_id",
                      direction="backward")
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "pts", "pvalue"]]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
