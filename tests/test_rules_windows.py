"""Rule engine + event-time window helper tests."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from bdq_spark.operators.rules import (
    Rule,
    annotate_rules,
    check_rules,
    observe_rules,
    quarantine_rules,
    violation_summary,
)
from bdq_spark.streaming import (
    dedup_within_watermark,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


@pytest.fixture()
def people(spark):
    rows = [
        (1, 25, "a@x.com"),
        (2, -3, "b@x.com"),     # bad age
        (3, 40, None),          # bad email (null predicate -> violation)
        (4, 200, "nope"),       # bad age + bad email
        (5, 30, "e@x.com"),
    ]
    return spark.createDataFrame(rows, "id:int, age:int, email:string")


RULES = [
    Rule("age_valid", "age BETWEEN 0 AND 150"),
    Rule("email_has_at", "email LIKE '%@%'"),
]


def test_check_rules_single_pass(people):
    res = check_rules(people, RULES)
    assert res["record_count"] == 5
    assert res["violations"] == {"age_valid": 2, "email_has_at": 2}
    assert res["failed_records"] == 3  # rows 2, 3, 4


def test_annotate_and_quarantine(people):
    ann = {r.id: r["__failed_rules"] for r in annotate_rules(people, RULES).collect()}
    assert ann[1] == []
    assert ann[2] == ["age_valid"]
    assert ann[3] == ["email_has_at"]  # NULL email counts as violation
    assert sorted(ann[4]) == ["age_valid", "email_has_at"]

    clean, bad = quarantine_rules(people, RULES)
    assert {r.id for r in clean.collect()} == {1, 5}
    assert {r.id for r in bad.collect()} == {2, 3, 4}
    assert "__failed_rules" in bad.columns and "__failed_rules" not in clean.columns


def test_observe_rules_zero_extra_scan(people, tmp_path):
    df, obs = observe_rules(people, RULES)
    df.write.mode("overwrite").parquet(str(tmp_path / "out"))  # the only action
    got = obs.get
    assert got["record_count"] == 5
    assert got["age_valid"] == 2
    assert got["email_has_at"] == 2


def test_rule_validation():
    from bdq_spark.operators.rules import _validate

    with pytest.raises(ValueError, match="non-empty"):
        _validate([])
    with pytest.raises(ValueError, match="duplicate"):
        _validate([Rule("x", "1=1"), Rule("x", "2=2")])


@pytest.fixture()
def ev(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 30), "click", 1.0),
        (2, datetime(2024, 1, 1, 10, 0), "click", 2.0),
        (3, datetime(2024, 1, 1, 23, 59), "view", 3.0),
        (4, datetime(2024, 1, 2, 0, 1), "click", 4.0),
        (5, datetime(2024, 1, 3, 12, 0), "view", 5.0),
    ]
    return spark.createDataFrame(rows, "event_id:long, ts:timestamp, typ:string, value:double")


def test_tumbling_window_agg(ev):
    out = tumbling_window_agg(
        ev, "ts", "1 day", [F.count(F.lit(1)).alias("n")],
    ).orderBy("window_start").collect()
    assert [(r.window_start.day, r.n) for r in out] == [(1, 3), (2, 1), (3, 1)]
    assert all((r.window_end - r.window_start).days == 1 for r in out)


def test_tumbling_with_group_by(ev):
    out = tumbling_window_agg(
        ev, "ts", "1 day", [F.count(F.lit(1)).alias("n")], group_by=["typ"],
    ).collect()
    got = {(r.window_start.day, r.typ): r.n for r in out}
    assert got[(1, "click")] == 2 and got[(1, "view")] == 1


def test_sliding_window_agg(ev):
    out = sliding_window_agg(
        ev, "ts", "2 days", "1 day", [F.count(F.lit(1)).alias("n")],
    ).collect()
    got = {r.window_start.day: r.n for r in out if r.window_start.month == 1}
    # window [Dec31-Jan2) catches 3, [Jan1-Jan3) catches 4, [Jan2-Jan4) 2, [Jan3-Jan5) 1
    assert got[1] == 4 and got[2] == 2 and got[3] == 1


def test_session_window_agg(ev):
    out = session_window_agg(
        ev, "ts", "1 hour", [F.count(F.lit(1)).alias("n")],
    ).orderBy("window_start").collect()
    # sessions: {1}, {2}, {3,4} (2-min gap), {5}
    assert [r.n for r in out] == [1, 1, 2, 1]


def test_dedup_within_watermark_batch(ev):
    doubled = ev.union(ev)
    out = dedup_within_watermark(doubled, ["event_id"], "ts", "1 hour")
    assert out.count() == 5


def test_tumbling_window_streaming(spark, ev, tmp_path):
    src = tmp_path / "src"
    ev.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    agg = tumbling_window_agg(
        stream, "ts", "1 day", [F.count(F.lit(1)).alias("n")],
        watermark="1 hour",
    )
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("tumble_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM tumble_test ORDER BY window_start").collect()
    assert [(r.window_start.day, r.n) for r in got] == [(1, 3), (2, 1), (3, 1)]


def test_observe_rules_streaming(spark, tmp_path):
    from bdq_spark.operators.rules import Rule, observe_rules

    src = tmp_path / "rsrc"
    src.mkdir()
    spark.createDataFrame(
        [(1, 10), (2, -5), (3, 200), (4, 30)], "id:long, age:int"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))

    stream = spark.readStream.schema("id long, age int").parquet(f"{src}/*")
    observed, obs = observe_rules(
        stream, [Rule("age_ok", "age BETWEEN 0 AND 150")], name="stream_rules"
    )
    assert obs is None  # streaming path: named observation
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "rckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    progress = q.lastProgress
    metrics = progress["observedMetrics"]["stream_rules"]
    assert metrics["record_count"] == 4
    assert metrics["age_ok"] == 2  # -5 and 200 violate


# ---------------------------------------------------------------------------
# interval_join (batch + true stream-stream)
# ---------------------------------------------------------------------------

def _ij_data(spark):
    from datetime import datetime as DT

    clicks = spark.createDataFrame(
        [(1, DT(2024, 1, 1, 10, 0), 100),
         (1, DT(2024, 1, 1, 12, 0), 101),
         (2, DT(2024, 1, 1, 10, 0), 102)],
        "user_id long, ts timestamp, event_id long",
    )
    buys = spark.createDataFrame(
        [(1, DT(2024, 1, 1, 10, 30), 200),   # within 1h of click 100
         (1, DT(2024, 1, 1, 13, 30), 201),   # within 2h of 12:00 click only
         (2, DT(2024, 1, 1, 9, 0), 202),     # before any click -> no pair
         (3, DT(2024, 1, 1, 10, 0), 203)],   # no clicks for user 3
        "user_id long, ts timestamp, event_id long",
    )
    return clicks, buys


def test_interval_join_batch(spark):
    from bdq_spark.streaming import interval_join

    clicks, buys = _ij_data(spark)
    got = sorted(
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in interval_join(
            clicks, buys, ["user_id"], "ts", "ts", upper="1 hour"
        ).collect()
    )
    assert got == [(1, 100, 200)]
    wide = sorted(
        (r.l_event_id, r.r_event_id)
        for r in interval_join(
            clicks, buys, ["user_id"], "ts", "ts", upper="4 hours"
        ).collect()
    )
    assert wide == [(100, 200), (100, 201), (101, 201)]
    with pytest.raises(ValueError, match="keys"):
        interval_join(clicks, buys, [], "ts", "ts")


def test_interval_join_how_validation_and_outer_keys(spark):
    from bdq_spark.streaming import interval_join

    clicks, buys = _ij_data(spark)
    with pytest.raises(ValueError, match="how"):
        interval_join(clicks, buys, ["user_id"], "ts", "ts", how="left_semi")
    with pytest.raises(ValueError, match="interval bound"):
        interval_join(
            clicks, buys, ["user_id"], "ts", "ts",
            upper="1 hour); DROP TABLE x",
        )
    # full outer: right-only rows (user 3 never clicks) must keep keys
    full = interval_join(
        clicks, buys, ["user_id"], "ts", "ts", upper="1 hour", how="full"
    )
    rows = {r.user_id for r in full.collect()}
    assert None not in rows
    assert 3 in rows  # buy 203's key survives via the coalesce


def test_interval_join_stream_stream(spark, tmp_path):
    from bdq_spark.streaming import interval_join

    clicks, buys = _ij_data(spark)
    cdir, bdir = str(tmp_path / "c"), str(tmp_path / "b")
    clicks.coalesce(1).write.parquet(cdir)
    buys.coalesce(1).write.parquet(bdir)
    sc = spark.readStream.schema(clicks.schema).parquet(cdir)
    sb = spark.readStream.schema(buys.schema).parquet(bdir)
    joined = interval_join(
        sc, sb, ["user_id"], "ts", "ts", upper="4 hours", watermark="1 day"
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_test_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.l_event_id, r.r_event_id)
        for r in spark.table("ij_test_sink").collect()
    )
    spark.catalog.dropTempView("ij_test_sink")
    assert got == [(100, 200), (100, 201), (101, 201)]


def test_dedup_within_watermark_true_streaming(spark, tmp_path):
    from datetime import datetime as DT

    from bdq_spark.streaming import dedup_within_watermark

    df = spark.createDataFrame(
        [(1, "click", DT(2024, 1, 1, 10, 0)),
         (1, "click", DT(2024, 1, 1, 10, 10)),   # dup within horizon
         (1, "buy", DT(2024, 1, 1, 10, 20)),
         (2, "click", DT(2024, 1, 1, 11, 0)),
         (2, "click", DT(2024, 1, 1, 11, 1))],   # dup within horizon
        "user_id long, event_type string, ts timestamp",
    )
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    deduped = dedup_within_watermark(
        stream, ["user_id", "event_type"], "ts", "1 hour"
    )
    assert deduped.isStreaming
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("ddww_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.event_type)
        for r in spark.table("ddww_sink").collect()
    )
    spark.catalog.dropTempView("ddww_sink")
    assert got == [(1, "buy"), (1, "click"), (2, "click")]
