"""Data-diff goldens — fixture F1, expected diff from
/root/reference/README.md:88-115."""

from datetime import date, datetime

from bdq_spark.operators import (
    compare_dataframes,
    uncache_compare_dataframes_results,
)

DDL = (
    "id1:long, id2:long, name:string, first_login_dt:date, "
    "last_login_ts:timestamp, credits:float, likes:long, active:boolean"
)


def _dfs(spark):
    ts = datetime(2023, 5, 1, 10, 0)
    df1 = spark.createDataFrame(
        [
            (1, 1, "Grzegorz", date(2023, 1, 1), ts, 100.0, 15, True),
            (2, 1, "Tim", date(2023, 1, 2), ts, 50.0, 3, True),
            (3, 1, "Maria", date(2023, 1, 3), ts, 77.0, 8, True),
        ],
        DDL,
    )
    df2 = spark.createDataFrame(
        [
            # changed: first_login_dt and credits differ
            (1, 1, "Grzegorz", date(2023, 2, 1), ts, 200.0, 15, True),
            # added (new key)
            (2, 2, "Timmy", date(2023, 1, 2), ts, 50.0, 3, True),
            # not changed
            (3, 1, "Maria", date(2023, 1, 3), ts, 77.0, 8, True),
        ],
        DDL,
    )
    return df1, df2


def test_compare_dataframes_counts_and_shapes(spark):
    df1, df2 = _dfs(spark)
    res = compare_dataframes(df1, df2, ["id1", "id2"])

    assert res["added_count"] == 1
    assert res["removed_count"] == 1
    assert res["changed_count"] == 1
    assert res["not_changed_count"] == 1

    # added = in df2 only (direction quirk), full df2 rows
    added = res["added"].collect()
    assert [(r.id1, r.id2, r.name) for r in added] == [(2, 2, "Timmy")]
    assert res["added"].columns == df2.columns

    removed = res["removed"].collect()
    assert [(r.id1, r.id2, r.name) for r in removed] == [(2, 1, "Tim")]

    # changed rows carry key cols + map<col, struct<before,after>> (strings)
    changed = res["changed"].collect()
    assert len(changed) == 1
    row = changed[0]
    assert (row.id1, row.id2) == (1, 1)
    assert set(row.changed.keys()) == {"first_login_dt", "credits"}
    assert row.changed["first_login_dt"].before == "2023-01-01"
    assert row.changed["first_login_dt"].after == "2023-02-01"
    assert row.changed["credits"].before == "100.0"
    assert row.changed["credits"].after == "200.0"

    nc = res["not_changed"].collect()
    assert [(r.id1, r.id2) for r in nc] == [(3, 1)]
    assert nc[0].changed == {}


def test_compare_dataframes_null_safe(spark):
    ddl = "k:int, v:string"
    df1 = spark.createDataFrame([(1, None), (2, "x")], ddl)
    df2 = spark.createDataFrame([(1, None), (2, None)], ddl)
    res = compare_dataframes(df1, df2, ["k"])
    # null <=> null is equal; "x" vs null is a change
    assert res["not_changed_count"] == 1
    assert res["changed_count"] == 1
    changed = res["changed"].first()
    assert changed.k == 2
    assert changed.changed["v"].before == "x"
    assert changed.changed["v"].after is None


def test_compare_dataframes_cached_all_usable(spark):
    # reference bug (premature unpersist of `changed`) is fixed: all four
    # frames remain usable and cached until explicit uncache
    df1, df2 = _dfs(spark)
    res = compare_dataframes(df1, df2, ["id1", "id2"], cache_results=True)
    assert res["changed"].count() == 1  # still valid after return
    assert res["changed"].storageLevel.useMemory
    uncache_compare_dataframes_results(res)
    assert not res["changed"].storageLevel.useMemory


def test_display_results(spark, capsys):
    from bdq_spark.operators import display_compare_dataframes_results

    df1, df2 = _dfs(spark)
    res = compare_dataframes(df1, df2, ["id1", "id2"])
    shown = []
    display_compare_dataframes_results(res, display_function=shown.append)
    out = capsys.readouterr().out
    assert "Added records count: 1" in out
    assert "Removed records count: 1" in out
    assert "Changed records count: 1" in out
    assert "Not changed records count: 1" in out
    # default flags: added/removed/changed shown, not_changed hidden
    assert len(shown) == 3
    assert shown[0] is res["added"]
