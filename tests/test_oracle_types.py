"""Type-lint sweep over every registered DuckDB oracle.

Round-7 postmortem: two oracles shipped driver-red because DuckDB's
``sum()`` / ``list_sum()`` over BIGINT promote to HUGEINT.  The local
gate compared via ``fetchall()``, which converts HUGEINT to Python int
— indistinguishable from the Spark bigint — while the driver's typed
hash saw decimal128(38,0) and failed.  ``tools/check_oracle.py`` now
fetches through Arrow (so the class fails locally too); this sweep
catches it even earlier, at pytest time, by BINDING every oracle (no
execution, no Spark) and failing on any HUGEINT/UHUGEINT output
column.  Spark has no 128-bit integer type, so a HUGEINT oracle column
can never hash-match a Spark result: it is always a bug.
"""

import os

import duckdb
import pytest

from bdq_spark import entry_queries as eq

SF_DIR = os.environ.get("SPARK_GRAFT_TYPES_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

BANNED = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


def _banned_columns(rel):
    cols = []
    for name, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(b in t for b in BANNED):
            cols.append((name, str(typ)))
    return cols


@pytest.mark.parametrize("name", sorted(eq.ORACLE_SQL))
def test_oracle_output_has_no_hugeint(con, name):
    rel = con.sql(eq.ORACLE_SQL[name])  # bind only — resolves types
    assert _banned_columns(rel) == [], (
        f"oracle {name!r} produces HUGEINT-typed output; "
        f"add CAST(... AS BIGINT) — Spark cannot hash-match int128"
    )


def test_lint_actually_fires_on_hugeint(con):
    """The sweep must catch the exact r7 bug shape: a bare sum() over
    BIGINT.  If DuckDB ever changes its promotion rules this canary
    flags that the sweep has gone vacuous."""
    rel = con.sql("SELECT sum(o_orderkey) AS s FROM orders")
    assert _banned_columns(rel) == [("s", "HUGEINT")]


def test_arrow_rows_preserves_duplicate_column_names(con):
    """ADVICE r8: the local gate's row rebuild must be positional — a
    dict-keyed rebuild collapses duplicate output column names to one
    value, silently weakening the multiset compare for that shape."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    tbl = con.sql("SELECT 1 AS a, 2 AS a, 3 AS b").arrow()
    assert mod.arrow_rows(tbl) == [(1, 2, 3)]
    empty = con.sql("SELECT 1 AS a WHERE false").arrow()
    assert mod.arrow_rows(empty) == []


def test_align_order_gives_each_duplicate_column_its_own_index(con):
    """ADVICE r9: the alignment order must be positional over (name,
    occurrence) — list.index() mapped every duplicate name to the FIRST
    occurrence, so a value difference confined to the SECOND duplicate
    column was invisible to the multiset compare.  Exercise row_key
    end-to-end: same first column, differing second duplicate."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_oracle_align",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cols = ["a", "a", "b"]
    order = mod.align_order(cols)
    assert sorted(order) == [0, 1, 2] and order != [0, 0, 2]

    # end-to-end: rows differ ONLY in the second 'a' column
    spark_row, duck_row = (1, 2, 3), (1, 99, 3)
    assert mod.row_key(spark_row, order) != mod.row_key(duck_row, order)
    # and identical rows still align regardless of column ordering
    shuffled = mod.align_order(["b", "a", "a"])
    assert mod.row_key((3, 1, 2), shuffled) == mod.row_key(spark_row, order)
