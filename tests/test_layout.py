"""Z-order layout: key exactness, validation, and the locality claim."""

import pytest
from pyspark.sql import functions as F

from bdq_spark.operators.layout import zorder_key, zorder_layout


def _py_zkey(vals, bits=4):
    """Independent plain-Python replay: min/max bucket + interleave."""
    nd = len(vals[0])
    lohi = [
        (min(v[j] for v in vals), max(v[j] for v in vals))
        for j in range(nd)
    ]
    nb = 1 << bits
    out = []
    for v in vals:
        z = 0
        for j in range(nd):
            lo, hi = lohi[j]
            b = (v[j] - lo) * nb // (hi - lo + 1)
            for i in range(bits):
                z |= ((b >> i) & 1) << (i * nd + j)
        out.append(z)
    return out


def test_zorder_key_matches_python_replay(spark):
    import random

    rng = random.Random(5)
    vals = [
        (rng.randint(-500, 500), rng.randint(0, 10**6), rng.randint(7, 9))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, *v) for i, v in enumerate(vals)], "id:long, a:long, b:long, c:long"
    )
    got = {
        r.id: r.zkey
        for r in zorder_key(
            df, [("a", F.col("a")), ("b", F.col("b")), ("c", F.col("c"))],
            bits=4,
        ).collect()
    }
    expect = _py_zkey(vals, bits=4)
    assert got == {i: expect[i] for i in range(len(vals))}


def test_zorder_key_interleave_golden(spark):
    # 2 dims x 2 bits over value range [0, 4): bucket == value, and the
    # Morton codes are the textbook 2-bit interleave
    rows = [(i, x, y) for i, (x, y) in enumerate(
        [(0, 0), (1, 0), (0, 1), (3, 3), (2, 1)])]
    df = spark.createDataFrame(rows, "id:long, x:long, y:long")
    # force bounds 0..3 on both dims by including (0,0) and (3,3)
    got = {r.id: r.zkey for r in zorder_key(
        df, [("x", F.col("x")), ("y", F.col("y"))], bits=2).collect()}
    # (2,1): x-bit1 -> pos 2, y-bit0 -> pos 1 => 0b0110
    assert got == {0: 0b0000, 1: 0b0001, 2: 0b0010, 3: 0b1111, 4: 0b0110}


def test_zorder_key_validation(spark):
    df = spark.createDataFrame([(1, 0.5)], "id:long, v:double")
    with pytest.raises(ValueError, match="not integral"):
        zorder_key(df, [("v", F.col("v"))])
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="int64 key space"):
        zorder_key(df, [("id", F.col("id"))] * 5, bits=16)
    with pytest.raises(ValueError, match="bits"):
        zorder_key(df, [("id", F.col("id"))], bits=0)


def test_zorder_layout_locality(spark):
    """The point of the operator: after the layout rewrite, each output
    partition's bounding box is small in BOTH dimensions, so per-file
    min/max statistics prune range predicates on either.  Compare the
    mean per-partition bounding-box area against the unsorted layout —
    Z-order must shrink it by a large factor."""
    import random

    rng = random.Random(17)
    rows = [
        (i, rng.randint(0, 1023), rng.randint(0, 1023)) for i in range(4096)
    ]
    df = spark.createDataFrame(rows, "id:long, x:long, y:long").repartition(8)
    dims = [("x", F.col("x")), ("y", F.col("y"))]

    def mean_box_area(frame):
        stats = (
            frame.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("x") - F.min("x")).alias("dx"),
                (F.max("y") - F.min("y")).alias("dy"),
            )
            .collect()
        )
        return sum((r.dx + 1) * (r.dy + 1) for r in stats) / len(stats)

    base = mean_box_area(df)
    laid = mean_box_area(zorder_layout(df, dims, bits=5, num_partitions=16))
    # random partitions each cover ~the whole 1024x1024 square; 16
    # Z-runs cover ~1/16 of it each — demand at least a 4x shrink to
    # stay robust to range-partition boundary noise
    assert laid * 4 < base, (laid, base)


def test_zorder_layout_is_sorted_by_key(spark):
    rows = [(i, i * 37 % 101, i * 53 % 97) for i in range(500)]
    df = spark.createDataFrame(rows, "id:long, x:long, y:long")
    out = zorder_layout(
        df, [("x", F.col("x")), ("y", F.col("y"))], bits=4, num_partitions=4
    )
    # within every partition the key is non-decreasing, and partition
    # ranges are disjoint and ordered (repartitionByRange contract)
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .select("pid", "zkey")
        .collect()
    )
    by_pid = {}
    for r in parts:
        by_pid.setdefault(r.pid, []).append(r.zkey)
    for ks in by_pid.values():
        assert ks == sorted(ks)
    ordered = sorted(by_pid)
    for a, b in zip(ordered, ordered[1:]):
        assert max(by_pid[a]) <= min(by_pid[b])
