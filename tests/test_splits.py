"""Deterministic split/sample tests: stability across runs and
partitionings, proportion accuracy, sample nesting, null keys."""

import pytest
from pyspark.sql import functions as F

from bdq_spark.operators import (
    deterministic_sample,
    hash_split,
)


@pytest.fixture()
def ids(spark):
    return spark.range(0, 20_000).select(F.col("id").alias("k"))


WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


def test_split_proportions_and_coverage(spark, ids):
    counts = dict(
        hash_split(ids, WEIGHTS, ["k"])
        .groupBy("split")
        .count()
        .collect()
    )
    assert set(counts) == {"train", "val", "test"}
    n = sum(counts.values())
    assert n == 20_000  # exactly one split per row
    assert abs(counts["train"] / n - 0.9) < 0.01
    assert abs(counts["val"] / n - 0.05) < 0.005
    assert abs(counts["test"] / n - 0.05) < 0.005


def test_split_stable_across_runs_and_partitionings(spark, ids):
    a = dict(hash_split(ids, WEIGHTS, ["k"]).select("k", "split").collect())
    b = dict(
        hash_split(ids.repartition(17), WEIGHTS, ["k"])
        .select("k", "split")
        .collect()
    )
    assert a == b  # randomSplit would fail this

    # a different salt reshuffles assignment
    c = dict(
        hash_split(ids, WEIGHTS, ["k"], salt="v2").select("k", "split").collect()
    )
    assert a != c


def test_sample_nesting_and_fraction(spark, ids):
    small = {r.k for r in deterministic_sample(ids, 0.02, ["k"]).collect()}
    large = {r.k for r in deterministic_sample(ids, 0.20, ["k"]).collect()}
    assert small <= large  # nested: smaller fraction is a subset
    assert abs(len(large) / 20_000 - 0.20) < 0.02
    assert abs(len(small) / 20_000 - 0.02) < 0.01

    # repartition-invariant
    again = {
        r.k for r in deterministic_sample(ids.repartition(13), 0.20, ["k"]).collect()
    }
    assert again == large


def test_null_and_multi_column_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "a"), (None, None)],
        "x int, y string",
    )
    out = hash_split(df, WEIGHTS, ["x", "y"]).collect()
    assert len(out) == 4
    assert all(r.split in WEIGHTS for r in out)
    # null renders distinctly from the string 'None'/'': all four keys
    # hash independently and deterministically
    again = hash_split(df, WEIGHTS, ["x", "y"]).collect()
    assert sorted(map(tuple, out), key=repr) == sorted(map(tuple, again), key=repr)


def test_validation(spark, ids):
    with pytest.raises(ValueError, match="key_columns"):
        hash_split(ids, WEIGHTS, [])
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(ids, {}, ["k"])
    with pytest.raises(ValueError, match=">= 0"):
        hash_split(ids, {"a": -1.0, "b": 2.0}, ["k"])
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(ids, 1.5, ["k"])


def test_stratified_sample_fractions_and_stability(spark):
    from bdq_spark.operators import deterministic_sample, deterministic_sample_by

    df = spark.range(0, 30_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 < 8, "en")
        .when(F.col("id") % 10 < 9, "de")
        .otherwise(None)
        .alias("lang"),
    )
    out = deterministic_sample_by(
        df, "lang", {"en": 0.1, "de": 1.0}, ["k"], default_fraction=0.5
    )
    counts = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert abs(counts["en"] / 24_000 - 0.1) < 0.01    # downsampled majority
    assert counts["de"] == 3_000                      # kept whole
    assert abs(counts[None] / 3_000 - 0.5) < 0.05     # null stratum -> default

    # stable across partitionings
    a = {r.k for r in out.collect()}
    b = {
        r.k
        for r in deterministic_sample_by(
            df.repartition(11), "lang", {"en": 0.1, "de": 1.0}, ["k"],
            default_fraction=0.5,
        ).collect()
    }
    assert a == b

    # per-stratum sampling agrees with the flat sampler at equal fraction
    en = df.filter(F.col("lang") == "en")
    flat = {r.k for r in deterministic_sample(en, 0.1, ["k"]).collect()}
    strat = {r.k for r in out.collect() if r.lang == "en"}
    assert strat == flat

    with pytest.raises(ValueError, match="fractions"):
        deterministic_sample_by(df, "lang", {"en": 1.2}, ["k"])
    with pytest.raises(ValueError, match="not in DataFrame"):
        deterministic_sample_by(df, "nope", {"en": 0.5}, ["k"])


def test_weighted_mixture_recipe(spark):
    from bdq_spark.operators import deterministic_sample_by, weighted_mixture

    df = spark.range(0, 30_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 < 8, "en")
        .when(F.col("id") % 10 < 9, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    out = weighted_mixture(
        df, "lang", {"en": 0.5, "de": 2.5, "fr": 3.0}, ["k"],
        default_weight=1.0, salt="mix",
    )
    counts = {
        r.lang: r.cnt
        for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert abs(counts["en"] / 24_000 - 0.5) < 0.02    # halved, one copy each
    assert abs(counts["de"] / 3_000 - 2.5) < 0.05     # 2 copies + half a 3rd
    assert counts["fr"] == 3_000 * 3                  # exact integer tripling

    # copy indices are dense 0..copies-1 per key
    per_key = {}
    for r in out.filter(F.col("lang") == "de").collect():
        per_key.setdefault(r.k, []).append(r.copy_idx)
    assert all(sorted(v) == list(range(len(v))) for v in per_key.values())
    assert {len(v) for v in per_key.values()} == {2, 3}

    # fractional-copy assignment is key-stable across partitionings
    a = {(r.k, r.copy_idx) for r in out.collect()}
    b = {
        (r.k, r.copy_idx)
        for r in weighted_mixture(
            df.repartition(13), "lang", {"en": 0.5, "de": 2.5, "fr": 3.0},
            ["k"], default_weight=1.0, salt="mix",
        ).collect()
    }
    assert a == b

    # w < 1 selects the SAME keys as the equal-fraction downsampler
    en_kept = {r.k for r in out.filter(F.col("lang") == "en").collect()}
    ds = {
        r.k
        for r in deterministic_sample_by(
            df.filter(F.col("lang") == "en"), "lang", {"en": 0.5}, ["k"],
            salt="mix",
        ).collect()
    }
    assert en_kept == ds

    with pytest.raises(ValueError, match=">= 0"):
        weighted_mixture(df, "lang", {"en": -1.0}, ["k"])
    with pytest.raises(ValueError, match="not in DataFrame"):
        weighted_mixture(df, "nope", {"en": 1.0}, ["k"])


def test_temperature_mixture_proportions(spark):
    from bdq_spark.operators.splits import temperature_mixture

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mixture(df, "lang", ["doc_id"], alpha=0.5)
    got = out.groupBy("lang").count().collect()
    by = {r.lang: r["count"] for r in got}
    # alpha=0.5: shares ~ sqrt(n): sqrt(900):sqrt(100) = 3:1 -> big ~750, small ~250
    assert abs(by["big"] - 750) < 40
    assert abs(by["small"] - 250) < 40
    # expected total preserved
    assert abs(sum(by.values()) - 1000) < 60
    # alpha=1 is a no-op recipe: every multiplicity exactly 1
    ident = temperature_mixture(df, "lang", ["doc_id"], alpha=1.0)
    assert ident.count() == 1000
    assert ident.select("copy_idx").distinct().collect()[0][0] == 0


def test_temperature_mixture_determinism_and_validation(spark):
    import pytest as _pt

    from bdq_spark.operators.splits import temperature_mixture

    df = spark.createDataFrame(
        [(i, "a" if i % 4 else "b") for i in range(200)],
        "doc_id long, lang string",
    )
    a = sorted((r.doc_id, r.copy_idx) for r in
               temperature_mixture(df, "lang", ["doc_id"], alpha=0.3).collect())
    b = sorted((r.doc_id, r.copy_idx) for r in
               temperature_mixture(df.repartition(7), "lang", ["doc_id"], alpha=0.3).collect())
    assert a == b  # key-stable under repartition
    with _pt.raises(ValueError, match="alpha"):
        temperature_mixture(df, "lang", ["doc_id"], alpha=-1)
    with _pt.raises(ValueError, match="not in DataFrame"):
        temperature_mixture(df, "nope", ["doc_id"])


def test_fixed_size_sample_exact_and_nested(spark):
    from bdq_spark.operators.splits import fixed_size_sample

    df = spark.createDataFrame(
        [(i, "a" if i < 300 else "b") for i in range(400)],
        "doc_id long, lang string",
    )
    s30 = fixed_size_sample(df, 30, ["doc_id"], stratum_column="lang")
    by = {r[0]: r[1] for r in s30.groupBy("lang").count().collect()}
    assert by == {"a": 30, "b": 30}
    # nesting: smaller sample is a prefix of the larger one
    s10 = fixed_size_sample(df, 10, ["doc_id"], stratum_column="lang")
    ids30 = {r.doc_id for r in s30.collect()}
    ids10 = {r.doc_id for r in s10.collect()}
    assert ids10 <= ids30
    # stratum smaller than n -> whole stratum kept
    tiny = fixed_size_sample(df.filter("doc_id < 5"), 30, ["doc_id"],
                             stratum_column="lang")
    assert tiny.count() == 5
    # global (no stratum) exact size
    g = fixed_size_sample(df, 17, ["doc_id"])
    assert g.count() == 17
    import pytest as _pt
    with _pt.raises(ValueError, match="positive"):
        fixed_size_sample(df, 0, ["doc_id"])


def test_fixed_size_sample_global_bucketed_equals_naive(spark):
    """The bucketed two-stage global top-n must return EXACTLY the rows
    the naive single-window rank returns, and bound the single-partition
    stage's input to buckets*n rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bdq_spark.operators.splits import fixed_size_sample

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(500)], "doc_id long, txt string"
    ).repartition(13)
    got = fixed_size_sample(df, 25, ["doc_id"])
    # naive reference: one global window over everything
    h = F.md5(F.concat(F.lit(""), F.lit("\x1f"),
                       F.coalesce(F.col("doc_id").cast("string"), F.lit("@~<null>~@"))))
    naive = (
        df.withColumn("__r", F.row_number().over(
            Window.partitionBy().orderBy(h, F.col("doc_id"))))
        .filter("__r <= 25").drop("__r")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    # nesting survives the bucketed path
    small = {r.doc_id for r in fixed_size_sample(df, 5, ["doc_id"]).collect()}
    assert small <= {r.doc_id for r in got.collect()}
    # the plan carries the bucketed pre-rank: two Window nodes, the
    # first partitioned by the pmod(xxhash64) bucket expression
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2
    assert "pmod" in plan and "xxhash64" in plan
