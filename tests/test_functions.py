"""Surrogate-key golden tests — expected values from
/root/reference/README.md:144-154 and tests/functions_test.py."""

from pyspark.sql import functions as F

from bdq_spark.functions import surrogate_key_hash, surrogate_key_string


def _sk_df(spark):
    # fixture F5: /root/reference/tests/functions_test.py:6-16
    rows = [
        (1, 1, "GrzeGorz", 1),
        (1, 1, "Grzegorz", 2),
        (1, 1, "Grzegorz ", 3),
        (1, 1, " Grzegorz", 4),
        (2, 1, "Tom", 10),
        (3, None, "Pascal", 20),
        (4, 4, None, 40),
    ]
    return spark.createDataFrame(rows, "id1:long, id2:long, name:string, likes:int")


def test_surrogate_key_string_goldens(spark):
    df = _sk_df(spark)
    got = df.select(
        surrogate_key_string(["id1", "id2", "name"], rtrim=True).alias("sk")
    ).collect()
    values = [r.sk for r in got]
    # upper defaults ON; rtrim strips trailing spaces; nulls render placeholder
    assert values[0] == "[1, 1, GRZEGORZ]"
    assert values[1] == "[1, 1, GRZEGORZ]"
    assert values[2] == "[1, 1, GRZEGORZ]"  # trailing space rtrimmed
    assert values[3] == "[1, 1,  GRZEGORZ]"  # leading space kept (no ltrim)
    assert values[5] == "[3, @~<null>~@, PASCAL]"
    assert values[6] == "[4, 4, @~<null>~@]"


def test_surrogate_key_string_single_column_is_bare():
    from bdq_spark.session import get_spark

    spark = get_spark()
    df = spark.createDataFrame([("abc",)], "name:string")
    got = df.select(surrogate_key_string(["name"]).alias("sk")).first()
    assert got.sk == "ABC"  # no array brackets for a single column


def test_surrogate_key_hash_golden(spark):
    # sha224('[1, 1, GRZEGORZ]')[:40] per /root/reference/README.md:147
    df = _sk_df(spark)
    got = df.select(
        surrogate_key_hash(["id1", "id2", "name"], rtrim=True).alias("h")
    ).collect()
    expected = bytes.fromhex("6F2199994CF293562E7CC329F96A422F6D62EC4B".lower())
    assert bytes(got[0].h) == expected
    assert bytes(got[1].h) == expected  # case-insensitive via upper
    assert bytes(got[2].h) == expected  # rtrim collapses trailing spaces
    assert len(bytes(got[0].h)) == 20  # 160-bit binary


def test_surrogate_key_hash_matches_python_sha224(spark):
    import hashlib

    df = _sk_df(spark)
    got = df.select(
        surrogate_key_hash(["id1", "id2", "name"], rtrim=True).alias("h")
    ).collect()
    py = hashlib.sha224(b"[3, @~<null>~@, PASCAL]").hexdigest()[:40]
    assert bytes(got[5].h) == bytes.fromhex(py)


def test_pseudonymize_stable_and_keyed(spark):
    import hashlib

    import pytest

    from bdq_spark.functions import pseudonymize

    df = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (1, "alice"), (None, "x")],
        "id long, name string",
    )
    got = [r[0] for r in df.select(pseudonymize(["id", "name"], "s3cret")).collect()]
    # stable: identical keys -> identical pseudonyms
    assert got[0] == got[2]
    # reference: sha256 over secret + US + rendered composite key
    exp = hashlib.sha256("s3cret\x1f[1, alice]".encode()).hexdigest()[:16]
    assert got[0] == exp
    # NULL key component uses the placeholder, still deterministic
    exp_null = hashlib.sha256("s3cret\x1f[@~<null>~@, x]".encode()).hexdigest()[:16]
    assert got[3] == exp_null
    # different secret -> different token space
    other = [r[0] for r in df.select(pseudonymize(["id", "name"], "other")).collect()]
    assert other[0] != got[0]
    with pytest.raises(ValueError, match="secret"):
        pseudonymize(["id"], "")
    with pytest.raises(ValueError, match="length"):
        pseudonymize(["id"], "k", length=4)
