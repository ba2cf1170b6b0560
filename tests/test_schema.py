"""Schema toolkit tests — goldens ported from
/root/reference/tests/schema_columns_test.py and compare_schema_test.py."""

import pytest

from bdq_spark.schema import (
    compare_schemas,
    get_column_names_combinations,
    get_column_names_from_schema,
    get_column_names_in_schema,
    get_column_names_not_in_schema,
    get_schema_from_ddl_string,
)

DDL = "a: byte, b: decimal(  16 , 8   ), c:int, d:int, e:int, f:int, g:int"


def test_ddl_parse_whitespace_tolerant():
    schema = get_schema_from_ddl_string("a: byte, b: decimal(  16 , 8   )")
    assert schema.names == ["a", "b"]
    assert schema["b"].dataType.simpleString() == "decimal(16,8)"


def test_column_names_from_schema_polymorphic():
    assert get_column_names_from_schema(DDL) == ["a", "b", "c", "d", "e", "f", "g"]
    schema = get_schema_from_ddl_string(DDL)
    assert get_column_names_from_schema(schema) == ["a", "b", "c", "d", "e", "f", "g"]
    with pytest.raises(ValueError):
        get_column_names_from_schema("totally !! not DDL ((")
    with pytest.raises(ValueError):
        get_column_names_from_schema(12345)


def test_membership_filters_preserve_order():
    assert get_column_names_in_schema(["g", "a", "zz"], DDL) == ["g", "a"]
    assert get_column_names_not_in_schema(["g", "a", "zz"], DDL) == ["zz"]


def test_combinations_golden():
    # golden from /root/reference/tests/schema_columns_test.py:19-27
    got = list(
        get_column_names_combinations(
            dynamic_column_names=["a", "b", "c"],
            fixed_column_names=["f", "g"],
            schema=DDL,
        )
    )
    assert got == [
        ("f", "g"),
        ("f", "g", "a"),
        ("f", "g", "b"),
        ("f", "g", "c"),
        ("f", "g", "a", "b"),
        ("f", "g", "a", "c"),
        ("f", "g", "b", "c"),
        ("f", "g", "a", "b", "c"),
    ]


def test_combinations_no_fixed_max_len():
    got = list(get_column_names_combinations(["a", "b", "c"], max_len=2))
    assert got == [
        ("a",),
        ("b",),
        ("c",),
        ("a", "b"),
        ("a", "c"),
        ("b", "c"),
    ]


def test_combinations_validation_errors():
    with pytest.raises(ValueError, match="invalud"):
        list(get_column_names_combinations(["nope"], schema=DDL))
    with pytest.raises(ValueError, match="overlap"):
        list(get_column_names_combinations(["a"], fixed_column_names=["a"]))


def test_compare_schemas_golden():
    # golden from /root/reference/tests/compare_schema_test.py:24-46
    base = (
        "id1:long, id2:long, name:string, first_login_dt:date, "
        "last_login_ts:timestamp, credits:float, likes:long, active:boolean"
    )
    drifted = (
        "id1:long, id2:long, name:string, "
        "last_login_ts:timestamp, credits:float, likes:int, active:boolean, "
        "new_data:date"
    )
    s1 = get_schema_from_ddl_string(base)
    s2 = get_schema_from_ddl_string(drifted)

    same = compare_schemas(s1, s1)
    assert same["added"] == set()
    assert same["removed"] == set()
    assert same["changed"] == {}
    assert same["not_changed"] == set(s1.names)

    diff = compare_schemas(s1, s2)
    # direction quirk: column present only in s1 reports as "added"
    assert diff["added"] == {"first_login_dt"}
    assert diff["removed"] == {"new_data"}
    assert diff["changed"] == {"likes": {"before": "bigint", "after": "int"}}
    assert diff["not_changed"] == {
        "id1",
        "id2",
        "name",
        "last_login_ts",
        "credits",
        "active",
    }
