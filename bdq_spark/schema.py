"""Schema toolkit: compare, DDL parse, column-combination generator.

Re-implements the semantics of ``bdq/schema.py`` (reference
`/root/reference/bdq/schema.py:16-113`) on public PySpark APIs.

All functions here are driver-side pure Python over ``StructType`` — they
never touch data, so they are scale-free.
"""

from __future__ import annotations

from itertools import combinations
from typing import Any, Generator, Iterable, List, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "compare_schemas",
    "dict_compare",
    "get_schema_from_ddl_string",
    "get_column_names_from_schema",
    "get_column_names_in_schema",
    "get_column_names_not_in_schema",
    "get_column_names_combinations",
]

SchemaLike = Union[str, DataFrame, T.StructType]


def dict_compare(d1: dict, d2: dict) -> dict:
    """Compare two dicts (semantics of `/root/reference/bdq/schema.py:28-48`).

    Direction quirk preserved: ``added`` = keys present in *d1* but not in
    *d2*; ``removed`` = keys in *d2* but not *d1*.  ``changed`` maps shared
    keys with unequal values to ``{'before': d1[k], 'after': d2[k]}``.
    """
    k1, k2 = set(d1), set(d2)
    shared = k1 & k2
    return {
        "added": k1 - k2,
        "removed": k2 - k1,
        "changed": {k: {"before": d1[k], "after": d2[k]} for k in shared if d1[k] != d2[k]},
        "not_changed": {k for k in shared if d1[k] == d2[k]},
    }


def compare_schemas(schema1: T.StructType, schema2: T.StructType) -> dict:
    """Diff two schemas by ``{field name: simpleString type}`` maps.

    Matches `/root/reference/bdq/schema.py:16-26` including the direction
    quirk shared with ``compare_dataframes``: a column present only in
    ``schema1`` reports as ``added``.
    """
    m1 = {f.name: f.dataType.simpleString() for f in schema1.fields}
    m2 = {f.name: f.dataType.simpleString() for f in schema2.fields}
    return dict_compare(m1, m2)


def get_schema_from_ddl_string(ddl: str) -> T.StructType:
    """Parse a DDL string like ``"a: byte, b: decimal( 16 , 8 )"``.

    Reference uses the private ``T._parse_datatype_string``
    (`/root/reference/bdq/schema.py:50-51`); on Spark >= 3.5 the public
    ``StructType.fromDDL`` handles the same grammar incl. whitespace.
    """
    return T.StructType.fromDDL(ddl)


def get_column_names_from_schema(schema: SchemaLike) -> List[str]:
    """Column names from a DDL string, DataFrame, or StructType.

    Polymorphic dispatch per `/root/reference/bdq/schema.py:53-65`; raises
    ``ValueError`` for anything else (including empty/unparseable DDL).
    """
    if isinstance(schema, str):
        try:
            parsed = get_schema_from_ddl_string(schema)
        except Exception as e:  # unparseable DDL -> ValueError per reference
            raise ValueError(f"invalid schema DDL string: {schema!r}") from e
        return list(parsed.names)
    if isinstance(schema, DataFrame):
        return list(schema.schema.names)
    if isinstance(schema, T.StructType):
        return list(schema.names)
    raise ValueError(f"cannot extract column names from {type(schema).__name__}")


def get_column_names_in_schema(column_names: Iterable[str], schema: SchemaLike) -> List[str]:
    """Order-preserving filter of ``column_names`` present in ``schema``
    (`/root/reference/bdq/schema.py:67-74`)."""
    names = set(get_column_names_from_schema(schema))
    return [c for c in column_names if c in names]


def get_column_names_not_in_schema(column_names: Iterable[str], schema: SchemaLike) -> List[str]:
    """Inverse of :func:`get_column_names_in_schema`
    (`/root/reference/bdq/schema.py:76-83`)."""
    names = set(get_column_names_from_schema(schema))
    return [c for c in column_names if c not in names]


def get_column_names_combinations(
    dynamic_column_names: List[str],
    fixed_column_names: Optional[List[str]] = None,
    max_len: Optional[int] = None,
    schema: Optional[SchemaLike] = None,
) -> Generator[tuple, None, None]:
    """Yield candidate-key column combinations, smallest first.

    Semantics of `/root/reference/bdq/schema.py:85-113`:

    - yields the fixed prefix alone first (if any), then every size-1..n
      combination of the dynamic columns, each prefixed by the fixed
      columns, in ascending combination size;
    - ``max_len`` bounds total tuple length (fixed + dynamic);
    - optional ``schema`` validates all names (raises ``ValueError`` with
      the reference's "invalud column names" wording, typo preserved);
    - overlapping fixed/dynamic sets raise ``ValueError``;
    - duplicate tuples are suppressed while preserving yield order.
    """
    fixed = tuple(fixed_column_names or ())
    dynamic = list(dynamic_column_names or ())

    if schema is not None:
        known = set(get_column_names_from_schema(schema))
        bad = [c for c in [*fixed, *dynamic] if c not in known]
        if bad:
            raise ValueError(f"invalud column names: {bad}")

    overlap = set(fixed) & set(dynamic)
    if overlap:
        raise ValueError(
            f"fixed and dynamic column names overlap: {sorted(overlap)}"
        )

    seen: set = set()

    def emit(t: tuple) -> Generator[tuple, None, None]:
        if t and t not in seen:
            if max_len is None or len(t) <= max_len:
                seen.add(t)
                yield t

    yield from emit(fixed)
    for size in range(1, len(dynamic) + 1):
        for combo in combinations(dynamic, size):
            yield from emit(fixed + combo)
