"""Surrogate-key column expressions.

Re-implements the semantics of `/root/reference/bdq/functions.py:9-31` as
pure built-in column expressions (JVM-side, whole-stage-codegen friendly;
no UDFs, so they vectorize identically at 100 TB and at 100 rows).

Golden values (from `/root/reference/README.md:144-154`):

- ``surrogate_key_string(['id1','id2','name'], rtrim=True)`` on row
  ``(1, 1, 'GrzeGorz')`` renders ``[1, 1, GRZEGORZ]``.
- ``surrogate_key_hash`` of that row is the 20-byte binary
  ``6F2199994CF293562E7CC329F96A422F6D62EC4B``.
- NULLs render as the placeholder ``@~<null>~@``.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["surrogate_key_string", "surrogate_key_hash", "pseudonymize", "NULL_STR_REPR"]

#: Null placeholder — exact string contract from the reference
#: (`/root/reference/bdq/functions.py:9`).
NULL_STR_REPR = "@~<null>~@"


def surrogate_key_string(
    key_columns: List[str],
    rtrim: bool = False,
    ltrim: bool = False,
    upper: bool = True,
    null_str_repr: str = NULL_STR_REPR,
) -> Column:
    """Canonical string rendering of a (composite) business key.

    Per column: cast to string, optional ``upper`` (default ON), optional
    ``rtrim``/``ltrim``, then ``coalesce`` with ``null_str_repr``.  A single
    column yields the string itself; N columns yield
    ``array(...).cast('string')`` which Spark renders as ``[a, b, c]``
    (`/root/reference/bdq/functions.py:23-26`).
    """
    if not key_columns:
        raise ValueError("key_columns must be a non-empty list of column names")

    rendered = []
    for name in key_columns:
        c = F.col(name).cast("string")
        if upper:
            c = F.upper(c)
        if rtrim:
            c = F.rtrim(c)
        if ltrim:
            c = F.ltrim(c)
        rendered.append(F.coalesce(c, F.lit(null_str_repr)))

    if len(rendered) == 1:
        return rendered[0]
    return F.array(*rendered).cast("string")


def surrogate_key_hash(
    key_columns: List[str],
    rtrim: bool = False,
    ltrim: bool = False,
) -> Column:
    """160-bit binary surrogate key.

    ``unhex(substr(sha2(surrogate_key_string(...), 224), 1, 40))`` — SHA2-224
    hex digest truncated to the first 40 hex chars (160 bits) and unhexed to
    a 20-byte ``binary`` (`/root/reference/bdq/functions.py:28-31`).

    Scale note: a 20-byte fixed-width binary key keeps shuffle rows narrow
    and hash-partitions uniformly even when the business key is skewed text.
    """
    sks = surrogate_key_string(key_columns, rtrim=rtrim, ltrim=ltrim)
    return F.unhex(F.substring(F.sha2(sks, 224), 1, 40))


def pseudonymize(
    key_columns: List[str],
    secret: str,
    length: int = 16,
) -> Column:
    """Keyed pseudonym for a (composite) identifier: the first
    ``length`` hex chars of ``sha2-256(secret || US || rendered-key)``.

    The standard privacy-pipeline building block: replaces direct
    identifiers with stable opaque tokens, so the SAME entity maps to
    the SAME pseudonym everywhere (joins and group-bys keep working
    across tables and runs) while reversing the mapping requires the
    secret.  Rotating the secret re-keys the whole dataset.  Rendering
    reuses :func:`surrogate_key_string` (case kept as-is, NULLs get the
    placeholder) with a ``\\x1f`` separator prepended so ``secret='a'``
    + ``key='bc'`` and ``secret='ab'`` + ``key='c'`` never collide.

    Pure built-in expressions (``sha2`` is JVM-side codegen), and
    engine-portable: DuckDB's ``sha256`` reproduces it byte-for-byte —
    the driver entry value-hash-checks the full mapping.
    """
    if not secret:
        raise ValueError("secret must be non-empty")
    if not 8 <= length <= 64:
        raise ValueError("length must be in [8, 64]")
    rendered = surrogate_key_string(key_columns, upper=False)
    return F.substring(
        F.sha2(F.concat(F.lit(secret), F.lit("\x1f"), rendered), 256),
        1,
        length,
    )
