"""Serialized localCheckpoint for DATA-SCALE relations.

``DataFrame.localCheckpoint`` defaults to Scala's
``MEMORY_AND_DISK_DESER``: every checkpointed row is stored as a live
JVM object (~84 bytes measured for a 16-byte edge row — object header,
byte-array header, alignment, block bookkeeping).  For node-scale or
per-round relations that is the right trade (no serialize/deserialize
on every round access).  For EDGE- and SHINGLE-scale relations it is
catastrophic past the first scale decade: the x100 pagerank graph's
59M-row edge checkpoint alone holds 4.96 GiB of storage memory on the
16 GiB measurement heap, and together with the degree-joined twin it
squeezes the unified pool until execution cannot acquire a single page
(``UNABLE_TO_ACQUIRE_MEMORY`` with "got 86" bytes) — the measured root
cause of the second-decade walls in the sf1.0 sweep (pagerank
last-decade exponent 1.70, documents_deduped 1.30).

``data_checkpoint`` keeps the same lineage-cut semantics but stores the
blocks SERIALIZED (``StorageLevel.MEMORY_AND_DISK`` — in PySpark the
un-suffixed level is the serialized one), ~4x smaller in memory and
spilling compactly to local disk under pressure — the same trade GraphX
ships as its default edge storage level.  Use it for any checkpoint
whose row count scales with the DATA (edges, shingles, signatures,
band keys, token streams); keep the default level for node-scale and
per-round relations.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

__all__ = ["data_checkpoint"]


def data_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager)`` with serialized block storage."""
    return df.localCheckpoint(
        eager=eager, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
