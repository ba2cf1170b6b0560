"""Catalog-table-persisted key-value state store.

Parity target: `/root/reference/bdq/statestore.py:14-121` (E10 in
SURVEY.md §2.2): an append-only state table whose "current" value is the
latest row by an event-timestamp column, with JSON-encoded dict columns
(datetimes round-tripped via an ``{'_isoformat': ...}`` envelope).

Deviations for a Databricks-free local/cluster setup:

- the catalog name is optional — ``catalog.database.table`` when given,
  ``database.table`` otherwise (the reference hard-requires Unity
  Catalog three-part names);
- schema drift is healed by rewriting the table with the old data
  re-projected into the new schema (the reference's
  ``mergeSchema``-option write is Delta-only; plain parquet tables don't
  support write-time schema merge);
- writes go through the V1 writer for the session catalog and fall back
  to V2 ``writeTo`` for format-owning V2 catalogs (JDBC etc.) that
  reject ``CREATE TABLE ... USING`` — tested against Spark's
  JDBCTableCatalog over embedded Derby.

Scale notes: the latest-row read is ``filter → orderBy(ts desc) →
limit(1)``, which Catalyst executes as TakeOrderedAndProject — no global
sort, one partial top-1 per partition.  State rows are tiny (one per
pipeline run); the append write is a single-row job.
"""

from __future__ import annotations

import json
import logging
from copy import deepcopy
from datetime import datetime
from typing import List, Optional, Union

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["CatalogPersistedStateStore", "PersistedStateStoreBase"]


class PersistedStateStoreBase:
    """Interface + JSON helpers shared by state-store implementations."""

    def save(self, data: dict) -> None:
        raise NotImplementedError

    def load(self) -> dict:
        raise NotImplementedError

    @classmethod
    def _to_json(cls, obj) -> str:
        def encode(x):
            if isinstance(x, datetime):
                return {"_isoformat": x.isoformat()}
            raise TypeError(f"Unsupported type: {type(x)}: {x}")

        return json.dumps(obj, default=encode)

    @classmethod
    def _from_json(cls, text: str):
        def decode(x):
            iso = x.get("_isoformat")
            if iso is not None:
                return datetime.fromisoformat(iso)
            return x

        return json.loads(text, object_hook=decode)


class CatalogPersistedStateStore(PersistedStateStoreBase):
    """Append-only state in a catalog table; latest row by timestamp wins."""

    def __init__(
        self,
        catalog_name: Optional[str],
        database_name: str,
        table_name: str,
        schema: Union[str, T.StructType],
        event_ts_column: str,
        json_encoded_columns: Optional[List[str]] = None,
        log: Optional[logging.Logger] = None,
        filter_expr=None,
        spark: Optional[SparkSession] = None,
    ):
        self.log = log.getChild("StateStore") if log else logging.getLogger("StateStore")
        self.spark = spark or SparkSession.getActiveSession()
        if self.spark is None:
            raise ValueError("could not get active spark session")

        if isinstance(schema, T.StructType):
            self.schema = schema
        else:
            self.schema = T.StructType.fromDDL(schema)

        self.catalog_name = catalog_name
        self.database_name = database_name
        self.table_name = table_name
        self.fqn_table_name = ".".join(
            part for part in (catalog_name, database_name, table_name) if part
        )
        self.event_ts_column = event_ts_column
        self.json_encoded_columns = json_encoded_columns or []
        self.filter_expr = filter_expr

        field_names = set(self.schema.names)
        for c in self.json_encoded_columns:
            if c not in field_names:
                raise ValueError(f"Column {c} does not exist in schema")

        self._ensure_table()

    def _v1_unsupported(self, e: Exception) -> bool:
        """True when the target catalog rejects the V1 writer path and the
        V2 ``writeTo`` API must be used instead (JDBC and other
        format-owning V2 catalogs)."""
        msg = str(e)
        return (
            "NOT_SUPPORTED_IN_JDBC_CATALOG" in msg
            or "does not support" in msg
            or "UNSUPPORTED_FEATURE" in msg
        )

    def _ensure_table(self) -> None:
        staging = f"{self.fqn_table_name}__migration"
        if not self.spark.catalog.tableExists(self.fqn_table_name):
            # a leftover staging table means a previous migration crashed
            # between dropping the main table and completing the rewrite —
            # the staging copy is the ONLY copy of the state.  Restore it
            # instead of silently creating an empty table (which would
            # reset pipeline state).
            if self.spark.catalog.tableExists(staging):
                self.log.warning(
                    "Recovering state table %s from interrupted migration "
                    "staging copy %s", self.fqn_table_name, staging,
                )
                self._overwrite_from_staging(staging)
                self.spark.sql(f"DROP TABLE IF EXISTS {staging}")
                return self._ensure_table()  # re-check schema post-restore
            self.log.info("Creating state table: %s", self.fqn_table_name)
            empty = self.spark.createDataFrame([], self.schema)
            try:
                empty.write.saveAsTable(self.fqn_table_name)
            except Exception as e:
                if not self._v1_unsupported(e):
                    raise
                empty.writeTo(self.fqn_table_name).create()
            return

        current = self.spark.table(self.fqn_table_name)
        if current.schema != self.schema:
            # schema drift: rewrite old rows into the new shape (missing
            # columns become NULL, extra columns are dropped)
            self.log.info("Evolving schema of %s", self.fqn_table_name)
            existing_cols = set(current.columns)
            projection = [
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in existing_cols
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in self.schema.fields
            ]
            # stage the re-projected rows in a DURABLE sibling table
            # first (a catalog write, distributed end to end — no driver
            # collect), then overwrite the main table from the staging
            # copy.  Staging both breaks the self-read cycle (Spark
            # rejects overwriting a table its own plan reads) and
            # survives failure mid-overwrite: the staging table is
            # dropped ONLY after the overwrite succeeds — on failure it
            # is left in place as the recovery copy, which
            # `_ensure_table` restores from on the next startup.
            migrated = current.select(*projection)
            # a stale staging table (an older migration that crashed
            # between its staging write and the main-table overwrite,
            # possibly with a DIFFERENT schema) would make the overwrite
            # below raise a schema mismatch on schema-enforcing catalogs.
            # Safe to drop here: the main table exists in this branch, so
            # staging is never the only copy.  Belt-and-braces: the write
            # also passes overwriteSchema for catalogs that honor it.
            self.spark.sql(f"DROP TABLE IF EXISTS {staging}")
            try:
                migrated.write.mode("overwrite").option(
                    "overwriteSchema", "true"
                ).saveAsTable(staging)
            except Exception as e:
                if not self._v1_unsupported(e):
                    raise
                migrated.writeTo(staging).createOrReplace()
            self._overwrite_from_staging(staging)
            self.spark.sql(f"DROP TABLE IF EXISTS {staging}")

    def _overwrite_from_staging(self, staging: str) -> None:
        """Overwrite the main state table from the staging copy (V1
        writer with a V2 ``writeTo`` fallback for format-owning
        catalogs).  The caller drops ``staging`` only after this
        returns successfully."""
        staged = self.spark.table(staging)
        try:
            staged.write.mode("overwrite").option(
                "overwriteSchema", "true"
            ).saveAsTable(self.fqn_table_name)
        except Exception as e:
            if not self._v1_unsupported(e):
                raise
            staged.writeTo(self.fqn_table_name).createOrReplace()

    def load(self) -> dict:
        """Latest state row as a dict (JSON columns decoded); {} if none."""
        df = self.spark.table(self.fqn_table_name)
        if self.filter_expr is not None:
            df = df.filter(self.filter_expr)
        row = df.orderBy(F.col(self.event_ts_column).desc()).limit(1).first()
        if row is None:
            self.log.info("State not found, returning empty placeholder")
            return {}
        data = row.asDict()
        for c in self.json_encoded_columns:
            if data.get(c) is not None:
                data[c] = self._from_json(data[c])
        return data

    def save(self, data: dict) -> None:
        """Append one state row (JSON columns encoded)."""
        if not isinstance(data, dict):
            raise ValueError("data must be a dict")
        data = deepcopy(data)
        for c in self.json_encoded_columns:
            data[c] = self._to_json(data[c])
        row_df = self.spark.createDataFrame([data], self.schema)
        try:
            row_df.write.mode("append").saveAsTable(self.fqn_table_name)
        except Exception as e:
            if not self._v1_unsupported(e):
                raise
            row_df.writeTo(self.fqn_table_name).append()
        self.log.info("State saved")

    @classmethod
    def clean(cls, name: str) -> str:
        """Sanitize a name to ``[alnum_]`` for use as a table name."""
        return "".join(ch if ch.isalnum() else "_" for ch in name)
