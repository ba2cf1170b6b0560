"""Custom stateful streaming operators via ``applyInPandasWithState``.

SURVEY.md §2.3 notes the reference exposes no stateful streaming beyond
``foreachBatch``; Structured Streaming's arbitrary-state API
(``applyInPandasWithState``) is the Spark-native way to express
operators that need per-key state across micro-batches — running
aggregates, anomaly baselines, session machines with custom logic.

Scale notes: state lives in the executor state store keyed by the
grouping columns (shuffled once per micro-batch); timeouts bound state
size.  The same operator runs on batch frames via ``applyInPandas`` with
a fresh empty state per key — so the logic is unit-testable and
oracle-checkable without a stream.
"""

from __future__ import annotations

from typing import Iterable, List

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["running_counter"]

_OUTPUT_SCHEMA = "key bigint, n_events bigint, total double, max_value double"
_STATE_SCHEMA = "n bigint, total double, mx double"


def _fold(rows_n: int, rows_total: float, rows_max: float, state):
    n, total, mx = state
    n += rows_n
    total += rows_total
    mx = rows_max if mx is None else max(mx, rows_max)
    return n, total, mx


def running_counter(
    df: DataFrame,
    key_column: str = "user_id",
    value_column: str = "value",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running (count, sum, max) maintained across micro-batches.

    Streaming input → ``applyInPandasWithState`` (update mode, state kept
    between triggers).  Batch input → one-shot ``applyInPandas`` with the
    same fold logic, which makes the operator's semantics checkable
    against plain ``groupBy`` aggregation.
    """

    if df.isStreaming:
        from pyspark.sql.streaming.state import GroupState

        def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
            if state.exists:
                n, total, mx = state.get
            else:
                n, total, mx = 0, 0.0, None
            for pdf in pdfs:
                vals = pdf[value_column].astype(float)
                if len(vals):
                    n, total, mx = _fold(len(vals), float(vals.sum()), float(vals.max()), (n, total, mx))
            state.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_events": [n],
                    "total": [total],
                    "max_value": [mx],
                }
            )

        return (
            df.groupBy(key_column)
            .applyInPandasWithState(
                update,
                outputStructType=_OUTPUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=timeout,
            )
        )

    def one_shot(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_column].astype(float)
        return pd.DataFrame(
            {
                "key": [pdf[key_column].iloc[0]],
                "n_events": [len(vals)],
                "total": [float(vals.sum())],
                "max_value": [float(vals.max()) if len(vals) else None],
            }
        )

    return df.groupBy(key_column).applyInPandas(one_shot, schema=_OUTPUT_SCHEMA)
