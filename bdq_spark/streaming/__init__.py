"""Structured-Streaming-native helpers (SURVEY.md §2.3/§7.1 step 7).

The reference only exposes ``foreachBatch`` micro-batching (E8); these
helpers surface the Structured Streaming capabilities Spark gives for
free — watermarks, event-time windows, within-watermark dedup — as thin,
batch-compatible combinators.
"""

from bdq_spark.streaming.cdc_sink import (
    BUCKET_COLUMN,
    cdc_merge_sink,
    cdc_merge_sink_partitioned,
    init_snapshot,
    read_snapshot,
    recover_snapshot,
)
from bdq_spark.streaming.stateful import (
    running_counter,
    running_zscore,
    sessionize,
)
from bdq_spark.streaming.windows import (
    dedup_within_watermark,
    interval_join,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
    with_watermark,
)

__all__ = [
    "with_watermark",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "dedup_within_watermark",
    "interval_join",
    "running_counter",
    "running_zscore",
    "sessionize",
    "cdc_merge_sink",
    "cdc_merge_sink_partitioned",
    "init_snapshot",
    "read_snapshot",
    "recover_snapshot",
    "BUCKET_COLUMN",
]
