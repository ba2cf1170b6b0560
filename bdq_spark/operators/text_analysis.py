"""Document profiling operators (DataFrame-level text analysis).

Extension mandate (BASELINE.json north_star): language-ID, quality
scoring, token counting, fingerprinting over a ``documents`` table.
Everything is a single narrow projection over the scan — no shuffle, no
UDF — so profiling 100 TB of text is one pass at I/O speed, and Catalyst
prunes to just the text column (check ``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bdq_spark.functions import text as TXT

__all__ = ["profile_documents", "detect_language", "filter_by_quality"]


def profile_documents(df: DataFrame, text_column: str = "text") -> DataFrame:
    """Append the standard text-statistics columns.

    Adds ``n_chars_computed, n_tokens, punct_cnt, punct_pct, stop_ratio,
    lang_pred, quality, fingerprint`` — all built-in expressions evaluated
    in one projection.
    """
    c = F.col(text_column)
    return df.select(
        "*",
        TXT.char_count(c).alias("n_chars_computed"),
        TXT.token_count(c).alias("n_tokens"),
        TXT.punct_count(c).alias("punct_cnt"),
        F.round(TXT.punct_ratio(c), 6).alias("punct_pct"),
        F.round(TXT.stopword_ratio(c), 6).alias("stop_ratio"),
        TXT.language_id(c).alias("lang_pred"),
        TXT.quality_score(c).alias("quality"),
        TXT.doc_fingerprint(c).alias("fingerprint"),
    )


def detect_language(df: DataFrame, text_column: str = "text") -> DataFrame:
    """Append just the predicted language column (``lang_pred``)."""
    return df.withColumn("lang_pred", TXT.language_id(F.col(text_column)))


def filter_by_quality(
    df: DataFrame, min_quality: float = 0.5, text_column: str = "text"
) -> DataFrame:
    """Keep documents whose heuristic quality score >= ``min_quality``.

    The score is computed inline (not materialized), so the filter sits
    directly on the scan and benefits from whole-stage codegen.
    """
    return df.filter(TXT.quality_score(F.col(text_column)) >= min_quality)
