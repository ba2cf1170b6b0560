"""Inverted-index text retrieval: postings, boolean search, BM25.

Extension surface (no reference counterpart — grusin-db/bdq core is
dataframe utilities only): LLM corpus tooling constantly answers "which
documents contain these terms" (contamination probes, targeted
subsetting, quality audits) and "which documents match this query
best" (BM25 is the retrieval baseline behind most RAG and dedup-probe
pipelines).  Scanning 100 TB of text per query is not an option; the
classical answer is an INVERTED INDEX built once — a (token, doc)
posting relation — against which boolean queries are posting-list
intersections and BM25 is a small join + per-doc aggregation.

Design notes (Spark-first):

- the index is a plain DataFrame of distinct ``(token, doc, tf)``
  postings plus a compact per-doc length table — both parquet-
  persistable, both partitioned by token hash at scale so a query
  touches only the query tokens' partitions;
- boolean AND/OR never materializes per-doc token sets: AND is a
  count-of-matched-tokens filter over the postings of the (broadcast)
  query tokens; OR is a distinct projection of the same;
- BM25 (Robertson/Sparck-Jones, the Okapi formulation with the
  standard +1 idf floor): ``score(d) = sum_t idf(t) * tf / (tf + k1 *
  (1 - b + b * len_d / avglen))``.  All inputs (tf, len_d, df, N) are
  exact integers; idf and the saturation term are single double
  expressions on those integers, so any engine computes bit-identical
  scores — the registered entry's DuckDB oracle replays tokenization,
  postings, document statistics and the full scoring formula, and the
  round-6 output hashes exactly.

Scale shape: index build is one (token, doc) group-by (tf) plus one
doc group-by (length) — both partial-aggregable single shuffles.
Query-time work is proportional to the query tokens' postings, never
the corpus; the query-token relation is broadcast.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokenize_docs",
    "build_inverted_index",
    "boolean_search",
    "bm25_search",
    "build_positional_index",
    "phrase_search",
]

_TOKEN_RE = "[^a-z0-9]+"


def tokenize_docs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per token OCCURRENCE: ``(doc_id, token)`` — the shared
    tokenization of this repo's text entries (lowercase, [a-z0-9]+)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), _TOKEN_RE)).alias("token"),
    ).where(F.col("token") != "")


def build_inverted_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple:
    """Build the index: ``postings (token, doc_id, tf)`` and
    ``doc_stats (doc_id, dl)`` (document length in tokens).  Two
    partial-aggregable shuffles over the token stream; both outputs are
    plain DataFrames the caller can persist partitioned by token."""
    toks = tokenize_docs(docs, text_col, id_col)
    postings = toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    doc_stats = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return postings, doc_stats


def boolean_search(
    postings: DataFrame, tokens: List[str], mode: str = "and"
) -> DataFrame:
    """Documents matching ALL (``mode="and"``) or ANY (``"or"``) of the
    query tokens — a filter + distinct-token count over the query
    tokens' postings only (the query relation broadcasts; the corpus is
    never rescanned).  Returns ``(doc_id,)``."""
    if not tokens:
        raise ValueError("tokens must be non-empty")
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or': {mode!r}")
    hits = postings.where(F.col("token").isin(*[t.lower() for t in tokens]))
    if mode == "or":
        return hits.select("doc_id").distinct()
    return (
        hits.groupBy("doc_id")
        .agg(F.countDistinct("token").alias("__nt"))
        .where(F.col("__nt") == len(set(t.lower() for t in tokens)))
        .select("doc_id")
    )


def bm25_search(
    postings: DataFrame,
    doc_stats: DataFrame,
    tokens: List[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Okapi BM25 over the index: ``(doc_id, score)`` for the ``top_k``
    best documents (score desc, doc_id asc — deterministic at ties).

    ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the +1 floor
    keeps idf positive for df > N/2); saturation uses the standard
    ``k1``/``b`` length normalization.  N, df, tf, dl are exact ints;
    ``avgdl`` is one double division of exact ints — every engine
    computes the same doubles, and the output rounds to 6 places.
    Query-time cost: the query tokens' postings joined to the (tiny,
    broadcast) idf relation and the per-doc length table — never a
    corpus scan."""
    toks = [t.lower() for t in tokens]
    n_docs = doc_stats.agg(F.count(F.lit(1)).alias("n"))
    avgdl = doc_stats.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    df_t = (
        postings.where(F.col("token").isin(*toks))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )
    scored = (
        postings.where(F.col("token").isin(*toks))
        .join(F.broadcast(df_t), "token")
        .join(doc_stats, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        # float addition is not associative: round each per-token part
        # to 9 places and sum in decimal so the total is independent of
        # partial-aggregation order (each part itself is a bit-identical
        # double in every engine), then round the exact sum to 6
        .agg(
            F.round(
                F.sum(F.round(F.col("part"), 9).cast("decimal(20,9)")).cast(
                    "double"
                ),
                6,
            ).alias("score")
        )
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(top_k)


def build_positional_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional postings ``(token, doc_id, pos)`` — ``pos`` is the
    0-based index in the FILTERED token sequence, so adjacency in the
    index means adjacency in the text under this repo's tokenization.
    One shuffle-free projection (posexplode); persist partitioned by
    token at scale."""
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_RE), lambda x: x != ""
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(arr).alias("pos", "token")
    )


def phrase_search(pos_index: DataFrame, phrase: List[str]) -> DataFrame:
    """Exact phrase occurrences via positional-posting joins: token i
    of the phrase must appear at ``start_pos + i`` in the same
    document.  Returns ``(doc_id, n_occ)`` for documents containing the
    phrase at least once.  Cost rides the PHRASE TOKENS' postings (the
    first token's postings anchor; each further token is one join on
    (doc, pos) — the rarest-token-first optimization is the caller's
    choice of phrase order at scale, classic IR)."""
    toks = [t.lower() for t in phrase]
    if not toks:
        raise ValueError("phrase must be non-empty")
    anchor = pos_index.where(F.col("token") == toks[0]).select(
        "doc_id", F.col("pos").alias("start")
    )
    for i, t in enumerate(toks[1:], start=1):
        nxt = pos_index.where(F.col("token") == t).select(
            "doc_id", (F.col("pos") - i).alias("start")
        )
        anchor = anchor.join(nxt, ["doc_id", "start"])
    return anchor.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_occ"))
