"""Declarative data-quality rule engine.

SURVEY.md §2.4: "declarative rules → ``F.expr`` predicates aggregated
with ``sum(case when)`` + ``Observation``" — the generalization of the
reference's PK check (O8, `/root/reference/bdq/dataframe.py:184-195`)
and observe-metrics (E9, `/root/reference/bdq/spark_pipeline.py:235-252`)
into a reusable rule surface.

Scale design: every evaluation mode is a SINGLE pass over the data —

- :func:`check_rules` folds all rules into one aggregate job (each rule
  is a ``sum(case when violated)`` — map-side combined, one shuffle of
  one row per partition);
- :func:`annotate_rules` / :func:`quarantine_rules` are pure
  projections/filters (no shuffle at all);
- :func:`observe_rules` attaches the same counters to an existing write
  via ``df.observe`` — zero extra scans, the metrics fall out of the
  job you were already running.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

__all__ = [
    "Rule",
    "check_rules",
    "annotate_rules",
    "quarantine_rules",
    "observe_rules",
    "violation_summary",
]


@dataclass(frozen=True)
class Rule:
    """A named row-level expectation.

    ``predicate`` is a SQL boolean expression (or Column) that is TRUE
    for GOOD rows.  NULL predicate results count as violations (a rule
    that cannot be evaluated is a failed expectation, matching SQL
    ``CHECK`` semantics would instead pass them — data-quality wants the
    strict reading).
    """

    name: str
    predicate: Union[str, Column]

    def as_column(self) -> Column:
        col = F.expr(self.predicate) if isinstance(self.predicate, str) else self.predicate
        return F.coalesce(col, F.lit(False))


def _validate(rules: List[Rule]) -> List[Rule]:
    if not rules:
        raise ValueError("rules must be a non-empty list of Rule")
    seen = set()
    for r in rules:
        if not isinstance(r, Rule):
            raise ValueError(f"not a Rule: {r!r}")
        if r.name in seen:
            raise ValueError(f"duplicate rule name: {r.name}")
        seen.add(r.name)
    return rules


def _violation_aggs(rules: List[Rule]) -> List[Column]:
    return [
        F.sum(F.when(~r.as_column(), 1).otherwise(0)).alias(r.name)
        for r in rules
    ]


def check_rules(df: DataFrame, rules: List[Rule]) -> dict:
    """Evaluate all rules in ONE aggregation pass.

    Returns ``{'record_count': N, 'violations': {rule: count},
    'failed_records': M}`` where ``failed_records`` counts rows violating
    at least one rule.
    """
    rules = _validate(rules)
    any_violation = None
    for r in rules:
        v = ~r.as_column()
        any_violation = v if any_violation is None else (any_violation | v)

    row = df.agg(
        F.count(F.lit(1)).alias("__total"),
        F.sum(F.when(any_violation, 1).otherwise(0)).alias("__failed"),
        *_violation_aggs(rules),
    ).first()

    return {
        "record_count": row["__total"],
        "failed_records": row["__failed"] or 0,
        "violations": {r.name: (row[r.name] or 0) for r in rules},
    }


def annotate_rules(
    df: DataFrame, rules: List[Rule], column: str = "__failed_rules"
) -> DataFrame:
    """Append an ``array<string>`` column listing each row's violated
    rules (empty array = clean row).  Pure projection — no shuffle."""
    rules = _validate(rules)
    failed = F.array_compact(
        F.array(
            *[F.when(~r.as_column(), F.lit(r.name)) for r in rules]
        )
    )
    return df.withColumn(column, failed)


def quarantine_rules(
    df: DataFrame, rules: List[Rule]
) -> Tuple[DataFrame, DataFrame]:
    """Split into (clean_df, quarantined_df); the quarantined side keeps
    the ``__failed_rules`` annotation for triage."""
    annotated = annotate_rules(df, rules)
    clean = annotated.filter(F.size("__failed_rules") == 0).drop("__failed_rules")
    bad = annotated.filter(F.size("__failed_rules") > 0)
    return clean, bad


def observe_rules(
    df: DataFrame, rules: List[Rule], name: str = "rules"
) -> Tuple[DataFrame, Optional[Observation]]:
    """Attach rule-violation counters to a DataFrame via ``observe``.

    Batch: counters are computed as a side effect of whatever action the
    caller runs next (typically a write) — zero additional scans; read
    them from the returned ``Observation.get``.

    Streaming: ``Observation`` objects are unsupported, so the metrics
    are attached as a NAMED observation (returned observation is None);
    read them per micro-batch from
    ``StreamingQueryProgress.observedMetrics[name]`` (mirrors the
    reference's streaming metric path,
    `/root/reference/bdq/spark_pipeline.py:403-409`).
    """
    rules = _validate(rules)
    aggs = [F.count(F.lit(1)).alias("record_count"), *_violation_aggs(rules)]
    if df.isStreaming:
        return df.observe(name, *aggs), None
    obs = Observation(name)
    return df.observe(obs, *aggs), obs


def violation_summary(df: DataFrame, rules: List[Rule]) -> DataFrame:
    """Violation counts as a lazy one-row DataFrame (oracle-friendly
    shape: one column per rule plus ``record_count``)."""
    rules = _validate(rules)
    return df.agg(
        F.count(F.lit(1)).alias("record_count"), *_violation_aggs(rules)
    )
