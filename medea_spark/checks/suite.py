"""Declarative data-quality check suites (single-pass).

A rule list compiles into ONE aggregate over the table — every
count-style expectation (null checks, range checks, regex checks,
accepted values, uniqueness, row floor) becomes a conditional-count
expression in the same ``agg``, so a 40-rule suite over 100 TB costs
exactly one scan with map-side partial aggregation, not 40 jobs.  The
result is one tiny row, reshaped driver-side into the uniform
``(rule_id, kind, column, metric, threshold, passed)`` relation a
quality dashboard or a CI gate consumes.

Tolerances are absolute row counts (``max_violations``) — a rule
passes when its violation metric is ≤ the tolerance (for ``min_rows``
the metric is the row count and the rule passes when it is ≥ the
threshold).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class Rule:
    rule_id: str
    kind: str
    column: str  # "" for table-level rules
    metric_expr: Column = field(compare=False)
    threshold: int = 0
    at_least: bool = False  # pass when metric >= threshold (min_rows)


def _cnt(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def not_null(column: str, rule_id: str | None = None, max_violations: int = 0) -> Rule:
    return Rule(
        rule_id or f"not_null:{column}",
        "not_null",
        column,
        _cnt(F.col(column).isNull()),
        max_violations,
    )


def in_range(
    column: str,
    lo: float,
    hi: float,
    rule_id: str | None = None,
    max_violations: int = 0,
) -> Rule:
    c = F.col(column)
    return Rule(
        rule_id or f"in_range:{column}",
        "in_range",
        column,
        _cnt(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))),
        max_violations,
    )


def matches(
    column: str, regex: str, rule_id: str | None = None, max_violations: int = 0
) -> Rule:
    c = F.col(column)
    return Rule(
        rule_id or f"matches:{column}",
        "matches",
        column,
        _cnt(c.isNotNull() & ~c.rlike(regex)),
        max_violations,
    )


def accepted_values(
    column: str,
    values: list,
    rule_id: str | None = None,
    max_violations: int = 0,
) -> Rule:
    c = F.col(column)
    return Rule(
        rule_id or f"accepted_values:{column}",
        "accepted_values",
        column,
        _cnt(c.isNotNull() & ~c.isin(list(values))),
        max_violations,
    )


def unique(columns: list[str], rule_id: str | None = None, max_violations: int = 0) -> Rule:
    """Surplus rows beyond one per distinct key (0 = fully unique).
    countDistinct in the shared aggregate: Spark plans it as the
    standard expand + two-phase aggregate alongside the plain counts —
    still a single pass over the data."""
    key = F.struct(*[F.col(c) for c in columns])
    return Rule(
        rule_id or f"unique:{','.join(columns)}",
        "unique",
        ",".join(columns),
        (F.count(F.lit(1)) - F.countDistinct(key)).cast("long"),
        max_violations,
    )


def min_rows(n: int, rule_id: str | None = None) -> Rule:
    return Rule(
        rule_id or f"min_rows:{n}",
        "min_rows",
        "",
        F.count(F.lit(1)).cast("long"),
        n,
        at_least=True,
    )


RESULT_SCHEMA = T.StructType(
    [
        T.StructField("rule_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("metric", T.LongType(), False),
        T.StructField("threshold", T.LongType(), False),
        T.StructField("passed", T.BooleanType(), False),
    ]
)


def run_check_suite(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in ONE aggregate pass; returns the uniform
    results relation (one row per rule, in rule order)."""
    if not rules:
        raise ValueError("empty rule list")
    ids = [r.rule_id for r in rules]
    if len(set(ids)) != len(ids):
        raise ValueError(f"duplicate rule_ids: {ids}")
    row = df.agg(
        *[r.metric_expr.alias(f"m{i}") for i, r in enumerate(rules)]
    ).collect()[0]
    spark = SparkSession.getActiveSession() or df.sparkSession
    records = []
    for i, r in enumerate(rules):
        metric = int(row[f"m{i}"] or 0)
        passed = metric >= r.threshold if r.at_least else metric <= r.threshold
        records.append((r.rule_id, r.kind, r.column, metric, int(r.threshold), passed))
    return spark.createDataFrame(records, RESULT_SCHEMA)
