"""Comparison-operator-string → breach predicate (SURVEY §2.7 C13, §4
rewrite #2).

The reference resolves these strings onto CloudWatch ComparisonOperator enums
via getattr (ref:cdk_constructs/cw_alarm.py:42-49); CloudWatch then evaluates
``value OP threshold`` per datapoint. The engine evaluates natively.

CloudWatch semantics: the alarm condition is breached when the *datapoint*
compares true against the threshold — e.g. GREATER_THAN_THRESHOLD breaches
when value > threshold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {
    "GREATER_THAN_THRESHOLD": ">",
    "GREATER_THAN_OR_EQUAL_TO_THRESHOLD": ">=",
    "LESS_THAN_THRESHOLD": "<",
    "LESS_THAN_OR_EQUAL_TO_THRESHOLD": "<=",
}


def breach_predicate(value: Column, operator: Column, threshold: Column) -> Column:
    """Row-wise breach test where the operator itself is a column (each SLA
    row carries its own operator — one CASE, no per-SLA jobs)."""
    return (
        F.when(operator == "GREATER_THAN_THRESHOLD", value > threshold)
        .when(operator == "GREATER_THAN_OR_EQUAL_TO_THRESHOLD", value >= threshold)
        .when(operator == "LESS_THAN_THRESHOLD", value < threshold)
        .when(operator == "LESS_THAN_OR_EQUAL_TO_THRESHOLD", value <= threshold)
        .otherwise(F.lit(None).cast("boolean"))
    )


def comparison_expr_sql(operator: str, value_sql: str = "value", threshold_sql: str = "threshold") -> str:
    """SQL-text form for a statically-known operator (used in generated SQL)."""
    return f"{value_sql} {_OPS[operator]} {threshold_sql}"
