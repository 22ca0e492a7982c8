"""MetricStream — flattens metric sets and compiles per-frequency query
batches. API parity with ref:dataquality/stream.py:7-45.

In the engine the "compiled query batch" drives the windowed-aggregation jobs
in ``operators.metrics`` instead of CloudWatch GetMetricData calls.
"""

from __future__ import annotations

from typing import List

from .sets import MetricSet


class MetricStream:
    """Stream over metric sets."""

    def __init__(self, metric_sets: List[MetricSet]) -> None:
        self.metric_sets = metric_sets
        self.metrics = []
        for metric_set in self.metric_sets:
            self.metrics += list(metric_set.metrics)

    def metric_data_queries(self, frequency: str) -> list:
        """Frequency filter (F1) + compile to MetricDataQuery-shaped dicts —
        ref:dataquality/stream.py:24-45."""
        out = []
        for metric in self.metrics:
            if metric.frequency != frequency:
                continue
            out.append(
                {
                    "Id": metric.unique_id(),
                    "MetricStat": {
                        "Metric": metric.api_structure(),
                        "Period": metric.period,
                        "Stat": metric.statistic,
                    },
                }
            )
        return out
