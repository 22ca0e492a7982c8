"""Named groups of metrics / SLAs — API parity with ref:dataquality/set.py:12-48
(tuple-append ``add`` keeps the same immutable-ish behavior)."""

from __future__ import annotations

from typing import List, Union

from .metric import BusinessMetric, Metric
from .sla import SLA


class MetricSet:
    """Named metric group — ref:dataquality/set.py:12-30."""

    def __init__(
        self,
        name: str,
        metrics: List[Union[Metric, BusinessMetric]] = (),
        schedule: str | None = None,
    ) -> None:
        self.name = name
        self.metrics = metrics
        self.schedule = schedule

    def add(self, metric: Metric):
        self.metrics = tuple(self.metrics) + (metric,)


class BusinessMetricSet(MetricSet):
    """Business metric group — ref:dataquality/set.py:32-34."""


class SLASet:
    """SLA group — ref:dataquality/set.py:36-48."""

    def __init__(self, slas: List[SLA] = ()) -> None:
        self.slas = slas

    def add(self, sla: SLA):
        self.slas = tuple(self.slas) + (sla,)
