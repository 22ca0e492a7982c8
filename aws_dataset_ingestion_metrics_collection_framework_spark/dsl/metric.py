"""Metric DSL classes — API parity with ref:dataquality/metric.py.

The derived-key methods (``unique_id``, ``alarm_unique_id``, ``widget_title``)
are byte-compatible with the reference (goldens in tests/test_dsl.py); the
same derivations exist as Column builders in ``functions.keys`` so the engine
can compute them distributed-side for joins J1/J2 (SURVEY §2.3).
"""

from __future__ import annotations

import re
from typing import List, Optional

from .dataset import Dataset


class Dimension:
    """Metric dimension (name/value) — ref:dataquality/metric.py:9-24."""

    def __init__(self, name: str, value: str) -> None:
        self.name = name
        self.value = value

    def api_structure(self) -> dict:
        """boto3-shaped structure (kept for API compat)."""
        return {"Name": self.name, "Value": self.value}


class Metadata:
    """Metric metadata (name/value) — ref:dataquality/metric.py:41-47."""

    def __init__(self, name: str, value: str) -> None:
        self.name = name
        self.value = value


class Widget:
    """Dashboard placement — ref:dataquality/metric.py:26-39."""

    def __init__(self, dashboard_name: str, dashboard_category: str | None = None) -> None:
        self.dashboard_name = dashboard_name
        self.dashboard_category = dashboard_category


# Frequencies and their periods in seconds — ref:dataquality/metric.py:92-101.
FREQUENCY_TO_PERIOD = {"day": 86400, "hour": 3600, "minute": 60}


class Metric:
    """A named time-series declaration — ref:dataquality/metric.py:50-155.

    Constructing a Metric registers it into its ``metric_set`` (constructor
    side-effect, ref:dataquality/metric.py:90) — definition modules rely on
    this.
    """

    DAY = "day"
    HOUR = "hour"
    MINUTE = "minute"

    def __init__(
        self,
        namespace: str,
        name: str,
        frequency: str,
        statistic: str,
        dashboard: Widget,
        metric_set,
        sla_set=None,
        period: int | None = None,
        metadata: Optional[List[Metadata]] = None,
        dimensions: Optional[List[Dimension]] = None,
    ) -> None:
        self.namespace = namespace
        self.name = name
        self.frequency = frequency
        self.period = period if period is not None else self.frequency_to_period(frequency)
        self.statistic = statistic
        self.metadata = metadata
        self.dimensions = dimensions
        self.metric_set = metric_set
        self.sla_set = sla_set
        self.dashboard = dashboard
        self.metric_set.add(self)

    @staticmethod
    def frequency_to_period(frequency: str) -> int:
        """'day'→86400, 'hour'→3600, 'minute'→60 (ref:dataquality/metric.py:92-101).

        Unlike the reference, unknown frequencies raise instead of
        UnboundLocalError (documented divergence; same domain behavior).
        """
        try:
            return FREQUENCY_TO_PERIOD[frequency]
        except KeyError:
            raise ValueError(f"unknown frequency: {frequency!r}") from None

    def api_structure(self) -> dict:
        """boto3 MetricStat.Metric shape — ref:dataquality/metric.py:103-116."""
        dimensions = [d.api_structure() for d in self.dimensions] if self.dimensions else []
        return {"Namespace": self.namespace, "MetricName": self.name, "Dimensions": dimensions}

    def _visible_dimensions(self):
        """Dimensions not ending in 'Bucket' (exclusion predicate F6,
        ref:dataquality/metric.py:125-126,138-139,151-152)."""
        if not self.dimensions:
            return []
        return [d for d in self.dimensions if not str(d.name).endswith("Bucket")]

    def widget_title(self) -> str:
        """``name + ' per ' + frequency + '-' + dim values``, '/' removed,
        lowercased — ref:dataquality/metric.py:118-129."""
        metric_id = self.name + " per " + self.frequency + "-"
        for d in self._visible_dimensions():
            metric_id += d.value
        return metric_id.replace("/", "").lower()

    def alarm_unique_id(self) -> str:
        """Hyphen-joined id used for alarm naming + join J2 —
        ref:dataquality/metric.py:131-142."""
        metric_id = self.namespace + "-" + self.name + "-" + self.frequency + "-"
        for d in self._visible_dimensions():
            metric_id += d.name + "-" + d.value + "-"
        return metric_id.replace("/", "").lower()

    def unique_id(self) -> str:
        """``re.sub(r'\\W+','')``-normalized lowercase id — the join key for
        enrichment join J1 — ref:dataquality/metric.py:144-155."""
        metric_id = self.namespace + self.name + self.frequency
        for d in self._visible_dimensions():
            metric_id += d.name + d.value
        return re.sub(r"\W+", "", metric_id).lower()


class DataSetMetric(Metric):
    """Metric bound to a Dataset — ref:dataquality/metric.py:157-167."""

    def __init__(self, dataset: Dataset, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.dataset = dataset


class BusinessMetric(DataSetMetric):
    """DataSetMetric carrying a SQL query over reference datasets —
    ref:dataquality/metric.py:169-182. Executed by
    ``operators.business.run_business_metrics`` (spark.sql → scalar)."""

    def __init__(self, query: str, reference_datasets: List[Dataset], *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.reference_datasets = reference_datasets
        self.query = query
