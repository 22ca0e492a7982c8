"""Declarative definition DSL — API-compatible with the reference's
``dataquality`` package so existing user definition modules keep working
(ref:dataquality/{dataset,metric,sla,set,stream}.py).
"""

from .dataset import Dataset
from .metric import BusinessMetric, DataSetMetric, Dimension, Metadata, Metric, Widget
from .sla import SLA
from .sets import BusinessMetricSet, MetricSet, SLASet
from .stream import MetricStream
from .loader import Definition, DefinitionSet, definitions_to_dataframes

__all__ = [
    "Dataset",
    "Dimension",
    "Metadata",
    "Widget",
    "Metric",
    "DataSetMetric",
    "BusinessMetric",
    "SLA",
    "MetricSet",
    "BusinessMetricSet",
    "SLASet",
    "MetricStream",
    "Definition",
    "DefinitionSet",
    "definitions_to_dataframes",
]
