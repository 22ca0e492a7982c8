"""Definition loader + flattening to Spark DataFrames.

Parity with ref:definitions/definition.py:

- ``Definition`` (ref::10-80) — recursive glob of ``account_<id>/**/*.py``
  under a definitions root, dynamic import, collection of module-level
  ``metric_set`` / ``sla_set`` variables. (The zip-extraction fallback for
  Lambda/Glue, ref::29-35, is dropped — Spark ships py-files natively via
  ``spark.submit.pyFiles``.)
- ``DefinitionSet`` (ref::82-137) — flattening of all metric/SLA definitions
  into JSON-serializable dicts (maps → JSON strings). Divergence from the
  reference (documented, SURVEY §7 "bugs not to replicate"): we do not mutate
  the live Metric/SLA objects' ``__dict__`` — flattening is side-effect-free.
- ``definitions_to_dataframes`` — the engine-native step: flattened dicts →
  (``metric_defs``, ``sla_defs``) DataFrames with the §1.3 catalog schemas.
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
from typing import List

from pyspark.sql import DataFrame, SparkSession

from ..catalog import METRIC_DEFS_SCHEMA, SLA_DEFS_SCHEMA


class Definition:
    """Per-account aggregate of metric_sets + sla_sets discovered by importing
    every definition module under ``<root>/account_<id>/``."""

    def __init__(self, account: str, root: str | None = None):
        self.metric_sets: List = []
        self.sla_sets: List = []
        self.account_definitions: List[str] = []
        root = root or os.path.join(os.getcwd(), "definitions")
        dir_path = os.path.join(root, f"account_{account}", "**/*")
        self._iterate(dir_path)

    def _iterate(self, dir_path: str) -> None:
        for filename in sorted(glob.iglob(dir_path, recursive=True)):
            if not os.path.isfile(filename):
                continue
            if filename.endswith("__init__.py") or not filename.endswith(".py"):
                continue
            self.account_definitions.append(filename)
        self._load_modules()

    def _load_modules(self) -> None:
        for module_path in self.account_definitions:
            # One import per module (the reference imports each module twice —
            # once per attribute, ref::49-71 — which double-registers; we
            # import once and read both attributes).
            spec = importlib.util.spec_from_file_location(
                os.path.splitext(os.path.basename(module_path))[0], module_path
            )
            module = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(module)
            metric_set = getattr(module, "metric_set", None)
            if metric_set is not None:
                self.metric_sets.append(metric_set)
            sla_set = getattr(module, "sla_set", None)
            if sla_set is not None:
                self.sla_sets.append(sla_set)


def _maps_to_json(pairs) -> str | None:
    if not pairs:
        return None
    return json.dumps({p.name: p.value for p in pairs})


class DefinitionSet:
    """Cross-account flattening into JSON-serializable dicts
    (ref:definitions/definition.py:82-137)."""

    def __init__(self, accounts: List[str], root: str | None = None):
        self.metric_sets: List[dict] = []
        self.sla_sets: List[dict] = []
        self.definitions: List[Definition] = []
        for acc in accounts:
            definition = Definition(account=acc, root=root)
            self.definitions.append(definition)
            for metric_set in definition.metric_sets:
                for metric in metric_set.metrics:
                    self.metric_sets.append(self._flatten_metric(metric, acc))
            for sla_set in definition.sla_sets:
                for sla in sla_set.slas:
                    self.sla_sets.append(self._flatten_sla(sla, acc))

    @staticmethod
    def _flatten_metric(metric, account: str) -> dict:
        d = {
            "namespace": metric.namespace,
            "name": metric.name,
            "frequency": metric.frequency,
            "period": metric.period,
            "statistic": metric.statistic,
            "metadata": _maps_to_json(metric.metadata),
            "dimensions": _maps_to_json(metric.dimensions),
            "metric_set": metric.metric_set.name,
            "sla_set": getattr(metric.sla_set, "name", None),
            "dashboard": metric.dashboard.dashboard_name if metric.dashboard else None,
            "account": account,
            "dataset": None,
            "reference_datasets": None,
            "query": None,
        }
        if hasattr(metric, "dataset"):
            d["dataset"] = json.dumps(metric.dataset.__dict__)
        if hasattr(metric, "reference_datasets"):
            d["reference_datasets"] = json.dumps(
                [ds.__dict__ for ds in metric.reference_datasets]
            )
        if hasattr(metric, "query"):
            d["query"] = metric.query
        return d

    @staticmethod
    def _flatten_sla(sla, account: str) -> dict:
        return {
            "ticket": getattr(sla, "ticket", None),
            "threshold": sla.threshold,
            "comparison_operator": sla.comparison_operator,
            "datapoints_to_alarm": sla.datapoints_to_alarm,
            "evaluation_periods": sla.evaluation_periods,
            "treat_missing_data": sla.treat_missing_data,
            "severity": sla.severity,
            "short_description": sla.short_description,
            "details": sla.details,
            "metric_namespace": sla.metric.namespace,
            "metric_name": sla.metric.name,
            "metric_set": sla.metric.metric_set.name,
            "metric_metadata": _maps_to_json(sla.metric.metadata),
            "metric_dimensions": _maps_to_json(sla.metric.dimensions),
            "account": account,
        }


def definitions_to_dataframes(
    spark: SparkSession, definition_set: DefinitionSet
) -> tuple[DataFrame, DataFrame]:
    """Flattened dicts → (metric_defs, sla_defs) DataFrames (§1.3 schemas).

    Defs tables are inherently small (thousands of rows) — they broadcast in
    every enrichment join; the big side is always the datapoint stream.
    """
    metric_defs = spark.createDataFrame(
        [_row_for(d, METRIC_DEFS_SCHEMA) for d in definition_set.metric_sets],
        METRIC_DEFS_SCHEMA,
    )
    sla_defs = spark.createDataFrame(
        [_row_for(d, SLA_DEFS_SCHEMA) for d in definition_set.sla_sets],
        SLA_DEFS_SCHEMA,
    )
    return metric_defs, sla_defs


def _row_for(d: dict, schema) -> tuple:
    return tuple(d.get(f.name) for f in schema.fields)


def dashboard_category_map(spark: SparkSession, definition_set: DefinitionSet) -> DataFrame:
    """(dashboard, dashboard_category) map for category dashboards.

    The §1.3 ``metric_defs`` storage schema keeps only ``dashboard`` (the
    reference's defs JSON drops the category too —
    ref:definitions/definition.py:97-106); category synthesis walks the live
    Widget objects instead (ref:stacks/metrics_streamer.py:299-305). Feed
    this to ``operators.dashboards.category_report``.
    """
    seen: dict[str, str | None] = {}
    for definition in definition_set.definitions:
        for metric_set in definition.metric_sets:
            for metric in metric_set.metrics:
                w = metric.dashboard
                if w is not None and w.dashboard_name not in seen:
                    seen[w.dashboard_name] = getattr(w, "dashboard_category", None)
    return spark.createDataFrame(
        [(k, v) for k, v in seen.items()],
        "dashboard string, dashboard_category string",
    )


def write_defs_json(definition_set: DefinitionSet, out_dir: str) -> None:
    """JSON definitions writer — ``metrics.json`` / ``slas.json`` as JSON
    arrays (ref:stacks/centralized_resources.py:171-192; read back with
    OpenX ``strip.outer.array`` → here ``spark.read.option('multiLine')``)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(definition_set.metric_sets, f, default=str)
    with open(os.path.join(out_dir, "slas.json"), "w") as f:
        json.dump(definition_set.sla_sets, f, default=str)
