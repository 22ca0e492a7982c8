"""Business-metric runner — scheduled Spark SQL whose scalar results become
metric datapoints.

Parity with the reference's only Spark program (ref:glue/business_metrics.py):
select a metric set (F2), keep BusinessMetrics (F3), register each distinct
reference dataset once (F4), run ``spark.sql(query)`` (S1/J4/A4 — full
Catalyst surface), take ``collect()[0][0]`` as the scalar, and publish
(S7) — here an append to the engine's ``metric_datapoints`` table instead of
CloudWatch put_metric_data (ref::46-57). Null scalars are skipped (F7 —
ref::46).
"""

from __future__ import annotations

import datetime as _dt
import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import METRIC_DATAPOINTS_SCHEMA
from ..dsl.metric import BusinessMetric


def register_reference_datasets(
    spark: SparkSession, metrics: list[BusinessMetric], resolve_path
) -> list[str]:
    """F4 — register each distinct dataset once, preserving first-seen order
    (ref:glue/business_metrics.py:30-37). ``resolve_path(dataset) -> str``
    maps a Dataset to a parquet path (lake layout adapter)."""
    seen: list = []
    for metric in metrics:
        for ds in getattr(metric, "reference_datasets", []) or []:
            key = (ds.database, ds.table, ds.alias)
            if key in seen:
                continue
            seen.append(key)
            spark.read.parquet(resolve_path(ds)).createOrReplaceTempView(ds.alias)
    return [k[2] for k in seen]


def run_business_metrics(
    spark: SparkSession,
    metrics: list[BusinessMetric],
    metric_set_name: str | None = None,
    *,
    now: _dt.datetime | None = None,
    mode: str = "distributed",
) -> DataFrame:
    """Execute every BusinessMetric (optionally filtered to one set — F2) and
    return the resulting ``metric_datapoints`` rows.

    ``mode='distributed'`` (default, the scale path): all scalar queries are
    UNION-ALLed into ONE Spark job — Catalyst shares scans of common tables,
    the scheduler overlaps stages, and the driver does a single collect of
    #metrics rows. ``mode='sequential'`` is the reference-faithful compat
    loop — one blocking ``spark.sql(q).collect()[0][0]`` round-trip per
    metric (A4 contract, ref:glue/business_metrics.py:39-40); use it for
    queries that are not scalar-subquery-expressible (multi-row results
    where only the first cell counts).
    """
    now = now or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    selected = [
        m
        for m in metrics
        if (metric_set_name is None or m.metric_set.name == metric_set_name)  # F2
        and isinstance(m, BusinessMetric)  # F3
    ]
    if mode == "distributed":
        scalars_by_idx = {}
        if selected:
            union = business_metrics_distributed(
                spark, {str(i): m.query for i, m in enumerate(selected)}
            )
            for r in union.collect():
                if r["value"] is None and not r["raw_null"]:
                    # The query produced a real (non-NULL) scalar that the
                    # DOUBLE cast destroyed — silently dropping it via the
                    # F7 guard would mask a definition bug, so fail loudly.
                    bad = selected[int(r["name"])]
                    raise ValueError(
                        f"business metric {bad.name!r} returned a non-numeric "
                        f"scalar that CAST(... AS DOUBLE) nulled; fix the query "
                        f"or run mode='sequential': {bad.query!r}"
                    )
                scalars_by_idx[r["name"]] = r["value"]
        results = [(m, scalars_by_idx.get(str(i))) for i, m in enumerate(selected)]
    else:
        results = []
        for metric in selected:
            result = spark.sql(metric.query).collect()
            results.append((metric, result[0][0] if result else None))

    rows = []
    for metric, scalar in results:
        if scalar is None:
            continue  # F7 null-result guard
        dims = (
            json.dumps({d.name: d.value for d in metric.dimensions})
            if metric.dimensions
            else None
        )
        rows.append((metric.namespace, metric.name, dims, now, float(scalar)))
    return spark.createDataFrame(rows, METRIC_DATAPOINTS_SCHEMA)


def business_metrics_distributed(
    spark: SparkSession, queries: dict[str, str]
) -> DataFrame:
    """Scale path for *many* business metrics: UNION ALL the scalar queries
    into one job so Catalyst shares scans of common tables and the scheduler
    overlaps stages, instead of N sequential collect() round-trips.

    ``queries``: name → SQL text, each producing one scalar. Names are
    embedded as SQL string literals, so quotes are escaped defensively
    (names come from internal definitions, not user input — but a name like
    ``orders' count`` must not break or inject into the generated SQL).

    Each branch also emits ``raw_null`` — whether the scalar was NULL
    *before* the DOUBLE cast — so callers can tell a genuinely-NULL result
    (F7: skip) from a non-numeric one the cast nulled (definition bug:
    ``run_business_metrics`` raises).
    """
    selects = [
        "SELECT '{n}' AS name, CAST(raw AS DOUBLE) AS value, "
        "(raw IS NULL) AS raw_null FROM (SELECT ({q}) AS raw)".format(
            n=name.replace("'", "''"), q=q
        )
        for name, q in queries.items()
    ]
    return spark.sql(" UNION ALL ".join(selects))
