"""Statistic-string → aggregate-function resolution (SURVEY §2.4 A1, §4
rewrite #1).

The reference declares CloudWatch statistic strings
(ref:dataquality/metric.py:80 ``statistic``; compiled into
``MetricStat.Stat`` at ref:dataquality/stream.py:34-42) and lets CloudWatch
aggregate. The engine computes them natively:

  Sum → sum, Average → avg, Minimum → min, Maximum → max,
  SampleCount → count, pNN[.NN] → exact percentile (interpolated, matching
  CloudWatch's definition closely enough for parity; swap in
  ``percentile_approx`` for very high-cardinality groups at scale).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

SUPPORTED_STATISTICS = ("Sum", "Average", "Minimum", "Maximum", "SampleCount")

_PERCENTILE_RE = re.compile(r"^p(\d{1,2}(?:\.\d+)?)$")


def statistic_agg(statistic: str, col: Column, *, approx: bool = False) -> Column:
    """Resolve a CloudWatch statistic string to a Spark aggregate Column.

    ``approx=True`` switches percentiles to ``percentile_approx`` (sketch-
    based, constant memory per group — the 100 TB path when exactness isn't
    required by an oracle).
    """
    if statistic == "Sum":
        return F.sum(col)
    if statistic == "Average":
        return F.avg(col)
    if statistic == "Minimum":
        return F.min(col)
    if statistic == "Maximum":
        return F.max(col)
    if statistic == "SampleCount":
        return F.count(col).cast("double")
    m = _PERCENTILE_RE.match(statistic)
    if m:
        frac = float(m.group(1)) / 100.0
        if approx:
            return F.percentile_approx(col, frac)
        return F.percentile(col, frac)
    raise ValueError(f"unsupported statistic: {statistic!r}")


def all_statistics_struct(
    col: Column, percentiles: list[float] | None = None, *, approx: bool = False
) -> Column:
    """One-pass computation of every base statistic (plus optional
    percentiles) as a struct.

    This is the scale pattern: instead of one shuffle per distinct statistic,
    aggregate the big datapoint table ONCE per (series, window) computing all
    base stats map-side-combinable, then select the declared statistic with a
    CASE against the (broadcast) defs table. See
    ``operators.metrics.compute_metric_windows``.

    ``approx=True`` computes percentiles with the ``percentile_approx``
    sketch — constant memory per group, and the only percentile form legal
    inside a streaming aggregation (exact percentile buffers unboundedly).
    """
    fields = [
        F.sum(col).alias("Sum"),
        F.avg(col).alias("Average"),
        F.min(col).alias("Minimum"),
        F.max(col).alias("Maximum"),
        F.count(col).cast("double").alias("SampleCount"),
    ]
    if percentiles:
        pct_arr = F.array(*[F.lit(p) for p in percentiles])
        pct = (
            F.percentile_approx(col, pct_arr).cast("array<double>")
            if approx
            else F.percentile(col, pct_arr)
        )
        fields.append(pct.alias("Percentiles"))
    return F.struct(*fields)


def pick_statistic(stats_struct: Column, statistic: Column, percentiles: list[float] | None = None) -> Column:
    """CASE over the one-pass stats struct selecting the statistic named by
    the (def-joined) ``statistic`` column."""
    result = (
        F.when(statistic == "Sum", stats_struct["Sum"])
        .when(statistic == "Average", stats_struct["Average"])
        .when(statistic == "Minimum", stats_struct["Minimum"])
        .when(statistic == "Maximum", stats_struct["Maximum"])
        .when(statistic == "SampleCount", stats_struct["SampleCount"])
    )
    if percentiles:
        for i, p in enumerate(percentiles):
            stat_name = f"p{p * 100:g}"
            result = result.when(statistic == stat_name, stats_struct["Percentiles"].getItem(i))
    return result


def percentiles_in_defs(statistics: list[str]) -> list[float]:
    """Distinct pNN fractions declared across a defs table (driver-side,
    defs are small)."""
    out = []
    for s in statistics:
        m = _PERCENTILE_RE.match(s)
        if m:
            frac = float(m.group(1)) / 100.0
            if frac not in out:
                out.append(frac)
    return sorted(out)
