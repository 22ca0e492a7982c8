"""Derived-key Column builders — distributed equivalents of the reference's
Python key derivations (SURVEY §2.7 C1-C4), byte-compatible for ASCII input.

The engine stores dimensions as a JSON-object string column (schema §1.3);
these builders operate on an *array of (name, value) structs* so they can run
before JSON-encoding, or on exploded JSON via ``from_json``.

Note on regex classes: Python's ``re.sub(r'\\W+','')`` is Unicode-aware while
Java's ``\\W`` is ASCII; all reference keys are ASCII so the derivations
agree. Goldens pin this (tests/test_dsl.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _visible_dims(dims: Column) -> Column:
    """Filter out dimensions whose name ends with 'Bucket' (predicate F6 —
    ref:dataquality/metric.py:125-126,138-139,151-152)."""
    return F.filter(dims, lambda d: ~d["name"].endswith("Bucket"))


def unique_id_col(namespace: Column, name: Column, frequency: Column, dims: Column) -> Column:
    """C1 — ``lower(sub(r'\\W+','', ns+name+freq+dimName+dimValue...))``
    (ref:dataquality/metric.py:144-155). Join key for enrichment join J1.

    ``dims``: ``array<struct<name:string,value:string>>`` (possibly null).
    """
    dim_part = F.when(dims.isNull(), F.lit("")).otherwise(
        F.array_join(
            F.transform(_visible_dims(dims), lambda d: F.concat(d["name"], d["value"])), ""
        )
    )
    raw = F.concat(namespace, name, frequency, dim_part)
    return F.lower(F.regexp_replace(raw, r"\W+", ""))


def alarm_unique_id_col(
    namespace: Column, name: Column, frequency: Column, dims: Column
) -> Column:
    """C2 — hyphen-joined id, '/' removed, lowercase
    (ref:dataquality/metric.py:131-142)."""
    dim_part = F.when(dims.isNull(), F.lit("")).otherwise(
        F.array_join(
            F.transform(
                _visible_dims(dims), lambda d: F.concat(d["name"], F.lit("-"), d["value"], F.lit("-"))
            ),
            "",
        )
    )
    raw = F.concat(namespace, F.lit("-"), name, F.lit("-"), frequency, F.lit("-"), dim_part)
    return F.lower(F.regexp_replace(raw, "/", ""))


def widget_title_col(name: Column, frequency: Column, dims: Column) -> Column:
    """C3 — ``name + ' per ' + frequency + '-' + dim values``, '/' removed,
    lowercase (ref:dataquality/metric.py:118-129)."""
    dim_part = F.when(dims.isNull(), F.lit("")).otherwise(
        F.array_join(F.transform(_visible_dims(dims), lambda d: d["value"]), "")
    )
    raw = F.concat(name, F.lit(" per "), frequency, F.lit("-"), dim_part)
    return F.lower(F.regexp_replace(raw, "/", ""))


def alarm_name_col(alarm_unique_id: Column, region: Column) -> Column:
    """Alarm-name layout ``data-gov-<alarm_unique_id>SLA-Alarm-<region>``
    (ref:cdk_constructs/cw_alarm.py:36)."""
    return F.concat(F.lit("data-gov-"), alarm_unique_id, F.lit("SLA-Alarm-"), region)


def parse_alarm_name(alarmname: Column) -> dict[str, Column]:
    """C4 — parse an alarm name back into its components
    (ref:lambda/sla_parse.py:26-29).

    Layout: ``data-gov-<ns>-<name>-<freq>-<dimName>-<dimValue>-SLA-Alarm-<region>``
    where ns/name/freq/dims went through ``alarm_unique_id`` ('/' stripped,
    lowercase). Returns columns keyed ``metric_name``, ``frequency``,
    ``dimension_value`` — matching the reference's derived_list
    ``[split[3], split[4], join(split[6:])]`` over the pre-'-SLA' prefix.

    The reference's companion derivation for J2
    (ref:lambda/sla_stream_producer.py:68 — ``split('-')[3:-5]``) drops the
    namespace token and can never equal ``alarm_unique_id()[:-1]``; we
    implement the *intended* key (``[2:-5]`` ≡ everything between 'data-gov-'
    and '-SLA') — documented divergence (SURVEY §7 bug list).
    """
    prefix = F.substring_index(alarmname, "-SLA", 1)
    parts = F.split(prefix, "-")
    return {
        "metric_name": parts.getItem(3),
        "frequency": parts.getItem(4),
        "dimension_value": F.array_join(F.slice(parts, 7, F.greatest(F.size(parts) - 6, F.lit(0))), "-"),
        # the intended J2 key: alarm_unique_id without its trailing '-'
        "alarm_key": F.array_join(F.slice(parts, 3, F.greatest(F.size(parts) - 2, F.lit(0))), "-"),
    }
