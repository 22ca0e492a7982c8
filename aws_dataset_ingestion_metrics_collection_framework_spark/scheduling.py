"""Scheduling surface — consuming ``MetricSet.schedule`` (VERDICT r1 #10).

The reference wires two kinds of crons:

- per-frequency EventBridge rules driving the metric/SLA scrapes
  (ref:stacks/metrics_streamer.py:105-133 — ``cron(0 0 * * ? *)`` daily,
  ``cron(0 * * * ? *)`` hourly, ``cron(0/1 * * * ? *)`` minutely);
- per-set Glue job triggers from ``MetricSet.schedule``
  (ref:stacks/metrics_streamer.py:234-254 → cdk_constructs/glue_job_construct).

The engine stores ``schedule`` in the DSL; this module makes it executable:
a dependency-free AWS-cron matcher plus ``due_work`` — given a definition
set and a tick timestamp, which metric sets' business jobs and which scrape
frequencies are due. The external-orchestration contract (Airflow/cron/
EventBridge → ``spark-submit``) is simply: call ``due_work(defs, now)``
each tick and run the returned work; the driver loop stays outside Spark,
exactly as the reference keeps it outside Glue.

Scale: pure driver-side date arithmetic over the (tiny) definitions —
nothing here touches an executor.
"""

from __future__ import annotations

import datetime as _dt

# The reference's per-frequency scrape rules (EventBridge cron, UTC).
FREQUENCY_CRONS = {
    "day": "cron(0 0 * * ? *)",
    "hour": "cron(0 * * * ? *)",
    "minute": "cron(0/1 * * * ? *)",
}


def _field_matches(field: str, value: int, lo: int) -> bool:
    """One cron field against a value. Supports ``*``/``?``, numbers, lists
    ``a,b``, ranges ``a-b``, and steps ``a/s`` / ``*/s`` (AWS semantics:
    ``a/s`` = every s starting at a)."""
    for part in field.split(","):
        if part in ("*", "?"):
            return True
        if "/" in part:
            start_s, step_s = part.split("/", 1)
            step = int(step_s)
            if start_s in ("*", "?"):
                start, hi = lo, None
            elif "-" in start_s:
                # 'a-b/s': step through the range only — the upper bound
                # caps the match ('1-5/2' hits 1,3,5 but never 7).
                a_s, b_s = start_s.split("-", 1)
                start, hi = int(a_s), int(b_s)
            else:
                start, hi = int(start_s), None
            if (
                value >= start
                and (hi is None or value <= hi)
                and (value - start) % step == 0
            ):
                return True
            continue
        if "-" in part:
            a, b = part.split("-", 1)
            if int(a) <= value <= int(b):
                return True
            continue
        if int(part) == value:
            return True
    return False


def cron_matches(expr: str, at: _dt.datetime) -> bool:
    """Does ``at`` (treated as UTC) match an AWS cron expression?

    Accepts ``cron(m h dom mon dow y)`` (AWS 6-field, ``?`` wildcards,
    day-of-week 1=Sunday..7=Saturday) or a bare 5-field
    ``m h dom mon dow`` (classic cron, 0=Sunday..6=Saturday).
    """
    s = expr.strip()
    aws = s.startswith("cron(") and s.endswith(")")
    fields = (s[5:-1] if aws else s).split()
    if aws and len(fields) != 6:
        raise ValueError(f"AWS cron needs 6 fields: {expr!r}")
    if not aws and len(fields) != 5:
        raise ValueError(f"cron needs 5 fields: {expr!r}")
    minute, hour, dom, mon = fields[0], fields[1], fields[2], fields[3]
    dow = fields[4]
    year = fields[5] if aws else "*"
    # Python: Monday=0..Sunday=6 → AWS 1=Sunday..7=Saturday; classic 0=Sunday.
    py_dow = at.weekday()
    dow_value = ((py_dow + 1) % 7) + 1 if aws else (py_dow + 1) % 7
    return (
        _field_matches(minute, at.minute, 0)
        and _field_matches(hour, at.hour, 0)
        and _field_matches(dom, at.day, 1)
        and _field_matches(mon, at.month, 1)
        and _field_matches(dow, dow_value, 1 if aws else 0)
        and _field_matches(year, at.year, 1970)
    )


def next_fire(expr: str, after: _dt.datetime, *, limit_days: int = 366) -> _dt.datetime | None:
    """First minute strictly after ``after`` matching ``expr`` (minute
    resolution — AWS cron has none finer). Linear scan is plenty: driver-side,
    ≤ ~half a million iterations worst case within a year."""
    t = after.replace(second=0, microsecond=0) + _dt.timedelta(minutes=1)
    end = after + _dt.timedelta(days=limit_days)
    while t <= end:
        if cron_matches(expr, t):
            return t
        t += _dt.timedelta(minutes=1)
    return None


def due_work(
    definition_set,
    at: _dt.datetime,
    *,
    running: "list[str] | set[str] | None" = None,
    max_concurrent: int = 1,
) -> dict:
    """What should run at tick ``at``:

    - ``business_sets``: metric-set names whose ``schedule`` cron matches
      (the per-set Glue-job analog — run ``run_business_metrics`` for each);
    - ``scrape_frequencies``: frequencies whose standing rule matches (run
      ``scrape_metrics``/``scrape_sla_table`` for each);
    - ``deferred_sets``: due metric-set names HELD BACK by the concurrency
      guard (re-offered at the next tick their slot frees up).

    Concurrency guard — parity with the reference, which pins
    ``max_concurrent_runs=1`` per business-metric Glue job
    (stacks/metrics_streamer.py:243, cdk_constructs/glue_job_construct.py:244):
    a due metric set with ``max_concurrent`` runs already in flight
    (occurrences of its name in ``running`` — pass a LIST to count
    overlapping runs) is deferred, not re-offered, exactly as Glue
    queues a run that would exceed the cap. ``max_concurrent`` raises
    the per-set cap for engines that can overlap runs. The batch runner
    in this repo is sequential by construction, so with the default
    arguments the guard is also what the runner's structure already
    guarantees — ``running`` matters for external/async schedulers.

    ``definition_set`` is a ``dsl.loader.DefinitionSet`` (or anything with
    ``.definitions[*].metric_sets[*]`` carrying ``name``/``schedule``).
    """
    running = list(running or [])
    business, deferred = [], []
    for definition in getattr(definition_set, "definitions", []):
        for metric_set in definition.metric_sets:
            sched = getattr(metric_set, "schedule", None)
            name = metric_set.name
            if not (sched and cron_matches(sched, at)):
                continue
            if name in business or name in deferred:
                continue
            # a set with max_concurrent runs already in flight defers
            in_flight = sum(1 for r in running if r == name)
            (business if in_flight < max_concurrent else deferred).append(name)
    freqs = [f for f, c in FREQUENCY_CRONS.items() if cron_matches(c, at)]
    return {
        "business_sets": business,
        "scrape_frequencies": freqs,
        "deferred_sets": deferred,
    }
