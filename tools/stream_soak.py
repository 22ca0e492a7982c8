"""Streaming topology SOAK: the full reference topology — JSON ingest →
partitioned events lake → windowed scrape → metrics lake → stateful SLA
machine → alerts sink — plus the PSI drift monitor, run CONTINUOUSLY for
N minutes of real micro-batches (processingTime triggers, not
availableNow) against a feeder that keeps producing events.

What it demonstrates that tools/stream_bench.py (single availableNow
drain) cannot: sustained-rate stability. The state stores (open scrape
windows + SLA ring buffers) must PLATEAU once event time outruns the
watermark horizon, and per-batch latency must stay flat as total ingested
volume grows — the boiled-frog failure this catches is state that leaks
a little every batch and only shows after wall-clock soak.

Topology (4 concurrent queries + 1 feeder thread):

  feeder (driver thread) → raw/*.json          one file per tick; event
                                               time advances 60 s/tick so
                                               watermarks keep evicting
  Q1 start_ingest        raw → events lake     S5 converting sink (corrupt
                                               rows → errors/)
  Q2 streaming_scrape    events lake → metrics §3.2 windowed stats + defs
                         lake                  join, append on watermark
  Q3 streaming_sla_pipeline                    §3.3 m-of-n alarm machine
                         metrics lake → alerts (applyInPandasWithState)
  Q4 start_drift_monitor events lake → psi log per-batch PSI vs a pinned
                                               baseline

Usage:
    python tools/stream_soak.py [--minutes 30] [--tick-seconds 5]
        [--rows-per-tick 15000] [--series 5] [--workdir PATH]

    python tools/stream_soak.py --chaos [--kill-after 90] [--minutes 3]
        [--tick-seconds 5] [--rows-per-tick 15000]

Prints a per-5-minute curve table (rows/s, batch ms, state rows/MB per
stage) and ONE JSON summary line; SCALE.md's soak section is generated
from this. Run on a quiet host (measurement hygiene: no concurrent Spark
work).

``--workdir`` pins the working directory and PRESERVES it on exit (the
feeder resumes tick numbering above whatever raw files already exist, and
every query restarts from its checkpoint) — the restartability the chaos
drill exercises.

``--chaos`` (r12, VERDICT r11 ask #6 — exactly-once ACROSS RESTART, not
just within a run): phase 1 launches the full soak topology as a child
process group and SIGKILLs it — driver AND JVM, kill -9, no shutdown
hooks — after ``--kill-after`` seconds (mid-stream, mid-batch); phase 2
relaunches the same workdir for ``--minutes`` and lets it finish cleanly;
phase 3 validates, in a fresh session, that the restart healed to
exactly-once end to end:

  - events lake  == the raw feed as a MULTISET (no duplicated replay
    rows, no gaps) — the start_ingest batch-scoped-overwrite contract;
  - errors route: exactly one row per corrupt feeder line;
  - metrics lake: no duplicate (series, window) datapoint, per-series
    window CONTIGUITY (a kill-window hole would break it), and every
    emitted Sum equals the raw-derived per-minute sum — the parquet
    file sink's _spark_metadata exactly-once surviving the kill;
  - alerts + psi log: no duplicate rows.

Prints ONE JSON verdict line with per-check counters and ok: true/false.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, types as T

from aws_dataset_ingestion_metrics_collection_framework_spark import get_spark
from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import METRIC_DEFS_SCHEMA
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.metrics import series_unique_id
from aws_dataset_ingestion_metrics_collection_framework_spark.streaming import (
    streaming_scrape,
    streaming_sla_pipeline,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.drift import (
    start_drift_monitor,
)
from aws_dataset_ingestion_metrics_collection_framework_spark.streaming.ingest import (
    start_ingest,
)

EVENT_TYPES = ["click", "view", "purchase", "error", "signup"]
BASE_EPOCH = 1767225600  # 2026-01-01T00:00:00Z — event time, not wall time

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("namespace", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("dimensions", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _iso(epoch: int) -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime(epoch))


def _feed_tick(raw_dir: str, tick: int, rows: int) -> None:
    """One tick's JSON-lines file: `rows` events spread over EVENT_TYPES,
    event time = BASE + tick minutes (+jitter inside the minute), values
    from a fixed deterministic distribution so PSI stays ~0 (we are
    soaking the plumbing, not simulating drift). A corrupt row per tick
    exercises the error route continuously."""
    lines = []
    for i in range(rows):
        t = EVENT_TYPES[i % len(EVENT_TYPES)]
        ts = BASE_EPOCH + tick * 60 + (i * 7) % 60
        val = float((i * 31 + tick * 17) % 1000)
        lines.append(
            json.dumps(
                {"namespace": "App/Events", "name": t, "dimensions": None,
                 "ts": _iso(ts), "value": val}
            )
        )
    lines.append("{not json at all")  # corrupt-row route stays exercised
    tmp = os.path.join(raw_dir, f".tick_{tick}.tmp")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines))
    os.rename(tmp, os.path.join(raw_dir, f"tick_{tick}.json"))  # atomic


def _progress_rows(query, seen: set) -> list[dict]:
    out = []
    for p in query.recentProgress:
        if p["batchId"] in seen or p["numInputRows"] == 0:
            continue
        seen.add(p["batchId"])
        state = p.get("stateOperators") or []
        out.append(
            {
                "t": p["timestamp"],
                "rows": p["numInputRows"],
                "batch_ms": (p["durationMs"] or {}).get("triggerExecution"),
                "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
                "state_mb": round(
                    sum(s.get("memoryUsedBytes", 0) for s in state) / 1e6, 2
                ),
            }
        )
    return out


def _curve(batches: list[dict], t0: float, bucket_s: int = 300) -> list[dict]:
    """Bucket per-batch samples into wall-clock windows → the flatness
    curve (median batch ms, total rows/s, last state size per window)."""
    import statistics

    buckets: dict[int, list[dict]] = {}
    for b in batches:
        # progress timestamps are ISO strings in UTC
        ts = time.mktime(time.strptime(b["t"][:19], "%Y-%m-%dT%H:%M:%S"))
        # setup-phase batches (before t0 was stamped) fold into window 0
        buckets.setdefault(max(0, int((ts - t0) // bucket_s)), []).append(b)
    out = []
    for k in sorted(buckets):
        bs = buckets[k]
        ms = [x["batch_ms"] for x in bs if x["batch_ms"]]
        out.append(
            {
                "window_min": (k * bucket_s) // 60,
                "batches": len(bs),
                "rows_per_s": round(sum(x["rows"] for x in bs) / bucket_s),
                "batch_ms_med": round(statistics.median(ms)) if ms else None,
                "batch_ms_max": max(ms, default=None),
                "state_rows": bs[-1]["state_rows"],
                "state_mb": bs[-1]["state_mb"],
            }
        )
    return out


def _existing_ticks(raw_dir: str) -> list[int]:
    if not os.path.isdir(raw_dir):
        return []
    return sorted(
        int(f[5:-5])
        for f in os.listdir(raw_dir)
        if f.startswith("tick_") and f.endswith(".json")
    )


def _tree_has_parquet(root: str) -> bool:
    for _, _, files in os.walk(root):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def main() -> None:
    args = sys.argv[1:]

    def opt(name, default):
        return int(args[args.index(name) + 1]) if name in args else default

    def sopt(name, default=None):
        return args[args.index(name) + 1] if name in args else default

    if "--chaos" in args:
        chaos(
            minutes=opt("--minutes", 3),
            kill_after=opt("--kill-after", 90),
            tick_s=opt("--tick-seconds", 5),
            rows_per_tick=opt("--rows-per-tick", 15_000),
        )
        return

    minutes = opt("--minutes", 30)
    tick_s = opt("--tick-seconds", 5)
    rows_per_tick = opt("--rows-per-tick", 15_000)
    workdir = sopt("--workdir")

    spark = get_spark(app_name="stream-soak",
                      extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    work = workdir or tempfile.mkdtemp(prefix="stream_soak_")
    raw_dir = os.path.join(work, "raw")
    lake = os.path.join(work, "events_lake")
    mlake = os.path.join(work, "metrics_lake")
    alerts = os.path.join(work, "alerts")
    os.makedirs(raw_dir, exist_ok=True)
    stop = threading.Event()
    queries = []
    try:
        # ---- feeder: one JSON file per tick, started before the queries
        # so the first trigger has data. A restart (--workdir with prior
        # raw files) resumes tick numbering ABOVE the previous run — event
        # time keeps advancing and the checkpointed file source sees only
        # new names.
        prior = _existing_ticks(raw_dir)
        tick0 = (prior[-1] + 1) if prior else 1
        if not prior:
            _feed_tick(raw_dir, 0, rows_per_tick)

        def feeder():
            tick = tick0
            deadline = time.time() + minutes * 60
            while not stop.is_set() and time.time() < deadline:
                _feed_tick(raw_dir, tick, rows_per_tick)
                tick += 1
                stop.wait(tick_s)

        th = threading.Thread(target=feeder, daemon=True)

        # ---- Q1: S5 converting sink (JSON text → events lake parquet)
        raw = spark.readStream.format("text").option(
            "maxFilesPerTrigger", 4
        ).load(raw_dir)
        q_ingest = start_ingest(
            raw, EVENTS_SCHEMA, lake, os.path.join(work, "errors"),
            os.path.join(work, "ck_ingest"), trigger_seconds=tick_s,
        )
        queries.append(("ingest", q_ingest))

        # the scrape/drift streams need the lake dir + schema to exist
        t_wait = time.time()
        while not _tree_has_parquet(lake):
            if time.time() - t_wait > 120:
                raise RuntimeError("ingest produced no lake files in 120 s")
            time.sleep(1)

        # ---- Q2: §3.2 scrape → metrics lake
        defs = spark.createDataFrame(
            [
                ("App/Events", t, "minute", 60, "Sum", None, "{}",
                 "events", None, None, "1", None, None, None)
                for t in EVENT_TYPES
            ],
            METRIC_DEFS_SCHEMA,
        )
        ev_stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 16)
            .parquet(lake)
        )
        metrics = streaming_scrape(
            ev_stream, defs, "minute", period_seconds=60,
            watermark_delay="10 minutes",
            collection_time=F.lit("2026-01-01 00:00:00").cast("timestamp"),
        )
        q_scrape = (
            metrics.writeStream.format("parquet")
            .option("path", mlake)
            .option("checkpointLocation", os.path.join(work, "ck_scrape"))
            .outputMode("append")
            .trigger(processingTime=f"{tick_s} seconds")
            .start()
        )
        queries.append(("scrape", q_scrape))

        # ---- Q3: §3.3 SLA machine → alerts sink (schema known from the
        # unstarted scrape plan, so Q3 starts before Q2 emits)
        slas = defs.select(
            series_unique_id(
                F.col("namespace"), F.col("name"), F.lit("minute"),
                F.col("dimensions"),
            ).alias("series_id"),
        ).distinct().select(
            F.concat(F.lit("sla_"), "series_id").alias("sla_id"),
            "series_id",
            F.lit(250.0 * rows_per_tick / 5000).alias("threshold"),
            F.lit("GREATER_THAN_THRESHOLD").alias("comparison_operator"),
            F.lit(2).alias("datapoints_to_alarm"),
            F.lit(3).alias("evaluation_periods"),
            F.lit("NOT_BREACHING").alias("treat_missing_data"),
            F.lit(60).alias("period"),
        )
        os.makedirs(mlake, exist_ok=True)
        mstream = (
            spark.readStream.schema(metrics.schema)
            .option("maxFilesPerTrigger", 16)
            .parquet(mlake)
        )
        q_sla = (
            streaming_sla_pipeline(mstream, slas)
            .writeStream.format("parquet")
            .option("path", alerts)
            .option("checkpointLocation", os.path.join(work, "ck_sla"))
            .outputMode("append")
            .trigger(processingTime=f"{tick_s} seconds")
            .start()
        )
        queries.append(("sla", q_sla))

        # ---- Q4: drift monitor on the events lake (pinned baseline =
        # the generator's own value distribution)
        baseline = spark.range(10_000).select(
            (F.col("id") % 1000).cast("double").alias("value")
        )
        drift_stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 16)
            .parquet(lake)
        )
        q_drift = start_drift_monitor(
            drift_stream, baseline, "value",
            os.path.join(work, "psi_log"),
            os.path.join(work, "ck_drift"),
            lo=0.0, hi=1000.0, bins=10, trigger_seconds=tick_s,
        )
        queries.append(("drift", q_drift))

        th.start()
        t0 = time.time()
        samples = {name: [] for name, _ in queries}
        seen = {name: set() for name, _ in queries}
        deadline = t0 + minutes * 60
        while time.time() < deadline:
            time.sleep(min(60, max(1, deadline - time.time())))
            for name, q in queries:
                if q.exception() is not None:
                    raise RuntimeError(f"{name} died: {q.exception()}")
                samples[name].extend(_progress_rows(q, seen[name]))
            done_min = int((time.time() - t0) / 60)
            print(f"[{done_min:3d} min] " + "  ".join(
                f"{n}:{len(samples[n])}b" for n, _ in queries
            ), file=sys.stderr, flush=True)
        stop.set()
        if "--drain" in args:
            # chaos phase 2: drain the WHOLE chain before stopping so the
            # validator compares complete tables (creation order = data
            # flow order: ingest → scrape → sla → drift)
            for _, q in queries:
                q.processAllAvailable()
        time.sleep(tick_s + 2)  # let in-flight triggers finish
        for name, q in queries:
            samples[name].extend(_progress_rows(q, seen[name]))
            q.stop()

        curves = {n: _curve(samples[n], t0) for n, _ in queries}
        psi = spark.read.parquet(os.path.join(work, "psi_log"))
        psi_max = psi.agg(F.max("psi")).collect()[0][0]
        alerts_n = spark.read.parquet(alerts).count()
        for name in curves:
            print(f"--- {name}", file=sys.stderr)
            for w in curves[name]:
                print(f"  {w}", file=sys.stderr)
        print(json.dumps({
            "metric": "stream_soak",
            "minutes": minutes,
            "tick_seconds": tick_s,
            "rows_per_tick": rows_per_tick,
            "alerts_rows": alerts_n,
            "psi_max": psi_max,
            "curves": curves,
        }))
    finally:
        stop.set()
        for _, q in queries:
            try:
                q.stop()
            except Exception:
                pass
        if workdir is None:
            shutil.rmtree(work, ignore_errors=True)


def validate(work: str) -> dict:
    """Phase-3 exactly-once audit (fresh session, children gone): compare
    every output table against the raw feed — see the --chaos docstring
    for the per-table contracts."""
    spark = get_spark(app_name="stream-chaos-validate",
                      extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    raw_dir = os.path.join(work, "raw")
    n_ticks = len(_existing_ticks(raw_dir))

    parsed = (
        spark.read.text(raw_dir)
        .select(F.from_json("value", EVENTS_SCHEMA).alias("r"))
        .select("r.*")
    )
    good = parsed.filter(F.col("ts").isNotNull() & F.col("name").isNotNull())
    key = [
        "namespace", "name",
        F.coalesce(F.col("dimensions"), F.lit("∅")).alias("dims"),
        "ts", "value",
    ]
    expected = good.select(*key).groupBy(
        "namespace", "name", "dims", "ts", "value"
    ).count().withColumnRenamed("count", "n_exp")
    lake = (
        spark.read.parquet(os.path.join(work, "events_lake"))
        .select(*key)
        .groupBy("namespace", "name", "dims", "ts", "value")
        .count()
        .withColumnRenamed("count", "n_got")
    )
    diff = expected.join(
        lake, ["namespace", "name", "dims", "ts", "value"], "full_outer"
    ).filter(
        F.coalesce("n_exp", F.lit(0)) != F.coalesce("n_got", F.lit(0))
    )
    lake_mismatched_groups = diff.count()

    errors_got = spark.read.text(os.path.join(work, "errors")).count()

    m = spark.read.parquet(os.path.join(work, "metrics_lake")).select(
        "name",
        F.col("metrictimestamp").cast("timestamp").alias("wstart"),
        F.col("metricvalue").cast("double").alias("v"),
    )
    metrics_dup_windows = m.count() - m.select("name", "wstart").distinct().count()
    exp_sums = good.groupBy(
        "name", F.window("ts", "60 seconds").getField("start").alias("wstart")
    ).agg(F.sum("value").alias("v_exp"))
    value_mismatches = (
        m.join(exp_sums, ["name", "wstart"], "left")
        .filter(
            F.col("v_exp").isNull() | (F.abs(F.col("v") - F.col("v_exp")) > 1e-3)
        )
        .count()
    )
    per_name = m.groupBy("name").agg(
        F.countDistinct("wstart").alias("n"),
        ((F.unix_timestamp(F.max("wstart")) - F.unix_timestamp(F.min("wstart")))
         / 60 + 1).alias("span"),
    )
    gap_series = per_name.filter(F.col("n") != F.col("span")).count()
    metrics_rows = m.count()

    alerts_df = spark.read.parquet(os.path.join(work, "alerts"))
    alerts_dups = alerts_df.count() - alerts_df.distinct().count()
    psi = spark.read.parquet(os.path.join(work, "psi_log"))
    psi_dups = psi.count() - psi.select("batch_id").distinct().count()

    ok = (
        lake_mismatched_groups == 0
        and errors_got == n_ticks
        and metrics_dup_windows == 0
        and value_mismatches == 0
        and gap_series == 0
        and metrics_rows > 0
        and alerts_dups == 0
        and psi_dups == 0
    )
    return {
        "ok": bool(ok),
        "raw_ticks": n_ticks,
        "lake_mismatched_groups": lake_mismatched_groups,
        "errors_expected": n_ticks,
        "errors_got": errors_got,
        "metrics_rows": metrics_rows,
        "metrics_dup_windows": metrics_dup_windows,
        "metrics_value_mismatches": value_mismatches,
        "metrics_gap_series": gap_series,
        "alerts_dup_rows": alerts_dups,
        "psi_dup_rows": psi_dups,
    }


def chaos(*, minutes: int, kill_after: int, tick_s: int, rows_per_tick: int) -> None:
    """kill -9 the live topology mid-stream, restart it from checkpoints,
    audit exactly-once across the restart. See the module docstring."""
    import signal
    import subprocess

    work = tempfile.mkdtemp(prefix="stream_chaos_")
    base = [
        sys.executable, os.path.abspath(__file__), "--workdir", work,
        "--tick-seconds", str(tick_s), "--rows-per-tick", str(rows_per_tick),
    ]
    with open(os.path.join(work, "phase1.log"), "w") as log1:
        p = subprocess.Popen(
            base + ["--minutes", "30"],
            stdout=log1, stderr=subprocess.STDOUT, start_new_session=True,
        )
        time.sleep(kill_after)
        # the whole process GROUP: python driver AND the Spark JVM — no
        # shutdown hooks, no checkpoint flush, mid-batch by construction
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        p.wait()
    print(f"[chaos] phase 1 SIGKILLed after {kill_after}s", file=sys.stderr)
    with open(os.path.join(work, "phase2.log"), "w") as log2:
        rc = subprocess.call(
            base + ["--minutes", str(minutes), "--drain"],
            stdout=log2, stderr=subprocess.STDOUT,
        )
    if rc != 0:
        print(json.dumps({"metric": "stream_chaos", "ok": False,
                          "phase2_rc": rc, "workdir": work}))
        sys.exit(1)
    print("[chaos] phase 2 (restart) finished clean; validating", file=sys.stderr)
    verdict = validate(work)
    verdict = {
        "metric": "stream_chaos",
        "kill_after_s": kill_after,
        "phase2_minutes": minutes,
        **verdict,
    }
    print(json.dumps(verdict))
    if verdict["ok"]:
        shutil.rmtree(work, ignore_errors=True)
    else:
        print(f"[chaos] FAILED — workdir preserved: {work}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
