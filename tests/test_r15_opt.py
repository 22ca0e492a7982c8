"""r15 optimization-round pins: the bench harness's bounded gate sleep and
partial-output flush (bench.py methodology §6, VERDICT r14 ask #1).

These tests need no Spark session: the gate logic is tested with injected
load/sleep fakes, and the SIGTERM flush by running bench.py as a subprocess
and killing it before its first worker can finish.
"""

import json
import os
import signal
import subprocess
import sys
import time

import bench


def test_wait_for_quiet_noop_on_quiet_host():
    slept = []
    waited = bench._wait_for_quiet(
        1.0, 300.0, 15.0, load_fn=lambda: 0.2, sleep_fn=slept.append
    )
    assert waited == 0.0
    assert slept == []


def test_wait_for_quiet_respects_budget_exactly():
    # Load never drains: total sleep must equal the budget, with the final
    # increment clamped so the budget is never overshot (25 = 10 + 10 + 5).
    slept = []
    waited = bench._wait_for_quiet(
        1.0, 25.0, 10.0, load_fn=lambda: 9.9, sleep_fn=slept.append
    )
    assert waited == 25.0
    assert slept == [10.0, 10.0, 5.0]


def test_wait_for_quiet_stops_when_load_drains():
    loads = iter([5.0, 5.0, 0.3])
    slept = []
    waited = bench._wait_for_quiet(
        1.0, 300.0, 10.0, load_fn=lambda: next(loads), sleep_fn=slept.append
    )
    assert waited == 20.0
    assert slept == [10.0, 10.0]


def test_wait_for_quiet_zero_budget_never_sleeps():
    # The suite-wide re-gate budget can be exhausted mid-suite: a zero
    # budget must launch immediately even on a hot host.
    slept = []
    waited = bench._wait_for_quiet(
        1.0, 0.0, 10.0, load_fn=lambda: 9.9, sleep_fn=slept.append
    )
    assert waited == 0.0
    assert slept == []


def test_sigterm_flushes_partial_one_line_json():
    # Launch the suite runner on one real query, then SIGTERM it while the
    # worker JVM is still starting: stdout must still carry the one-line
    # JSON contract, tagged partial, with an empty queries map.
    env = dict(os.environ)
    env["BENCH_LOAD_GATE"] = "1e9"  # skip the start/per-query gates
    proc = subprocess.Popen(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__), "bench.py"),
         "q01_pricing_summary"],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=env,
    )
    time.sleep(3.0)  # enough for the worker Popen, not for a JVM + query
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    assert proc.returncode == 1
    line = out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["partial"] is True
    assert payload["queries"] == {}
    assert payload["unit"] == "sec"
    assert "loadavg_start" in payload
