"""End-to-end monitoring example: gated landing, incremental state,
both detectors — all counts self-consistent."""

import sys


def test_monitoring_pipeline_example(tmp_path):
    sys.path.insert(0, "/root/repo/examples")
    from monitoring_pipeline import main

    s = main(str(tmp_path), "/root/testdata/sf0.001")
    assert s["dq_checks_passed"] == 3          # every expectation holds
    assert s["rollup_rows"] > 0
    assert s["p95_windows"] > 0
    assert s["seasonal_alerts"] >= 0 and s["cusum_alerts"] >= 0
