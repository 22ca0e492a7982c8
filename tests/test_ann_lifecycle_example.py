"""The ANN index lifecycle example end-to-end: build → append/replay →
gauges → policy verdict → compact → streaming sink → lease refusal →
sharded path. The example asserts its own invariants (replay lands 0,
policy says compact_due, query rows unchanged across compaction, second
writer refused); this test executes it against the small test data so
the composition story stays runnable."""

import sys
from pathlib import Path

EXAMPLES_DIR = Path(__file__).resolve().parents[1] / "examples"


def test_ann_index_lifecycle_example(tmp_path, spark, sf_dir):
    sys.path.insert(0, str(EXAMPLES_DIR))
    import ann_index_lifecycle as ex

    argv = sys.argv
    sys.argv = ["ann_index_lifecycle", str(tmp_path / "out"), sf_dir]
    try:
        ex.main()  # raises on any broken stage invariant
    finally:
        sys.argv = argv
