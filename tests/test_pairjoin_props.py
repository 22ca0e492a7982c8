"""Property tests for the pair-join primitives: the banded Hamming join
and the grid-bucketed interval overlap join must equal brute force on
arbitrary inputs (completeness is the whole contract — a missed pair is a
silent dedup/correlation hole).

Each example batches its data into one DataFrame (job startup dominates
otherwise); example counts stay small, brute force is O(n²) driver-side.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import hamming_pairs
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.temporal import (
    interval_overlap_join,
)

_sig = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@settings(max_examples=6, deadline=None)
@given(st.lists(_sig, min_size=2, max_size=30), st.integers(min_value=0, max_value=6))
def test_hamming_pairs_equals_brute_force(spark, sigs, d):
    df = spark.createDataFrame(list(enumerate(sigs)), "id long, sig long")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(df, "id", "sig", max_hamming=d).collect()
    )
    want = sorted(
        (i, j, _ham(a, b))
        for i, a in enumerate(sigs)
        for j, b in enumerate(sigs)
        if i < j and _ham(a, b) <= d
    )
    assert got == want


_iv = st.tuples(
    st.integers(min_value=-1000, max_value=1000),
    st.integers(min_value=0, max_value=500),
).map(lambda t: (t[0], t[0] + t[1]))  # (start, end) with end >= start


@settings(max_examples=6, deadline=None)
@given(
    st.lists(_iv, min_size=1, max_size=20),
    st.lists(_iv, min_size=1, max_size=20),
    st.sampled_from([7, 64, 257]),
)
def test_interval_overlap_equals_brute_force(spark, ls, rs, width):
    left = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(ls)], "iid long, s long, e long"
    )
    right = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(rs)], "iid long, s long, e long"
    )
    got = sorted(
        (r["iid_l"], r["iid_r"])
        for r in interval_overlap_join(
            left, right, l_id="iid", l_start="s", l_end="e",
            r_id="iid", r_start="s", r_end="e", bucket_width=width,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (ls_, le) in enumerate(ls)
        for j, (rs_, re) in enumerate(rs)
        if ls_ < le and rs_ < re and ls_ < re and rs_ < le
    )
    assert got == want


def _lev(a, b):
    # textbook DP reference
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


_word = st.text(alphabet="abc", min_size=0, max_size=12)


@settings(max_examples=6, deadline=None)
@given(st.lists(_word, min_size=2, max_size=25), st.integers(min_value=0, max_value=3))
def test_edit_distance_pairs_equals_brute_force(spark, words, k):
    """The q-gram count filter + short-string bucket must be COMPLETE:
    output equals brute-force Levenshtein over all pairs. Short alphabet
    ('abc') maximizes repeated grams — the worst case for set-style
    filters; lengths 0..12 straddle the short-string bound for q=3."""
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(list(enumerate(words)), "id long, s string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(df, "id", "s", max_dist=k).collect()
    )
    want = sorted(
        (i, j, _lev(a, b))
        for i, a in enumerate(words)
        for j, b in enumerate(words)
        if i < j and _lev(a, b) <= k
    )
    assert got == want
