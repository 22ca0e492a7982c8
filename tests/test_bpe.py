"""BPE training pins: EXACT equality with a pure-Python reference
implementation of the same algorithm (same greedy fold, same total-order
tie-break) on real corpus data — the rows-only registry entry's oracle
equivalent — plus determinism and apply-path consistency."""

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.catalog import load_table
from aws_dataset_ingestion_metrics_collection_framework_spark.operators import bpe as B


# ---------------------------------------------------------------------------
# pure-Python reference (Sennrich alg., same tie-break + greedy merge)
# ---------------------------------------------------------------------------


def _ref_train(texts, num_merges):
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[w] += 1
    words = {w: list(w) + [B.EOW] for w in vocab}

    def merge_word(syms, a, b):
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        words = {w: merge_word(s, a, b) for w, s in words.items()}
    return merges, words


def test_matches_python_reference_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    texts = [r["text"] for r in docs.select("text").collect()]
    want_merges, want_words = _ref_train(texts, 25)

    merges, vocab = B.train_bpe(docs, "text", num_merges=25)
    assert merges == want_merges
    got_words = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got_words == want_words


def test_distributed_iterations_match_driver_path(spark, sf_dir):
    """Size-adaptive execution pin (r6): threshold=0 forces the
    distributed per-iteration path; it must produce byte-identical
    merges AND final symbol tables to the driver-local loop (and hence
    to the pure-Python reference) on real corpus data."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    m_local, v_local = B.train_bpe(docs, "text", num_merges=15)
    m_dist, v_dist = B.train_bpe(
        docs, "text", num_merges=15, driver_vocab_threshold=0
    )
    assert m_dist == m_local
    wl = {r["word"]: list(r["syms"]) for r in v_local.collect()}
    wd = {r["word"]: list(r["syms"]) for r in v_dist.collect()}
    assert wd == wl


def test_training_is_deterministic(spark):
    rows = [(i, "low lower lowest newer newest wide wider") for i in range(4)]
    df = spark.createDataFrame(rows, "id long, text string")
    m1, _ = B.train_bpe(df, "text", num_merges=10)
    m2, _ = B.train_bpe(df.repartition(7), "text", num_merges=10)
    assert m1 == m2 and len(m1) > 0


def test_apply_paths_agree(spark):
    df = spark.createDataFrame(
        [(1, "banana bandana"), (2, "ban banana")], "id long, text string"
    )
    merges, vocab = B.train_bpe(df, "text", num_merges=8)
    oov = spark.createDataFrame([(9, "banana bananas")], "id long, text string")
    via_table = B.apply_bpe(oov, "id", "text", merges, vocab_df=vocab)
    via_replay = B.apply_bpe(oov, "id", "text", merges)
    a = sorted((r["word_idx"], tuple(r["pieces"])) for r in via_table.collect())
    b = sorted((r["word_idx"], tuple(r["pieces"])) for r in via_replay.collect())
    assert a == b  # OOV 'bananas' replays; seen 'banana' joins — same pieces

    joined = "".join(p for _, ps in a for p in ps)
    assert joined == "banana" + B.EOW + "bananas" + B.EOW  # lossless


def test_merge_reduces_piece_count(spark):
    df = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa aaaa")], "id long, text string"
    )
    merges, vocab = B.train_bpe(df, "text", num_merges=3)
    assert merges[0] == ("a", "a")
    syms = vocab.collect()[0]["syms"]
    assert len(syms) < 5  # 'aaaa'+EOW folded into fewer pieces


def test_merge_replay_equals_chained_folds(spark):
    """r15 pin: the constant-depth `_merge_replay` (one fold over a merges
    array literal) must be row-identical to chaining `_merge_fold` once per
    merge — including self-merging pairs (a,a), merges that consume earlier
    merge output (aa,a), and EOW-adjacent pairs."""
    merges = [("a", "a"), ("aa", "a"), ("b", "a"), ("ba", B.EOW), ("c", "aa")]
    words = ["aaaa", "aaa", "ba", "caa", "abcabc", "", "aabaa", "cba"]
    df = spark.createDataFrame([(w,) for w in words], "word string")

    chained = B._chars_with_eow(F.col("word"))
    for left, right in merges:
        chained = B._merge_fold(chained, left, right)

    got = df.select(
        "word",
        B._merge_replay(F.col("word"), merges).alias("one"),
        chained.alias("many"),
    ).collect()
    for r in got:
        assert list(r["one"]) == list(r["many"]), r["word"]
    # empty merge list degenerates to plain chars+EOW
    base = df.select(B._merge_replay(F.col("word"), []).alias("p")).collect()
    ref = df.select(B._chars_with_eow(F.col("word")).alias("p")).collect()
    assert [list(r["p"]) for r in base] == [list(r["p"]) for r in ref]
