"""Distributed BPE tokenizer training (Sennrich et al., ACL'16) — the
"train a tokenizer on the corpus" step of every LLM data pipeline,
expressed Spark-first.

The scale insight Sennrich's algorithm already contains: after ONE pass
that reduces the corpus to a (word, count) vocabulary table, every merge
iteration runs over the VOCABULARY (≈ millions of rows at web scale), not
the corpus (billions of documents). Each iteration is:

1. pair statistics: explode adjacent symbol pairs per word, weighted by
   word count — map-only + one groupBy(pair) SUM (map-side combined);
2. best pair: argmax with a TOTAL-ORDER tie-break (count desc, then pair
   lexicographic) via TakeOrderedAndProject(1) — deterministic across
   partitionings, unlike bare max-by-count;
3. merge application: a greedy left-to-right fold over each word's symbol
   array (``aggregate`` HOF — JVM-side, no Python) replacing adjacent
   (left, right) with the concatenation; ``localCheckpoint`` truncates the
   per-iteration lineage exactly like ``graph.pagerank``.

The merge list itself is tiny (one row per iteration) and collects to the
driver as the trained artifact — the same bounded planning-time collect
as the defs loaders.

Training is iterative global-argmax, so it is NOT SQL-expressible as one
query; its correctness pin is EXACT equality with a pure-Python reference
implementation of the same algorithm (tests/test_bpe.py) — the same
contract strength as a DuckDB oracle, enforced by pytest instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# end-of-word marker (Sennrich's </w>): lets merges distinguish word-final
# units; a plain corpus character can never equal it.
EOW = "▁"


def _chars_with_eow(word: Column) -> Column:
    return F.concat(F.split(word, ""), F.array(F.lit(EOW)))


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right single-pair merge over a symbol array (the
    fold never re-merges its own output: after replacing (a,b) the new
    last element is a||b, which only re-merges if a||b literally equals
    the left symbol — the correct greedy semantics)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _merge_replay(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Replay ALL trained merges over a word, rank order, as ONE
    constant-depth expression: an outer fold over a merges array literal
    whose step is the same greedy left-to-right fold as ``_merge_fold``
    (with the pair taken from the lambda variable instead of literals).

    Equivalent to chaining ``_merge_fold`` once per merge — pinned by
    tests/test_bpe.py::test_apply_paths_agree and the byte-parity suite —
    but the chained form built a num_merges-deep lambda tree whose
    Catalyst analysis dominated the face wall time (guide §7.3); this
    form is depth-2 regardless of merge count."""
    syms = _chars_with_eow(word)
    if not merges:
        return syms
    mlit = F.array(
        *[
            F.struct(F.lit(l).alias("l"), F.lit(r).alias("r"))
            for l, r in merges
        ]
    )
    return F.aggregate(
        mlit,
        syms,
        lambda acc, m: F.aggregate(
            acc,
            F.array().cast("array<string>"),
            lambda a, s: F.when(
                (F.size(a) > 0)
                & (F.element_at(a, -1) == m["l"])
                & (s == m["r"]),
                F.concat(
                    F.slice(a, 1, F.size(a) - 1),
                    F.array(F.concat(m["l"], m["r"])),
                ),
            ).otherwise(F.concat(a, F.array(s))),
        ),
    )


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """The one corpus-sized pass: (word, count) vocabulary."""
    from .dedup import tokenize

    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _train_merges_local(
    words: list[tuple[str, int]], num_merges: int
) -> tuple[list[tuple[str, str]], dict[str, list[str]]]:
    """The merge loop over a DRIVER-LOCAL (word, count) vocabulary —
    byte-identical semantics to the distributed iterations (same pair
    stats, same (count desc, pair asc) total-order argmax, same n >= 2
    stop, same greedy left-to-right fold).

    Returns (merges, final_syms): the loop maintains every word's final
    symbol sequence anyway, so it is returned alongside the merges —
    re-deriving it distributed as a chain of ``num_merges`` fold
    expressions cost ~1.5-2 s of pure driver planning per action at
    bench scale (r15, guide §7.3: Catalyst analysis of the 30-deep
    lambda tree, zero task time)."""
    vocab = [(list(w) + [EOW], c) for w, c in words]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        left, right = best[0]
        merges.append((left, right))
        merged = left + right
        for idx, (syms, c) in enumerate(vocab):
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            vocab[idx] = (out, c)
    final_syms = {w: syms for (syms, _c), (w, _cnt) in zip(vocab, words)}
    return merges, final_syms


def train_bpe(
    df: DataFrame,
    text_col: str,
    *,
    num_merges: int = 50,
    driver_vocab_threshold: int = 200_000,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``num_merges`` BPE merges; returns (merges, vocab_df) where
    ``merges`` is the ranked [(left, right), ...] list and ``vocab_df``
    the final (word, cnt, symbols) table — the lookup that tokenizes every
    in-vocabulary word with a plain join at apply time.

    Size-adaptive execution: the iterations run over the VOCABULARY, so
    when the vocabulary fits the driver comfortably (≤
    ``driver_vocab_threshold`` rows — Sennrich's original algorithm is
    exactly this driver-local loop; a bounded collect like the A4 scalar
    contract, NOT a corpus collect), the merge loop runs locally in one
    job instead of ``num_merges`` sequential Spark jobs whose cost is
    pure scheduling (measured ~8 s → ~1.5 s at bench scale). Larger
    vocabularies take the distributed per-iteration path; BOTH paths are
    pinned byte-identical (tests/test_bpe.py trains each way on the same
    corpus), and either way the final symbol table is rebuilt
    distributed, so apply-time tokenization never depends on the
    training path. Set the threshold to 0 to force distributed
    iterations."""
    vocab = word_vocab(df, text_col).withColumn(
        "syms", _chars_with_eow(F.col("word"))
    )
    vocab = vocab.localCheckpoint(eager=False)

    n_vocab = vocab.count()
    if n_vocab <= driver_vocab_threshold:
        rows = vocab.select("word", "cnt").collect()
        pairs = [(r["word"], int(r["cnt"])) for r in rows]
        merges, final_syms = _train_merges_local(pairs, num_merges)
        # The trainer already holds every word's final symbols: ship them
        # back as a local relation instead of re-deriving them with a
        # num_merges-deep fold-expression chain whose Catalyst analysis
        # cost ~1.5-2 s of driver time PER ACTION at bench scale (r15,
        # guide §7.3 "planning time itself can become the bottleneck").
        # Bounded driver data: the vocabulary was already collected above.
        table = df.sparkSession.createDataFrame(
            [(w, c, final_syms[w]) for w, c in pairs],
            "word string, cnt long, syms array<string>",
        )
        # A local relation has no size stats, so the apply-time join would
        # plan as a shuffle; this path is bounded by driver_vocab_threshold
        # rows, so broadcasting is safe by construction (guide §3.1).
        return merges, F.broadcast(table)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = vocab.select(
            "cnt",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("l"),
                            F.element_at(F.col("syms"), i + 1).alias("r"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.l"), F.asc("p.r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < 2:
            break  # no pair worth merging (count 1 gains nothing)
        left, right = best[0]["p"]["l"], best[0]["p"]["r"]
        merges.append((left, right))
        vocab = vocab.withColumn(
            "syms", _merge_fold(F.col("syms"), left, right)
        ).localCheckpoint(eager=False)
    return merges, vocab


def apply_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    *,
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """Tokenize a corpus with trained merges: (id, word_idx, pieces).

    Fast path: join against the trained ``vocab_df`` symbol table (one
    broadcast-or-shuffle join; every seen word is O(1)). Fallback (and
    the whole path when ``vocab_df`` is None): replay the merges in rank
    order as chained folds — exact same result, used for out-of-vocabulary
    words at inference time."""
    from .dedup import tokenize

    words = df.select(
        F.col(id_col),
        F.posexplode(tokenize(F.col(text_col))).alias("word_idx", "word"),
    )
    if vocab_df is not None:
        table = vocab_df.select("word", F.col("syms").alias("pieces"))
        seen = words.join(table, "word", "left")
        return seen.select(
            id_col,
            "word_idx",
            F.coalesce("pieces", _merge_replay(F.col("word"), merges)).alias(
                "pieces"
            ),
        )
    return words.select(
        id_col, "word_idx", _merge_replay(F.col("word"), merges).alias("pieces")
    )
