"""Text-analysis operators for training-data pipelines: token statistics,
quality scoring, language identification, document fingerprinting.

All built-in-function compositions (split/filter/aggregate/regexp) — zero
Python UDFs, so every operator stays inside whole-stage codegen and scales
linearly with input bytes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .dedup import bind_once, tokenize

# Minimal per-language stopword lists for the n-gram/stopword-overlap
# language heuristic. Deliberately tiny & deterministic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "es": ["el", "la", "de", "y", "es", "un", "una", "que", "en", "los"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "que", "dans", "les"],
}


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics: counts, distinct ratio, mean token
    length, stopword ratio (en), punctuation density."""
    toks = tokenize(F.col(text_col))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_tokens = F.size(toks)
    stats = df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        (
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
            / F.greatest(n_tokens, F.lit(1))
        ).alias("avg_token_len"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(en_stop, F.lower(t))))
            / F.greatest(n_tokens, F.lit(1)).cast("double")
        ).alias("stopword_ratio"),
        (
            F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
            / F.greatest(F.length(F.col(text_col)), F.lit(1)).cast("double")
        ).alias("punct_ratio"),
    )
    return stats


def quality_score(stats: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: favors mid-length docs, lexical
    diversity, low punctuation noise (Gopher/C4-style rule-of-thumb filters
    re-expressed as a scalar)."""
    length_ok = F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0).otherwise(0.3)
    diversity = F.least(
        F.col("n_distinct_tokens") / F.greatest(F.col("n_tokens"), F.lit(1)) * 2.0, F.lit(1.0)
    )
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.4)
    avg_len_ok = F.when((F.col("avg_token_len") >= 2.0) & (F.col("avg_token_len") <= 12.0), 1.0).otherwise(
        0.5
    )
    return stats.withColumn(
        "quality", (length_ok * 0.3 + diversity * 0.3 + punct_ok * 0.2 + avg_len_ok * 0.2)
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-overlap language ID: argmax over per-language stopword hit
    counts; 'und' (undetermined) when nothing matches. Deterministic
    tie-break by language code order."""
    toks = F.transform(tokenize(F.col(text_col)), lambda t: F.lower(t))
    scores = []
    for lang in sorted(STOPWORDS):
        stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("predicted_lang"),
        best["hits"].alias("stopword_hits"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, *, hash_fn: str = "xx") -> DataFrame:
    """Document fingerprint: hash of the token stream (content-defined,
    whitespace-insensitive), plus a winnowing-style min-hash over 5-gram
    rolling windows for robust partial-overlap detection.

    ``hash_fn='xx'`` → xxhash64 (fastest, 64-bit). ``'md5'`` → md5_60bit,
    reproducible in DuckDB SQL so the declared ``fingerprint`` query is
    fully oracled (same values, independent engine)."""
    from .dedup import md5_60bit, word_shingles

    h = F.xxhash64 if hash_fn == "xx" else md5_60bit
    toks = tokenize(F.col(text_col))
    grams = word_shingles(toks, 5)
    return df.select(
        F.col(id_col),
        h(F.array_join(toks, " ")).alias("content_hash"),
        F.array_min(F.transform(grams, lambda g: h(g))).alias("min_gram_hash"),
    )


def tf_idf_top_terms(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 5
) -> DataFrame:
    """Top-k TF-IDF terms per document (smoothed idf = ln((N+1)/(df+1)) + 1).

    Shape for scale: one shuffle to (doc, term) counts with map-side partial
    aggregation, one slim shuffle on term for document frequency (8-byte key
    + count), corpus size as a broadcast one-row join — no driver collect.
    The per-doc top-k window re-uses the (doc, term) partitioning. Ranking
    orders on the ROUNDED score (6 dp) with a term tie-break so the order is
    reproducible across engines and runs.
    """
    from pyspark.sql.window import Window

    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    ).select("doc_id", F.lower("term").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.countDistinct(id_col).alias("n_docs"))
    tfidf = F.round(
        F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn("tfidf", tfidf)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token-window chunks (context-window
    prep: chunk k covers tokens [k*step, k*step + chunk_tokens) with
    step = chunk_tokens - overlap; the tail chunk is short, empty docs emit
    no chunks).

    Map-only: tokenize → explode the start offsets → slice. No shuffle at
    all — chunking 100 TB is a pure scan whose output partitioning follows
    the input, which is exactly what the downstream embed/tokenize stage
    wants.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokenize(F.col(text_col))
    exploded = (
        df.select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") > 0)
        .select(
            F.col(id_col),
            "_t",
            F.explode(
                F.sequence(F.lit(0), F.size("_t") - 1, F.lit(step))
            ).alias("_s"),
        )
    )
    chunk = F.slice(F.col("_t"), F.col("_s") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        (F.col("_s") / step).cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition metrics per document (the Gopher-style duplicate-n-gram
    filters): 2-gram count, distinct ratio, and the fraction held by the
    single most repeated 2-gram. Low distinct ratio / high top fraction
    flags boilerplate and degenerate repetition.

    Explode + two-level aggregation (map-side combine on (doc, gram), then
    per-doc rollup) — the scalable shape for per-group top counts; docs
    with fewer than two tokens have no 2-grams and emit no row.
    """
    from .dedup import bind_once

    def raw_2grams(toks: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        )
        return F.when(F.size(toks) >= 2, grams).otherwise(
            F.array().cast("array<string>")
        )

    grams = df.select(
        F.col(id_col),
        F.explode(bind_once(tokenize(F.col(text_col)), raw_2grams)).alias("g"),
    )
    counts = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt")
    return counts.groupBy(id_col).agg(
        total.cast("long").alias("n_2grams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_2grams"),
        F.round(F.count(F.lit(1)) / total.cast("double"), 6).alias("distinct_ratio"),
        F.round(F.max("cnt") / total.cast("double"), 6).alias("top_2gram_frac"),
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    block_tokens: int = 20,
) -> DataFrame:
    """Corpus-wide block-level dedup (the CCNet/RefinedWeb line-dedup recipe
    adapted to token blocks): split every document into non-overlapping
    ``block_tokens``-token blocks, drop each block's repeat occurrences
    corpus-wide (first occurrence by (doc_id, block_idx) order wins), and
    reassemble the surviving text per document.

    Boilerplate (headers, navigation, license blurbs) repeats across
    documents verbatim while full documents differ — block-level dedup
    removes it where document-level dedup cannot. Shape: one explode
    (map-side), ONE shuffle keyed by block text for the first-occurrence
    window, one groupBy doc to reassemble. Block text itself is the shuffle
    key only once; at 100 TB swap the key for xxhash64(block) + verify,
    the same slim-shuffle trade exact_dedup makes.

    Returns (id, text, n_blocks, n_kept): text is the deduped document
    (empty string when every block was a repeat).
    """
    from pyspark.sql import Window

    toks = tokenize(F.col(text_col))
    blocks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.size(toks) + block_tokens - 1) / block_tokens - 1, F.lit(0)
                    ).cast("int"),
                ),
                lambda b: F.array_join(
                    F.slice(toks, b * block_tokens + 1, block_tokens), " "
                ),
            )
        ).alias("idx", "block"),
    ).filter(F.col("block") != "")
    w = Window.partitionBy("block").orderBy("doc", "idx")
    kept = blocks.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    rebuilt = kept.groupBy("doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "block"))),
                lambda s: s["block"],
            ),
            " ",
        ).alias("_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = blocks.groupBy("doc").agg(F.count(F.lit(1)).alias("n_blocks"))
    return (
        totals.join(rebuilt, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("_text", F.lit("")).alias(text_col),
            "n_blocks",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


# GPT-2-style pre-tokenizer classes, portable across Java regex and RE2:
# letter runs, digit runs, single punctuation marks. Both engines resolve
# the alternation leftmost-first, so piece boundaries agree exactly.
PIECE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_estimate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chars_per_subword: int = 4,
) -> DataFrame:
    """Tokenizer-free BPE token-count estimate — the budgeting statistic
    every LM-training pipeline needs before a real tokenizer is in the
    loop (sequence packing, per-doc cost caps, corpus token accounting).

    Two counters per document, both map-only (zero shuffle at any scale):

    - ``n_ws_tokens``: whitespace tokens (the coarse count);
    - ``n_pieces`` / ``est_subwords``: pre-tokenizer pieces under the
      GPT-2-ish class regex (letter runs / digit runs / punctuation), each
      piece contributing ⌈len/chars_per_subword⌉ subwords — the ~4
      chars-per-token heuristic published for BPE vocabularies on English
      text, exact for short pieces, conservative for long rare words.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(PIECE_PATTERN), 0)
    return df.select(
        F.col(id_col),
        F.size(tokenize(F.col(text_col))).cast("long").alias("n_ws_tokens"),
        F.size(pieces).cast("long").alias("n_pieces"),
        bind_once(
            pieces,
            lambda ps: F.aggregate(
                ps,
                F.lit(0).cast("long"),
                lambda acc, p: acc
                + F.ceil(F.length(p) / F.lit(float(chars_per_subword))).cast("long"),
            ),
        ).alias("est_subwords"),
    )


def train_val_split(
    df: DataFrame,
    id_col: str,
    *,
    val_fraction: float = 0.01,
    seed: int = 42,
    buckets: int = 10_000,
    hash_fn: str = "xx",
) -> DataFrame:
    """Deterministic train/validation assignment by key hash — the split
    every training pipeline needs to be reproducible across reruns, engines
    and partitionings (``rand()`` is none of those: it changes under task
    retry and repartitioning).

    ``pmod(hash(id, seed), buckets) < val_fraction*buckets`` → val.
    Map-only (zero shuffle), stable under any execution plan, and the same
    expression is one line of SQL for downstream systems to replicate.
    ``hash_fn='xx'`` (default) uses xxhash64 — the scale path; ``'md5'``
    uses the md5-derived 60-bit hash both Spark and DuckDB compute
    identically (the cross-engine-oracle variant, same trick as
    simhash/fingerprint). Adds a ``split`` column ('train' | 'val').

    Leakage note: pass a GROUP key (domain, author, conversation id) as
    ``id_col`` to make the split group-aware — every row of a group lands
    in the same side, so near-duplicate family members can't straddle the
    train/val boundary and inflate eval (`group_split` query pins this).
    """
    from .dedup import md5_60bit

    cut = int(val_fraction * buckets)
    if hash_fn == "xx":
        h = F.xxhash64(F.col(id_col), F.lit(seed))
    else:
        h = md5_60bit(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
    bucket = F.pmod(h, F.lit(buckets))
    return df.withColumn(
        "split", F.when(bucket < cut, F.lit("val")).otherwise(F.lit("train"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    budget: int = 2048,
    shards: int = 64,
    hash_fn: str = "xx",
) -> DataFrame:
    """Assign documents to fixed-token-budget training packs (sequence
    packing): documents are sharded by id hash, ordered within their shard,
    and cut into packs at budget-aligned prefix-sum offsets — the
    streaming-concat packing used to fill LM context windows, without
    cross-document shuffles.

    Packing rule (offset-bucket, a pure window expression): a document
    belongs to pack ``floor(preceding_cumsum / budget)`` of its shard, so
    every pack's START offset is budget-aligned and a pack overflows by at
    most its last document (the straddling doc — downstream tokenizers
    truncate or roll it, standard practice). True reset-after-cut greedy
    needs sequential accumulation and is deliberately not used: it is not
    expressible as a window and would force per-shard iteration.

    Shape: token counts are map-side; the only shuffle is the per-shard
    window sort (shards bound partition width, so sort memory per task is
    corpus/shards — pick shards ≈ cluster cores at scale). Returns (id,
    shard, n_tokens, pack_id, pack_pos).
    """
    from pyspark.sql import Window

    from .dedup import md5_60bit

    shard_hash = (
        F.xxhash64(F.col(id_col))
        if hash_fn == "xx"
        else md5_60bit(F.col(id_col).cast("string"))
    )
    n_tokens = F.size(tokenize(F.col(text_col)))
    sharded = df.select(
        F.col(id_col),
        F.pmod(shard_hash, F.lit(shards)).cast("int").alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    cum = F.sum("n_tokens").over(w)
    pack_in_shard = F.floor((cum - F.col("n_tokens")) / budget)
    wp = Window.partitionBy("shard", "pack_id").orderBy(id_col)
    return (
        sharded.withColumn("pack_id", pack_in_shard.cast("long"))
        .withColumn("pack_pos", F.row_number().over(wp) - 1)
    )


def global_shuffle(
    df: DataFrame,
    id_col: str,
    *,
    seed: int = 42,
    n_shards: int = 1024,
    hash_fn: str = "xx",
) -> DataFrame:
    """Deterministic global corpus shuffle — the randomize-before-training
    pass (and re-shuffle between epochs via ``seed``): every row gets a
    pseudo-random but reproducible (shard, pos) coordinate, identical
    across reruns, task retries, engines and input partitionings
    (``df.orderBy(rand())`` is none of those).

    shuffle_key = hash(id, seed); shard = pmod(key, n_shards);
    pos = row_number within shard ordered by (key, id).

    Scale shape: key/shard are map-only; the per-shard position is a window
    sort PER SHARD, so parallelism = n_shards and the largest sort is
    corpus/n_shards rows — size n_shards so a shard fits an executor
    (n_shards=1024 at 100 TB → ~100 GB spill-friendly sorts; raise it, the
    hash keeps every shard balanced to within sampling noise). A writer
    that only needs shard files in key order can skip the window entirely:
    ``repartitionByRange('shard','shuffle_key').sortWithinPartitions(...)``
    and positions are implicit in file order.

    ``hash_fn='xx'`` (xxhash64) is the scale path; ``'md5'`` is the
    cross-engine-oracle variant (same convention as ``train_val_split``).
    """
    from pyspark.sql.window import Window

    from .dedup import md5_60bit

    if hash_fn == "xx":
        key = F.xxhash64(F.col(id_col), F.lit(seed))
    else:
        key = md5_60bit(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
    keyed = df.withColumn("shuffle_key", key).withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return keyed.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))


def perplexity_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    reference: DataFrame | None = None,
    ref_text_col: str | None = None,
    n_buckets: int = 3,
    bucket_thresholds: list[float] | None = None,
) -> DataFrame:
    """CCNet-style language-model quality filtering (Wenzek et al.,
    LREC'20): score every document by the log-likelihood of a bigram LM
    trained on a reference corpus, then split the corpus into quality
    buckets (CCNet's head/middle/tail keeps bucket 1 and discards the
    tail). Documents that read like the reference score high; gibberish,
    boilerplate and wrong-language text score low.

    Model: add-one-smoothed bigram LM, P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V).
    Training is two integer count aggregations over the reference; scoring
    joins each document's bigrams against the count tables (no broadcast
    hint — the LM size is corpus-dependent, AQE decides) and averages the
    per-bigram log10 probabilities.

    Cross-engine determinism: counts and V are exact integers, the
    probability ratio is one exact-integer division in IEEE double, and
    each per-bigram log10 is ROUNDed to 6 decimals then summed as
    DECIMAL(28,6) — decimal addition is exact and order-independent, so
    the float non-associativity of a double SUM over an arbitrary join
    order never reaches the result (same trick as the engine's money
    sums). Buckets come from NTILE over (avg_logp10, id) — a total order,
    so bucketing is deterministic too.

    Returns (id, n_bigrams, sum_logp10, avg_logp10, bucket) — bucket 1 is
    the most reference-like (head), ``n_buckets`` the tail. Docs with < 2
    tokens have no bigrams and go to the tail with NULL scores.

    Bucketing has two paths. Default (exact NTILE) materializes a GLOBAL
    window — right for report/oracle-sized outputs, wrong at corpus scale
    (one task sorts every score). At scale pass ``bucket_thresholds`` —
    descending score cut points, in practice percentiles of a sample or a
    ``percentile_approx`` pass over the slim score table (CCNet itself
    thresholds from a sample) — and bucketing becomes a map-side CASE:
    bucket k = first k with score >= thresholds[k-1], else the tail.
    """
    from pyspark.sql.window import Window

    from .dedup import tokenize

    ref = reference if reference is not None else df
    rcol = ref_text_col or text_col

    def bigram_rows(frame: DataFrame, keep_id: bool) -> DataFrame:
        toks = tokenize(F.col(rcol if not keep_id else text_col))
        pairs = bind_once(
            toks,
            lambda t: F.when(
                F.size(t) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - 1),
                    lambda i: F.struct(
                        F.element_at(t, i).alias("w1"),
                        F.element_at(t, i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
        )
        cols = [F.col(id_col)] if keep_id else []
        return frame.select(*cols, F.explode(pairs).alias("bg")).select(
            *([id_col] if keep_id else []),
            F.col("bg.w1").alias("w1"),
            F.col("bg.w2").alias("w2"),
        )

    ref_bg = bigram_rows(ref, keep_id=False)
    c2 = ref_bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = ref_bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = ref.select(F.explode(tokenize(F.col(rcol))).alias("w")).distinct().count()
    if vocab == 0:
        # loud, not a divide-by-zero mid-job: an empty reference means the
        # upstream quality gate dropped everything
        raise ValueError("perplexity_scores: reference corpus has no tokens")

    doc_bg = bigram_rows(df, keep_id=True)
    term = (
        doc_bg.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .select(
            F.col(id_col),
            F.round(
                F.log10(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + vocab).cast("double")
                ),
                6,
            )
            .cast("decimal(28,6)")
            .alias("logp"),
        )
    )
    scored = term.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("logp").cast("decimal(28,6)").alias("sum_logp10"),
    )
    out = (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "sum_logp10",
            # avg in EXACT integer micro-units: double ROUND(x, 6) lands on
            # half-boundaries whose tie-breaking differs between engines
            # (observed: -66.831583/46). sum*1e6 is an exact integer
            # (decimal scale 6); truncating division on the positive
            # magnitude is engine-agnostic (DIV truncates toward zero,
            # // floors — they agree on positives only).
            (
                -F.expr("(-CAST(sum_logp10 * 1000000 AS BIGINT)) DIV n_bigrams")
            ).alias("avg_micro"),
        )
    )
    out = out.withColumn(
        # exact-integer / 1e6 is one correctly-rounded IEEE division —
        # bit-identical across engines, no decimal-rounding step involved
        "avg_logp10",
        F.col("avg_micro").cast("double") / F.lit(1000000.0),
    )
    if bucket_thresholds is not None:
        bucket = F.lit(len(bucket_thresholds) + 1)  # tail (incl. NULL scores)
        for k in range(len(bucket_thresholds), 0, -1):
            bucket = F.when(
                F.col("avg_logp10") >= F.lit(bucket_thresholds[k - 1]), F.lit(k)
            ).otherwise(bucket)
        return out.drop("avg_micro").withColumn("bucket", bucket.cast("int"))
    # order by the exact integer, not the double — identical total order on
    # both engines by construction
    w = Window.orderBy(F.desc_nulls_last("avg_micro"), F.col(id_col))
    return out.withColumn("bucket", F.ntile(n_buckets).over(w)).drop("avg_micro")


def assign_row_ids(
    df: DataFrame,
    order_cols: list[str],
    *,
    n_partitions: int | None = None,
    id_col: str = "row_id",
) -> DataFrame:
    """Contiguous global row ids 0..n-1 in ``order_cols`` order — the
    example-numbering step before sharded training output (the
    ``zipWithIndex`` pattern, DataFrame-native).

    A naive ``row_number() OVER (ORDER BY ...)`` sorts EVERYTHING in one
    task. This is the two-phase scale recipe instead:

    1. range-partition + sort within partitions on the order key (the
       ordinary distributed sort — every partition holds a disjoint key
       range, in order);
    2. pin partition ids (``localCheckpoint`` — pids must not be
       recomputed differently between the two uses), count rows per
       partition (#partitions rows to the driver — bounded planning
       data), prefix-sum the offsets, broadcast them back;
    3. id = partition offset + (row_number within partition) - 1.

    Provided ``order_cols`` is a TOTAL order (include a unique tie-break
    column), the result equals the naive global ROW_NUMBER exactly —
    range boundaries only decide WHERE the work happens, never the ids —
    which is what the DuckDB oracle checks.
    """
    from pyspark.sql.window import Window

    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    sorted_df = (
        df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = sorted_df.groupBy("_pid").count().orderBy("_pid").collect()
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_pid"], acc))
        acc += r["count"]
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _offset long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        sorted_df.join(F.broadcast(off_df), "_pid")
        .withColumn(
            id_col, (F.col("_offset") + F.row_number().over(w) - 1).cast("long")
        )
        .drop("_pid", "_offset")
    )


def normalize_unicode(
    df: DataFrame, cols: list[str], *, form: str = "NFC"
) -> DataFrame:
    """Unicode-normalize string columns in place (NFC/NFD/NFKC/NFKD) —
    the preprocessing step that makes byte-level dedup keys honest: 'é'
    as one code point and as 'e'+combining-acute are the SAME text but
    different bytes, so exact/paragraph/substring dedup silently misses
    such pairs (and crawled corpora mix both encodings freely). NFKC
    additionally folds compatibility forms (ligatures, full-width) — the
    usual choice before tokenizer training.

    Spark has no built-in normalization function, making this one of the
    engine's documented built-ins-can't Python boundaries: a vectorized
    Arrow ``pandas_udf`` over pandas' ``str.normalize`` (C-accelerated
    unicodedata underneath), map-only, zero shuffle, NULL-preserving.
    The NFC path is cross-engine-oracled against DuckDB's
    ``nfc_normalize`` (`unicode_normalize` query).
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    out = df
    for c in cols:
        out = out.withColumn(c, _norm(F.col(c)))
    return out


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Top collocations by pointwise mutual information — the corpus
    statistic behind phrase detection / tokenizer-merge candidates /
    word2vec-style preprocessing: bigrams whose joint frequency beats
    what their unigram frequencies predict.

        pmi(x,y) = ln( P(x,y) / (P(x)·P(y)) )
                 = ln( c_xy · N² / (B · c_x · c_y) )

    with c over the corpus, N total tokens, B total bigrams — computed
    as ONE log of a ratio of exact integer counts, so the value is an
    identical IEEE chain cross-engine. ``min_count`` suppresses the
    classic PMI pathology (hapax pairs score highest); ranking orders on
    the ROUNDED pmi (6 dp) with a (w1, w2) tie-break — reproducible.

    Shape: two map-side-combined count aggregations (tokens never leave
    their partition un-reduced), two slim joins of count tables, a 1-row
    totals broadcast, and a global top-n (TakeOrderedAndProject — no full
    sort materializes).
    """
    toks = F.transform(tokenize(F.col(text_col)), lambda t: F.lower(t))
    base = df.select(F.col(id_col).alias("doc"), toks.alias("_t"))
    uni = (
        base.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    bi = (
        base.filter(F.size("_t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_t) - 1), "
                    "i -> struct(_t[i-1] AS w1, _t[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .filter(F.col("cxy") >= min_count)
    )
    totals = uni.agg(
        F.sum("cw").alias("_N")
    ).crossJoin(
        base.select(
            F.greatest(F.size("_t") - 1, F.lit(0)).alias("_nb")
        ).agg(F.sum("_nb").alias("_B"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    pmi = F.round(
        F.log(
            F.col("cxy").cast("double") * F.col("_N") * F.col("_N")
            / (F.col("_B") * F.col("c1") * F.col("c2"))
        ),
        6,
    )
    scored = (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select("w1", "w2", "cxy", pmi.alias("pmi"))
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("w1"), F.asc("w2")
    ).limit(top_n)


def bm25_rank(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
) -> DataFrame:
    """BM25 ranking of the corpus against a term query — full-text search
    as three aggregations, no index service needed (and the scoring
    recipe an offline index build would precompute anyway):

        score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
                            (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
        idf(t)   = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

    (the Robertson/Sparck-Jones Okapi form with the +1 floor that keeps
    idf positive). All inputs are exact integer counts (tf, df, N, |d|)
    — the double chain is identical cross-engine; ranking orders on the
    ROUNDED score (6 dp) with an id tie-break.

    Shape: term filter BEFORE the tf aggregation (only query-term rows
    shuffle — the corpus-sized explode never leaves its partition
    unfiltered), slim df/doclen joins, one broadcast of the ≤|terms|
    stats, TakeOrderedAndProject top-n. Documents matching no term score
    0 and are excluded.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    toks = F.transform(tokenize(F.col(text_col)), lambda t: F.lower(t))
    base = df.select(F.col(id_col).alias("doc"), toks.alias("_t"))
    base = base.select("doc", "_t", F.size("_t").alias("dl"))

    n_total = base.agg(
        F.count(F.lit(1)).alias("_N"), F.avg("dl").alias("_avgdl")
    )
    hits = (
        base.select("doc", "dl", F.explode("_t").alias("w"))
        .filter(F.col("w").isin(terms))
        .groupBy("doc", "dl", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = hits.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(n_total))
        .select(
            "doc",
            (
                F.log(
                    (F.col("_N") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy("doc")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
    )
    return (
        scored.select(F.col("doc").alias(id_col), "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_n)
    )
