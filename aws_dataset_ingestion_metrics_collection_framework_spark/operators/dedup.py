"""Deduplication operators for large-scale training-data pipelines.

Beyond reference parity (BASELINE.json north star): exact dedup,
MinHash+LSH near-dup, SimHash, and n-gram Jaccard — all expressed with
built-in JVM-side functions (no Python UDFs anywhere):

- **exact**: hash-groupBy — one shuffle keyed on the content hash; at
  100 TB shuffle only (id, hash) pairs, not the payloads.
- **MinHash+LSH**: shingle → xxhash64 once per shingle → 64 universal-hash
  permutations via literal (a,b) parameter arrays and higher-order
  ``transform``/``array_min`` (O(shingles) hash work, not O(shingles×perms)
  hashing) → banding → explode (band, bucket) → self-join within buckets →
  exact-Jaccard verification of candidates only. Shuffle volume is
  O(docs × bands), independent of document length.
- **SimHash**: 64-bit signature via per-bit voting with ``zip_with``
  accumulation; near-dups = signatures within Hamming distance d, found by
  banding the signature (pigeonhole: d ≤ 3 → 4 bands of 16 bits, at least
  one band equal).
- **n-gram Jaccard**: exact pairwise similarity over word shingles via
  shingle-inverted-index self-join (the verification primitive; also usable
  standalone at moderate scale / with prefix filtering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Mersenne prime 2^31-1 for universal hashing: with a,b,h < 2^31 the product
# a*h stays < 2^62, safe under ANSI-mode 64-bit arithmetic (no overflow).
_PRIME = (1 << 31) - 1


def md5_60bit(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT.

    Cross-engine-reproducible hash: DuckDB computes the identical value as
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``, which makes operators built
    on it fully oracle-checkable (xxhash64 has no DuckDB counterpart). 15 hex
    digits = 60 bits < 2^63, so the cast never overflows. Slower than
    xxhash64 — prefer the xx variants where no oracle is required."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokenize(text: Column) -> Column:
    """Whitespace tokenization (consistent with the DuckDB oracle's
    string_split — no empty trailing tokens)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def materialize_once(df: DataFrame) -> DataFrame:
    """Materialize a slim intermediate exactly once before a self-join.

    Every sketch join in this module (MinHash buckets, SimHash bands, the
    PPJoin prefix index) is a self-join of an expensive-to-derive but
    slim-to-store table: without this, Catalyst plans the full upstream DAG
    (tokenize → shingle → hash → aggregate over the whole corpus) once PER
    SIDE — at 100 TB that is two complete corpus passes to derive the same
    few-bytes-per-doc table. ``localCheckpoint(eager=False)`` stores the
    partitions (memory-and-disk) at first materialization and both join
    sides — and every later iteration — read the stored copy.

    The trade (same one ``operators/graph.py`` makes for its iterative
    loops): lineage is truncated, so losing an executor means retrying the
    job instead of recomputing lost partitions. For signature tables of a
    few longs per document that retry is cheap; for anything
    payload-carrying, don't use this."""
    return df.localCheckpoint(eager=False)


def bind_once(col: Column, build) -> Column:
    """Evaluate ``col`` exactly once per row and pass it to ``build`` as a
    lambda variable.

    Catalyst re-evaluates expressions referenced inside higher-order-function
    lambda bodies once per element (there is no common-subexpression
    elimination through HOFs), so any non-trivial expression used inside a
    ``transform``/``aggregate`` lambda must be bound to a lambda variable
    first. Implemented as a one-element ``transform``.
    """
    return F.transform(F.array(F.struct(col.alias("v"))), lambda x: build(x["v"]))[0]


def word_shingles(tokens: Column, k: int) -> Column:
    """Distinct k-word shingles as strings; documents shorter than k words
    yield their full token string as a single shingle.

    ``tokens`` is bound once per row (bind_once) — referencing it directly in
    the per-shingle lambda would re-run the upstream tokenization regex once
    per shingle (a measured ~25× slowdown on shingle-index builds)."""

    def build(toks: Column) -> Column:
        joined = F.array_join(toks, " ")
        shingled = F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
        return F.array_distinct(
            F.when(F.size(toks) >= k, shingled).otherwise(F.array(joined))
        )

    return bind_once(tokens, build)


# ----------------------------- exact dedup -----------------------------


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one representative (min id) per identical content.

    Two-phase, so the big shuffle moves only (id, 64-bit hash) — never the
    payload — while staying EXACT under hash collisions (at billions of docs
    a 64-bit collision is probable, so hash-only grouping would silently
    merge distinct documents):

    1. Group (id, hash): hashes seen once are unique by necessity (equal
       content ⇒ equal hash) and resolve with zero content movement.
    2. Hashes seen more than once — the duplicate-candidate sliver — are
       semi-joined back against the corpus; only those rows' content
       shuffles, grouped by (hash, content) for exact equality. The hash
       stays the shuffle key; content is the equality witness.

    The semi join carries NO broadcast hint on purpose: the duplicate-hash
    set is data-dependent and unbounded (web-crawl corpora commonly run
    30-50% duplicates, far past the broadcast ceiling at 100 TB), so the
    strategy is left to AQE, which broadcasts iff the built side measures
    small at runtime.
    """
    h = F.xxhash64(*[F.col(c) for c in content_cols])
    slim = df.select(F.col(id_col), h.alias("_h"))
    by_hash = slim.groupBy("_h").agg(
        F.min(F.col(id_col)).alias(id_col),
        F.count(F.lit(1)).alias("dup_count"),
    )
    singles = by_hash.filter(F.col("dup_count") == 1).select(id_col, "dup_count")
    multi_hashes = by_hash.filter(F.col("dup_count") > 1).select("_h")
    resolved = (
        df.withColumn("_h", h)
        .join(multi_hashes, "_h", "left_semi")
        .groupBy("_h", *content_cols)
        .agg(
            F.min(F.col(id_col)).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, "dup_count")
    )
    return singles.unionByName(resolved)


def exact_dedup_stats(df: DataFrame, content_cols: list[str]) -> DataFrame:
    """Corpus-level dedup summary (total / distinct / duplicate-group counts).

    Same two-phase shape as ``exact_dedup``: hash-only counts settle the
    hashes seen once; the duplicate-candidate sliver is re-grouped by
    (hash, content) so collisions cannot inflate the duplicate counts.
    As in ``exact_dedup``, the semi join is unhinted — the duplicate-hash
    side is unbounded, so AQE picks broadcast only when it is measured
    small at runtime."""
    h = F.xxhash64(*[F.col(c) for c in content_cols])
    counts = df.select(h.alias("_h")).groupBy("_h").agg(F.count(F.lit(1)).alias("n"))
    single = counts.filter(F.col("n") == 1).agg(
        F.count(F.lit(1)).cast("long").alias("s_distinct")
    )
    multi_hashes = counts.filter(F.col("n") > 1).select("_h")
    multi_groups = (
        df.withColumn("_h", h)
        .join(multi_hashes, "_h", "left_semi")
        .groupBy("_h", *content_cols)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    multi = multi_groups.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("m_total"),
        F.count(F.lit(1)).cast("long").alias("m_distinct"),
        F.coalesce(F.sum(F.when(F.col("n") > 1, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("m_dup_groups"),
        F.coalesce(F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("m_removable"),
    )
    return single.crossJoin(multi).select(
        (F.col("s_distinct") + F.col("m_total")).alias("n_total"),
        (F.col("s_distinct") + F.col("m_distinct")).alias("n_distinct"),
        F.col("m_dup_groups").alias("n_dup_groups"),
        F.col("m_removable").alias("n_removable"),
    )


# --------------------------- MinHash + LSH ---------------------------


def _hash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic universal-hash parameters (a odd, b) — plain Python
    LCG so signatures are reproducible across runs/clusters."""
    params = []
    state = seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state | 1) % _PRIME
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _PRIME
        params.append((a, b))
    return params


def minhash_signature(shingles: Column, num_perm: int = 64, seed: int = 42) -> Column:
    """MinHash signature (array<bigint>, length num_perm) from a shingle
    array, as a single Column expression.

    NOTE: hashes the shingle array once into a materialized intermediate via
    nested ``transform``; Catalyst evaluates a HOF's *argument* expression on
    every evaluation of the HOF node, so the hash step must not sit inside
    the per-permutation lambda (it would re-hash all shingles once per
    permutation — a measured 60× slowdown). Here the per-perm lambda only
    does arithmetic over the pre-hashed array. For bulk signatures prefer
    ``minhash_signatures_df`` (explode + map-side min aggregation), which
    additionally parallelizes long documents across rows.
    """
    params = _hash_params(num_perm, seed)
    hashes = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_PRIME)))

    def sig_from(hs: Column) -> Column:
        return F.array(
            *[
                F.array_min(
                    F.transform(hs, lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_PRIME)))
                )
                for a, b in params
            ]
        )

    # single-element outer transform = evaluate `hashes` exactly once per row
    return F.transform(F.array(F.struct(hashes.alias("h"))), lambda x: sig_from(x["h"]))[0]


def minhash_signatures_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    num_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(doc, sig) signatures via explode + grouped min — the bulk/scale path.

    One xxhash64 per (doc, shingle) row, then ``num_perm`` arithmetic
    permutations per row and ``num_perm`` map-side-combinable ``min``
    aggregates. Shuffle volume is one partial-aggregate row per doc per
    partition — independent of document length — and long documents spread
    across tasks instead of serializing inside one row's expression tree.
    """
    params = _hash_params(num_perm, seed)
    exploded = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(tokenize(F.col(text_col)), k)).alias("s"),
    ).select("doc", F.pmod(F.xxhash64("s"), F.lit(_PRIME)).alias("h"))
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_PRIME))).alias(f"_m{i}")
        for i, (a, b) in enumerate(params)
    ]
    return (
        exploded.groupBy("doc")
        .agg(*aggs)
        .select("doc", F.array(*[F.col(f"_m{i}") for i in range(num_perm)]).alias("sig"))
    )


def cap_bucket_size(banded: DataFrame, keys: list[str], max_bucket_size: int | None) -> DataFrame:
    """Skew guard for LSH bucket self-joins: drop buckets with more than
    ``max_bucket_size`` members.

    A degenerate bucket (boilerplate shingles, near-constant signatures)
    turns the self-join quadratic in that bucket's size — one hot key can
    dominate the whole job at corpus scale. Members of a capped bucket still
    pair up through their other bands/tables, so recall degrades gracefully
    rather than the job skewing. ``None`` disables (exact candidate
    semantics).
    """
    if max_bucket_size is None:
        return banded
    counts = banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    return (
        banded.join(F.broadcast(counts.filter(F.col("_n") > max_bucket_size)), keys, "left_anti")
    )


def band_signatures(sigs: DataFrame, *, bands: int, rows_per_band: int) -> DataFrame:
    """(doc, band, bucket) rows from a (doc, sig) signature table: each
    band's slice of the signature hashed to a 64-bit bucket key. Shared by
    the self-join candidate path and the cross-corpus incremental path —
    both sides of any band join MUST come from the same seed/bands config
    for buckets to be comparable."""
    return sigs.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b): documents sharing ≥1 MinHash band.

    rows-per-band = num_perm // bands; candidate probability for Jaccard s is
    1-(1-s^r)^b. Shuffle = docs × bands rows of (band_idx, band_hash).
    ``max_bucket_size`` bounds per-bucket join blowup (cap_bucket_size).
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures_df(
        df, id_col, text_col, k=k, num_perm=num_perm, seed=seed
    )
    banded = materialize_once(
        cap_bucket_size(
            band_signatures(sigs, bands=bands, rows_per_band=rows_per_band),
            ["band", "bucket"],
            max_bucket_size,
        )
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs only (the cheap
    post-LSH verification — candidates ≪ all pairs).

    The corpus is first pruned to documents that actually appear in a
    candidate pair (semi-join on the id union): shingling is the expensive
    step, and candidates cover a vanishing fraction of a deduplicated
    corpus — without the prune, verification re-shingles all 100 TB twice
    (once per join side)."""
    candidates = materialize_once(candidates)  # referenced twice below
    cand_ids = (
        candidates.select(F.col("id_a").alias("_cid"))
        .union(candidates.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    pruned = df.join(cand_ids, df[id_col] == cand_ids["_cid"], "left_semi")
    # store the pruned shingle table once: the two join sides key on
    # different columns (id_a vs id_b), so their exchanges differ and
    # Catalyst would otherwise run the prune + shingle chain per side
    sh = materialize_once(
        pruned.select(
            F.col(id_col).alias("doc"),
            word_shingles(tokenize(F.col(text_col)), k).alias("sh"),
        )
    )
    a = sh.alias("a")
    b = sh.alias("b")
    joined = (
        candidates.join(a, candidates["id_a"] == F.col("a.doc"))
        .join(b, candidates["id_b"] == F.col("b.doc"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("a.sh", "b.sh")).alias("inter"),
            F.size("a.sh").alias("na"),
            F.size("b.sh").alias("nb"),
        )
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return joined.withColumn("jaccard", jac).filter(jac >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates → exact verification."""
    cands = minhash_candidates(
        df, id_col, text_col, k=k, num_perm=num_perm, bands=bands, seed=seed,
        max_bucket_size=max_bucket_size,
    )
    return jaccard_verify(df, cands, id_col, text_col, k=k, threshold=threshold)


# ------------------------------ SimHash ------------------------------


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array, entirely JVM-side.

    Per-bit vote: each token hash contributes +1/-1 per bit (``getbit``); the
    signature sets bits with positive vote sums. The 64 bit positions are
    compile-time constants, so this unrolls into 64 ``aggregate`` expressions
    over the (hashed-once) token array — wide but codegen-friendly.
    """
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def _sig_from(hs: Column) -> Column:
        sig = F.lit(0).cast("long")
        for i in range(64):
            vote = F.aggregate(
                hs,
                F.lit(0).cast("long"),
                lambda acc, h: acc + (F.getbit(h, F.lit(i)).cast("long") * 2 - 1),
            )
            bit_val = (1 << i) if i < 63 else -(1 << 63)  # sign bit of a signed long
            sig = sig.bitwiseOR(
                F.when(vote > 0, F.lit(bit_val).cast("long")).otherwise(F.lit(0).cast("long"))
            )
        return sig

    # hash once per row: HOF argument expressions re-evaluate per HOF node,
    # so the 64 per-bit aggregates must reference a lambda variable, not the
    # token-hashing transform itself (same pitfall as minhash_signature).
    return F.transform(F.array(F.struct(hashes.alias("h"))), lambda x: _sig_from(x["h"]))[0]


def simhash_signatures_df(
    df: DataFrame, id_col: str, text_col: str, *, hash_fn: str = "xx"
) -> DataFrame:
    """(doc, sig) SimHash signatures via explode + grouped per-bit votes —
    the bulk/scale path (nbits map-side-combinable SUM aggregates; shuffle
    independent of document length).

    ``hash_fn='xx'`` → 64-bit xxhash64 signature (fastest): tokens hash
    per instance, map-side — xxhash64 is cheaper than any rearrangement.
    ``'md5'`` → a 60-bit signature from md5_60bit, bit-for-bit reproducible
    in DuckDB SQL (what makes ``simhash_pairs`` fully oracled); md5's
    hex+conv cost is high enough that tokens are first grouped to DISTINCT
    (doc, token) with occurrence counts, so the hash runs once per distinct
    token and votes weight by count — Σ_instances bit±1 ≡
    Σ_distinct count·(bit±1), identical math, identical oracle. Natural
    text repeats tokens (Zipf), so the md5 path trades one (doc, token)
    pre-aggregation shuffle for a 2-5× cut in hash CPU."""
    nbits = 64 if hash_fn == "xx" else 60
    token_hash = F.xxhash64("t") if hash_fn == "xx" else md5_60bit(F.col("t"))
    exploded = df.select(
        F.col(id_col).alias("doc"), F.explode(tokenize(F.col(text_col))).alias("t")
    )
    if hash_fn == "md5":
        toks = (
            exploded.groupBy("doc", "t")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("doc", token_hash.alias("h"), "n")
        )
    else:
        toks = exploded.select("doc", token_hash.alias("h"), F.lit(1).alias("n"))
    votes = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.col("n") * (F.getbit(F.col("h"), F.lit(i)).cast("long") * 2 - 1)
            ).alias(f"_v{i}")
            for i in range(nbits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(nbits):
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        sig = sig.bitwiseOR(
            F.when(F.col(f"_v{i}") > 0, F.lit(bit_val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return votes.select("doc", sig.alias("sig"))


def hamming_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    *,
    max_hamming: int,
    nbits: int = 64,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """All pairs of 64-bit-signature rows within Hamming distance
    ``max_hamming`` — the generic banded join behind SimHash text dedup
    AND perceptual-hash (pHash) image dedup.

    Pigeonhole banding: split the signature into d+1 blocks; any pair
    within distance d agrees exactly on ≥1 block → join on (block_idx,
    block_value), verify Hamming via bit_count(xor). (The pigeonhole holds
    even when nbits isn't divisible by d+1: the blocks are disjoint, so ≤ d
    differing bits leave at least one block untouched.) Returns
    (id_a, id_b, hamming) with id_a < id_b.
    """
    blocks = max_hamming + 1
    # Cap width at 63: a 64-bit mask literal overflows Java's signed long
    # (d=0 would ask for one full-width block). Bits beyond blocks*width are
    # simply uncovered — the pigeonhole still holds (≤ d differing bits
    # leave ≥1 of the d+1 disjoint blocks untouched, wherever the
    # differences fall), and the bit_count verification filter is exact.
    width = min(max(nbits // blocks, 1), 63)
    base = sigs.select(F.col(id_col).alias("doc"), F.col(sig_col).alias("sig"))
    block_structs = [
        F.struct(
            F.lit(b).alias("block"),
            F.shiftright(F.col("sig"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("bval"),
        )
        for b in range(blocks)
    ]
    banded = base.select(
        "doc", "sig", F.explode(F.array(*block_structs)).alias("bb")
    ).select("doc", "sig", F.col("bb.block").alias("block"), F.col("bb.bval").alias("bval"))
    banded = materialize_once(cap_bucket_size(banded, ["block", "bval"], max_bucket_size))
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            F.bit_count(F.col("l.sig").bitwiseXOR(F.col("r.sig"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    hash_fn: str = "xx",
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ d between SimHashes —
    :func:`simhash_signatures_df` composed with the generic
    :func:`hamming_pairs` banded join."""
    nbits = 64 if hash_fn == "xx" else 60
    sigs = simhash_signatures_df(df, id_col, text_col, hash_fn=hash_fn)
    return hamming_pairs(
        sigs, "doc", "sig",
        max_hamming=max_hamming, nbits=nbits, max_bucket_size=max_bucket_size,
    )


# ----------------------- n-gram Jaccard (exact) -----------------------


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All-pairs exact Jaccard ≥ threshold via shingle inverted index.

    Cost is Σ_shingle |posting|² join rows — fine at moderate scale or after
    frequency-capping hot shingles; prefer MinHash-LSH at 100 TB (this is
    its verification oracle).
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        word_shingles(tokenize(F.col(text_col)), k).alias("sh"),
    )
    sizes = sh.select("doc", F.size("sh").alias("n"))
    # join on the 64-bit shingle hash, not the string: the posting-list
    # shuffle/sort moves 8-byte keys instead of full shingles (collision
    # odds ~|shingles|²/2⁶⁴ — immaterial vs the shuffle-volume win)
    inv = materialize_once(
        sh.select("doc", F.explode("sh").alias("s")).select(
            "doc", F.xxhash64("s").alias("s")
        )
    )
    l, r = inv.alias("l"), inv.alias("r")
    common = (
        l.join(r, (F.col("l.s") == F.col("r.s")) & (F.col("l.doc") < F.col("r.doc")))
        .groupBy(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("jaccard", jac)
        .filter(jac >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All-pairs exact Jaccard ≥ threshold with **prefix filtering** — the
    scale path for exact similarity joins (AllPairs/PPJoin family).

    Under any global total order of shingles, two sets with Jaccard ≥ t must
    share a shingle within each other's first ``n - ceil(t·n) + 1`` shingles
    (pigeonhole on the required overlap ≥ t·max(nx,ny)); ordering by
    ascending global frequency puts the *rarest* shingles in the prefix, so
    posting lists in the index are short where it matters. On top of the
    prefix index the join applies the two classic PPJoin reductions:

    - **length filter**: Jaccard ≥ t ⇒ t·|a| ≤ |b| ≤ |a|/t — applied inside
      the join condition, pruning before any candidate row materializes;
    - **positional filter**: a prefix hit at ranks (ra, rb) bounds the
      achievable overlap by 1 + min(na-ra, nb-rb), which must reach the
      required overlap ⌈t/(1+t)·(na+nb)⌉.

    Candidates are then verified with the exact intersection — results are
    IDENTICAL to ``ngram_jaccard_pairs``, only the join volume changes
    (filtered Σ|posting|² over prefix postings instead of all postings).

    Costs one extra shuffle (global shingle frequencies) + a per-doc
    rank — worth it when posting lists are long; the plain inverted-index
    join wins on small corpora.
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        word_shingles(tokenize(F.col(text_col)), k).alias("sh"),
    )
    inv = materialize_once(
        sh.select("doc", F.explode("sh").alias("s")).select(
            "doc", F.xxhash64("s").alias("s")
        )
    )  # the single stored corpus derivative everything below reads
    # Global shingle frequency and per-doc set size both come from inv as
    # WINDOW counts (shingles are distinct per doc, so the per-doc row
    # count IS |set|): one shuffle by s, one by doc — replacing the old
    # freq-aggregate + two joins + a second full tokenize pass for sizes.
    wd = Window.partitionBy("doc")
    ranked = (
        inv.withColumn("f", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .withColumn("rn", F.row_number().over(wd.orderBy("f", "s")))
        .withColumn("n", F.count(F.lit(1)).over(wd))
        # prefix length = n - ceil(t·n) + 1
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
        .select("doc", "s", "rn", "n")
    )
    ranked = materialize_once(ranked)
    t = F.lit(threshold)
    # required overlap for Jaccard ≥ t given sizes na, nb
    min_overlap = F.ceil(t / (1 + t) * (F.col("l.n") + F.col("r.n")))
    l, r = ranked.alias("l"), ranked.alias("r")
    candidates = (
        l.join(
            r,
            (F.col("l.s") == F.col("r.s"))
            & (F.col("l.doc") < F.col("r.doc"))
            # length filter: the smaller set must reach t × the larger
            & (F.col("l.n") >= F.ceil(t * F.col("r.n")))
            & (F.col("r.n") >= F.ceil(t * F.col("l.n")))
            # positional filter: overlap upper bound from this prefix hit
            & (
                1
                + F.least(
                    F.col("l.n") - F.col("l.rn"), F.col("r.n") - F.col("r.rn")
                )
                >= min_overlap
            ),
        )
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .distinct()
    )
    return jaccard_verify(df, candidates, id_col, text_col, k=k, threshold=threshold)


# ----------------------- survivorship (golden records) -----------------------

SURVIVORSHIP_RULES = ("min", "max", "sum", "longest", "first_non_null")


def golden_records(
    df: DataFrame,
    cluster_col: str,
    id_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """Merge each duplicate cluster into ONE golden record — the
    survivorship step after near-dup clustering (`graph.
    connected_components` hands out the cluster ids; this collapses each
    cluster by per-column rules instead of keep-min-id, which throws away
    the best value of every OTHER column).

    ``rules`` maps column → rule:
    - 'min' / 'max' / 'sum': plain aggregates;
    - 'longest': the longest value, ties broken by the value itself then
      never ambiguous (max_by over (length, value));
    - 'first_non_null': the value of the smallest-`id_col` row where the
      column is non-null (NULL-keyed rows never win: the ordering key is
      NULL for them and min_by skips null keys).

    Every rule is deterministic (no Spark `first()` — its result is
    partition-order-dependent) and map-side combinable: ONE shuffle on
    the cluster key, like every aggregation in this engine. Output: one
    row per cluster: cluster_col + n_members + the ruled columns.
    """
    aggs = [F.count(F.lit(1)).alias("n_members")]
    for col, rule in rules.items():
        c = F.col(col)
        if rule == "min":
            aggs.append(F.min(c).alias(col))
        elif rule == "max":
            aggs.append(F.max(c).alias(col))
        elif rule == "sum":
            aggs.append(F.sum(c).alias(col))
        elif rule == "longest":
            aggs.append(
                F.max_by(c, F.when(c.isNotNull(), F.struct(F.length(c), c)))
                .alias(col)
            )
        elif rule == "first_non_null":
            aggs.append(
                F.min_by(c, F.when(c.isNotNull(), F.col(id_col))).alias(col)
            )
        else:
            raise ValueError(
                f"unknown survivorship rule {rule!r} for column {col!r} "
                f"(one of {SURVIVORSHIP_RULES})"
            )
    return df.groupBy(cluster_col).agg(*aggs)


# ------------------- incremental (cross-corpus) dedup -------------------


def incremental_dedup(
    new: DataFrame,
    base: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Classify an incoming batch against an EXISTING corpus: per new doc,
    ``exact_dup`` (byte-identical text in base), ``near_dup`` (Jaccard ≥
    threshold vs some base doc) or ``fresh`` — the shape ingestion
    actually needs: each day's crawl dedups against the accumulated
    corpus WITHOUT re-pairing the corpus with itself (that O(|corpus|²)
    candidate work was already paid; only new×base pairs are new).

    Exact path: a slim (xxhash64, id) join finds hash matches, then the
    matched docs' texts — only those — are compared byte-for-byte
    (collision-safe, same discipline as `exact_dedup`). Near path: MinHash
    band buckets computed per side with the SAME seed/bands (buckets are
    only comparable then — see `band_signatures`), an equi-join
    banded_new⨝banded_base, and exact Jaccard verification of candidates.

    Output: one row per new doc — (id, status, match_id, jaccard).
    ``match_id`` = smallest qualifying base id (deterministic), exact
    match preferred over near; ``jaccard`` = the reported near match's
    similarity (NULL for exact_dup/fresh). Self-duplicates WITHIN the
    batch are out of scope (run the self-join ops for that). The two id
    spaces need NOT be disjoint (r6): the verification corpus tags every
    id with its side ('n:'/'b:') before the union, so an id reused
    across sides can never cross-wire texts; tags are stripped (and the
    original id dtype restored) before the deterministic min-base-id
    pick.
    """
    nid, bid = F.col(id_col).alias("new_id"), F.col(id_col).alias("base_id")

    # exact: slim hash join, then text compare on the matched sliver only
    nh = new.select(nid, F.xxhash64(text_col).alias("_h"))
    bh = base.select(bid, F.xxhash64(text_col).alias("_h"))
    hash_pairs = materialize_once(nh.join(bh, "_h").select("new_id", "base_id"))
    nt = new.join(
        hash_pairs.select("new_id").distinct(),
        new[id_col] == F.col("new_id"), "left_semi",
    ).select(nid, F.col(text_col).alias("_tn"))
    bt = base.join(
        hash_pairs.select("base_id").distinct(),
        base[id_col] == F.col("base_id"), "left_semi",
    ).select(bid, F.col(text_col).alias("_tb"))
    # materialize_once: `exact` is consumed TWICE (near-side anti-join
    # below + final assembly) and its subtree re-scans new AND base for
    # the nt/bt semi-joins — without pinning, Catalyst pays that corpus
    # scan pair per consumer. The pinned result is one slim row per
    # exact-dup doc.
    exact = materialize_once(
        hash_pairs.join(nt, "new_id").join(bt, "base_id")
        .filter(F.col("_tn") == F.col("_tb"))
        .groupBy("new_id")
        .agg(F.min("base_id").alias("exact_match"))
    )

    # near: cross band join (new side ⨝ base side), exact Jaccard verify.
    # Docs already classified exact never need the near path (the final
    # coalesce prefers the exact match) — pruning them BEFORE signature
    # build skips the minhash work for exactly the docs ingestion dedups
    # most often, and cannot change the output.
    near_side = new.join(
        exact.select("new_id"),
        new[id_col] == F.col("new_id"), "left_anti",
    )
    rows_per_band = num_perm // bands
    # ONE signature build over the side-tagged union instead of one per
    # side: same explode + num_perm min-aggregate pass, half the stage
    # chains. The 'n:'/'b:' id prefixes (the r6 cross-wiring guard) double
    # as the side marker the band split reads back; the tag never enters
    # the signature math (only text shingles do), so the candidate set is
    # identical to the per-side builds.
    def _tag(side_df, prefix):
        return side_df.select(
            F.concat(F.lit(prefix), F.col(id_col).cast("string")).alias(id_col),
            text_col,
        )

    bands_all = materialize_once(  # read by BOTH sides of the band join
        band_signatures(
            minhash_signatures_df(
                _tag(near_side, "n:").unionByName(_tag(base, "b:")),
                id_col, text_col, k=k, num_perm=num_perm, seed=seed,
            ),
            bands=bands, rows_per_band=rows_per_band,
        )
    )
    bn = bands_all.filter(F.col("doc").startswith("n:"))
    bb = cap_bucket_size(
        bands_all.filter(F.col("doc").startswith("b:")),
        ["band", "bucket"],
        max_bucket_size,
    )
    cand_tagged = (
        bn.alias("n").join(
            bb.alias("b"),
            (F.col("n.band") == F.col("b.band"))
            & (F.col("n.bucket") == F.col("b.bucket")),
        )
        .select(F.col("n.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    # the verify corpus carries the same tags (an id reused across the
    # two corpora can never cross-wire texts)
    id_dtype = new.schema[id_col].dataType
    both = _tag(new, "n:").unionByName(_tag(base, "b:"))
    near_pairs = jaccard_verify(
        both, cand_tagged, id_col, text_col, k=k, threshold=threshold
    ).select(
        # strip tags and restore the native dtype BEFORE the min-struct
        # pick: a lexicographic min over tagged strings would reorder
        # numeric ids ("b:10" < "b:9")
        F.expr("substring(id_a, 3)").cast(id_dtype).alias("id_a"),
        F.expr("substring(id_b, 3)").cast(id_dtype).alias("id_b"),
        "jaccard",
    )
    near = (
        near_pairs.groupBy(F.col("id_a").alias("new_id"))
        .agg(
            F.min(F.struct(F.col("id_b"), F.col("jaccard"))).alias("_m")
        )
        .select(
            "new_id",
            F.col("_m.id_b").alias("near_match"),
            F.round(F.col("_m.jaccard"), 6).alias("near_jaccard"),
        )
    )

    return (
        new.select(nid)
        .join(exact, "new_id", "left")
        .join(near, "new_id", "left")
        .select(
            F.col("new_id").alias(id_col),
            F.when(F.col("exact_match").isNotNull(), F.lit("exact_dup"))
            .when(F.col("near_match").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("fresh"))
            .alias("status"),
            F.coalesce("exact_match", "near_match").alias("match_id"),
            F.when(
                F.col("exact_match").isNull(), F.col("near_jaccard")
            ).alias("jaccard"),
        )
    )


# ----------------- edit-distance (fuzzy) similarity join -----------------


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_dist`` — the fuzzy
    entity-resolution join (typo'd titles, OCR'd names, near-identical
    URLs) — WITHOUT an all-pairs comparison.

    Scale path = PassJoin segment filtering (Li/Deng/Feng, the standard
    edit-distance join): partition every indexed string into ``k+1``
    contiguous segments — at most k edits cannot touch them all
    (pigeonhole), so for any pair within distance k, at least one
    segment of one string appears VERBATIM in the other, at a start
    offset shifted by at most k. Candidates therefore come from an
    equi-join of (length, segment_idx, 64-bit substring hash): the
    index side emits k+1 segment rows per string; the probe side emits
    the ≤ (2k+1)·(k+1)·(2k+1) valid (partner length, segment, shift)
    windows. Segments are ~|s|/(k+1) characters long — long enough to
    stay selective even when the gram alphabet saturates (the earlier
    q-gram count/prefix filters measured SUPERLINEAR at the third scale
    point on a 31-word-vocabulary corpus precisely because every short
    gram was hot; 10-char segments are not).

    Strings shorter than k+1 characters cannot host k+1 nonempty
    segments and pair through a bounded length-bucket equi-join instead.
    The ``q`` parameter is retained for call compatibility and ignored
    (the segment layout depends only on ``max_dist``).

    Both filters are complete (no false negatives), so after the exact
    ``levenshtein`` verification the output is IDENTICAL to the brute
    all-pairs join — only the join volume differs. Output:
    ``id_a < id_b, dist``.
    """
    k = int(max_dist)
    if k < 0:
        raise ValueError(f"max_dist must be >= 0, got {k}")
    kp1 = k + 1
    del q  # see docstring: layout depends only on max_dist

    base = materialize_once(
        df.select(
            F.col(id_col).alias("doc"),
            F.col(text_col).alias("s"),
            F.length(text_col).alias("n"),
        ).filter(F.col(text_col).isNotNull())
    )

    # segment layout for a string of length L: k+1 segments, the last
    # (L % (k+1)) of them one char longer; closed forms (1-based):
    #   len_i   = L DIV kp1 + (i >= kp1 - L % kp1)
    #   start_i = 1 + i·(L DIV kp1) + max(0, i - (kp1 - L % kp1))
    seg_len = (
        lambda L, i: f"(({L}) DIV {kp1} + IF({i} >= {kp1} - ({L}) % {kp1}, 1, 0))"
    )
    seg_start = (
        lambda L, i: f"(1 + ({i}) * (({L}) DIV {kp1}) + greatest(0, ({i}) - ({kp1} - ({L}) % {kp1})))"
    )

    idx = (
        base.filter(F.col("n") >= kp1)
        .select(
            "doc",
            "n",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {k}), i -> struct("
                    f"i AS i, substring(s, {seg_start('n', 'i')}, {seg_len('n', 'i')}) AS seg))"
                )
            ).alias("e"),
        )
        .select(
            F.col("doc").alias("doc_i"),
            F.col("n").alias("n_i"),
            F.col("e.i").alias("i"),
            F.xxhash64("e.seg").alias("h"),
        )
    )
    probe = (
        base.select(
            "doc",
            "n",
            "s",
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(n - {k}, n + {k}), L -> "
                    f"flatten(transform(sequence(0, {k}), i -> "
                    f"filter(transform(sequence(-{k}, {k}), d -> struct("
                    f"L AS L, i AS i, {seg_start('L', 'i')} + d AS st, {seg_len('L', 'i')} AS ln)), "
                    f"x -> x.L >= {kp1} AND x.ln >= 1 AND x.st >= 1 AND x.st + x.ln - 1 <= n)"
                    f"))))"
                )
            ).alias("w"),
        )
        .select(
            F.col("doc").alias("doc_p"),
            F.col("n").alias("n_p"),
            F.col("w.L").alias("L"),
            F.col("w.i").alias("i"),
            F.xxhash64(F.expr("substring(s, w.st, w.ln)")).alias("h"),
        )
    )
    cand_gram = (
        probe.join(
            idx,
            (probe["L"] == idx["n_i"])
            & (probe["i"] == idx["i"])
            & (probe["h"] == idx["h"])
            & (probe["doc_p"] != idx["doc_i"])
            & (F.abs(probe["n_p"] - idx["n_i"]) <= k),
        )
        .select(
            F.least("doc_p", "doc_i").alias("id_a"),
            F.greatest("doc_p", "doc_i").alias("id_b"),
        )
        .distinct()
    )

    # Tiny-string bucket (n <= k: cannot host k+1 nonempty segments):
    # every admissible pair via a length-key equi-join.
    short_bound = k
    shorts = base.filter(F.col("n") <= short_bound)
    sl = shorts.select(
        F.col("doc").alias("id_a"),
        F.explode(
            F.array(*[F.col("n") + F.lit(d) for d in range(-k, k + 1)])
        ).alias("lk"),
    )
    sr = shorts.select(F.col("doc").alias("id_b"), F.col("n").alias("lk"))
    cand_short = (
        sl.join(sr, on="lk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )

    cand = cand_gram.unionByName(cand_short).distinct()
    a = base.select(F.col("doc").alias("id_a"), F.col("s").alias("_sa"))
    b = base.select(F.col("doc").alias("id_b"), F.col("s").alias("_sb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("dist", F.levenshtein("_sa", "_sb"))
        .filter(F.col("dist") <= k)
        .select("id_a", "id_b", "dist")
    )


# -------------------- embedding cosine near-dup --------------------


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    n_planes: int | str = 8,
    n_tables: int = 1,
    seed: int = 7,
    scorer: str = "hof",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Scale path: random-hyperplane LSH bucket join (bucket = sign bits of
    n_planes projections → expected pair reduction 2^n_planes for random
    data per table) then exact cosine verification inside buckets. Recall
    per pair is 1-(1-p^n_planes)^n_tables with p = 1-θ/π: high thresholds
    need few planes/tables; moderate thresholds (θ near π/3) want fewer
    planes and more independent tables. Candidate generation cost is linear
    in n_tables; verification is deduped across tables.

    PLANE COUNT MUST SCALE WITH THE CORPUS: within-bucket pair volume is
    ~n²/2^n_planes per table, so a fixed plane count goes quadratic as the
    corpus grows (measured: 200k vectors at the default 8 planes = ~780
    docs/bucket = 28× the 20k wall time; at 14 planes the same corpus is
    linear — SCALE.md r9e). ``n_planes='auto'`` sizes it as
    ceil(log2(count / 16)) clamped to [8, 24] — bucket occupancy pinned
    near 16 regardless of corpus size — at the cost of one count job and
    corpus-size-dependent output for sub-threshold pairs (identical-vector
    pairs collide under EVERY plane count; only partial-similarity recall
    shifts, so pair more planes with more tables when thresholds are
    moderate). The numeric default stays 8 so small-corpus results are
    reproducible run to run.

    ``scorer``: verification-cosine kernel, same values as
    :func:`~.similarity.ivf_ann_topk`. The default here is 'hof' — NOT
    'auto' — because this is a THRESHOLD operator: the Arrow kernel's
    pairwise summation shifts cosines ~1e-6 vs the HOF's left-to-right
    fold, which flips threshold-straddling pairs (and therefore cluster
    membership) rather than merely reordering ulp-tied ranks. Opt into
    'arrow'/'auto' for wide embeddings where the per-element interpreted
    HOF dominates verification CPU and the threshold isn't razor-edged.
    """
    from .similarity import (
        cosine_score_col,
        resolve_scorer,
        auto_planes,
        bucketize_tables,
    )

    if n_planes == "auto":
        n_planes = auto_planes(df.count())
    elif not isinstance(n_planes, int):
        raise ValueError(f"n_planes must be an int or 'auto', got {n_planes!r}")
    use = resolve_scorer(
        scorer, df.select(F.col(vec_col).alias("v")), "v"
    )

    # The bucket join and candidate dedup move ONLY (doc, tbl, bucket) —
    # 24-byte rows — never the vectors: with n_tables tables each vector
    # would otherwise ride the shuffle n_tables times. Vectors re-attach
    # once per side after the candidate set is deduped across tables.
    # Bucketing itself is one Arrow-batched matmul per batch (map-only).
    bucketed = materialize_once(
        bucketize_tables(
            df, id_col=id_col, id_name="doc", vec_col=vec_col,
            n_tables=n_tables, n_planes=n_planes, seed=seed,
        )
    )
    # Every join below is corpus × corpus — pin SORT-MERGE explicitly.
    # Catalyst's static size estimates are unreliable through the Arrow
    # bucketize branch and the checkpoint re-attach: measured at 200k ×
    # 64-dim vectors, the unpinned plan broadcast BOTH full id→vector maps
    # (~110 MB each, under a 64 MB threshold) and the bucket table — the
    # same misestimate class that OOM'd the IVF candidate join (SCALE.md
    # r10). A corpus-sized broadcast is never the right plan here at any
    # scale worth having; the merge hint costs a sort of slim rows.
    l, r = bucketed.alias("l"), bucketed.alias("r").hint("merge")
    cands = (
        l.join(
            r,
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = (
        cands.join(va.hint("merge"), "id_a")
        .join(vb.hint("merge"), "id_b")
        # cross-width pairs (mixed-dim corpora colliding across per-dim
        # bucket spaces) have no defined cosine — drop them rather than
        # let the HOF truncate or the Arrow kernel null them
        .filter(F.size("va") == F.size("vb"))
        .select("id_a", "id_b", cosine_score_col(use, "va", "vb").alias("cosine"))
    )
    return pairs.filter(F.col("cosine") >= threshold)


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    n_planes: int | str = 8,
    n_tables: int = 1,
    seed: int = 7,
    max_iter: int = 25,
    scorer: str = "hof",
) -> DataFrame:
    """Embedding-space deduplication end to end (the SemDeDup shape, Abbas
    et al. 2023, arXiv:2303.09540): partition the embedding space cheaply,
    score cosine only within partitions, close the ≥ threshold pairs into
    duplicate groups, keep one representative per group.

    This engine uses multi-table hyperplane LSH as the partitioner instead
    of the paper's k-means — the same within-partition-then-verify economics
    (no all-pairs join), with a deterministic, engine-replayable bucket
    assignment. Returns a total assignment (id, cluster_rep, keep):
    ``keep`` marks each group's minimum id; filter on it (or left-semi join
    via :func:`~.graph.dedup_keep_per_cluster`) to materialize the deduped
    corpus.
    """
    from .graph import connected_components

    pairs = embedding_near_dup_pairs(
        df, id_col, vec_col,
        threshold=threshold, n_planes=n_planes, n_tables=n_tables, seed=seed,
        scorer=scorer,
    )
    comp = connected_components(
        df.select(F.col(id_col)), pairs.select("id_a", "id_b"),
        id_col=id_col, max_iter=max_iter,
    )
    return comp.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_rep"),
        (F.col("id") == F.col("component")).alias("keep"),
    )


# ----------------------- benchmark decontamination -----------------------


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 8,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Flag training documents that share ≥1 word ``n``-gram with any
    benchmark document — the standard eval-set decontamination step of
    LLM training pipelines (exact n-gram collision, the GPT-3/PaLM recipe).

    Shape: explode each side to DISTINCT n-gram strings (map-side), inner
    semi-join train-grams against the benchmark-gram set, and mark the
    surviving doc ids. The join moves (doc, gram) strings only — never the
    documents; the benchmark side is usually small enough that AQE
    broadcasts it, but no hint is forced (a 10k-task eval suite still
    beats a broadcast ceiling comfortably, and a huge one must shuffle).
    Returns (id, contaminated) for every train row.
    """
    bench_text = bench_text_col or text_col
    t_grams = train.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(tokenize(F.col(text_col)), n)).alias("gram"),
    )
    b_grams = benchmark.select(
        F.explode(word_shingles(tokenize(F.col(bench_text)), n)).alias("gram")
    ).distinct()
    hits = (
        t_grams.join(b_grams, "gram", "left_semi")
        .select("doc")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        train.select(F.col(id_col).alias("doc"))
        .join(hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Exact-substring dedup (Lee et al., "Deduplicating Training Data Makes
# Language Models Better", ACL'22): find every w-token window whose exact
# token sequence occurs elsewhere in the corpus, keep the globally-first
# occurrence, and merge the remaining windows into removable spans.
# ---------------------------------------------------------------------------


def duplicate_substring_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 50,
    hash_fn: str = "xx",
) -> DataFrame:
    """Token spans to delete so no ``window``-token sequence appears twice
    in the corpus (the suffix-array recipe re-expressed as rolling-window
    hashing — the distributed-friendly formulation: a duplicated substring
    of length >= window is exactly a run of duplicated windows, so merged
    duplicate-window islands recover the maximal duplicated spans, clipped
    to window granularity).

    Output: one row per removable span — (id, span_start, span_end,
    n_windows), token positions 1-based inclusive. The globally FIRST
    occurrence of each window (min (id, start)) is kept, so one copy of
    every duplicated passage survives (deleting all copies, the naive
    formulation, would remove common boilerplate entirely).

    Scale shape: windows explode map-side (one row per token, ids+hashes
    only — never window text); duplicate detection + keeper election is ONE
    8-byte-key shuffle (count + min-position per hash in the same agg);
    candidate windows return via a semi-shaped inner join on that slim
    table; island-merge sorts only each doc's candidate windows (window
    partitioned by id — parallelism = #docs-with-candidates, each tiny).
    Docs shorter than ``window`` tokens emit nothing — by construction they
    cannot contain a length-``window`` duplicate.

    ``hash_fn='md5'`` is the cross-engine-oracle variant; 'xx' (xxhash64)
    the scale path (same convention as fingerprint/simhash).
    """
    from pyspark.sql.window import Window as W

    w = window
    toks = tokenize(F.col(text_col))
    # Spark's sequence(1, 0) counts DOWN ([1, 0]) rather than yielding an
    # empty array, so short docs need the explicit guard.
    grams = bind_once(
        toks,
        lambda t: F.when(
            F.size(t) >= w,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (w - 1)),
                lambda i: F.array_join(F.slice(t, i, w), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    hashed = F.transform(
        grams,
        (lambda s: F.xxhash64(s)) if hash_fn == "xx" else (lambda s: md5_60bit(s)),
    )
    wins = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(hashed).alias("i0", "h"),
    ).select("id", (F.col("i0") + 1).alias("i"), "h")

    # one slim shuffle: per-hash count + globally-first occurrence
    stats = wins.groupBy("h").agg(
        F.count("*").alias("c"),
        F.min(F.struct("id", "i")).alias("first"),
    )
    dup = stats.filter(F.col("c") > 1).select("h", "first")
    victims = (
        wins.join(dup, "h")
        .filter(
            (F.col("id") != F.col("first.id")) | (F.col("i") != F.col("first.i"))
        )
        .select("id", "i")
    )

    prev_max_end = F.max(F.col("i") + (w - 1)).over(
        W.partitionBy("id").orderBy("i").rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = victims.withColumn(
        "new_island",
        F.when(F.col("i") > F.coalesce(prev_max_end, F.lit(-1)) + 1, 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            W.partitionBy("id").orderBy("i").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy("id", "island")
        .agg(
            F.min("i").alias("span_start"),
            (F.max("i") + (w - 1)).alias("span_end"),
            F.count("*").cast("long").alias("n_windows"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("span_start").cast("long"),
            F.col("span_end").cast("long"),
            "n_windows",
        )
    )
