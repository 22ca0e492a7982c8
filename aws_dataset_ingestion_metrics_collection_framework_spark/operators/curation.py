"""Corpus-curation operators for large-scale training-data pipelines:
PII scan/redaction, URL-domain extraction with blocklist filtering,
deterministic stratified sampling, character-entropy scoring, C4
line-level cleaning, Gopher quality rules, and the composite
``curate_corpus`` chain.

The reference framework (SURVEY.md §2) stops at metric analytics; these
extend the engine toward the dataset-curation surface a 100 TB ingestion
pipeline needs (the same extension family as ``textops``/``dedup``).

Scale notes — every operator here is map-only (pure projection/filter,
whole-stage-codegen-friendly, zero shuffle) except:

- ``domain_report``: one aggregation whose key cardinality is #distinct
  domains (map-side combined; the exploded URL rows never leave their
  input partition before partial aggregation), plus an optional broadcast
  anti-join against a (small) blocklist;
- ``curate_corpus``: inherits exactly the two-phase slim shuffle of
  ``dedup.exact_dedup`` for its dedup stage (ids+hashes only);
- nothing else shuffles at all, so all of them compose with upstream scans
  at any corpus size.

Cross-engine determinism: regex patterns are restricted to the syntax
subset Java regex (Spark) and RE2 (DuckDB) share — no backreferences, no
lookaround — so the DuckDB oracles run the *identical* pattern strings.
Sampling uses the md5-derived 60-bit hash (``dedup.md5_60bit``) that DuckDB
reproduces exactly; thresholds are integer parts-per-million so no float
boundary can disagree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import md5_60bit

# ---------------------------------------------------------------------------
# PII scan / redaction
# ---------------------------------------------------------------------------

# name -> (pattern, placeholder). Redaction applies in THIS order: emails
# first (an address like user@10.0.0.1.corp.com must become one <EMAIL>,
# not keep a partial <IP> inside the host), then phone numbers (3-3-4 with
# -/. separators, which an IPv4 dotted-quad can never match — 4 groups),
# then bare IPv4 literals. Note the email host needs an alphabetic TLD, so
# a raw user@10.0.0.1 is NOT an email; its quad redacts as <IP>.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII hit counts over the *original* text, one column per
    pattern class (a substring matching two classes counts in both).

    Map-only; counts are ``regexp_extract_all`` sizes so the scan is a
    single codegen'd pass per pattern."""
    cols: list[Column] = [F.col(id_col)]
    for name, (pat, _) in PII_PATTERNS.items():
        cols.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
    return df.select(*cols)


def redact_pii(df: DataFrame, id_col: str, text_col: str, *, out_col: str = "redacted") -> DataFrame:
    """Replace every PII match with its class placeholder, applying the
    patterns in ``PII_PATTERNS`` order (see the ordering note above)."""
    c: Column = F.col(text_col)
    for _, (pat, placeholder) in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, placeholder)
    return df.select(F.col(id_col), c.alias(out_col))


# ---------------------------------------------------------------------------
# URL / domain extraction + blocklist
# ---------------------------------------------------------------------------

# Capture group 1 = the host part of an http(s) URL.
URL_DOMAIN_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def extract_domains(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One output row per URL occurrence: (id, domain). Map-only explode —
    rows multiply by URLs-per-doc but never shuffle."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_DOMAIN_PATTERN), F.lit(1))
        ).alias("domain"),
    )


def domain_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    blocklist: DataFrame | None = None,
) -> DataFrame:
    """Per-domain link stats: (domain, n_urls, n_docs), excluding blocklisted
    domains via a broadcast anti-join when ``blocklist`` (a one-column
    ``domain`` DataFrame — always small: blocklists are curated) is given.

    One shuffle keyed by domain; ``n_docs`` uses an exact count-distinct,
    which Spark runs as a two-phase expand — at extreme domain skew prefer
    an ``approx_count_distinct`` variant."""
    doms = extract_domains(df, id_col, text_col)
    if blocklist is not None:
        doms = doms.join(F.broadcast(blocklist.select("domain")), "domain", "left_anti")
    return doms.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct(id_col).cast("long").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + URL-keyed dedup
# ---------------------------------------------------------------------------

# Java ∩ RE2 (no lookaround): scheme://hostport path ?query #fragment
_URL_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://.*"
_URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+).*"
_URL_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*).*"
_URL_QUERY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+[^?#]*\?([^#]*).*"
# tracking params dropped during canonicalization (the C4/CCNet recipe)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9]+|fbclid|gclid|msclkid|mc_eid|ref)="


def canonical_url_col(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, entirely with built-ins
    (map-only, codegen'd):

    - scheme and host lowercased; leading ``www.`` and default ports
      (``:80`` http / ``:443`` https) dropped;
    - path: duplicate slashes collapsed, trailing slashes dropped;
    - query: tracking params (``utm_*``, ``fbclid``, ``gclid``, ...) and
      empty params removed, the rest byte-sorted and re-joined (both
      engines compare ASCII param strings binary, so sort order agrees);
    - fragment always dropped.

    Userinfo (``user@host``) is retained verbatim — canonicalizing it away
    would merge URLs that fetch differently. Non-URL input yields '' (the
    scheme regex fails to match), letting callers route instead of crash."""
    scheme = F.lower(F.regexp_extract(url, _URL_SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _URL_HOST_RE, 1))
    host = F.regexp_replace(
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport),
        r"^www\.",
        "",
    )
    path = F.regexp_replace(
        F.regexp_replace(F.regexp_extract(url, _URL_PATH_RE, 1), "//+", "/"),
        "/+$",
        "",
    )
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(url, _URL_QUERY_RE, 1), "&"),
            lambda y: (y != F.lit("")) & ~y.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.array_join(params, "&")
    return F.when(scheme == F.lit(""), F.lit("")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
        )
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Exact dedup keyed on the canonical URL: one row per canonical form
    with the first-seen (min id) representative and the duplicate count —
    the crawl-frontier dedup every web pipeline runs before fetch/store.

    One shuffle keyed by canonical_url (map-side combined); the canonical
    key is computed map-side so raw URL variants never co-locate."""
    return (
        df.select(
            F.col(id_col), canonical_url_col(F.col(url_col)).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates_ppm: dict[str, int],
    *,
    default_ppm: int = 1_000_000,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic Bernoulli sample with a per-stratum rate.

    A row is kept iff ``md5_60bit(salt || ':' || id) % 1e6 < rate_ppm`` for
    its stratum — reproducible across runs, engines (DuckDB computes the
    same hash), and cluster sizes, unlike ``DataFrame.sample`` whose output
    depends on partitioning. Rates are integer parts-per-million, so there
    is no float threshold to disagree at. Map-only filter; keeps all input
    columns."""
    for k, v in rates_ppm.items():
        if not (0 <= v <= 1_000_000):
            raise ValueError(f"rate for stratum {k!r} must be in [0, 1e6] ppm, got {v}")
    h = md5_60bit(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % 1_000_000
    rate = F.coalesce(
        *[F.when(F.col(strata_col) == k, F.lit(v)) for k, v in rates_ppm.items()],
        F.lit(default_ppm),
    )
    return df.filter(h < rate)


def group_sample(
    df: DataFrame,
    id_col: str,
    group_cols: list[str],
    k: int,
    *,
    salt: str = "gsamp",
    oversample: float = 2.0,
    hash_fn: str = "xx",
) -> DataFrame:
    """Exactly-k uniform sample per group, deterministic across runs,
    engines, retries, and cluster sizes — the reservoir-sampling result
    (each size-k subset of a group equally likely under the random-oracle
    hash) without reservoir state.

    Semantics: per group, keep the k rows with the smallest
    ``(hash(salt:id), id)`` — a seeded total order, so the same k rows
    come back no matter how the data is partitioned. Groups smaller than
    k are kept whole. Output adds ``sample_rank`` (1..k within group).

    Scale shape (the part a naive ``row_number() per group`` gets wrong):
    ranking every row of a 100 TB group means shuffling and sorting the
    whole group. Instead, a two-phase plan: (1) slim per-group counts
    (map-side combined) broadcast back; (2) a MAP-ONLY hash-threshold
    pre-filter keeps ~``oversample * k`` expected rows per group (all
    rows when the group is small enough that the threshold is vacuous);
    only these candidates shuffle into the exact window sort. A binomial
    undershoot (fewer than k survivors in an oversampled group —
    astronomically rare at oversample=2 but not impossible) is handled
    exactly: such groups are replayed through an unfiltered ranking, so
    the operator's OUTPUT is always exactly the top-k by hash order;
    the threshold only prunes work, never changes the result.

    ``hash_fn='xx'`` ranks by xxhash64 (fastest, scale default); ``'md5'``
    ranks by the 60-bit md5 hash DuckDB reproduces bit-for-bit — the
    cross-engine-oracle variant.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    hf = F.xxhash64 if hash_fn == "xx" else md5_60bit
    h = hf(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    # Signed-64 domain: shift to unsigned fraction via a decimal offset so
    # the ppm threshold arithmetic stays integer-exact in both engines.
    hashed = df.withColumn("_h", h)

    counts = hashed.groupBy(*group_cols).agg(F.count("*").alias("_n"))
    with_n = hashed.join(F.broadcast(counts), on=group_cols, how="inner")

    # Threshold over the hash domain — signed 64-bit for xxhash64,
    # [0, 2^60) for md5_60bit: keep iff h < lo + span * min(1,
    # oversample*k/n). Computed in double — fine, because the EXACT top-k
    # window below decides membership; the threshold only has to be a
    # superset with overwhelming probability (undershoot replays).
    lo, span = (-(2.0**63), 2.0**64) if hash_fn == "xx" else (0.0, 2.0**60)
    frac = F.least(F.lit(1.0), F.lit(float(oversample) * k) / F.col("_n"))
    cutoff = F.lit(lo) + F.lit(span) * frac
    cand = with_n.filter(F.col("_h").cast("double") < cutoff)

    w = Window.partitionBy(*group_cols).orderBy("_h", id_col)
    ranked = cand.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_nc", F.count("*").over(Window.partitionBy(*group_cols))
    )
    ok = ranked.filter((F.col("_nc") >= F.least(F.lit(k), F.col("_n"))))

    # Replay branch for undershot groups (survivors < min(k, n)): rank the
    # FULL group. Usually an empty frame — the join keeps the plan lazy
    # and distributed; no driver-side check. Derived from the COUNTS
    # table, not the candidate rows, so a group whose candidates all
    # missed the threshold (zero survivors) is still replayed.
    cand_counts = cand.groupBy(*group_cols).agg(F.count("*").alias("_nc2"))
    short = (
        counts.join(cand_counts, on=group_cols, how="left")
        .filter(
            F.coalesce(F.col("_nc2"), F.lit(0)) < F.least(F.lit(k), F.col("_n"))
        )
        .select(*group_cols)
    )
    replay = (
        with_n.join(F.broadcast(short), on=group_cols, how="left_semi")
        .withColumn("_rk", F.row_number().over(w))
    )

    out_cols = df.columns + [F.col("_rk").alias("sample_rank")]
    return (
        ok.filter(F.col("_rk") <= k).select(*out_cols)
        .unionByName(replay.filter(F.col("_rk") <= k).select(*out_cols))
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    *,
    salt: str = "wsamp",
) -> DataFrame:
    """Exactly-k sample with inclusion probability proportional to weight,
    without replacement — the importance-sampling draw data selection
    needs (e.g. sample documents ∝ DSIR weight or token count; a uniform
    sample wastes the budget on low-value rows).

    Efraimidis–Spirakis (2006) exponential-keys: each row gets key =
    ln(u)/w with u uniform in (0,1); the k LARGEST keys are a valid
    weight-proportional without-replacement sample. Here u is the md5
    ppm-style uniform (hash/2⁶⁰), so the draw is deterministic across
    runs/engines/partitionings AND fully oracle-checkable — `rand()` is
    none of those. Rows with weight ≤ 0 or NULL never sample.

    The top-k by key runs through the engine's bin-thresholded exact
    top-k (`top_k_by_value`) — no full sort; keys are negative
    (ln(u) < 0, w > 0), bounded by the bin grid like any value column.
    Output: sampled rows + ``sample_rank`` (1..k by descending key).
    """
    from .dedup import md5_60bit

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    two60 = float(1 << 60)
    u = (
        md5_60bit(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(two60)  # +0.5 keeps u strictly inside (0,1): ln(0) guard
    key = F.log(u) / F.col(weight_col)
    eligible = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_es_key", key)
        .withColumn("_g", F.lit(1))  # single global draw group
    )
    out = top_k_by_value(
        eligible, ["_g"], "_es_key", k, tiebreak_col=id_col, descending=True
    )
    return out.select(
        *df.columns, F.col("rank").alias("sample_rank")
    )


def top_k_by_value(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    *,
    tiebreak_col: str,
    descending: bool = True,
    bins: int = 1024,
) -> DataFrame:
    """Exact top-k rows per group by value — WITHOUT sorting whole groups.

    The naive `row_number() over (partition by g order by v)` shuffles
    and sorts every row of every group; at 100 TB a hot group is a
    straggler. Here the sort sees only candidates, and the prefilter is
    EXACT (no replay branch needed): (1) PER-GROUP [min, max] (a slim
    one-row-per-group aggregate, broadcast — r6: was a global grid,
    under which a group whose values all landed in one global bin
    degraded to a full-group sort); (2) per-(group, bin) integer counts
    over the group's own grid — slim, map-side combined; (3) per group,
    the threshold bin where the from-the-top cumulative count first
    reaches k (a window over ≤ `bins` rows per group, not data) — every
    group's k-th value provably lies at or beyond that bin edge, so
    filtering to it can never undershoot; (4) a MAP-ONLY value filter,
    then the exact (value, tiebreak) window over candidates. Expected
    candidates ≈ k + one bin's worth per group, now independent of how
    disparate the groups' value ranges are. Assumes the GROUP-BOUNDS
    table fits a broadcast — the same assumption the threshold broadcast
    already makes (true whenever per-group top-k is the right tool:
    many-groups-tiny-groups degenerates to the plain window anyway).

    NULL values never rank (dropped, documented — a NULL is not a top
    value in either direction). Output: non-null input rows that made
    the cut + ``rank`` (1..k per group).
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(value_col).cast("double")
    data = df.filter(v.isNotNull())
    if group_cols:
        bounds = data.groupBy(*group_cols).agg(
            F.min(v).alias("_lo"), F.max(v).alias("_hi")
        )
        # slim per-group ride-along; inner join loses nothing (every
        # surviving row's group has bounds by construction)
        withb = data.join(F.broadcast(bounds), on=group_cols, how="inner")
    else:
        bounds = data.agg(F.min(v).alias("_lo"), F.max(v).alias("_hi"))
        # 1-row broadcast ride-along (the established 1-row crossJoin
        # pattern)
        withb = data.crossJoin(F.broadcast(bounds))
    width = (F.col("_hi") - F.col("_lo")) / bins
    idx = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(bins - 1),
            F.floor((v - F.col("_lo")) / width).cast("int"),
        )
    )
    binned = withb.withColumn("_b", idx)
    bc = binned.groupBy(*group_cols, "_b").agg(F.count("*").alias("_c"))
    # from-the-top cumulative over the ≤bins-row per-group grid
    cum_order = F.col("_b").desc() if descending else F.col("_b").asc()
    wg = (
        Window.partitionBy(*group_cols)
        .orderBy(cum_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    thr = (
        bc.withColumn("_cum", F.sum("_c").over(wg))
        .filter(F.col("_cum") >= k)
        .groupBy(*group_cols)
        .agg(
            (F.max("_b") if descending else F.min("_b")).alias("_tb")
        )
    )
    # groups smaller than k never reach _cum >= k: keep them whole via a
    # left join (null _tb -> no filter)
    cand = binned.join(F.broadcast(thr), on=group_cols, how="left").filter(
        F.col("_tb").isNull()
        | (F.col("_b") >= F.col("_tb") if descending else F.col("_b") <= F.col("_tb"))
    )
    order = [v.desc() if descending else v.asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    out_cols = df.columns + [F.col("_rk").alias("rank")]
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(*out_cols)
    )


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    *,
    secret: str,
    length: int = 16,
) -> DataFrame:
    """Keyed pseudonymization of identifier columns: value →
    ``sha256(secret ':' value)`` hex prefix — the PII-minimization step
    that keeps JOIN KEYS working (same value + same secret → same token,
    across tables, runs and engines) while severing the link to the raw
    identifier for anyone without the secret. Rotate the secret to
    unlink past exports. NULLs stay NULL.

    Not format-preserving encryption and not reversible; ``length`` hex
    chars = length·4 bits of token space (default 64 — birthday-collision
    odds ~n²/2⁶⁵, immaterial below billions of distinct values; raise it
    past that). Map-only, codegen'd `sha2` — zero shuffle."""
    if not (8 <= length <= 64):
        raise ValueError(f"length must be in [8, 64] hex chars, got {length}")
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.substring(
                F.sha2(
                    F.concat(F.lit(secret + ":"), F.col(c).cast("string")), 256
                ),
                1,
                length,
            ),
        )
    return out


def mix_corpus(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weight_col: str,
    target_ppm: dict[str, int],
    *,
    salt: str = "mix",
) -> DataFrame:
    """Dataset-mixture sampling: downsample groups so the OUTPUT's weight
    (token) shares hit a target mixture — the data-mixing step of every
    LLM training pipeline (e.g. rebalance languages/domains to prescribed
    proportions without upsampling anything).

    Given per-group target shares in ppm (summing to ≤ 1e6), the output
    total is capped by the binding group — the one whose full weight,
    scaled to its share, limits everything else: B = min_g ⌊T_g·1e6 /
    share_g⌋; each group then keeps rate_g = ⌊B·share_g / T_g⌋ ppm of its
    rows, sampled deterministically
    by the md5 ppm threshold (engine/partitioning/retry stable — DuckDB
    reproduces the run row-for-row). Groups absent from `target_ppm` are
    dropped: the mixture is the explicit contract. Rates are exact
    integer arithmetic (two-step floor-div keeps every intermediate under
    2⁶³ for per-group totals up to ~9.2e12 weight units — tens of TB of
    text; lift the constants to DECIMAL beyond that). The two floors
    leave the binding group's rate ≲ share_g/T_g ppm under 1e6 (e.g.
    60 ppm at T=10⁴ — vanishing for real corpora where T ≫ share).

    Scale shape: one slim per-group aggregation (≤ |groups| rows; the
    global min runs over that tiny table, not data), a broadcast rates
    join, and a MAP-ONLY hash filter — the corpus itself never shuffles.

    Doc-level Bernoulli sampling hits the target shares in expectation
    with O(1/√n_g) relative error — exact enough at corpus scale;
    row-exact quotas would need a per-group rank (see `group_sample`).

    Output: input columns + ``rate_ppm`` (audit column).
    """
    from pyspark.sql import Window

    if not target_ppm:
        raise ValueError("target_ppm must name at least one group")
    for g, v in target_ppm.items():
        if v <= 0:
            raise ValueError(f"share for group {g!r} must be positive, got {v}")
    if sum(target_ppm.values()) > 1_000_000:
        raise ValueError("target shares exceed 1e6 ppm")

    share = F.coalesce(
        *[F.when(F.col(group_col) == g, F.lit(v)) for g, v in target_ppm.items()]
    )
    totals = (
        df.filter(F.col(group_col).isin(list(target_ppm)))
        .groupBy(group_col)
        .agg(F.sum(weight_col).alias("_t"))
        .withColumn("_share", share)
    )
    # cap_g = floor(T_g * 1e6 / share_g), overflow-safe two-step floor-div
    m = F.lit(1_000_000)
    cap = (F.expr("_t div _share") * m) + F.expr(
        "((_t % _share) * 1000000) div _share"
    )
    caps = totals.withColumn("_cap", cap)
    # global min over the ≤|groups|-row table (bounded unpartitioned window)
    caps = caps.withColumn("_B", F.min("_cap").over(Window.partitionBy()))
    rates = caps.withColumn(
        "rate_ppm",
        F.least(
            m.cast("long"),
            F.expr("_B div _t") * F.col("_share")
            + F.expr("((_B % _t) * _share) div _t"),
        ),
    ).select(group_col, "rate_ppm")
    h = md5_60bit(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % m
    return (
        df.join(F.broadcast(rates), on=group_col)
        .filter(h < F.col("rate_ppm"))
        .select(*df.columns, "rate_ppm")
    )


def compression_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document zlib compression ratio — the repetitive/templated-text
    detector used by large-corpus quality pipelines (boilerplate, keyword
    stuffing and generated spam compress far better than natural prose;
    a very HIGH ratio flags binary-ish/random content instead).

    Output: id + ``n_bytes`` (UTF-8 length), ``n_compressed`` (zlib level-6
    DEFLATE size), ``compression_ratio`` (compressed/raw, 6 digits; NULL
    for empty text).

    This is one of the engine's few documented built-ins-can't Python
    boundaries (Spark has no SQL DEFLATE): an Arrow ``mapInPandas`` stage
    over exactly (id, text) — column-pruned before the boundary, map-only,
    zero shuffle; zlib itself runs at C speed. DEFLATE output for a given
    (input, level) is deterministic for a given zlib build, and the
    RATIO's downstream use is thresholding — the pinned contracts
    (ordering of repetitive vs prose vs random, bounds) are build-stable.
    """
    import pandas as pd  # local import: keep module import light
    import zlib

    out_schema = (
        f"{id_col} long, n_bytes long, n_compressed long, compression_ratio double"
    )

    def run(batches):
        for pdf in batches:
            ids, nb, nc, ratio = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raw = (t or "").encode("utf-8")
                comp = len(zlib.compress(raw, 6)) if raw else 0
                ids.append(i)
                nb.append(len(raw))
                nc.append(comp)
                ratio.append(round(comp / len(raw), 6) if raw else None)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "compression_ratio": ratio,
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020, §2.2 of the T5 paper)
# ---------------------------------------------------------------------------

# Terminal punctuation a retained line must end with (the C4 rule).
C4_TERMINAL = (".", "!", "?", '"')


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words_per_line: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """The C4 cleaning recipe over newline-delimited pages, entirely with
    array higher-order functions — map-only, zero shuffle at any corpus
    size (no explode: a page's lines never leave their row).

    Line rules (a line is RETAINED iff all hold):
      - ends with terminal punctuation (``C4_TERMINAL``);
      - has at least ``min_words_per_line`` whitespace words;
      - does not contain the word 'javascript' (case-insensitive).
    Page rules (the document is DROPPED iff any holds):
      - raw text contains 'lorem ipsum' (case-insensitive) or a '{';
      - fewer than ``min_lines`` lines survive the line rules.

    Returns (id, clean_text, n_lines, n_kept, doc_kept); ``clean_text`` is
    the retained lines re-joined (empty string for dropped documents).
    """
    lines = F.split(F.col(text_col), "\n")

    def _retained(line: Column) -> Column:
        last = F.substring(line, -1, 1)
        words = F.size(F.filter(F.split(F.trim(line), r"\s+"), lambda t: t != ""))
        return (
            last.isin(*C4_TERMINAL)
            & (words >= min_words_per_line)
            & ~F.lower(line).contains("javascript")
        )

    kept = F.filter(lines, _retained)
    lower = F.lower(F.col(text_col))
    page_bad = lower.contains("lorem ipsum") | F.col(text_col).contains("{")
    doc_kept = ~page_bad & (F.size(kept) >= min_lines)
    return df.select(
        F.col(id_col),
        F.when(doc_kept, F.array_join(kept, "\n")).otherwise(F.lit("")).alias(
            "clean_text"
        ),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        doc_kept.alias("doc_kept"),
    )


# ---------------------------------------------------------------------------
# Gopher document-quality rules (Rae et al. 2021, table A1)
# ---------------------------------------------------------------------------


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    stopwords: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with"),
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher quality flags — each published rule as its own
    boolean column plus the conjunction, so downstream filters can relax
    individual rules without recomputing. Map-only (one tokenize, array
    HOFs; no shuffle).

    Rules (Gopher appendix A1, re-expressed over whitespace words):
      - word count within [min_words, max_words];
      - mean word length within [min_avg_word_len, max_avg_word_len];
      - (symbol '#' or '…' occurrences) / words ≤ max_symbol_ratio;
      - fraction of words containing ≥1 alphabetic char ≥ min_alpha_word_ratio;
      - at least ``min_stopword_hits`` DISTINCT stopwords present.
    """
    toks = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    nn = F.greatest(n, F.lit(1))
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    avg_len = total_len.cast("double") / nn
    symbols = (
        F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
        + (
            F.length(F.col(text_col))
            - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
        )
        / 3
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
    stop_hits = F.size(F.filter(stop_arr, lambda w: F.array_contains(toks, w)))
    out = df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.round(avg_len, 6).alias("avg_word_len"),
        ((n >= min_words) & (n <= max_words)).alias("ok_words"),
        ((avg_len >= min_avg_word_len) & (avg_len <= max_avg_word_len)).alias(
            "ok_avg_len"
        ),
        (symbols.cast("double") / nn <= max_symbol_ratio).alias("ok_symbols"),
        (alpha_words.cast("double") / nn >= min_alpha_word_ratio).alias("ok_alpha"),
        (stop_hits >= min_stopword_hits).alias("ok_stopwords"),
    )
    return out.withColumn(
        "pass",
        F.col("ok_words")
        & F.col("ok_avg_len")
        & F.col("ok_symbols")
        & F.col("ok_alpha")
        & F.col("ok_stopwords"),
    )


# ---------------------------------------------------------------------------
# Composite curation pipeline
# ---------------------------------------------------------------------------


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    gopher_kwargs: dict | None = None,
    val_fraction: float = 0.02,
    seed: int = 42,
    hash_fn: str = "xx",
) -> DataFrame:
    """The standard pre-training curation chain as ONE composition of the
    engine's operators: Gopher quality gate → exact dedup (min-id
    representative per identical text) → deterministic train/val split →
    per-doc token count. Returns one row per SURVIVING document:
    (id, split, n_tokens, dup_count).

    Stage shapes (nothing here adds a new shuffle kind): the gate is
    map-only; dedup is the two-phase slim shuffle of ``dedup.exact_dedup``
    (id+hash only — text never shuffles except the duplicate sliver); the
    split and the count are map-only. The id-only semi-join back to text
    re-reads the (columnar, pruned) source rather than carrying text
    through the dedup shuffle — the 100 TB trade.
    """
    from .dedup import exact_dedup, tokenize
    from .textops import train_val_split

    flags = gopher_rules(df, id_col, text_col, **(gopher_kwargs or {}))
    kept = df.join(
        flags.filter(F.col("pass")).select(id_col), id_col, "left_semi"
    )
    reps = exact_dedup(kept, [text_col], id_col)  # (id, dup_count)
    survivors = kept.join(reps, id_col)  # re-attach text for the token count
    split = train_val_split(
        survivors, id_col, val_fraction=val_fraction, seed=seed, hash_fn=hash_fn
    )
    return split.select(
        F.col(id_col),
        "split",
        F.size(tokenize(F.col(text_col))).cast("long").alias("n_tokens"),
        "dup_count",
    )


# ---------------------------------------------------------------------------
# Character-entropy scoring
# ---------------------------------------------------------------------------

# Letters + space: the signal that separates natural language from
# binary-ish / boilerplate text. Kept small so the count projection stays a
# bounded number of codegen'd string scans per row.
ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz "


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shannon entropy (bits) of the per-character distribution over
    ``ENTROPY_ALPHABET`` in the lowercased text → (id, n_alpha, entropy).

    Natural English prose sits around 4 bits; ``aaaa…`` scores 0; uniform
    random letters approach log2(27). Documents with no alphabet characters
    score 0 (by the 0·log 0 = 0 convention, total clamped to 1 to avoid
    0/0).

    Implementation: per-letter counts via the length-minus-replace trick —
    27 codegen'd string scans per row, no explode, no shuffle, no UDF. The
    entropy sum is built as an explicit left-associated 27-term chain in
    *alphabet order* so the DuckDB oracle (same chain, same order) is
    bitwise identical despite float non-associativity."""
    s = F.lower(F.col(text_col))
    counted = df.select(
        F.col(id_col),
        *[
            (F.length(s) - F.length(F.replace(s, F.lit(ENTROPY_ALPHABET[i]), F.lit(""))))
            .cast("double")
            .alias(f"_c{i}")
            for i in range(len(ENTROPY_ALPHABET))
        ],
    )
    total: Column = F.col("_c0")
    for i in range(1, len(ENTROPY_ALPHABET)):
        total = total + F.col(f"_c{i}")
    counted = counted.withColumn("_total", total)
    t = F.greatest(F.col("_total"), F.lit(1.0))
    ent: Column | None = None
    for i in range(len(ENTROPY_ALPHABET)):
        c = F.col(f"_c{i}")
        term = F.when(c > 0, (c / t) * F.log2(c / t)).otherwise(F.lit(0.0))
        ent = term if ent is None else ent + term
    return counted.select(
        F.col(id_col),
        F.col("_total").cast("long").alias("n_alpha"),
        (-ent).alias("entropy"),
    )


def char_entropy_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB SQL computing ``char_entropy`` with the identical 27-term
    left-associated chains (generated from the same alphabet constant, so
    the two engines cannot drift)."""
    n = len(ENTROPY_ALPHABET)
    counts = ",\n       ".join(
        "CAST(length(s) - length(replace(s, '{ch}', '')) AS DOUBLE) AS c{i}".format(
            ch=ENTROPY_ALPHABET[i], i=i
        )
        for i in range(n)
    )
    total = " + ".join(f"c{i}" for i in range(n))
    terms = "\n     + ".join(
        f"CASE WHEN c{i} > 0 THEN (c{i}/t)*log2(c{i}/t) ELSE 0.0 END" for i in range(n)
    )
    return f"""
WITH lowered AS (SELECT {id_col}, lower({text_col}) AS s FROM {table}),
counts AS (
  SELECT {id_col},
       {counts}
  FROM lowered
),
with_t AS (
  SELECT *, {total} AS total, greatest({total}, 1.0) AS t FROM counts
)
SELECT {id_col},
       CAST(total AS BIGINT) AS n_alpha,
       -({terms}) AS entropy
FROM with_t
"""
