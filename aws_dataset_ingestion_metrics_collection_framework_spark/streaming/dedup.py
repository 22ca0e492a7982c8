"""Streaming exact dedup — the continuous-ingest counterpart of
``operators.dedup.exact_dedup`` (training pipelines dedup at ingest time so
duplicates never land in the lake).

Built on ``dropDuplicatesWithinWatermark``: state holds one entry per
distinct key seen within the watermark horizon and the watermark evicts
older entries, so state is bounded by (dedup horizon × arrival rate) —
never by stream length. One shuffle on the dedup key per micro-batch;
late rows beyond the watermark are dropped by the engine upstream.
"""

from __future__ import annotations

import json
import time
import warnings

from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..sources import fsio


def dedup_stream(
    df: DataFrame,
    content_cols: list[str],
    *,
    event_time_col: str,
    watermark: str = "10 minutes",
    hash_only: bool = False,
) -> DataFrame:
    """Keep the first arrival of each distinct content within the watermark
    horizon.

    Default keys state on the content columns themselves — exact, like the
    batch operator's collision-safe contract. ``hash_only=True`` keys on
    xxhash64(content) instead: state rows shrink to 8 bytes + timestamp
    (the choice at 100 TB with wide documents), trading a ~|pairs|/2^64
    silent-merge probability — the same tradeoff the batch docstring
    documents, made explicit here because streaming state lives in memory.
    """
    if hash_only:
        keyed = df.withColumn(
            "_content_hash", F.xxhash64(*[F.col(c) for c in content_cols])
        )
        out = (
            keyed.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(["_content_hash"])
            .drop("_content_hash")
        )
        return out
    return df.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        content_cols
    )


def _bucket_expr(n_buckets: int):
    """The ONE bucket function both the run writers and the probe reader
    use: pmod keeps it non-negative for negative xxhash64 values. Any
    drift between write-side and read-side bucketing silently loses dup
    matches, so both sides call this. Python-side equivalent for a
    driver-held hash h is ``h % n_buckets`` (Python's % is already
    non-negative for a positive modulus, unlike Java's)."""
    return F.pmod(F.col("_h"), F.lit(n_buckets)).cast("int")


def _committed_runs(
    spark, compact_root: str, index_root: str | None = None
) -> list[dict]:
    """Discover the COMMITTED history runs under ``index_compact`` and run
    the resumable cleanup of anything a committed run already folded.

    Two layouts are understood:

    - ``run=<name>/`` (current): committed iff its ``_meta`` JSON exists —
      ``_meta`` is written strictly after the parquet job completes, so it
      is a commit gate that works even on deployments that disable
      ``_SUCCESS`` markers. A run dir without ``_meta`` is a crashed
      half-write and is IGNORED entirely: its inputs (per-batch index dirs
      or predecessor runs) were deleted only after ``_meta``, so they are
      all still present and the base row set is unchanged; the stream's
      replay of the crashed fold overwrites the dir and re-commits it.
    - ``upto=<N>/`` (legacy single-tree layout): committed iff ``_SUCCESS``
      OR ``_nb`` exists (``_nb`` doubles as the marker-disabled gate — it
      too was written post-commit). Only the LARGEST committed legacy tree
      is live (legacy trees are cumulative [0, N)); it participates as a
      frozen base run ``[0, N)`` that new runs never merge into (merging
      it would need an O(history) row count + rewrite — exactly the cost
      this layout removes; a legacy corpus keeps its base tree and
      accumulates tiered runs above it). Committed legacy trees BELOW the
      elected one are crash residue (the old fold deleted its predecessor
      only post-commit) and are deleted here, mirroring the folds-victim
      cleanup. An UNMARKED legacy dir (neither ``_SUCCESS`` nor ``_nb``)
      is never elected: electing it would trust a possibly-torn tree and
      hide (then delete) intact ``index/batch=*`` history. If any other
      history exists alongside it (committed runs, or the batch dirs a
      crashed fold always leaves intact), it is skipped with a warning;
      if it is the ONLY history present it can't be crash residue — it is
      an import written without commit markers, and discovery RAISES with
      remediation (write ``_nb``, or an empty ``_SUCCESS`` for a flat
      tree) rather than silently classifying all prior rows as fresh.

    Resumable cleanup: every committed run records the dirs it folded in
    ``_meta["folds"]``. Any such victim still on disk is a crash residue
    (output committed, input delete never ran) — it is dropped from the
    live set and deleted here, so a crashed fold's cleanup completes on
    the next call no matter where the crash landed.

    SLICED merges (``max_fold_rows``): a big merge executes one
    hash-congruence slice per fold, each slice its own committed run
    ``run=m<N>.<i>.s<j>`` whose ``_meta["part"]`` records
    ``{id, slice, of, inputs}``. A COMPLETE slice set (all ``of`` slices
    committed) is returned as ONE virtual run — the slices partition the
    hash space, so for tiering and probing the set is indistinguishable
    from the single run an unsliced merge would have written (same total
    bucket count; a probe opens only matched buckets of matched slices).
    An INCOMPLETE set's slices stay visible for probing (their rows
    temporarily duplicate the still-live inputs — harmless, see the
    dup-tolerance contract) but both the slices and their inputs are
    marked busy so tiering never touches a merge in flight.

    Returns ``(runs, pending)`` where pending lists the in-flight sliced
    merges ``{id, of, have, inputs, lo, hi}``.
    """
    runs: list[dict] = []
    legacy: list[dict] = []
    unmarked: list[str] = []
    for n in fsio.list_names(compact_root, spark):
        path = f"{compact_root}/{n}"
        if n.startswith("run="):
            meta_txt = fsio.read_text(f"{path}/_meta", spark)
            if meta_txt is None:
                continue  # uncommitted half-write: invisible
            m = json.loads(meta_txt)
            runs.append(
                {
                    "name": n,
                    "path": path,
                    "nb": m["nb"],
                    "rows": m["rows"],
                    "lo": m["lo"],
                    "hi": m["hi"],
                    "folds": m.get("folds", []),
                    "part": m.get("part"),
                    "legacy": False,
                }
            )
        elif n.startswith("upto="):
            hi = int(n.split("=", 1)[1])
            nb_txt = fsio.read_text(f"{path}/_nb", spark)
            if nb_txt is None and not fsio.exists(f"{path}/_SUCCESS", spark):
                unmarked.append(n)  # no commit marker: not electable
                continue
            legacy.append(
                {
                    "name": n,
                    "path": path,
                    "nb": int(nb_txt) if nb_txt else None,
                    "rows": None,
                    "lo": 0,
                    "hi": hi,
                    "folds": [],
                    "part": None,
                    "legacy": True,
                }
            )
    if unmarked and not legacy and not runs:
        # With no committed run and no marked legacy tree, an unmarked
        # upto= tree is either torn residue of a crashed pre-LSM fold —
        # whose inputs (index/batch=* dirs) are still intact, because the
        # old fold deleted them only post-commit — or a hand-imported
        # index written without Spark committers, which has NO batch dirs
        # backing it. The two demand opposite treatment: residue must be
        # ignored (classification replays from the intact batch dirs);
        # silently ignoring an IMPORT would classify all its history as
        # fresh (quiet dedup loss), and blindly electing it would trust a
        # possibly-torn tree AND delete any batch dirs below its upto.
        # Disambiguate on the batch dirs and fail loudly on the import.
        has_batch_history = index_root is not None and any(
            n.startswith("batch=") for n in fsio.list_names(index_root, spark)
        )
        if not has_batch_history:
            raise RuntimeError(
                "corpus dedup index: legacy tree(s) "
                f"{sorted(unmarked)} under {compact_root} carry neither "
                "_SUCCESS nor _nb, and no other history (committed runs or "
                "index/batch=* dirs) exists — refusing to guess. If this "
                "is an imported index, mark it committed (write its _nb "
                "bucket-count file, or an empty _SUCCESS for a flat tree); "
                "if it is torn residue of a crashed fold, delete the dir."
            )
    if unmarked:
        # other history exists: the unmarked tree cannot be elected (it
        # may be torn) but should not vanish silently either
        warnings.warn(
            f"corpus dedup index: ignoring unmarked legacy tree(s) "
            f"{sorted(unmarked)} under {compact_root} (no _SUCCESS/_nb); "
            "imported trees must carry a commit marker to be read",
            stacklevel=2,
        )
    if legacy:
        elected = max(legacy, key=lambda r: r["hi"])
        runs.append(elected)
        # crash residue: the old fold deleted the predecessor tree only
        # AFTER committing its successor, so two committed legacy trees
        # mean the delete never ran. Finish it here (mirroring the
        # folds-victim cleanup) instead of re-listing the dead tree on
        # every micro-batch forever.
        for r in legacy:
            if r is not elected:
                # destructive action on the read path: never delete a
                # committed tree the elected one doesn't cover. Legacy
                # trees are cumulative [0, N) so coverage always holds
                # for genuine crash residue — a violation means an
                # operator placed two INDEPENDENT committed imports side
                # by side, which deletion would silently destroy.
                if not (elected["lo"] <= r["lo"] and r["hi"] <= elected["hi"]):
                    warnings.warn(
                        f"corpus dedup index: committed legacy tree "
                        f"{r['name']} is NOT covered by the elected "
                        f"{elected['name']} ([{r['lo']},{r['hi']}) vs "
                        f"[{elected['lo']},{elected['hi']})) — keeping it "
                        "on disk (unread). Merge or remove it manually.",
                        stacklevel=2,
                    )
                    continue
                warnings.warn(
                    f"corpus dedup index: deleting superseded committed "
                    f"legacy tree {r['name']} (crash residue covered by "
                    f"{elected['name']})",
                    stacklevel=2,
                )
                fsio.delete(r["path"], spark=spark)
    victims = {v for r in runs for v in r["folds"]}
    live = [r for r in runs if r["name"] not in victims]
    for v in victims:
        if fsio.exists(f"{compact_root}/{v}", spark):
            fsio.delete(f"{compact_root}/{v}", spark=spark)

    # group slice parts into virtual runs / pending merges
    by_id: dict[str, list[dict]] = {}
    out: list[dict] = []
    for r in live:
        if r["part"]:
            by_id.setdefault(r["part"]["id"], []).append(r)
        else:
            out.append(r)
    pending: list[dict] = []
    for pid, ps in sorted(by_id.items()):
        ps.sort(key=lambda p: p["part"]["slice"])
        of = ps[0]["part"]["of"]
        if len(ps) == of:  # complete: one virtual run
            out.append(
                {
                    "name": pid,
                    "path": None,
                    "nb": None,
                    "rows": sum(p["rows"] for p in ps),
                    "lo": min(p["lo"] for p in ps),
                    "hi": max(p["hi"] for p in ps),
                    "folds": [],
                    "part": None,
                    "legacy": False,
                    "parts": ps,
                }
            )
        else:  # in flight: probe-visible, merge-busy
            for p in ps:
                p["busy"] = True
                out.append(p)
            pending.append(
                {
                    "id": pid,
                    "of": of,
                    "have": {p["part"]["slice"] for p in ps},
                    "inputs": ps[0]["part"]["inputs"],
                    "lo": min(p["lo"] for p in ps),
                    "hi": max(p["hi"] for p in ps),
                }
            )
    busy_inputs = {name for p in pending for name in p["inputs"]}
    for r in out:
        names = {q["name"] for q in r.get("parts", [])} | {r["name"]}
        if names & busy_inputs:
            r["busy"] = True
    return out, pending


def _read_run(spark, run: dict, idx_schema, probe_hashes=None):
    """Read one committed run, partition-pruned to the buckets the probe
    batch can possibly match.

    ``probe_hashes`` is the driver-collected (capped) distinct xxhash64
    list of the incoming batch: per run, the hit buckets are computed
    driver-side (``h % nb``) and only those ``bucket=<k>/`` sub-paths are
    opened (explicit paths + basePath — Spark never lists the other
    bucket dirs). One collect thus prunes EVERY run, instead of one
    distinct-bucket Spark job per run per micro-batch. Pruning below ~8
    buckets can't beat just reading the run, so small runs read whole.

    Layouts: bucketed (``bucket=<k>/`` subdirs); legacy flat tree — read
    whole; bucketed but nb unknown (legacy ``_nb`` lost in a crash
    window): all buckets read — a correct superset, never a miss.

    Returns None when pruning proves no row can match, or the run is
    known-empty.

    A VIRTUAL run (a complete slice set, see ``_committed_runs``) reads
    as the union of its parts — each part is itself bucket-pruned, and
    the parts partition the hash space, so total opened buckets equal
    the single-run layout's.
    """
    if run.get("parts"):
        parts = [
            p
            for part in run["parts"]
            if (p := _read_run(spark, part, idx_schema, probe_hashes))
            is not None
        ]
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df
    if run["rows"] == 0:
        return None
    tree = run["path"]
    bucket_dirs = {
        n for n in fsio.list_names(tree, spark) if n.startswith("bucket=")
    }
    if not bucket_dirs:
        if run["rows"] is None:  # legacy flat tree
            return spark.read.schema(idx_schema).parquet(tree)
        return None  # committed-empty run (all-dup window): nothing to read
    sel = sorted(bucket_dirs)
    nb = run["nb"]
    if probe_hashes is not None and nb and nb > 8:
        hit = {h % nb for h in probe_hashes}
        sel = [n for n in sel if int(n.split("=", 1)[1]) in hit]
        if not sel:
            return None
    schema_b = T.StructType(
        list(idx_schema) + [T.StructField("bucket", T.IntegerType())]
    )
    return (
        spark.read.schema(schema_b)
        .option("basePath", tree)
        .parquet(*[f"{tree}/{n}" for n in sel])
        .drop("bucket")
    )


def _read_run_class(spark, run: dict, idx_schema, j: int, of: int):
    """Rows of one hash congruence class (``pmod(_h, of) == j``) from a
    physical run — the slice-merge read path.

    When ``of`` divides the run's bucket count (always true for runs this
    module wrote with ``max_fold_rows`` set: bucket counts are powers of
    two and ``of`` is clamped to divide the smallest input), the class is
    exactly the buckets ``b ≡ j (mod of)`` — explicit sub-paths, reading
    1/of of the run. Otherwise (legacy/pre-pow2 runs) the whole run is
    read with a row-level pmod filter — correct, just not pruned; the
    one-time migration cost of slicing over an old layout.
    """
    if run["rows"] == 0:
        return None
    tree = run["path"]
    bucket_dirs = {
        n for n in fsio.list_names(tree, spark) if n.startswith("bucket=")
    }
    nb = run["nb"]
    if bucket_dirs and nb and nb % of == 0:
        sel = sorted(
            n for n in bucket_dirs if int(n.split("=", 1)[1]) % of == j
        )
        if not sel:
            return None
        schema_b = T.StructType(
            list(idx_schema) + [T.StructField("bucket", T.IntegerType())]
        )
        return (
            spark.read.schema(schema_b)
            .option("basePath", tree)
            .parquet(*[f"{tree}/{n}" for n in sel])
            .drop("bucket")
        )
    whole = _read_run(spark, run, idx_schema)
    if whole is None:
        return None
    return whole.filter(F.pmod(F.col("_h"), F.lit(of)) == j)


def _pick_merge_group(runs: list[dict]) -> list[dict] | None:
    """Binary-counter tiering: merge whenever ≥2 runs share a size tier
    (tier = bit_length of the row count), smallest tier first.

    Equal-ish window runs behave like incrementing a binary counter —
    two W-row runs fold to one 2W run, two 2W runs to one 4W run — so at
    any moment at most ~1 run lives per tier: the live run count AND the
    number of times any row is rewritten are both O(log(total ingested /
    window)). That bound is what makes the fold independent of corpus
    AGE: a fold's merge work is a function of recently ingested volume,
    with geometrically rarer (and geometrically larger) promotions — the
    classic size-tiered LSM amortization — instead of the previous
    layout's rewrite-everything-every-fold O(history) term. Legacy base
    trees (rows unknown without an O(history) count) never merge.
    """
    tiers: dict[int, list[dict]] = {}
    for r in runs:
        if r["rows"] is None or r.get("busy"):
            continue
        tiers.setdefault(max(r["rows"], 1).bit_length(), []).append(r)
    cand = [g for g in tiers.values() if len(g) >= 2]
    if not cand:
        return None
    return min(cand, key=lambda g: sum(r["rows"] for r in g))


def import_corpus_index(
    spark,
    corpus_path: str,
    *,
    n_buckets: int | None = None,
) -> str:
    """One-time onboarding of a HAND-IMPORTED corpus index: validate the
    layout of the marker-less legacy ``upto=<N>`` tree under
    ``{corpus_path}/index_compact`` and stamp its commit marker, so a
    ``first_batch_id`` bootstrap reads it as history instead of hitting
    the unmarked-tree raise in ``_committed_runs`` (the raise is correct —
    an unmarked tree could be torn crash residue — but a validated import
    deserves a one-call path to the marker instead of hand-written
    ``_nb``/``_SUCCESS`` files).

    Validates BEFORE stamping — a marker on a malformed tree would be
    trusted forever after:

    - exactly ONE marker-less ``upto=<N>`` tree exists (zero → nothing to
      import; several → ambiguous, refuse); a tree already carrying a
      marker is returned as-is (idempotent re-run);
    - the tree's rows carry the slim index schema the probe join reads:
      ``_h`` (xxhash64, long) and ``batch`` (int) with every batch in
      ``[0, N)`` — a missing/overflowing batch column would send text
      verification to ``data/batch=null`` or to batches the stream will
      itself write;
    - bucketed layout (``bucket=<k>/`` dirs): every row satisfies
      ``pmod(_h, nb) == bucket`` — write-side/read-side bucket-function
      agreement (:func:`_bucket_expr`); a mis-bucketed import silently
      LOSES dup matches, the worst failure mode this helper exists to
      prevent. ``nb`` defaults to ``max(bucket)+1`` — pass ``n_buckets``
      when trailing buckets are empty. One full scan of the slim index
      tree (8-byte keys): the right price for a one-time import.

    Stamps ``_nb`` (bucket count) on a bucketed tree, an empty
    ``_SUCCESS`` on a flat one; returns the tree path.
    """
    compact_root = f"{corpus_path}/index_compact"
    unmarked: list[tuple[int, str]] = []
    for name in fsio.list_names(compact_root, spark):
        if not name.startswith("upto="):
            continue
        path = f"{compact_root}/{name}"
        if fsio.exists(f"{path}/_nb", spark) or fsio.exists(f"{path}/_SUCCESS", spark):
            unmarked.append((-1, path))  # already committed: candidate no-op
            continue
        unmarked.append((int(name.split("=", 1)[1]), path))
    committed = [p for hi, p in unmarked if hi == -1]
    pending = [(hi, p) for hi, p in unmarked if hi >= 0]
    if not pending:
        if committed:
            return committed[0]
        raise ValueError(
            f"import_corpus_index: no legacy upto= tree under {compact_root}"
        )
    if len(pending) > 1:
        raise ValueError(
            "import_corpus_index: several marker-less upto= trees "
            f"({sorted(p for _, p in pending)}) — refusing to guess which "
            "is the import; remove or merge the extras first."
        )
    hi, tree = pending[0]
    df = spark.read.parquet(tree)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    if not isinstance(by_name.get("_h"), T.LongType):
        raise ValueError(
            f"import_corpus_index: {tree} lacks the long '_h' hash column "
            f"(found {sorted(by_name)}); the probe join reads (id, _h, batch)."
        )
    if "batch" not in by_name:
        raise ValueError(
            f"import_corpus_index: {tree} lacks the int 'batch' column — "
            "text verification prunes data/batch=<b> dirs by it; an import "
            "without it would verify against nothing."
        )
    bucket_dirs = sorted(
        int(n.split("=", 1)[1])
        for n in fsio.list_names(tree, spark)
        if n.startswith("bucket=")
    )
    checks = [
        F.sum(
            (F.col("batch").isNull() | (F.col("batch") < 0) | (F.col("batch") >= hi))
            .cast("long")
        ).alias("bad_batch"),
    ]
    nb = None
    if bucket_dirs:
        nb = n_buckets if n_buckets is not None else max(bucket_dirs) + 1
        if max(bucket_dirs) >= nb:
            raise ValueError(
                f"import_corpus_index: bucket dir {max(bucket_dirs)} ≥ "
                f"n_buckets={nb}"
            )
        checks.append(
            F.sum(
                (F.pmod(F.col("_h"), F.lit(nb)).cast("int") != F.col("bucket"))
                .cast("long")
            ).alias("bad_bucket")
        )
    stats = df.agg(*checks).first()
    if stats["bad_batch"]:
        raise ValueError(
            f"import_corpus_index: {stats['bad_batch']} rows of {tree} have "
            f"batch outside [0, {hi}) — the upto={hi} claim is wrong; fix "
            "the tree (or its name) before stamping."
        )
    if nb is not None and stats["bad_bucket"]:
        raise ValueError(
            f"import_corpus_index: {stats['bad_bucket']} rows violate "
            f"pmod(_h, {nb}) == bucket — the import was bucketed with a "
            "different function or count (pass n_buckets= if trailing "
            "buckets are empty); stamping would silently lose dup matches."
        )
    if nb is not None:
        fsio.write_text_atomic(f"{tree}/_nb", str(nb), spark=spark)
    else:
        fsio.write_text_atomic(f"{tree}/_SUCCESS", "", spark=spark)
    return tree


def start_corpus_dedup_ingest(
    docs: DataFrame,
    corpus_path: str,
    checkpoint_dir: str,
    id_col: str,
    text_col: str,
    *,
    trigger_seconds: int | None = None,
    available_now: bool = False,
    compact_every: int | None = None,
    bucket_target_rows: int = 1_000_000,
    first_batch_id: int = 0,
    verify_collect_cap: int = 20_000,
    max_merges_per_fold: int = 4,
    max_fold_rows: int | None = None,
    probe_hash_cap: int = 131_072,
    metrics: dict | None = None,
):
    """Continuous ingest dedup against ALL accumulated history — the
    daily-crawl loop (`operators.dedup.incremental_dedup`'s exact path)
    as a streaming topology: per micro-batch, classify every incoming
    document against the corpus built by all PRIOR batches, land only
    the fresh ones, and log every classification.

    Layout under ``corpus_path``:

    - ``data/batch=<id>/``  — the fresh documents each batch landed,
      sorted by id within files so candidate-id point lookups prune
      parquet row groups via min/max stats;
    - ``index/batch=<id>/`` — their slim (id, xxhash64) rows: future
      batches join THIS (8-byte keys), never the corpus texts;
    - ``index_compact/run=<name>/bucket=<k>/`` — the folded history
      index as a TIERED LSM of immutable hash-bucketed runs. Each run
      carries a ``_meta`` JSON (bucket count ``nb`` chosen at write time
      as ceil(rows / bucket_target_rows), ``rows``, covered batch range
      ``[lo, hi)``, and ``folds`` — the dirs it superseded). ``run=w<N>``
      is the window run fold N wrote; ``run=m<N>.<i>`` a merge output.
      Legacy single-tree ``upto=<N>`` layouts are still read (and serve
      as a frozen base run);
    - ``log/batch=<id>/``   — (id, status, match_id) per incoming doc:
      ``fresh`` | ``exact_dup`` (vs corpus, min matching id) |
      ``batch_dup`` (vs an earlier row of the same batch).

    Why buckets: a flat compact tree makes every micro-batch scan the
    ENTIRE history index — linear in corpus age. Bucketed, the probe
    opens only the buckets the incoming hashes land in: per-batch read
    volume is ~min(distinct incoming hashes, n_buckets) × bucket_target
    rows per live run — proportional to BATCH size, flat in history
    decades (measured in SCALE.md's endurance probe). One capped driver
    collect of the batch's distinct hashes prunes every run at once.
    The same idea applies to text verification: candidate index rows
    carry their landing batch, so the corpus-text read opens only
    ``data/batch=<b>`` dirs that actually hold a candidate (explicit
    paths — no full-tree partition listing) and pushes the candidate ids
    down as an IN filter for row-group pruning. Candidates are
    driver-bounded by ``verify_collect_cap`` (default 20k ≈ 1 MB of
    (id, batch) keys): under it, ONE bounded collect runs the probe join
    once and doubles as the verify join's broadcast side; over it (a
    degenerate cross-history dup storm), the plan falls back to a
    checkpointed candidate table and join-based pruning — same rows, no
    driver list.

    Why a TIERED LSM and not a single tree: rewriting one cumulative
    tree per fold costs O(history) every ``compact_every`` batches — the
    corpus-age-proportional term this layout removes. Instead a fold
    (1) writes the new window as its own small run — O(window) — then
    (2) merges runs sharing a size tier (binary-counter rule, see
    ``_pick_merge_group``): run count stays O(log ingest), each row is
    rewritten O(log ingest) times total, and a fold's cost is a function
    of recently-ingested volume — never of corpus age. (The obvious
    alternative — appending each window into a single tree's existing
    buckets with local bucket splits — does NOT work at window ≪ bucket
    count: every fold drops a tiny file into ~min(window, nb) buckets,
    so either file counts explode or per-bucket compaction rewrites
    bucket_target rows for every ~1 appended row — O(folds) write
    amplification. Tiering is the structure whose amplification is
    logarithmic.) ``max_merges_per_fold`` caps how far a promotion
    cascade runs within one fold; a deferred merge re-triggers next fold
    since sizes are unchanged.

    ``max_fold_rows`` additionally bounds the WORST-CASE single fold: a
    merge whose inputs exceed it executes as hash-congruence SLICES, one
    per fold — slice ``j`` holds the rows with ``pmod(_h, of) == j``,
    read bucket-aligned (bucket counts are powers of two and ``of``
    divides them) and committed as its own run ``run=m<N>.<i>.s<j>``.
    A complete slice set is equivalent to the single run an unsliced
    merge would write (the slices partition the hash space; same total
    bucket count) and participates in tiering as one virtual run, so
    slicing adds NO write amplification — it only spreads the same write
    across ``of`` folds. While a sliced merge is in flight its inputs
    and slices stay probe-visible (rows briefly duplicated — harmless)
    and merge-busy; the final slice lists the inputs in ``folds``, so
    input retirement rides the same resumable cleanup as unsliced
    merges, and a crash at ANY slice resumes at the next missing one.
    The effective floor of the cap is ~(#inputs × bucket_target_rows):
    ``of`` is clamped to divide every input's bucket count. Default
    None = unsliced (amortized-bounded folds only).

    Exactly-once WITHOUT marker files: every write is an overwrite of
    the batch's own partition directory (idempotent under re-delivery),
    and the classification base is ``batch < current_batch_id`` — so a
    replay whose previous attempt already landed its output classifies
    against exactly the same base and rewrites identical results, never
    against its own half-landed rows (the self-dup poisoning a naive
    append suffers).

    Crash safety of the fold itself rests on three mechanisms:
    (1) COMMIT GATES — a run is visible only once its ``_meta`` lands,
    and ``_meta`` is written strictly after the parquet job; inputs are
    deleted strictly after the output's ``_meta``. A crash at any point
    leaves the previous committed base row set fully intact (possibly
    alongside a committed-but-not-yet-cleaned output).
    (2) RESUMABLE CLEANUP — each run's ``_meta["folds"]`` names its
    inputs; any input still on disk at the next read is deleted then.
    (3) DUP TOLERANCE — in the crash window where an output AND its
    inputs are briefly both visible, index rows are duplicated; that is
    provably harmless here (a dup candidate verifies to the same text
    match and the classification takes min(match_id)), and merges bound
    accumulation by exact-row dropDuplicates. Replayed folds are
    idempotent: the window run is skipped if already committed (an
    unguarded rewrite would refold an EMPTY window over committed rows),
    and merge outputs are deterministic pure functions of their inputs.

    Collision safety mirrors the batch operator: the hash join only
    nominates candidates; texts are compared byte-for-byte for exactly
    the matched sliver.

    ``compact_every=N`` folds every N batches as above and deletes the
    folded ``index/batch=*`` dirs — bounding the per-batch file-listing
    cost that otherwise grows linearly with batch count. The ``data/``
    tree is never compacted: texts are read only for matched slivers,
    and folding data would rewrite the whole corpus each cycle.

    ``first_batch_id`` bootstraps the stream ATOP an imported corpus:
    when ``corpus_path`` already holds batches [0, first_batch_id) — a
    one-time batch import of an existing lake, laid out as ``data/
    batch=*`` plus a committed index run (either layout) — the stream's
    own numbering starts above them, so every imported batch satisfies
    ``batch < current`` and classifies as prior history from the very
    first trigger.

    ``metrics`` (optional dict, driver-side) collects per-fold
    instrumentation: ``metrics["fold"]`` grows one entry per executed
    fold with wall ms, window rows, merge input rows, and the live run
    count — the hook ``tools/corpus_dedup_bench.py`` uses to publish
    fold-cost-vs-history-decades evidence.
    """
    spark = docs.sparkSession

    def process(batch_df: DataFrame, stream_batch_id: int) -> None:
        batch_id = stream_batch_id + first_batch_id
        b = batch_df.select(
            F.col(id_col), F.col(text_col),
            F.xxhash64(F.col(text_col)).alias("_h"),
        ).localCheckpoint(eager=True)  # several passes below

        # Read the history index with an EXPLICIT schema, never a bare
        # try/except around the read: schema inference would turn "no
        # index yet" (first batch) and "index dir exists but only holds
        # an uncommitted _temporary from a crashed write" into errors,
        # while a bare except would also swallow transient read failures
        # (object-store hiccup, permission blip) and classify every
        # incoming doc as fresh, landing duplicates. With the schema
        # pinned, both empty states read as zero rows and any genuine IO
        # error still fails the micro-batch so the checkpoint retries it.
        idx_schema = T.StructType(
            [
                b.schema[id_col],
                T.StructField("_h", T.LongType()),
                T.StructField("batch", T.IntegerType()),
            ]
        )
        compact_root = f"{corpus_path}/index_compact"
        runs, pending = _committed_runs(
            spark, compact_root, index_root=f"{corpus_path}/index"
        )
        upto = max((r["hi"] for r in runs), default=0)

        # one capped collect of the batch's distinct hashes prunes the
        # buckets of EVERY run (batches beyond the cap read runs whole —
        # a correct superset; at that batch size pruning saves little)
        probe_hashes = None
        if any(
            q["nb"] and q["nb"] > 8
            for r in runs
            for q in (r.get("parts") or [r])
        ):
            hrows = (
                b.select("_h").distinct().limit(probe_hash_cap + 1).collect()
            )
            if len(hrows) <= probe_hash_cap:
                probe_hashes = [r[0] for r in hrows]

        parts = []
        for run in runs:
            rdf = _read_run(spark, run, idx_schema, probe_hashes)
            if rdf is not None:
                # batch < batch_id: the replay guard (a replayed fold's
                # own prior-attempt rows are invisible)
                parts.append(rdf.filter(F.col("batch") < batch_id))
        if fsio.exists(f"{corpus_path}/index", spark):
            parts.append(
                spark.read.schema(idx_schema)
                .parquet(f"{corpus_path}/index")
                # batch >= upto: rows below upto live in the runs
                # (residual not-yet-deleted folded dirs must not double)
                .filter(
                    (F.col("batch") < batch_id) & (F.col("batch") >= upto)
                )
            )
        base_idx = None
        if parts:
            base_idx = parts[0]
            for p in parts[1:]:
                base_idx = base_idx.unionByName(p)

        cand = None
        if base_idx is not None:
            cand_plan = b.join(
                base_idx.select(
                    F.col(id_col).alias("_bid"),
                    "_h",
                    F.col("batch").alias("_bb"),
                ),
                "_h",
            ).select(id_col, "_bid", "_bb")
            # ONE bounded collect runs the probe join exactly once and
            # serves THREE consumers: candidate ids (IN pushdown),
            # landing batches (explicit data paths), and — when bounded —
            # the verify join's cand side itself, rebuilt as a LOCAL
            # relation (broadcast, no shuffle, no re-execution). Only the
            # over-cap dup storm pays for a checkpoint + re-collect.
            cand_keys = cand_plan.limit(verify_collect_cap + 1).collect()
            if len(cand_keys) > verify_collect_cap:
                cand = cand_plan.localCheckpoint(eager=True)
                cand_keys = cand.select("_bid", "_bb").distinct().limit(
                    verify_collect_cap + 1
                ).collect()
            elif cand_keys:
                cand = spark.createDataFrame(
                    cand_keys,
                    T.StructType(
                        [
                            b.schema[id_col],
                            T.StructField("_bid", b.schema[id_col].dataType),
                            T.StructField("_bb", T.IntegerType()),
                        ]
                    ),
                )
            cand_batches = sorted({r["_bb"] for r in cand_keys})
        if cand is not None and cand_batches:
            # Text verification reads ONLY the batch dirs holding a
            # candidate — explicit sub-paths, so Spark never lists the
            # full data/ tree (the measured per-batch drift term). An
            # index row with batch=k guarantees data/batch=k committed:
            # within an attempt data lands before index, and replays
            # overwrite both.
            capped = len(cand_keys) <= verify_collect_cap
            if capped and len(cand_batches) <= 4096:
                base_src = (
                    spark.read.option("basePath", f"{corpus_path}/data")
                    .parquet(
                        *[
                            f"{corpus_path}/data/batch={v}"
                            for v in cand_batches
                        ]
                    )
                )
            else:  # degenerate cross-history dup storm: full read is
                # cheaper than ten-thousand explicit paths
                base_src = spark.read.parquet(f"{corpus_path}/data").filter(
                    F.col("batch") < batch_id
                )
            # candidate ids as an IN filter when bounded: pushed to the
            # parquet scan, prunes row groups via min/max stats (data is
            # written id-sorted). Above the bound, a broadcast-able
            # semi-join does the same work without a driver-side list.
            if capped:
                ids = {r["_bid"] for r in cand_keys}
                pruned = base_src.filter(F.col(id_col).isin(list(ids)))
            else:
                pruned = base_src.join(
                    cand.select(F.col("_bid").alias(id_col)).distinct(),
                    id_col,
                    "left_semi",
                )
            base_txt = pruned.select(
                F.col(id_col).alias("_bid"), F.col(text_col).alias("_bt")
            )
            exact = (
                cand.join(base_txt, "_bid")
                .join(b.select(id_col, text_col), id_col)
                .filter(F.col(text_col) == F.col("_bt"))
                .groupBy(id_col)
                .agg(F.min("_bid").alias("match_id"))
            )
        else:
            exact = b.select(id_col).limit(0).withColumn(
                "match_id", F.col(id_col)
            )

        # within-batch dups: first (min id) per identical text survives.
        # ONE window shuffle (partition by text) replaces the former
        # groupBy(text) + join-back-on-text pair, and the classified rows
        # keep text + _h so every write below is a pure filter+project
        # over the pinned result — no per-write semi-join back to the
        # batch. The price is pinning the batch's texts twice (b and
        # log); both are exactly batch-sized, never history-sized.
        keep = F.min(id_col).over(Window.partitionBy(text_col))
        log = (
            b.withColumn("_keep", keep)
            .join(exact, id_col, "left")  # exact is candidate-sized: AQE
            # broadcasts it under the classification window's shuffle
            .select(
                id_col, text_col, "_h",
                F.when(F.col("match_id").isNotNull(), F.lit("exact_dup"))
                .when(F.col(id_col) != F.col("_keep"), F.lit("batch_dup"))
                .otherwise(F.lit("fresh"))
                .alias("status"),
                F.coalesce(
                    "match_id",
                    F.when(F.col(id_col) != F.col("_keep"), F.col("_keep")),
                ).alias("match_id"),
            )
        ).localCheckpoint(eager=True)  # classification pinned pre-write

        fresh = log.filter(F.col("status") == "fresh")
        # id-sorted within files → row-group min/max stats make the
        # candidate-id IN pushdown above actually skip
        fresh.select(id_col, text_col).sortWithinPartitions(id_col).write.mode(
            "overwrite"
        ).parquet(f"{corpus_path}/data/batch={batch_id}")
        # slim outputs collapse to ONE file per batch: a 10M-row index
        # partition is ~160 MB — fine as a single file — while inheriting
        # the batch's 32-way partitioning would grow the per-batch
        # listing cost of `index/` by 32× (the small-files problem is the
        # first thing that drifts in the endurance bench). repartition,
        # NOT coalesce: coalesce(1) would collapse the upstream
        # classification join itself into one task, while the repartition
        # shuffle moves only the slim output rows.
        fresh.select(id_col, "_h").repartition(1).write.mode(
            "overwrite"
        ).parquet(f"{corpus_path}/index/batch={batch_id}")
        log.select(id_col, "status", "match_id").repartition(1).write.mode(
            "overwrite"
        ).parquet(f"{corpus_path}/log/batch={batch_id}")

        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            t_fold = time.perf_counter()
            new_upto = batch_id + 1
            wname = f"run=w{new_upto}"
            window_rows = 0

            def _write_run(df, name: str, rows: int, lo: int, hi: int,
                           folds: list[str], part: dict | None = None) -> dict:
                # bucket count = next power of two ≥ rows/target: buckets
                # stay within [target/2, target] AND any slice factor
                # `of` (itself a power of two ≤ nb) divides nb, keeping
                # slice reads bucket-aligned
                nb = 1 << max(0, (max(1, -(-rows // bucket_target_rows)) - 1)
                              .bit_length())
                path = f"{compact_root}/{name}"
                # parquet job first (readers ignore the dir until _meta
                # lands), THEN the meta — a crash between leaves the dir
                # invisible and every input intact
                (
                    df.withColumn("bucket", _bucket_expr(nb))
                    .repartition(nb, "bucket")
                    .write.partitionBy("bucket")
                    .mode("overwrite")
                    .parquet(path)
                )
                meta = {"nb": nb, "rows": rows, "lo": lo, "hi": hi,
                        "folds": folds}
                if part:
                    meta["part"] = part
                fsio.write_text_atomic(
                    f"{path}/_meta", json.dumps(meta), spark
                )
                return {"name": name, "path": path, "nb": nb, "rows": rows,
                        "lo": lo, "hi": hi, "folds": folds, "part": part,
                        "legacy": False}

            def _materialize_merge(parts_dfs):
                if parts_dfs:
                    mdf = parts_dfs[0]
                    for p in parts_dfs[1:]:
                        mdf = mdf.unionByName(p)
                    # exact-row dedup bounds crash-window duplicates; the
                    # key includes batch so two legit landings of the
                    # same id (same doc id, different text/epoch) survive
                    mdf = mdf.dropDuplicates(
                        [id_col, "_h", "batch"]
                    ).localCheckpoint(eager=True)
                    return mdf, mdf.count()
                return spark.createDataFrame([], idx_schema), 0

            # (1) the window run: O(window), skipped on a replay whose
            # prior attempt already committed it (the window read below
            # would come back empty — an unguarded rewrite would replace
            # the committed rows with nothing)
            if upto < new_upto and not fsio.exists(
                f"{compact_root}/{wname}/_meta", spark
            ):
                window = (
                    spark.read.schema(idx_schema)
                    .parquet(f"{corpus_path}/index")
                    .filter(
                        (F.col("batch") < new_upto) & (F.col("batch") >= upto)
                    )
                    .localCheckpoint(eager=True)  # count + write
                )
                window_rows = window.count()
                runs.append(
                    _write_run(window, wname, window_rows, upto, new_upto, [])
                )
                upto = new_upto
            # folded per-batch index dirs: delete strictly after commit
            for n in fsio.list_names(f"{corpus_path}/index", spark):
                if n.startswith("batch=") and int(n.split("=", 1)[1]) < upto:
                    fsio.delete(f"{corpus_path}/index/{n}", spark=spark)

            # (2a) an in-flight SLICED merge advances ONE slice per fold
            # (work ≈ total/of ≤ max_fold_rows); only one sliced merge is
            # ever in flight, so per-fold merge work stays bounded. The
            # final slice carries the inputs in its folds list — the
            # existing resumable-cleanup machinery then retires them.
            merged_rows = 0
            slice_info = None

            def _tier_maintenance(budget: int, allow_slice_start: bool):
                # (2b) binary-counter merges, smallest tier first, at most
                # `budget` promotions per fold; a group over max_fold_rows
                # STARTS a sliced merge (slice 0 now, one more per
                # subsequent fold) instead of paying the whole merge in
                # one fold — unless a sliced merge is already in flight
                # (allow_slice_start=False), in which case oversized
                # groups simply wait their turn.
                nonlocal runs, merged_rows, slice_info
                next_m = 0
                for _ in range(budget):
                    group = _pick_merge_group(runs)
                    if group is None:
                        break
                    phys = [
                        q for r in group for q in (r.get("parts") or [r])
                    ]
                    total = sum(q["rows"] for q in phys)
                    # name must not collide with any COMMITTED run — a
                    # replayed fold whose prior attempt committed m<N>.0
                    # would otherwise emit an output that lists itself in
                    # folds (self-cleanup = data loss) or overwrites a
                    # live input mid-plan. Slice dirs of the same id
                    # collide too (run=<id>.s0), so both forms gate.
                    taken = {
                        q["name"]
                        for r in runs
                        for q in (r.get("parts") or [r])
                    } | {r["name"] for r in runs}
                    while (
                        f"run=m{new_upto}.{next_m}" in taken
                        or f"run=m{new_upto}.{next_m}.s0" in taken
                    ):
                        next_m += 1
                    mid = f"m{new_upto}.{next_m}"
                    if max_fold_rows and total > max_fold_rows:
                        if not allow_slice_start:
                            # one in-flight sliced merge at a time; the
                            # smallest candidate group is already over the
                            # cap, so there is no small-tier work left
                            break
                        # slice factor: smallest power of two bringing
                        # per-slice rows under the cap, clamped to divide
                        # every input's bucket count (all powers of two
                        # for runs this module wrote; the clamp floors
                        # the effective cap at ~inputs × bucket_target)
                        need = 1 << max(
                            1, (-(-total // max_fold_rows) - 1).bit_length()
                        )
                        div = min(
                            (q["nb"] & -q["nb"] for q in phys if q["rows"]),
                            default=1,
                        )
                        of = min(need, div)
                        if of >= 2:
                            inputs = [q["name"] for q in phys]
                            class_dfs = [
                                d
                                for q in phys
                                if (
                                    d := _read_run_class(
                                        spark, q, idx_schema, 0, of
                                    )
                                )
                                is not None
                            ]
                            mdf, rows = _materialize_merge(class_dfs)
                            _write_run(
                                mdf, f"run={mid}.s0", rows,
                                min(q["lo"] for q in phys),
                                max(q["hi"] for q in phys),
                                [],
                                part={"id": mid, "slice": 0, "of": of,
                                      "inputs": inputs},
                            )
                            merged_rows += rows
                            slice_info = {"id": mid, "slice": 0, "of": of,
                                          "done": False}
                            break  # one in-flight sliced merge at a time
                        # of < 2: inputs too coarse to slice — fall
                        # through to the unsliced merge (loud in metrics:
                        # merged_rows > max_fold_rows)
                    mparts = [
                        d
                        for q in phys
                        if (d := _read_run(spark, q, idx_schema)) is not None
                    ]
                    mdf, rows = _materialize_merge(mparts)
                    merged_rows += rows
                    out = _write_run(
                        mdf, f"run={mid}", rows,
                        min(r["lo"] for r in group),
                        max(r["hi"] for r in group),
                        [q["name"] for q in phys],
                    )
                    for q in phys:  # inputs die strictly after the commit
                        fsio.delete(q["path"], spark=spark)
                    runs = [r for r in runs if r not in group] + [out]

            if pending:
                p = pending[0]
                j = min(set(range(p["of"])) - p["have"])
                phys_map = {
                    q["name"]: q
                    for r in runs
                    for q in (r.get("parts") or [r])
                }
                missing = [n for n in p["inputs"] if n not in phys_map]
                if missing:
                    # protocol violation: inputs are deleted only via the
                    # final slice's folds, and the set is incomplete
                    raise RuntimeError(
                        f"sliced merge {p['id']}: input run(s) vanished "
                        f"with slices incomplete: {missing}"
                    )
                class_dfs = [
                    d
                    for n in p["inputs"]
                    if (
                        d := _read_run_class(
                            spark, phys_map[n], idx_schema, j, p["of"]
                        )
                    )
                    is not None
                ]
                mdf, rows = _materialize_merge(class_dfs)
                last = len(p["have"]) + 1 == p["of"]
                _write_run(
                    mdf, f"run={p['id']}.s{j}", rows, p["lo"], p["hi"],
                    list(p["inputs"]) if last else [],
                    part={"id": p["id"], "slice": j, "of": p["of"],
                          "inputs": list(p["inputs"])},
                )
                merged_rows += rows
                if last:  # inputs die strictly after the final commit
                    for n in p["inputs"]:
                        fsio.delete(f"{compact_root}/{n}", spark=spark)
                slice_info = {"id": p["id"], "slice": j, "of": p["of"],
                              "done": last}
                # cap-bounded SMALL-TIER merges proceed alongside the
                # in-flight slice (the slice consumed one promotion of
                # the budget; _pick_merge_group skips busy runs, so the
                # merge in flight is untouchable). Without this, a long
                # top-tier slice (of folds) suspends ALL tiering and the
                # live-run count grows O(of) as new window runs pile up
                # unmerged — per-batch probe listing/open cost with it.
                _tier_maintenance(
                    max_merges_per_fold - 1, allow_slice_start=False
                )
            else:
                _tier_maintenance(
                    max_merges_per_fold, allow_slice_start=True
                )

            if metrics is not None:
                entry = {
                    "batch": batch_id,
                    "ms": round((time.perf_counter() - t_fold) * 1000),
                    "window_rows": window_rows,
                    "merged_rows": merged_rows,
                    "n_runs": len(runs),
                }
                if slice_info:
                    entry["slice"] = slice_info
                metrics.setdefault("fold", []).append(entry)

    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
