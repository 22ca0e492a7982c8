"""Tests for the corpus-curation operators: PII scan/redaction, domain
reports, deterministic stratified sampling, character entropy."""

import math

import pytest
from pyspark.sql import functions as F

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import (
    c4_clean,
    char_entropy,
    domain_report,
    extract_domains,
    gopher_rules,
    pii_scan,
    redact_pii,
    stratified_sample,
)


PII_DOCS = [
    (1, "contact alice@example.com or bob.smith+x@sub.domain.org today"),
    (2, "call 555-867-5309 or 212.555.0134 maybe"),
    (3, "server at 10.0.0.1 and 192.168.255.254 responded"),
    (4, "mixed: eve@10.0.0.1.corp.com phoned 555-123-4567 from 8.8.8.8"),
    (5, "nothing sensitive here at all"),
]


def pii_df(spark):
    return spark.createDataFrame(PII_DOCS, "doc_id long, text string")


class TestPII:
    def test_scan_counts(self, spark):
        rows = {r["doc_id"]: r for r in pii_scan(pii_df(spark), "doc_id", "text").collect()}
        assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ipv4"]) == (2, 0, 0)
        # '212.555.0134' is dot-separated 3-3-4 → phone, and also a dotted
        # quad prefix-shaped string — but only 3 groups, so NOT ipv4.
        assert (rows[2]["n_email"], rows[2]["n_phone"], rows[2]["n_ipv4"]) == (0, 2, 0)
        assert rows[3]["n_ipv4"] == 2
        # eve@10.0.0.1.corp.com is an email (alpha TLD) whose host embeds an
        # ipv4-shaped quad: scan counts each class independently.
        assert rows[4]["n_email"] == 1 and rows[4]["n_phone"] == 1 and rows[4]["n_ipv4"] == 2
        assert (rows[5]["n_email"], rows[5]["n_phone"], rows[5]["n_ipv4"]) == (0, 0, 0)

    def test_redact_order_email_wins_over_ip(self, spark):
        # user@10.0.0.1.corp.com must become one <EMAIL>, never eve@<IP>…
        # — the email pattern applies first.
        out = {r["doc_id"]: r["redacted"]
               for r in redact_pii(pii_df(spark), "doc_id", "text").collect()}
        assert out[4] == "mixed: <EMAIL> phoned <PHONE> from <IP>"
        assert out[1] == "contact <EMAIL> or <EMAIL> today"
        assert out[5] == "nothing sensitive here at all"

    def test_redact_keeps_all_ids(self, spark):
        assert redact_pii(pii_df(spark), "doc_id", "text").count() == len(PII_DOCS)


URL_DOCS = [
    (1, "see https://a.example.com/x and https://b.example.com/y"),
    (2, "again https://a.example.com/z plus http://blocked.bad/page"),
    (3, "no links at all"),
]


class TestDomains:
    def test_extract(self, spark):
        df = spark.createDataFrame(URL_DOCS, "doc_id long, text string")
        got = sorted((r["doc_id"], r["domain"]) for r in
                     extract_domains(df, "doc_id", "text").collect())
        assert got == [(1, "a.example.com"), (1, "b.example.com"),
                       (2, "a.example.com"), (2, "blocked.bad")]

    def test_report_with_blocklist(self, spark):
        df = spark.createDataFrame(URL_DOCS, "doc_id long, text string")
        block = spark.createDataFrame([("blocked.bad",)], ["domain"])
        got = {r["domain"]: (r["n_urls"], r["n_docs"]) for r in
               domain_report(df, "doc_id", "text", blocklist=block).collect()}
        assert got == {"a.example.com": (2, 2), "b.example.com": (1, 1)}


class TestStratifiedSample:
    def test_rates_and_determinism(self, spark):
        df = spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)],
            "doc_id long, lang string",
        )
        out = stratified_sample(df, "doc_id", "lang",
                                rates_ppm={"en": 500_000, "zh": 0})
        rows = out.collect()
        assert all(r["lang"] == "en" for r in rows)  # zh rate 0 → excluded
        # ~50% of the 1000 en rows; md5 is uniform so ±10% is generous.
        assert 400 <= len(rows) <= 600
        # deterministic: same output under a different partitioning
        again = stratified_sample(df.repartition(7), "doc_id", "lang",
                                  rates_ppm={"en": 500_000, "zh": 0})
        assert sorted(r["doc_id"] for r in again.collect()) == sorted(
            r["doc_id"] for r in rows)

    def test_default_rate_keeps_unlisted_strata(self, spark):
        df = spark.createDataFrame([(1, "fr"), (2, "fr")], "doc_id long, lang string")
        assert stratified_sample(df, "doc_id", "lang", rates_ppm={"en": 0}).count() == 2

    def test_bad_rate_raises(self, spark):
        df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
        with pytest.raises(ValueError):
            stratified_sample(df, "doc_id", "lang", rates_ppm={"en": 2_000_000})


GOOD_PAGE = (
    "this is a perfectly reasonable first sentence.\n"
    "and here is another good line of text!\n"
    'a third line ends with a quote says "someone"\n'
    "short one."  # < 5 words → line dropped, doc still has 3 kept lines
)


class TestC4Clean:
    def test_good_page_keeps_qualifying_lines(self, spark):
        df = spark.createDataFrame([(1, GOOD_PAGE)], "doc_id long, text string")
        row = c4_clean(df, "doc_id", "text").collect()[0]
        assert row["doc_kept"] is True
        assert row["n_lines"] == 4 and row["n_kept"] == 3
        assert row["clean_text"].split("\n") == GOOD_PAGE.split("\n")[:3]

    def test_line_rules(self, spark):
        page = (
            "no terminal punctuation so this line goes\n"      # no punct
            "enable javascript to view this content please.\n"  # javascript
            "one two three four five six seven eight nine.\n"   # kept
            "good line with plenty of words right here.\n"      # kept
            "a third keeper so the page survives overall."      # kept
        )
        row = c4_clean(spark.createDataFrame([(1, page)], "doc_id long, text string"),
                       "doc_id", "text").collect()[0]
        assert row["n_lines"] == 5 and row["n_kept"] == 3 and row["doc_kept"] is True

    def test_page_rules_drop_doc(self, spark):
        lorem = GOOD_PAGE + "\nlorem ipsum dolor sit amet consectetur."
        brace = GOOD_PAGE.replace("another good", "another { good")
        few = "only one qualifying line lives in this document."
        df = spark.createDataFrame(
            [(1, lorem), (2, brace), (3, few)], "doc_id long, text string")
        rows = {r["doc_id"]: r for r in c4_clean(df, "doc_id", "text").collect()}
        assert not rows[1]["doc_kept"] and rows[1]["clean_text"] == ""
        assert not rows[2]["doc_kept"]
        # doc 3 has 1 kept line < min_lines=3
        assert rows[3]["n_kept"] == 1 and not rows[3]["doc_kept"]

    def test_min_words_per_line_param(self, spark):
        df = spark.createDataFrame([(1, "tiny line here.\n" * 4)],
                                   "doc_id long, text string")
        strict = c4_clean(df, "doc_id", "text", min_words_per_line=5).collect()[0]
        loose = c4_clean(df, "doc_id", "text", min_words_per_line=3).collect()[0]
        assert strict["n_kept"] == 0 and not strict["doc_kept"]
        assert loose["n_kept"] == 4 and loose["doc_kept"]


class TestGopherRules:
    def test_rule_flags(self, spark):
        prose = ("the cat sat on the mat and then the dog came to sit with "
                 "the cat near the warm fire in the old house " * 3)
        short = "too few words here"
        longword = " ".join(["pneumonoultramicroscopic"] * 60)
        df = spark.createDataFrame(
            [(1, prose), (2, short), (3, longword)], "doc_id long, text string")
        rows = {r["doc_id"]: r for r in gopher_rules(df, "doc_id", "text").collect()}
        assert rows[1]["ok_words"] and rows[1]["ok_avg_len"] and rows[1]["ok_stopwords"]
        assert rows[1]["pass"]
        assert not rows[2]["ok_words"] and not rows[2]["pass"]
        assert not rows[3]["ok_avg_len"] and not rows[3]["ok_stopwords"]

    def test_symbol_and_alpha_rules(self, spark):
        hashy = "the " + "# " * 40 + "of and that have with be to"
        df = spark.createDataFrame([(1, hashy)], "doc_id long, text string")
        row = gopher_rules(df, "doc_id", "text").collect()[0]
        assert not row["ok_symbols"]      # 40 '#' over ~49 words > 0.1
        assert not row["ok_alpha"]        # '#' words have no alphabetic char
        assert not row["pass"]

    def test_stopword_distinctness(self, spark):
        # 'the' repeated 60 times is ONE distinct stopword — fails min 2.
        df = spark.createDataFrame([(1, "the " * 60)], "doc_id long, text string")
        assert not gopher_rules(df, "doc_id", "text").collect()[0]["ok_stopwords"]


class TestCuratePipeline:
    def test_gate_dedup_split_compose(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import (
            curate_corpus,
        )
        prose = ("the cat sat on the mat and then the dog came to sit with "
                 "the cat near the warm fire in the old house eating food "
                 "while the rain fell on the roof of the small barn outside")
        df = spark.createDataFrame(
            [(1, prose), (2, prose), (3, prose + " again today"),
             (4, "too short")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in curate_corpus(
            df, "doc_id", "text",
            gopher_kwargs=dict(min_words=10, max_words=100),
        ).collect()}
        # doc 4 fails the word-count gate; docs 1/2 are exact dups → min id
        # 1 survives with dup_count 2; doc 3 is distinct.
        assert set(out) == {1, 3}
        assert out[1]["dup_count"] == 2 and out[3]["dup_count"] == 1
        assert out[1]["n_tokens"] == len(prose.split())
        assert all(r["split"] in ("train", "val") for r in out.values())

    def test_split_is_partitioning_invariant(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import (
            curate_corpus,
        )
        docs = [(i, f"the a value table row filler{i} " * 8) for i in range(100)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        kw = dict(gopher_kwargs=dict(min_words=10, max_words=100,
                                     max_avg_word_len=12.0,
                                     stopwords=("the", "a", "value")))
        a = {r["doc_id"]: r["split"]
             for r in curate_corpus(df, "doc_id", "text", **kw).collect()}
        b = {r["doc_id"]: r["split"]
             for r in curate_corpus(df.repartition(13), "doc_id", "text", **kw).collect()}
        assert len(a) == 100 and a == b


class TestCharEntropy:
    def test_known_values(self, spark):
        df = spark.createDataFrame(
            [(1, "aaaaaaaa"),            # single symbol → 0 bits
             (2, "abababab"),            # two equiprobable symbols → 1 bit
             (3, "abcd"),                # four equiprobable → 2 bits
             (4, "1234!!!!"),            # nothing in alphabet → 0, n_alpha 0
             (5, "AAAA")],               # lowercased first → 'a', 0 bits
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in char_entropy(df, "doc_id", "text").collect()}
        assert rows[1]["n_alpha"] == 8 and rows[1]["entropy"] == 0.0
        assert rows[2]["entropy"] == pytest.approx(1.0)
        assert rows[3]["entropy"] == pytest.approx(2.0)
        assert rows[4]["n_alpha"] == 0 and rows[4]["entropy"] == 0.0
        assert rows[5]["n_alpha"] == 4 and rows[5]["entropy"] == 0.0

    def test_uniform_alphabet_is_max(self, spark):
        df = spark.createDataFrame(
            [(1, "abcdefghijklmnopqrstuvwxyz ")], "doc_id long, text string")
        row = char_entropy(df, "doc_id", "text").collect()[0]
        assert row["entropy"] == pytest.approx(math.log2(27))

    def test_prose_beats_repetition(self, spark):
        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog"),
             (2, "aa aa aa aa aa aa aa aa aa aa aa aa aa aa")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r["entropy"]
                for r in char_entropy(df, "doc_id", "text").collect()}
        assert rows[1] > 3.5 > 1.5 > rows[2]


class TestCanonicalUrl:
    def _canon(self, spark, urls):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import canonical_url_col
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return [r[0] for r in df.select(canonical_url_col(F.col("url"))).collect()]

    def test_variants_collapse(self, spark):
        variants = [
            "HTTP://WWW.Example.COM:80/a//b/?utm_source=x&b=2&a=1#frag",
            "http://example.com/a/b?a=1&b=2",
            "http://example.com/a/b/?b=2&a=1&fbclid=zzz",
        ]
        assert len(set(self._canon(spark, variants))) == 1
        assert self._canon(spark, variants)[0] == "http://example.com/a/b?a=1&b=2"

    def test_https_default_port_and_root_path(self, spark):
        got = self._canon(spark, ["https://Site.org:443/", "https://site.org"])
        assert got == ["https://site.org", "https://site.org"]

    def test_semantics_preserved(self, spark):
        # non-default port, real params, userinfo: all kept; fragment dropped
        got = self._canon(spark, ["http://u:p@host.com:8080/x?q=1&page=2#top"])
        assert got == ["http://u:p@host.com:8080/x?page=2&q=1"]

    def test_non_url_routes_to_empty(self, spark):
        assert self._canon(spark, ["not a url", "ftp//broken"]) == ["", ""]

    def test_url_dedup_groups(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import url_dedup
        df = spark.createDataFrame(
            [(1, "http://a.com/x?utm_source=s"), (2, "HTTP://WWW.A.com:80/x"),
             (3, "https://a.com/x"), (4, "http://a.com/x/")],
            "id long, url string",
        )
        rows = {r["canonical_url"]: (r["keep_id"], r["n_dups"])
                for r in url_dedup(df, "id", "url").collect()}
        assert rows["http://a.com/x"] == (1, 3)
        assert rows["https://a.com/x"] == (3, 1)


class TestGroupSample:
    """Exactly-k per-group deterministic sampling."""

    def _docs(self, spark, n=300, groups=3):
        return spark.createDataFrame(
            [(i, f"g{i % groups}") for i in range(n)], "id long, grp string"
        )

    def test_exactly_k_per_group(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import group_sample
        out = group_sample(self._docs(spark), "id", ["grp"], 7).collect()
        by_grp = {}
        for r in out:
            by_grp.setdefault(r["grp"], []).append(r["sample_rank"])
        assert set(by_grp) == {"g0", "g1", "g2"}
        for ranks in by_grp.values():
            assert sorted(ranks) == list(range(1, 8))

    def test_small_groups_kept_whole(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import group_sample
        df = self._docs(spark, n=9, groups=3)  # 3 rows per group
        out = group_sample(df, "id", ["grp"], 7).collect()
        assert len(out) == 9
        assert {r["id"] for r in out} == set(range(9))

    def test_partition_invariant_and_deterministic(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import group_sample
        df = self._docs(spark)
        a = {(r["grp"], r["id"], r["sample_rank"])
             for r in group_sample(df, "id", ["grp"], 5).collect()}
        b = {(r["grp"], r["id"], r["sample_rank"])
             for r in group_sample(df.repartition(17), "id", ["grp"], 5).collect()}
        assert a == b and len(a) == 15

    def test_zero_candidate_undershoot_replays_exactly(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import group_sample
        df = self._docs(spark)
        # oversample so tiny the threshold admits (almost) nothing: the
        # replay branch must still deliver the exact same top-k as the
        # normal path — the threshold prunes work, never changes output.
        normal = {(r["grp"], r["id"], r["sample_rank"])
                  for r in group_sample(df, "id", ["grp"], 5).collect()}
        starved = {(r["grp"], r["id"], r["sample_rank"])
                   for r in group_sample(df, "id", ["grp"], 5,
                                         oversample=1e-9).collect()}
        assert starved == normal

    def test_md5_variant_matches_xx_contract_shape(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import group_sample
        out = group_sample(self._docs(spark), "id", ["grp"], 4,
                           hash_fn="md5").collect()
        assert len(out) == 12
        # different hash -> (almost surely) different sample than xx; both
        # are valid uniform samples. Just pin determinism of the md5 path.
        again = group_sample(self._docs(spark), "id", ["grp"], 4,
                             hash_fn="md5").collect()
        assert {tuple(r) for r in out} == {tuple(r) for r in again}

    def test_k_must_be_positive(self, spark):
        import pytest as _pytest
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import group_sample
        with _pytest.raises(ValueError):
            group_sample(self._docs(spark), "id", ["grp"], 0)


class TestCompressionSignals:
    """zlib compression-ratio signal: the contracts thresholding relies on."""

    def _sig(self, spark, rows):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import compression_signals
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r for r in compression_signals(df, "doc_id", "text").collect()}

    def test_repetitive_compresses_below_prose_below_random(self, spark):
        import random
        rng = random.Random(7)
        rows = [
            (1, "spam " * 200),
            (2, ("the quick brown fox jumps over the lazy dog and then "
                 "wanders off toward the river where ducks are feeding ") * 10),
            (3, "".join(chr(rng.randint(33, 0x2FFF)) for _ in range(1000))),
        ]
        s = self._sig(spark, rows)
        assert (s[1]["compression_ratio"] < s[2]["compression_ratio"]
                < s[3]["compression_ratio"])
        assert s[1]["compression_ratio"] < 0.05   # near-pure repetition
        assert s[3]["compression_ratio"] > 0.5    # high-entropy content

    def test_utf8_byte_accounting_and_empty(self, spark):
        s = self._sig(spark, [(1, "héllo"), (2, ""), (3, None)])
        assert s[1]["n_bytes"] == 6  # é is two UTF-8 bytes
        for k in (2, 3):
            assert s[k]["n_bytes"] == 0 and s[k]["compression_ratio"] is None

    def test_deterministic_across_runs_and_partitioning(self, spark):
        rows = [(i, f"document body {i} " * (i % 7 + 1)) for i in range(50)]
        a = self._sig(spark, rows)
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import compression_signals
        df = spark.createDataFrame(rows, "doc_id long, text string").repartition(13)
        b = {r["doc_id"]: r for r in compression_signals(df, "doc_id", "text").collect()}
        assert {k: tuple(v) for k, v in a.items()} == {k: tuple(v) for k, v in b.items()}


class TestNormalizeUnicode:
    def test_nfc_composes_and_nfkc_folds(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.textops import normalize_unicode
        df = spark.createDataFrame(
            [(1, "Café ﬁle"), (2, None)], "id long, s string"
        )
        nfc = {r["id"]: r["s"] for r in normalize_unicode(df, ["s"]).collect()}
        assert nfc[1] == "Café ﬁle" and nfc[2] is None
        nfkc = {r["id"]: r["s"]
                for r in normalize_unicode(df, ["s"], form="NFKC").collect()}
        assert nfkc[1] == "Café file"  # ligature folded

    def test_normalization_makes_dedup_keys_agree(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.dedup import exact_dedup
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.textops import normalize_unicode
        df = spark.createDataFrame(
            [(1, "café"), (2, "café")], "id long, s string"
        )
        # without normalization the two spellings are distinct byte keys
        assert exact_dedup(df, ["s"], "id").count() == 2
        assert exact_dedup(normalize_unicode(df, ["s"]), ["s"], "id").count() == 1

    def test_unknown_form_raises(self, spark):
        import pytest as _pytest
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.textops import normalize_unicode
        df = spark.createDataFrame([(1, "x")], "id long, s string")
        with _pytest.raises(ValueError):
            normalize_unicode(df, ["s"], form="NFX")


class TestMixCorpus:
    """Dataset-mixture sampling: binding group, rate arithmetic, drops."""

    def _docs(self, spark):
        rows = []
        for i in range(300):
            g = ["en", "zh", "de"][i % 3]
            rows.append((i, g, 100))  # equal weight per row
        return spark.createDataFrame(rows, "id long, lang string, w long")

    def test_output_shares_approach_target(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import mix_corpus
        out = mix_corpus(
            self._docs(spark), "id", "lang", "w",
            {"en": 600_000, "zh": 300_000, "de": 100_000},
        ).collect()
        by = {}
        for r in out:
            by[r["lang"]] = by.get(r["lang"], 0) + r["w"]
        total = sum(by.values())
        # en is binding (equal totals, largest share): kept ~whole; shares
        # within Bernoulli noise of target (100 docs/group)
        assert by["en"] >= 0.999 * 100 * 100  # binding group: rate ~1e6
        # (floor slack ≤ share/T ppm, so at most a stray doc drops)
        assert abs(by["zh"] / total - 0.3) < 0.1
        assert abs(by["de"] / total - 0.1) < 0.06

    def test_binding_group_keeps_everything(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import mix_corpus
        rates = {
            r["lang"]: r["rate_ppm"]
            for r in mix_corpus(
                self._docs(spark), "id", "lang", "w",
                {"en": 600_000, "zh": 300_000, "de": 100_000},
            ).select("lang", "rate_ppm").distinct().collect()
        }
        assert rates["en"] == 999_960  # 1e6 minus the documented floor slack
        assert rates["zh"] == 499_980 and rates["de"] == 166_660

    def test_groups_outside_mixture_are_dropped(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import mix_corpus
        out = mix_corpus(
            self._docs(spark), "id", "lang", "w", {"en": 500_000, "zh": 500_000}
        )
        assert out.filter("lang = 'de'").count() == 0

    def test_invalid_targets_raise(self, spark):
        import pytest as _pytest
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import mix_corpus
        df = self._docs(spark)
        with _pytest.raises(ValueError):
            mix_corpus(df, "id", "lang", "w", {})
        with _pytest.raises(ValueError):
            mix_corpus(df, "id", "lang", "w", {"en": 0})
        with _pytest.raises(ValueError):
            mix_corpus(df, "id", "lang", "w", {"en": 900_000, "zh": 200_000})

    def test_deterministic_under_repartition(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import mix_corpus
        t = {"en": 700_000, "zh": 300_000}
        a = {r["id"] for r in mix_corpus(self._docs(spark), "id", "lang", "w", t).collect()}
        b = {r["id"] for r in mix_corpus(
            self._docs(spark).repartition(11), "id", "lang", "w", t).collect()}
        assert a == b


class TestPseudonymize:
    def test_tokens_preserve_joins_and_hide_values(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import pseudonymize
        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c"), (None, "d")], "uid long, x string"
        )
        tok = pseudonymize(df, ["uid"], secret="s1")
        rows = tok.collect()
        toks = {r["x"]: r["uid"] for r in rows}
        assert toks["a"] == toks["b"] != toks["c"]       # joins preserved
        assert toks["d"] is None                         # NULL passthrough
        assert all(v is None or len(v) == 16 for v in toks.values())
        assert "1" not in (toks["a"] or "")              # raw value gone

    def test_secret_rotation_unlinks(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import pseudonymize
        df = spark.createDataFrame([(7,)], "uid long")
        a = pseudonymize(df, ["uid"], secret="old").collect()[0]["uid"]
        b = pseudonymize(df, ["uid"], secret="new").collect()[0]["uid"]
        assert a != b

    def test_length_bounds(self, spark):
        import pytest as _pytest
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import pseudonymize
        df = spark.createDataFrame([(1,)], "uid long")
        with _pytest.raises(ValueError):
            pseudonymize(df, ["uid"], secret="s", length=4)


class TestTopKByValue:
    """Bin-thresholded exact top-k: equals the naive window verbatim."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, grp string, v double")

    def _naive(self, rows, k, descending=True):
        by = {}
        for i, g, v in rows:
            if v is not None:
                by.setdefault(g, []).append((v, i))
        out = []
        for g, items in by.items():
            items.sort(key=lambda t: (-t[0] if descending else t[0], t[1]))
            out += [(i, g, v, r + 1) for r, (v, i) in enumerate(items[:k])]
        return sorted(out)

    def test_equals_naive_window_with_heavy_ties(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import top_k_by_value
        import random
        rng = random.Random(11)
        rows = [(i, f"g{i % 4}", float(rng.randint(0, 9)))  # many ties
                for i in range(300)]
        got = sorted(
            tuple(r) for r in top_k_by_value(
                self._df(spark, rows), ["grp"], "v", 7, tiebreak_col="id"
            ).collect()
        )
        assert got == self._naive(rows, 7)

    def test_ascending_and_small_groups(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import top_k_by_value
        rows = [(1, "a", 5.0), (2, "a", 3.0), (3, "b", 9.0)]  # b smaller than k
        got = sorted(
            tuple(r) for r in top_k_by_value(
                self._df(spark, rows), ["grp"], "v", 2,
                tiebreak_col="id", descending=False,
            ).collect()
        )
        assert got == self._naive(rows, 2, descending=False)

    def test_nulls_never_rank_and_constant_values(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import top_k_by_value
        rows = [(1, "a", 4.0), (2, "a", 4.0), (3, "a", 4.0), (4, "a", None)]
        got = sorted(
            tuple(r) for r in top_k_by_value(
                self._df(spark, rows), ["grp"], "v", 2, tiebreak_col="id"
            ).collect()
        )
        assert got == [(1, "a", 4.0, 1), (2, "a", 4.0, 2)]

    def test_disparate_group_ranges_stay_exact_and_pruned(self, spark):
        """r6 ADVICE fix: the bin grid is PER-GROUP, so a group whose
        values span [0, 1] while another spans [0, 1e9] still prefilters
        (under the old global grid the narrow group collapsed into one
        bin = a full-group sort). Exactness vs the naive window, plus a
        direct prune check: with 4 bins, the narrow group's candidate
        set must be smaller than the whole group."""
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import top_k_by_value
        import random
        rng = random.Random(5)
        rows = [(i, "narrow", rng.random()) for i in range(200)]
        rows += [(1000 + i, "wide", rng.random() * 1e9) for i in range(200)]
        got = sorted(
            tuple(r) for r in top_k_by_value(
                self._df(spark, rows), ["grp"], "v", 5,
                tiebreak_col="id", bins=4,
            ).collect()
        )
        assert got == self._naive(rows, 5)


class TestWeightedSample:
    """ES weighted sampling: heavier rows sample more often, exactness,
    determinism, zero-weight exclusion."""

    def test_heavy_rows_dominate(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import weighted_sample
        # 10 rows of weight 1000, 190 of weight 1: a size-20 draw should
        # be mostly heavy rows (each heavy row ~ guaranteed; the light
        # mass totals 190 vs heavy 10000)
        rows = [(i, 1000) for i in range(10)] + [(i, 1) for i in range(10, 200)]
        df = spark.createDataFrame(rows, "id long, w long")
        got = {r["id"] for r in weighted_sample(df, "id", "w", 20).collect()}
        assert len(got) == 20
        assert len(got & set(range(10))) >= 9  # nearly all heavy rows in

    def test_deterministic_and_exact_k(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import weighted_sample
        df = spark.createDataFrame(
            [(i, (i % 7) + 1) for i in range(300)], "id long, w long"
        )
        a = sorted(tuple(r) for r in weighted_sample(df, "id", "w", 25).collect())
        b = sorted(tuple(r) for r in weighted_sample(
            df.repartition(11), "id", "w", 25).collect())
        assert a == b and len(a) == 25

    def test_nonpositive_weights_never_sample(self, spark):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.curation import weighted_sample
        df = spark.createDataFrame(
            [(1, 5), (2, 0), (3, -1), (4, None)], "id long, w long"
        )
        got = {r["id"] for r in weighted_sample(df, "id", "w", 10).collect()}
        assert got == {1}
