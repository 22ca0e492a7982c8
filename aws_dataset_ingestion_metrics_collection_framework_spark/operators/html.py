"""HTML -> text extraction for web-corpus pipelines (the stage between the
WARC source and line-level cleaning: WARC payload -> HTML -> plain text ->
``curation.c4_clean`` -> dedup).  C4 / CCNet / RefinedWeb all start from
exactly this extraction; the reference framework (SURVEY.md §2) has no web
surface at all, so this extends the engine the same way ``sources/warc.py``
does on the read side.

Design: the whole extraction is a chain of Spark built-in string/regexp/
array-HOF expressions — map-only, zero shuffle, whole-stage-codegen'd, no
Python boundary — so it composes with a 100 TB WARC scan at full JVM speed
(a Python-side html.parser pass would put every payload byte through the
interpreter; the regex subset below is the standard tag-stripping recipe
C4 itself uses).

Cross-engine determinism: every pattern is restricted to the Java-regex ∩
RE2 syntax subset (no backreferences, no lookaround — which is why script
and style blocks are removed in two passes instead of one ``\\1``
pattern), so the DuckDB oracles run the *identical* pattern strings;
``html_to_text_oracle_sql`` emits that mirrored chain.

Extraction semantics (in order):

1. drop ``<script ...>...</script>`` and ``<style ...>...</style>``
   blocks (non-greedy, case-insensitive, dot-matches-newline — a quoted
   ``"</p>"`` inside a script must not terminate the block early);
2. drop ``<!-- ... -->`` comments;
3. convert block-element closers (``</p>``, ``</div>``, ``</h1..6>``,
   ``</li>``, ``</tr>``, ``</td>``, ``</ul>``, ``</ol>``, ``</table>``,
   ``</blockquote>``, ``</title>``, ``</section>``, ``</article>``,
   ``</header>``, ``</footer>``) and ``<br>``/``<br/>`` to newlines, so
   block structure survives as line structure (feeding the line-based
   ``curation.c4_clean``);
4. strip every remaining tag (inline elements join their text: the
   ``<a>Home</a> and <a>About</a>`` case);
5. decode the HTML entities that appear in real text (``&lt; &gt; &quot;
   &#39; &nbsp;`` then ``&amp;`` LAST — standard order, so ``&amp;lt;``
   decodes to the literal ``&lt;`` rather than double-decoding to ``<``);
6. collapse horizontal whitespace, then trim each line, drop empties and
   re-join with ``\\n``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Java-regex ∩ RE2 patterns (shared verbatim with the DuckDB oracle).
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_BLOCK_TAGS = (
    "p|div|h[1-6]|li|tr|td|ul|ol|table|blockquote|title|section"
    "|article|header|footer"
)
_BLOCK_CLOSE_RE = r"(?i)</(" + _BLOCK_TAGS + r")\s*>"
_BR_RE = r"(?i)<br\s*/?\s*>"
_TAG_RE = r"<[^>]*>"
_HSPACE_RE = r"[ \t\r]+"
_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title"
_HREF_RE = r"(?i)<a[ \t][^>]*href"

# Decode order matters: &amp; strictly last (see module docstring step 5).
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_text_col(html: Column) -> Column:
    """The extraction chain as a single Column expression (steps 1-6)."""
    t = F.regexp_replace(html, _SCRIPT_RE, " ")
    t = F.regexp_replace(t, _STYLE_RE, " ")
    t = F.regexp_replace(t, _COMMENT_RE, " ")
    t = F.regexp_replace(t, _BLOCK_CLOSE_RE, "\n")
    t = F.regexp_replace(t, _BR_RE, "\n")
    t = F.regexp_replace(t, _TAG_RE, "")
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, _HSPACE_RE, " ")
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda y: F.trim(y)),
        lambda y: y != F.lit(""),
    )
    return F.array_join(lines, "\n")


def extract_title_col(html: Column) -> Column:
    """First ``<title>`` content, whitespace-normalized ('' if absent)."""
    return F.trim(
        F.regexp_replace(F.regexp_extract(html, _TITLE_RE, 1), _HSPACE_RE, " ")
    )


def count_links_col(html: Column) -> Column:
    """Number of ``<a ... href`` anchors (int)."""
    return F.size(F.regexp_extract_all(html, F.lit(_HREF_RE), F.lit(0)))


def html_to_text(
    df: DataFrame,
    id_col: str,
    html_col: str,
    *,
    out_col: str = "text",
    title_col: str = "title",
    links_col: str = "n_links",
) -> DataFrame:
    """Extract (title, link count, line-structured plain text) per page.

    Map-only projection — composes with ``sources.warc.read_warc`` output
    at any corpus size with zero shuffle."""
    html = F.col(html_col)
    return df.select(
        F.col(id_col),
        extract_title_col(html).alias(title_col),
        count_links_col(html).alias(links_col),
        extract_text_col(html).alias(out_col),
    )


def html_to_text_oracle_sql(
    table: str,
    id_col: str,
    html_col: str,
    *,
    out_col: str = "text",
    title_col: str = "title",
    links_col: str = "n_links",
) -> str:
    """DuckDB mirror of :func:`html_to_text` — the IDENTICAL pattern
    strings through RE2 (DuckDB regexp_replace needs the explicit 'g'
    flag; Spark's is global by default)."""

    def esc(pat: str) -> str:
        # DuckDB standard string literals are NOT backslash-escape-processed
        # (unlike Spark SQL literals), so the pattern goes in verbatim with
        # only quote doubling.
        return pat.replace("'", "''")

    t = html_col
    for pat, rep in ((_SCRIPT_RE, " "), (_STYLE_RE, " "), (_COMMENT_RE, " ")):
        t = f"regexp_replace({t}, '{esc(pat)}', '{rep}', 'g')"
    t = f"regexp_replace({t}, '{esc(_BLOCK_CLOSE_RE)}', chr(10), 'g')"
    t = f"regexp_replace({t}, '{esc(_BR_RE)}', chr(10), 'g')"
    t = f"regexp_replace({t}, '{esc(_TAG_RE)}', '', 'g')"
    for ent, rep in _ENTITIES:
        t = f"replace({t}, '{ent}', '{esc(rep)}')"
    t = f"regexp_replace({t}, '{esc(_HSPACE_RE)}', ' ', 'g')"
    # COALESCE: DuckDB array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — pin the Spark semantics.
    text = (
        "COALESCE(array_to_string(list_filter(list_transform("
        f"string_split({t}, chr(10)), y -> trim(y)), y -> y <> ''), chr(10)), '')"
    )
    title = (
        f"trim(regexp_replace(regexp_extract({html_col}, '{esc(_TITLE_RE)}', 1), "
        f"'{esc(_HSPACE_RE)}', ' ', 'g'))"
    )
    links = f"CAST(len(regexp_extract_all({html_col}, '{esc(_HREF_RE)}')) AS INTEGER)"
    return (
        f"SELECT {id_col}, {title} AS {title_col}, {links} AS {links_col}, "
        f"{text} AS {out_col} FROM {table}"
    )


# block boundary = the same closers that become newlines in extract_text_col
# (derived from the SAME tag list so the two can never drift)
_BLOCK_SPLIT_RE = r"(?i)</(" + _BLOCK_TAGS + r")\s*>|<br\s*/?\s*>"


def _block_text(b: Column) -> Column:
    """Tag-strip + entity-decode + whitespace-collapse one raw block."""
    x = F.regexp_replace(b, _TAG_RE, "")
    for ent, rep in _ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(x, r"[ \t\r\n]+", " "))


def main_content_col(
    html: Column,
    *,
    min_chars: int = 25,
    max_link_density_pct: int = 33,
) -> Column:
    """Boilerplate removal (the jusText/boilerpipe/trafilatura family,
    reduced to its two load-bearing deterministic rules): struct of
    (main_text, n_blocks, n_content_blocks, n_chars_main).

    Per page: drop script/style/comments, split into BLOCKS at the same
    block-element boundaries the text extractor turns into newlines, and
    per block compute its visible text plus the total visible length of
    its anchor texts. A block is CONTENT iff its text has at least
    ``min_chars`` characters AND its link density (anchor-text chars /
    text chars) is at most ``max_link_density_pct`` % — the two rules
    that kill navigation bars, footers, tag clouds and share buttons
    while keeping prose. Exact integer arithmetic (lc·100 ≤ len·pct)
    keeps the rule bit-identical across engines.

    Entirely Spark built-ins — regex passes + one split + nested array
    HOFs — map-only, zero shuffle, no Python boundary: composes with a
    100 TB WARC scan like the rest of this module."""
    t = F.regexp_replace(html, _SCRIPT_RE, " ")
    t = F.regexp_replace(t, _STYLE_RE, " ")
    t = F.regexp_replace(t, _COMMENT_RE, " ")
    blocks = F.split(t, _BLOCK_SPLIT_RE)
    feats = F.transform(
        blocks,
        lambda b: F.struct(
            _block_text(b).alias("txt"),
            F.aggregate(
                F.regexp_extract_all(b, F.lit(_HREF_PAIR_RE), F.lit(2)),
                F.lit(0),
                lambda acc, a: acc + F.length(_block_text(a)),
            ).alias("lc"),
        ),
    )
    nonempty = F.filter(feats, lambda s: s["txt"] != F.lit(""))
    kept = F.filter(
        nonempty,
        lambda s: (F.length(s["txt"]) >= F.lit(min_chars))
        & (s["lc"] * F.lit(100) <= F.length(s["txt"]) * F.lit(max_link_density_pct)),
    )
    main_text = F.array_join(F.transform(kept, lambda s: s["txt"]), "\n")
    return F.struct(
        main_text.alias("main_text"),
        F.size(nonempty).alias("n_blocks"),
        F.size(kept).alias("n_content_blocks"),
        F.length(main_text).alias("n_chars_main"),
    )


def main_content(
    df: DataFrame,
    id_col: str,
    html_col: str,
    *,
    min_chars: int = 25,
    max_link_density_pct: int = 33,
) -> DataFrame:
    """(id, main_text, n_blocks, n_content_blocks, n_chars_main) per page
    — see :func:`main_content_col` for the block-scoring semantics."""
    s = main_content_col(
        F.col(html_col),
        min_chars=min_chars,
        max_link_density_pct=max_link_density_pct,
    )
    return df.select(F.col(id_col), s.alias("_mc")).select(
        id_col, "_mc.main_text", "_mc.n_blocks", "_mc.n_content_blocks",
        "_mc.n_chars_main",
    )


_HREF_PAIR_RE = r'(?is)<a[ \t][^>]*href\s*=\s*"([^"]*)"[^>]*>(.*?)</a\s*>'


def extract_links(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """One row per double-quoted ``<a href="...">text</a>`` anchor:
    (id, href, anchor_text) — the edge list a link graph / PageRank /
    anchor-text index builds from (unquoted and single-quoted hrefs are
    outside the subset; crawler-normalized HTML quotes attributes).

    Map-only: two passes of the SAME pattern (regexp_extract_all returns
    one capture group per call — href then text), zipped positionally;
    anchor text is tag-stripped, entity-decoded and whitespace-normalized
    with the module's chain pieces."""
    html = F.col(html_col)
    hrefs = F.regexp_extract_all(html, F.lit(_HREF_PAIR_RE), F.lit(1))
    texts = F.regexp_extract_all(html, F.lit(_HREF_PAIR_RE), F.lit(2))
    pair = F.explode(F.arrays_zip(hrefs.alias("href"), texts.alias("anchor")))
    out = df.select(F.col(id_col), pair.alias("p")).select(
        id_col,
        F.col("p.href").alias("href"),
        F.col("p.anchor").alias("anchor_text"),
    )
    t = F.regexp_replace(F.col("anchor_text"), _TAG_RE, "")
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.trim(F.regexp_replace(t, r"[ \t\r\n]+", " "))
    return out.withColumn("anchor_text", t)
