"""HTML -> text extraction: hand-written goldens for every rule in the
chain (script/style/comment traps, entity decode order, block newlines,
case-insensitive tags), plus DuckDB parity of the mirrored oracle chain on
the same nasty fixtures."""

import duckdb
import pytest

from aws_dataset_ingestion_metrics_collection_framework_spark.operators.html import (
    html_to_text,
    html_to_text_oracle_sql,
)

MESSY = (
    "<!DOCTYPE html><html><head><title>  A   Title </title>"
    '<style>p { content: "<p>"; }</style>'
    '<script>var s = "</p>"; if (1 < 2) {}</script>'
    "</head><body><!-- <p>hidden</p> -->"
    '<div><a href="/x">One</a> &amp; <A HREF="/y">Two</A></div>'
    "<h2>Head</h2><p> body   text </p><br/>"
    "<p>&amp;lt; stays &lt;b&gt; &quot;q&#39;s&quot;&nbsp;end</p>"
    "</body></html>"
)

CASES = [
    # (html, title, n_links, text)
    (
        MESSY,
        "A Title",
        2,
        "A Title\nOne & Two\nHead\nbody text\n&lt; stays <b> \"q's\" end",
    ),
    # no title, no links, bare text with inline tags joining words
    ("<body><p>a<b>b</b>c</p></body>", "", 0, "abc"),
    # empty / whitespace-only page
    ("<html><body>   \n\t </body></html>", "", 0, ""),
    # br variants and uppercase block closer
    ("x<BR>y<br />z</DIV>w", "", 0, "x\ny\nz\nw"),
    # unterminated script swallows to end (non-greedy needs a closer)
    ("<p>keep</p><script>var x = 1;", "", 0, "keep\nvar x = 1;"),
]


@pytest.mark.parametrize("html,title,n_links,text", CASES)
def test_html_goldens(spark, html, title, n_links, text):
    df = spark.createDataFrame([(1, html)], "id int, html string")
    row = html_to_text(df, "id", "html").collect()[0]
    assert row["title"] == title
    assert row["n_links"] == n_links
    assert row["text"] == text


def test_oracle_chain_parity(spark):
    """The mirrored DuckDB chain (html_to_text_oracle_sql) reproduces the
    Spark extraction byte-for-byte on every golden fixture — the parity the
    registry oracle relies on, pinned here on nastier inputs than the
    synthesized pages."""
    rows = [(i, c[0]) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(rows, "id int, html string")
    got = {
        r["id"]: (r["title"], r["n_links"], r["text"])
        for r in html_to_text(df, "id", "html").collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE pages (id INTEGER, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", rows)
    sql = html_to_text_oracle_sql("pages", "id", "html")
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == want


def test_script_with_embedded_closer_trap(spark):
    # a quoted "</p>" inside script must NOT produce a line
    df = spark.createDataFrame(
        [(1, '<script>a = "</p>";</script><p>real</p>')], "id int, html string"
    )
    assert html_to_text(df, "id", "html").collect()[0]["text"] == "real"


def test_entity_no_double_decode(spark):
    # &amp;lt; is the literal text "&lt;" — decoding &amp; last keeps it
    df = spark.createDataFrame([(1, "<p>&amp;lt;</p>")], "id int, html string")
    assert html_to_text(df, "id", "html").collect()[0]["text"] == "&lt;"


LINK_CASES = [
    # nested tag + entity inside anchor text
    ('<a href="/x"><b>Bold</b> &amp; plain</a>', [("/x", "Bold & plain")]),
    # multiple links, uppercase tag
    ('<A HREF="http://a.com/1">one</A><a href="/2">two</a>',
     [("http://a.com/1", "one"), ("/2", "two")]),
    # unquoted href is outside the subset -> skipped
    ("<a href=/nope>skip</a>", []),
    # no links
    ("<p>plain</p>", []),
]


@pytest.mark.parametrize("html,want", LINK_CASES)
def test_extract_links(spark, html, want):
    from aws_dataset_ingestion_metrics_collection_framework_spark.operators.html import extract_links

    df = spark.createDataFrame([(1, html)], "id int, html string")
    got = [(r["href"], r["anchor_text"]) for r in extract_links(df, "id", "html").collect()]
    assert got == want


class TestMainContent:
    """Boilerplate removal: the two deterministic rules (min length, max
    link density) kill nav/footer/tag-cloud blocks and keep prose."""

    def _run(self, spark, html, **kw):
        from aws_dataset_ingestion_metrics_collection_framework_spark.operators.html import main_content

        df = spark.createDataFrame([(1, html)], "id long, html string")
        return main_content(df, "id", "html", **kw).collect()[0]

    def test_nav_footer_killed_prose_kept(self, spark):
        prose1 = ("This is a long enough paragraph of real prose content "
                  "to keep around for sure.")
        prose2 = ("Another paragraph with plenty of visible characters and "
                  "just one <a href=\"/x\">link</a> inside it that stays "
                  "below the density threshold.")
        page = (
            '<html><body>'
            '<div class="nav"><a href="/a">Home</a> | <a href="/b">About us'
            '</a> | <a href="/c">Contact</a></div>'
            f'<p>{prose1}</p><p>short</p><p>{prose2}</p>'
            '<div class="footer"><a href="/p">Privacy</a> '
            '<a href="/t">Terms</a></div>'
            '</body></html>'
        )
        r = self._run(spark, page)
        # nav, prose1, short, prose2, footer (trailing </body></html> is
        # tag-only -> empty -> not a block)
        assert r["n_blocks"] == 5 and r["n_content_blocks"] == 2
        lines = r["main_text"].split("\n")
        assert lines[0] == prose1
        assert "link inside it" in lines[1] and "<a" not in lines[1]
        assert r["n_chars_main"] == len(r["main_text"])

    def test_density_rule_is_exact_integer_boundary(self, spark):
        # text 100 chars, anchor text exactly 33 -> kept (lc*100 == len*33
        # iff len=100, lc=33); 34 -> dropped
        filler = "x" * 67
        for lc, kept in ((33, 1), (34, 0)):
            body = f'<p><a href="/l">{"y" * lc}</a>{filler[:100 - lc]}</p>'
            r = self._run(spark, f"<html><body>{body}</body></html>")
            assert r["n_content_blocks"] == kept, (lc, kept)

    def test_min_chars_rule_and_empty_page(self, spark):
        r = self._run(spark, "<p>" + "a" * 24 + "</p>")
        assert r["n_content_blocks"] == 0 and r["main_text"] == ""
        r = self._run(spark, "<p>" + "a" * 25 + "</p>")
        assert r["n_content_blocks"] == 1
        r = self._run(spark, "<html><head></head><body></body></html>")
        assert r["n_blocks"] == 0 and r["main_text"] == ""
        assert r["n_chars_main"] == 0

    def test_script_style_never_count_as_content(self, spark):
        page = ('<html><head><style>body { color: red; /* long long long '
                'comment that would pass the length rule */ }</style>'
                '<script>var s = "a very long string constant that would '
                'also pass the minimum length rule easily";</script>'
                '</head><body><p>Real prose content that is long enough '
                'to be kept by the extractor.</p></body></html>')
        r = self._run(spark, page)
        assert r["n_content_blocks"] == 1
        assert r["main_text"].startswith("Real prose")

    def test_entities_decoded_inside_blocks(self, spark):
        page = ("<p>Entities &amp; &lt;tags&gt; &quot;quoted&#39;s&quot;"
                "&nbsp;ok plus padding words here</p>")
        r = self._run(spark, page)
        assert r["main_text"] == (
            'Entities & <tags> "quoted\'s" ok plus padding words here'
        )

    def test_tunable_thresholds(self, spark):
        page = '<p>twelve chars</p>'
        assert self._run(spark, page)["n_content_blocks"] == 0
        assert self._run(spark, page, min_chars=5)["n_content_blocks"] == 1
