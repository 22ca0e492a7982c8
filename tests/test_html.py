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
