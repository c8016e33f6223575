"""HTML -> text extraction (text/extraction.py): strip semantics,
entity single-decode, block-line structure, links/title, and the
byte-identical DuckDB twin on adversarial markup."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.text import extraction

PAGES = [
    (
        1,
        '<html><head><title> My &amp; Page </title>'
        "<style>p{color:red}</style></head>"
        '<body><!-- nav chrome --><script type="text/javascript">\n'
        "var x = 1 < 2; // </div> inside code\n</script>"
        "<h1>Header</h1><p>First para.</p><p>Second&nbsp;para.</p>"
        '<ul><li>&lt;item&gt; one</li><li>two &#39;quoted&#39;</li></ul>'
        '<a href="/doc/2">next</a> <a href="https://x.example/a?b=1">ext</a>'
        "</body></html>",
    ),
    (2, "no markup at all"),
    (3, ""),
    (4, "<p>mismatched <script>alert(1)</style></script>tail</p>"),
    (5, "<title>a</title><TITLE>b</TITLE><br><BR/>x<br >y"),
    # single-pass entity decoding: &amp;lt; is the TEXT "&lt;"
    (6, "<p>&amp;lt;not a tag&amp;gt; &amp;amp;</p>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "doc_id long, html string")


@pytest.fixture(scope="module")
def prof(pages):
    return {
        r["doc_id"]: r.asDict()
        for r in extraction.extraction_profile(pages).collect()
    }


def test_crlf_leaves_no_carriage_returns(spark):
    """CRLF documents (the web default) must extract the same text as
    LF ones — a stray \\r makes 'line1\\r' != 'line1' for every
    md5(line)-keyed consumer (line-dedup, boilerplate, repetition)."""
    pages = spark.createDataFrame(
        [
            (1, "<p>line1\r\nline2</p>\r\n<p>tail</p>"),
            (2, "<p>line1\nline2</p>\n<p>tail</p>"),
        ],
        "doc_id long, html string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in extraction.extraction_profile(pages).collect()
    }
    assert "\r" not in out[1]
    assert out[1] == out[2]


def test_script_style_comments_stripped(prof):
    t = prof[1]["text"]
    assert "var x" not in t and "color:red" not in t
    assert "nav chrome" not in t
    assert "Header" in t and "First para." in t


def test_block_structure_becomes_lines(prof):
    lines = prof[1]["text"].split("\n")
    assert "Header" in lines
    assert "First para." in lines
    assert "Second para." in lines  # &nbsp; decoded to plain space


def test_entities_single_pass(prof):
    assert "<item> one" in prof[1]["text"]
    assert "two 'quoted'" in prof[1]["text"]
    # &amp;lt; -> literal &lt;  (never a second decode to <)
    assert prof[6]["text"] == "&lt;not a tag&gt; &amp;"


def test_title_and_links(prof):
    assert prof[1]["title"] == "My & Page"
    assert prof[1]["n_links"] == 2
    assert prof[1]["first_link"] == "/doc/2"
    assert prof[2]["title"] == ""  # no-match -> '' on both engines


def test_plain_text_and_empty_passthrough(prof):
    assert prof[2]["text"] == "no markup at all"
    assert prof[3]["text"] == "" and prof[3]["text_ratio"] == 0.0


def test_mismatched_close_does_not_truncate(prof):
    # </style> inside <script> must not end the script strip
    assert "alert" not in prof[4]["text"]
    assert "tail" in prof[4]["text"]


def test_first_title_wins_and_br_variants(prof):
    assert prof[5]["title"] == "a"
    # titles are metadata, not body; <br> variants all break lines
    assert prof[5]["text"] == "x\ny"


def test_duckdb_twin_byte_identical(spark):
    rows = [(i, h) for i, h in PAGES] + [
        (7, "<div>unclosed <b>bold"),
        (8, "< notatag but <em>yes</em>"),
        (9, "<p>a  \t b\f c</p>\n\n<p>d</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r["doc_id"]: (r["text"], r["title"])
        for r in df.select(
            "doc_id",
            extraction.html_to_text(F.col("html")).alias("text"),
            extraction.extract_title(F.col("html")).alias("title"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE p(doc_id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", rows)
    want = {
        i: (t, ti)
        for i, t, ti in con.execute(
            f"SELECT doc_id, {extraction.html_to_text_sql('html')},"
            f" {extraction.extract_title_sql('html')} FROM p"
        ).fetchall()
    }
    assert got == want


def test_links_twin(spark):
    html = '<a HREF="/up">u</a><a href="/low">l</a><a href=unquoted>n</a>'
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = df.select(extraction.extract_links(F.col("html"))).first()[0]
    want = duckdb.sql(
        f"SELECT {extraction.extract_links_sql(repr(html))}"
    ).fetchone()[0]
    assert got == want == ["/up", "/low"]
