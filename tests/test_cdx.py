"""X72 CDX capture-index source: SURT canonicalization, CDX-11 parse
validity guards, latest-capture winner, revisit accounting, and DuckDB
twin equality for every piece."""

from __future__ import annotations

import duckdb

from webscrape_neko_jirushi_spark.sources import cdx as CX

LINES = [
    # two captures of the same page, same digest (a revisit)
    "- 20240101000000 https://WWW.Example.com:443/A#frag text/html 200 d1 - - 100 10 c0.warc.gz",
    "- 20240301000000 http://example.com/a text/html 200 d1 - - 100 20 c1.warc.gz",
    # changed content on the third capture
    "- 20240501000000 http://example.com/a text/html 200 d2 - - 120 30 c2.warc.gz",
    # a different page, placeholder fields
    "- 20240201000000 https://other.org/x/y - - d3 - - - 40 c0.warc.gz",
    # malformed: wrong field count
    "garbage line",
    # malformed: bad timestamp
    "- 2024010100 http://example.com/b text/html 200 d4 - - 10 50 c0.warc.gz",
    # malformed: non-numeric status — must be INVALID on both engines
    # (an unguarded CAST('30x') is NULL on Spark but a hard error on
    # DuckDB, crashing the twin instead of diverging visibly)
    "- 20240601000000 http://example.com/c text/html 30x d5 - - 10 60 c0.warc.gz",
]


def _lines_df(spark):
    return spark.createDataFrame([(l,) for l in LINES], "line string")


def test_surt_key_semantics(spark):
    urls = [
        ("https://WWW.Example.com:443/A#frag", "com,example)/a"),
        ("http://example.com/a", "com,example)/a"),
        ("https://other.org/x/y", "org,other)/x/y"),
        ("http://sub.host.net:80", "net,host,sub)/"),
        ("host.net:8080/p?q=1", "net,host:8080)/p?q=1"),  # non-default port kept
    ]
    df = spark.createDataFrame(urls, "url string, want string")
    for r in df.select(CX.surt_key("url").alias("got"), "want").collect():
        assert r["got"] == r["want"]


def test_parse_validity_and_nulls(spark):
    rows = {r["line"]: r for r in CX.parse_cdx(_lines_df(spark)).collect()}
    assert sum(r["valid"] for r in rows.values()) == 4
    ph = rows[LINES[3]]
    assert ph["mime"] is None and ph["status"] is None and ph["length"] is None
    assert ph["offset"] == 40 and ph["digest"] == "d3"
    assert not rows["garbage line"]["valid"]
    assert not rows[LINES[5]]["valid"]
    assert rows["garbage line"]["url"] is None


def test_latest_capture_winner(spark):
    caps = CX.parse_cdx(_lines_df(spark)).filter("valid").withColumn(
        "urlkey", CX.surt_key("url")
    )
    latest = {r["urlkey"]: r for r in CX.latest_captures(caps).collect()}
    a = latest["com,example)/a"]
    assert (a["ts"], a["digest"], a["n_captures"]) == ("20240501000000", "d2", 3)
    assert latest["org,other)/x/y"]["n_captures"] == 1


def test_revisit_report(spark):
    caps = CX.parse_cdx(_lines_df(spark)).withColumn("urlkey", CX.surt_key("url"))
    r = CX.revisit_report(caps).collect()[0]
    # 4 valid captures, 2 urlkeys, 3 distinct digests -> 1 revisit
    assert (r["n_captures"], r["n_urlkeys"], r["n_digests"], r["n_revisits"]) == (
        4,
        2,
        3,
        1,
    )
    assert r["revisit_ratio"] == 0.25


def test_duckdb_twins(spark):
    df = _lines_df(spark)
    con = duckdb.connect()
    con.register("lines", df.toPandas())

    parsed = CX.parse_cdx(df)
    got = sorted(tuple(r) for r in parsed.collect())
    want = sorted(tuple(r) for r in con.execute(CX.parse_cdx_sql("lines")).fetchall())
    assert got == want

    caps = parsed.filter("valid").withColumn("urlkey", CX.surt_key("url"))
    # parse emits a (NULL-here) urlkey column; * REPLACE mirrors
    # Spark withColumn's replace semantics
    caps_sql = (
        f"(SELECT * REPLACE ({CX.surt_key_sql('url')} AS urlkey)"
        f" FROM ({CX.parse_cdx_sql('lines')}) p WHERE valid)"
    )
    got = sorted(tuple(r) for r in CX.latest_captures(caps).collect())
    want = sorted(
        tuple(r) for r in con.execute(CX.latest_captures_sql(caps_sql)).fetchall()
    )
    assert got == want

    got = [tuple(r) for r in CX.revisit_report(caps).collect()]
    want = [tuple(r) for r in con.execute(CX.revisit_report_sql(caps_sql)).fetchall()]
    assert got == want
