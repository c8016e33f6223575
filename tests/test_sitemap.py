"""X62 sitemap source: urlset/index parsing, entity decoding, twin
equality, bounded cyclic expansion."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.sources import sitemap as SM

URLSET = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://ex.com/a?x=1&amp;y=2 </loc>
    <lastmod>2024-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://ex.com/b</loc><priority>junk</priority></url>
  <url><lastmod>2024-02-02</lastmod></url>
  <url><loc>https://ex.com/c</loc></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://ex.com/s1.xml</loc></sitemap>
  <sitemap><loc>https://ex.com/s2.xml</loc></sitemap>
  <sitemap><loc>https://ex.com/root.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_semantics(spark):
    df = spark.createDataFrame([("root", URLSET)], "sitemap_url string, xml string")
    rows = {r["loc"]: r for r in SM.parse_urlset(df).collect()}
    assert set(rows) == {"https://ex.com/a?x=1&y=2", "https://ex.com/b", "https://ex.com/c"}
    a = rows["https://ex.com/a?x=1&y=2"]
    assert (a["lastmod"], a["changefreq"], a["priority"]) == ("2024-01-05", "daily", 0.8)
    b = rows["https://ex.com/b"]
    assert b["priority"] is None and b["lastmod"] is None  # junk guarded, absent NULL


def test_urlset_duckdb_twin(spark):
    df = spark.createDataFrame(
        [("root", URLSET), ("empty", "<urlset></urlset>")],
        "sitemap_url string, xml string",
    )
    got = sorted(tuple(r) for r in SM.parse_urlset(df).collect())
    con = duckdb.connect()
    con.register("pages", df.toPandas())
    want = sorted(
        tuple(r) for r in con.execute(SM.parse_urlset_sql("pages")).fetchall()
    )
    assert got == want


def test_expand_with_cycle_and_depth(spark):
    web = spark.createDataFrame(
        [
            ("https://ex.com/root.xml", INDEX),  # index incl. self-reference
            ("https://ex.com/s1.xml", "<urlset><url><loc>https://ex.com/p1</loc></url></urlset>"),
            ("https://ex.com/s2.xml",
             "<sitemapindex><sitemap><loc>https://ex.com/s3.xml</loc></sitemap></sitemapindex>"),
            ("https://ex.com/s3.xml", "<urlset><url><loc>https://ex.com/p3</loc></url></urlset>"),
        ],
        "url string, xml string",
    )
    seeds = spark.createDataFrame([("https://ex.com/root.xml",)], "url string")
    out = SM.expand_sitemaps(web, seeds, max_depth=3)
    locs = sorted(r["loc"] for r in out.collect())
    assert locs == ["https://ex.com/p1", "https://ex.com/p3"]
    # depth 2 stops before s3's urlset
    out2 = SM.expand_sitemaps(web, seeds, max_depth=2)
    assert sorted(r["loc"] for r in out2.collect()) == ["https://ex.com/p1"]
    with pytest.raises(ValueError, match="max_depth"):
        SM.expand_sitemaps(web, seeds, max_depth=0)
    # zero seeds (robots listed no Sitemap: lines): an EMPTY entry
    # table with the full schema, not an AssertionError
    empty = SM.expand_sitemaps(web, seeds.filter("url = 'none'"))
    assert empty.count() == 0
    assert empty.columns == out.columns
