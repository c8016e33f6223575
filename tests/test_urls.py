"""URL functions: canonicalization, hashing parity, extension maps."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.crawl.oracle import xxhash64_py
from webscrape_neko_jirushi_spark.functions.urls import (
    canonicalize_one,
    canonicalize_url,
    cat_id_col,
    content_type_to_ext,
    url_hash_col,
    url_interest_predicate,
)


def test_canonicalize_one_rules():
    # relative -> absolute (comprehensive_scraper.py:181-182)
    assert (
        canonicalize_one("/foster/1/", "https://mirror-main.test")
        == "https://mirror-main.test/foster/1/"
    )
    # lowercase host, strip fragment + default port, sort query
    assert (
        canonicalize_one("HTTPS://Mirror-Main.TEST:443/a?b=2&a=1#frag")
        == "https://mirror-main.test/a?a=1&b=2"
    )
    # non-default port kept
    assert canonicalize_one("http://h:8080/x") == "http://h:8080/x"
    # empty path -> /
    assert canonicalize_one("https://h") == "https://h/"
    # absolute URL ignores base
    assert canonicalize_one("https://other/x", "https://base") == "https://other/x"


def test_canonicalize_udf_matches_python(spark):
    urls = [
        "/foster/226400/",
        "https://img-cdn-a.test/media/foster_1_x.png",
        "HTTP://X.test/a?z=1&y=2#f",
        "/img/cat_5_main.jpg",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r[0]
        for r in df.select(
            canonicalize_url(F.col("url"), "https://mirror-main.test")
        ).collect()
    ]
    want = [canonicalize_one(u, "https://mirror-main.test") for u in urls]
    assert got == want


def test_xxhash64_parity_with_spark(spark):
    """The oracle's pure-python xxhash64 must equal Spark's builtin —
    it is the tie-break in the crawl-order comparison."""
    samples = [
        "",
        "a",
        "abc",
        "https://mirror-main.test/foster/226400/",
        "https://mirror-main.test/foster/cat/contents/?p=1",
        "x" * 7,
        "y" * 8,
        "z" * 31,
        "w" * 32,
        "日本語のテキストです" * 3,
        "q" * 100,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", url_hash_col(F.col("s")).alias("h")).collect()}
    for s in samples:
        assert got[s] == xxhash64_py(s), f"hash mismatch for {s!r}"


def test_cat_id_and_interest(spark):
    df = spark.createDataFrame(
        [
            ("https://h/foster/226400/",),
            ("https://h/about/",),
            ("https://h/static/logo.png",),
            ("https://h/static/spacer",),
        ],
        "url string",
    )
    rows = df.select(
        "url",
        cat_id_col(F.col("url")).alias("cat_id"),
        url_interest_predicate(F.col("url")).alias("interest"),
    ).collect()
    by_url = {r["url"]: r for r in rows}
    assert by_url["https://h/foster/226400/"]["cat_id"] == 226400
    assert by_url["https://h/about/"]["cat_id"] is None
    # .png extension passes the reference's interest filter; bare path fails
    assert by_url["https://h/static/logo.png"]["interest"] is True
    assert by_url["https://h/static/spacer"]["interest"] is False
    assert by_url["https://h/foster/226400/"]["interest"] is True


def test_content_type_ext(spark):
    df = spark.createDataFrame(
        [("image/jpeg",), ("image/png",), ("image/webp",), ("text/html",), (None,)],
        "ct string",
    )
    got = [r[0] for r in df.select(content_type_to_ext(F.col("ct"))).collect()]
    assert got == [".jpg", ".png", ".webp", ".jpg", ".jpg"]
