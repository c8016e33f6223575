"""Span-sequence equality: the input-contract invariant (BASELINE.json).

The vectorized Spark extractor (operators/spans.py, regex over Arrow
batches) must equal the sequential DOM oracle (crawl/oracle.py) on
(kind, text, media_ref, offset) — per row, per span, for every profile
page in the synthetic mirror.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.crawl.oracle import (
    doc_id_of,
    extract_profile_spans_dom,
)
from webscrape_neko_jirushi_spark.fixtures import mirror as M
from webscrape_neko_jirushi_spark.operators.spans import (
    extract_profile_spans,
    extract_spans,
    parse_listing,
)


@pytest.fixture(scope="module")
def mirror():
    return M.build_mirror(seed=42, n_pages=3, cats_per_page=22)


def _api_image_map(mirror):
    out = {}
    for u in mirror.listing_urls:
        body = json.loads(mirror.pages[u]["body"])
        for cat in body["foster_list"]:
            out[f"{M.BASE_URL}{cat['url']}"] = cat["image_1"]
    return out


def test_pure_extractors_agree(mirror):
    """regex extractor == DOM oracle on every 200 profile page."""
    api_img = _api_image_map(mirror)
    checked = 0
    for url, page in mirror.pages.items():
        if page["kind"] != "profile" or page["status_code"] != 200:
            continue
        a = extract_profile_spans(page["body"], api_img.get(url), M.BASE_URL)
        b = extract_profile_spans_dom(page["body"], api_img.get(url), M.BASE_URL)
        assert a == b, f"span mismatch for {url}\nregex={a}\ndom={b}"
        checked += 1
    assert checked > 50


def test_span_invariants(mirror):
    """offsets contiguous; first image is the API image_1 (prepend rule
    comprehensive_scraper.py:196-203); kinds from the contract enum."""
    api_img = _api_image_map(mirror)
    for url, page in mirror.pages.items():
        if page["kind"] != "profile" or page["status_code"] != 200:
            continue
        spans = extract_profile_spans(page["body"], api_img.get(url), M.BASE_URL)
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        kinds = {s["kind"] for s in spans}
        assert kinds <= {"title", "description", "detail", "image", "link"}
        images = [s for s in spans if s["kind"] == "image"]
        assert images, url
        main = api_img.get(url)
        assert main is not None
        # image_1 present; at position 0 iff the cascade didn't already
        # find it (prepend-if-absent, CS:196-203)
        refs = [s["media_ref"] for s in images]
        assert any(r.endswith(main) for r in refs)
        # within-page dedup: media_refs unique (CS:185,198)
        assert len(refs) == len(set(refs))


def test_prepend_rule_when_absent():
    """API image_1 not referenced in the page body -> inserted at 0."""
    html = '<html><body><div class="gallery"><img src="/img/cat_9_g1.jpg"></div></body></html>'
    spans = extract_profile_spans(html, "/img/cat_9_main.jpg", M.BASE_URL)
    images = [s for s in spans if s["kind"] == "image"]
    assert images[0]["media_ref"] == f"{M.BASE_URL}/img/cat_9_main.jpg"
    assert images[1]["media_ref"] == f"{M.BASE_URL}/img/cat_9_g1.jpg"
    assert spans == extract_profile_spans_dom(html, "/img/cat_9_main.jpg", M.BASE_URL)


def test_spark_extractor_matches_oracle(spark, mirror):
    """mapInPandas output == DOM oracle, row by row."""
    api_img = _api_image_map(mirror)
    rows = [
        (url, page["body"], api_img.get(url))
        for url, page in mirror.pages.items()
        if page["kind"] == "profile" and page["status_code"] == 200
    ]
    df = spark.createDataFrame(rows, "url string, body string, api_image_1 string")
    got = {
        r["doc_id"]: [s.asDict() for s in r["spans"]]
        for r in extract_spans(df, M.BASE_URL).collect()
    }
    assert len(got) == len(rows)
    for url, body, img1 in rows:
        want = extract_profile_spans_dom(body, img1, M.BASE_URL)
        assert got[doc_id_of(url)] == want, f"mismatch for {url}"


def test_parse_listing(spark, mirror):
    rows = [
        (p["url"], p["body"])
        for p in mirror.pages.values()
        if p["kind"] == "listing"
    ]
    df = spark.createDataFrame(rows, "url string, body string")
    out = parse_listing(df)
    pd = out.toPandas()
    assert len(pd) == 3 * 22
    # child_idx preserves foster_list order per page
    page1 = pd[pd.page_now == 1].sort_values("child_idx")
    body = json.loads(mirror.pages[M.listing_url(1)]["body"])
    assert list(page1["cat_id"]) == [c["cat_id"] for c in body["foster_list"]]
    assert list(page1["image_1"]) == [c["image_1"] for c in body["foster_list"]]
    assert (pd["all_page"] == 3).all()
