"""PandasMirrorFetcher equivalence with the join fetcher, and the
cuckoo-backed recrawl/TTL path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark import schemas
from webscrape_neko_jirushi_spark.crawl.engine import CrawlEngine, MirrorFetcher
from webscrape_neko_jirushi_spark.crawl.fetchers import HttpFetcher, PandasMirrorFetcher
from webscrape_neko_jirushi_spark.crawl.recrawl import recrawl_expired
from webscrape_neko_jirushi_spark.crawl.snapshots import SnapshotStore
from webscrape_neko_jirushi_spark.fixtures import mirror as M

BUDGET = 60
MIN_DELAY = 5


def _engine(spark, mirror, tmp_path, fetcher):
    budget = spark.createDataFrame(
        M.host_budget_rows(BUDGET, MIN_DELAY), schemas.HOST_BUDGET
    )
    store = SnapshotStore(tmp_path, spark)
    return CrawlEngine(spark, store, fetcher, budget, M.BASE_URL)


def test_pandas_fetcher_matches_join_fetcher(spark, tmp_path):
    mirror = M.build_mirror(seed=42, n_pages=2, cats_per_page=10)
    pages = spark.createDataFrame(mirror.rows(), schemas.PAGES)

    e1 = _engine(spark, mirror, tmp_path / "join", MirrorFetcher(pages))
    e1.seed([M.listing_url(1)])
    e1.run(max_epochs=30)

    e2 = _engine(
        spark, mirror, tmp_path / "pandas", PandasMirrorFetcher(spark, mirror)
    )
    e2.seed([M.listing_url(1)])
    e2.run(max_epochs=30)

    s1 = {r["url_hash"] for r in e1.url_seen().collect()}
    s2 = {r["url_hash"] for r in e2.url_seen().collect()}
    assert s1 == s2 and len(s1) > 50
    d1 = {r["doc_id"]: [s.asDict() for s in r["spans"]] for r in e1.documents().collect()}
    d2 = {r["doc_id"]: [s.asDict() for s in r["spans"]] for r in e2.documents().collect()}
    assert d1 == d2


def test_http_fetcher_gated():
    with pytest.raises(NotImplementedError):
        HttpFetcher().fetch(None)


def test_recrawl_expired_requeues(spark, tmp_path):
    mirror = M.build_mirror(seed=42, n_pages=2, cats_per_page=10)
    pages = spark.createDataFrame(mirror.rows(), schemas.PAGES)
    eng = _engine(spark, mirror, tmp_path / "ttl", MirrorFetcher(pages))
    eng.seed([M.listing_url(1)])
    eng.run(max_epochs=30)
    assert eng.frontier().count() == 0
    total_epochs = eng.store.epoch()
    seen_before = eng.url_seen().count()

    # everything fetched in epoch 1 is now expired with ttl = total-1
    n = recrawl_expired(eng, ttl_epochs=total_epochs - 1)
    assert n > 0
    assert eng.frontier().count() == n
    assert eng.url_seen().count() == seen_before - n

    # the engine can continue: re-fetches the expired URLs exactly once
    stats = eng.run(max_epochs=30)
    assert sum(s.selected for s in stats) >= n
    assert eng.frontier().count() == 0
    # seen set back to full coverage
    assert eng.url_seen().count() == seen_before


def test_recrawl_with_cuckoo_deletes_in_place(spark, tmp_path):
    """use_cuckoo=True: expiry deletes fingerprints instead of dropping
    the filter; the engine re-fetches expired URLs and converges to the
    same seen set. Also exercises idempotence: a second recrawl call
    while the re-queue is pending adds nothing."""
    mirror = M.build_mirror(seed=42, n_pages=1, cats_per_page=8, fail_rate=0.0)
    pages = spark.createDataFrame(mirror.rows(), schemas.PAGES)
    budget = spark.createDataFrame(
        M.host_budget_rows(BUDGET, MIN_DELAY), schemas.HOST_BUDGET
    )
    eng = CrawlEngine(
        spark, SnapshotStore(tmp_path / "ck", spark), MirrorFetcher(pages),
        budget, M.BASE_URL, fetch_images=False, use_cuckoo=True,
    )
    eng.seed([M.listing_url(1)])
    eng.run(max_epochs=20)
    seen_before = eng.url_seen().count()
    total_epochs = eng.store.epoch()
    filt = eng._bloom  # noqa: SLF001
    assert hasattr(filt, "delete")

    n = recrawl_expired(eng, ttl_epochs=total_epochs - 1)
    assert n > 0
    # same filter object survived (deleted in place, no rebuild)
    assert eng._bloom is filt  # noqa: SLF001
    # idempotence: everything expired is already pending
    assert recrawl_expired(eng, ttl_epochs=total_epochs - 1) == 0

    eng.run(max_epochs=20)
    assert eng.url_seen().count() == seen_before
    assert eng.frontier().count() == 0
