"""Crawl engine vs sequential oracle (SURVEY.md §5.2 items 2, 4, 6).

- final URL-seen set equality (the north-rule gate)
- per-host fetch order matches the oracle within each epoch
- per-document span-sequence equality end-to-end through the engine
- politeness: per-(host, epoch) count <= budget, schedule spacing >= min_delay
- kill-at-epoch-k resume equals the uninterrupted run (snapshot atomicity)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark import schemas
from webscrape_neko_jirushi_spark.crawl.engine import CrawlEngine, MirrorFetcher
from webscrape_neko_jirushi_spark.crawl.oracle import OracleCrawler
from webscrape_neko_jirushi_spark.crawl.snapshots import SnapshotStore
from webscrape_neko_jirushi_spark.fixtures import mirror as M

BUDGET = 40
MIN_DELAY = 10


@pytest.fixture(scope="module")
def mirror():
    return M.build_mirror(seed=42, n_pages=3, cats_per_page=22)


@pytest.fixture(scope="module")
def oracle_result(mirror):
    budgets = {h: (BUDGET, MIN_DELAY) for h in [M.MAIN_HOST, *M.TAIL_HOSTS]}
    return OracleCrawler(mirror, budgets, max_epochs=50).run([M.listing_url(1)])


def _make_engine(spark, mirror, tmp_path, name="run"):
    pages = spark.createDataFrame(mirror.rows(), schemas.PAGES)
    budget = spark.createDataFrame(
        M.host_budget_rows(BUDGET, MIN_DELAY), schemas.HOST_BUDGET
    )
    store = SnapshotStore(tmp_path / name, spark)
    return CrawlEngine(spark, store, MirrorFetcher(pages), budget, M.BASE_URL)


@pytest.fixture(scope="module")
def engine_done(spark, mirror, tmp_path_factory):
    eng = _make_engine(spark, mirror, tmp_path_factory.mktemp("crawl"))
    eng.seed([M.listing_url(1)])
    stats = eng.run(max_epochs=50)
    return eng, stats


def test_seen_set_equals_oracle(engine_done, oracle_result):
    eng, stats = engine_done
    got = {r["url_hash"] for r in eng.url_seen().collect()}
    assert got == oracle_result.url_seen
    assert len(got) > 200


def test_epoch_and_host_order_match_oracle(engine_done, oracle_result):
    eng, _ = engine_done
    log = eng.fetch_log().select("host", "epoch", "seq_in_host", "url").collect()
    got = {}
    for r in log:
        got.setdefault((r["host"], r["epoch"]), []).append((r["seq_in_host"], r["url"]))
    want = {}
    for r in oracle_result.fetch_log:
        want.setdefault((r["host"], r["epoch"]), []).append((r["seq_in_host"], r["url"]))
    assert set(got) == set(want)
    for k in want:
        assert sorted(got[k]) == sorted(want[k]), f"order mismatch in {k}"


def test_documents_equal_oracle(engine_done, oracle_result):
    eng, _ = engine_done
    docs = {
        r["doc_id"]: [s.asDict() for s in r["spans"]]
        for r in eng.documents().collect()
    }
    assert set(docs) == set(oracle_result.documents)
    for doc_id, want in oracle_result.documents.items():
        assert docs[doc_id] == want, f"span mismatch in {doc_id}"


def test_politeness_invariants(engine_done):
    """<= budget fetches per (host, epoch); schedule spacing >= min_delay;
    schedules strictly increasing with seq (token bucket)."""
    eng, _ = engine_done
    log = eng.fetch_log().select("host", "epoch", "seq_in_host", "scheduled_ms").collect()
    groups = {}
    for r in log:
        groups.setdefault((r["host"], r["epoch"]), []).append(
            (r["seq_in_host"], r["scheduled_ms"])
        )
    for (host, epoch), rows in groups.items():
        rows.sort()
        assert len(rows) <= BUDGET
        seqs = [s for s, _ in rows]
        assert seqs == list(range(1, len(rows) + 1))
        times = [t for _, t in rows]
        for a, b in zip(times, times[1:]):
            assert b - a >= MIN_DELAY


def test_lineage_present(engine_done):
    eng, stats = engine_done
    lin = eng.lineage()
    n_epochs = len([s for s in stats if s.selected > 0])
    got_epochs = {r["epoch"] for r in lin.select("epoch").distinct().collect()}
    assert got_epochs == set(range(1, n_epochs + 1))
    sums = lin.groupBy().agg(F.sum("urls_in").alias("n")).collect()[0]["n"]
    assert sums == eng.fetch_log().count()


def test_failed_urls_dead_lettered(engine_done, oracle_result):
    eng, _ = engine_done
    got_failed = {
        r["url"] for r in eng.fetch_log().filter(F.col("status_code") != 200).collect()
    }
    assert got_failed == oracle_result.failed
    # never fetched twice
    refetch = (
        eng.fetch_log().groupBy("url_hash").count().filter(F.col("count") > 1).count()
    )
    assert refetch == 0


def test_resume_equals_uninterrupted(spark, mirror, tmp_path_factory, engine_done):
    """Kill after epoch 2 (simulated: stop the loop), build a NEW engine
    on the same store, resume, and compare final state tables."""
    eng_full, _ = engine_done
    tmp = tmp_path_factory.mktemp("resume")
    eng = _make_engine(spark, mirror, tmp, "a")
    eng.seed([M.listing_url(1)])
    eng.run(max_epochs=2)  # "killed" here
    # resume with a fresh engine over the same snapshot root
    eng2 = _make_engine(spark, mirror, tmp, "a")
    eng2.seed([M.listing_url(1)])  # no-op: store already has state
    eng2.run(max_epochs=50)

    for table, schema, key in [
        ("url_seen", schemas.URL_SEEN, ["url_hash"]),
        ("documents", schemas.DOCUMENTS, ["doc_id"]),
    ]:
        a = eng_full.store.read(table, schema)
        b = eng2.store.read(table, schema)
        assert a.count() == b.count(), table
        assert a.join(b, key, "left_anti").count() == 0, table
    # frontier fully drained in both
    assert eng2.frontier().count() == 0
    assert eng_full.frontier().count() == 0


def test_torn_commit_ignored(spark, mirror, tmp_path_factory):
    """Data written without a manifest swap (crash mid-commit) is
    invisible: resume sees the last committed epoch only."""
    tmp = tmp_path_factory.mktemp("torn")
    eng = _make_engine(spark, mirror, tmp, "a")
    eng.seed([M.listing_url(1)])
    eng.run(max_epochs=1)
    seen_before = eng.url_seen().count()
    # simulate a crash: orphan data dir, HEAD untouched
    orphan = eng.store.root / "data" / "url_seen-999999-deadbeef"
    eng.url_seen().limit(1).write.mode("overwrite").parquet(str(orphan))
    eng2 = _make_engine(spark, mirror, tmp, "a")
    assert eng2.url_seen().count() == seen_before
