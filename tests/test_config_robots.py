"""D3 config cascade + T4 robots.txt parsing (pure-Python units)."""

from __future__ import annotations

import json

import pytest

from webscrape_neko_jirushi_spark.crawl.config import DEFAULTS, CrawlConfig
from webscrape_neko_jirushi_spark.crawl.politeness import parse_robots


def test_config_defaults():
    cfg = CrawlConfig.load()
    assert cfg.base_url == DEFAULTS["base_url"]
    assert cfg.max_retries == 3 and cfg.delay_between_requests_ms == 2000


def test_config_cascade_file_then_overrides(tmp_path):
    f = tmp_path / "crawl.json"
    f.write_text(json.dumps({"max_pages": 10, "n_salts": 8}))
    cfg = CrawlConfig.load(f, overrides={"n_salts": 16, "target_docs": 500})
    assert cfg.max_pages == 10          # from file
    assert cfg.n_salts == 16            # override beats file
    assert cfg.target_docs == 500       # override beats default
    assert cfg.max_retries == 3         # default survives


def test_config_unknown_key_raises(tmp_path):
    with pytest.raises(KeyError):
        CrawlConfig.load(overrides={"max_pgaes": 10})
    f = tmp_path / "bad.json"
    f.write_text(json.dumps({"nope": 1}))
    with pytest.raises(KeyError):
        CrawlConfig.load(f)


def test_config_adapters():
    cfg = CrawlConfig.load(overrides={"max_per_epoch": 7, "delay_between_requests_ms": 11})
    rows = cfg.budget_rows(["a.test", "b.test"])
    assert rows == [
        {"host": "a.test", "max_per_epoch": 7, "min_delay_ms": 11},
        {"host": "b.test", "max_per_epoch": 7, "min_delay_ms": 11},
    ]
    kw = cfg.engine_kwargs()
    assert kw["n_salts"] == 4 and kw["fetch_images"] is True
    assert "max_per_epoch" not in kw  # budget-table concern, not engine
    assert cfg.echo()["max_per_epoch"] == 7


ROBOTS = """
# comments ignored
User-agent: *
Disallow: /private/
Disallow: /tmp/

User-agent: neko-bot
User-agent: other-bot
Disallow: /foster/
Crawl-delay: 5

User-agent: open-bot
Disallow:
"""


def test_parse_robots_star_group():
    assert parse_robots(ROBOTS, "randombot/1.0") == [
        ("/private/", False), ("/tmp/", False)
    ]


def test_parse_robots_specific_group_and_stacked_agents():
    assert parse_robots(ROBOTS, "neko-bot") == [("/foster/", False)]
    assert parse_robots(ROBOTS, "Other-Bot/2.1") == [("/foster/", False)]


def test_parse_robots_empty_disallow_means_allow_all():
    assert parse_robots(ROBOTS, "open-bot") == []


def test_parse_robots_empty_text():
    assert parse_robots("", "any") == []
    assert parse_robots(None, "any") == []


def test_pipeline_consumes_config(spark, tmp_path):
    """D3 -> D1/D4: the resolved config drives the orchestrator and is
    echoed into the run report."""
    from webscrape_neko_jirushi_spark import schemas
    from webscrape_neko_jirushi_spark.crawl.engine import CrawlEngine, MirrorFetcher
    from webscrape_neko_jirushi_spark.crawl.snapshots import SnapshotStore
    from webscrape_neko_jirushi_spark.fixtures import mirror as M
    from webscrape_neko_jirushi_spark.plans.pipeline import CompletePipeline

    cfg = CrawlConfig.load(overrides={"max_epochs": 9, "user_agent": "t/1"})
    mirror = M.build_mirror(seed=7, n_pages=1, cats_per_page=4, fail_rate=0.0)
    pages = spark.createDataFrame(mirror.rows(), schemas.PAGES)
    budget = spark.createDataFrame(
        cfg.budget_rows([M.MAIN_HOST]), schemas.HOST_BUDGET
    )
    eng = CrawlEngine(
        spark, SnapshotStore(tmp_path, spark), MirrorFetcher(pages), budget,
        **dict(cfg.engine_kwargs(), base_url=M.BASE_URL),
    )
    eng.seed([M.listing_url(1)])
    pipe = CompletePipeline(eng, config=cfg)
    assert pipe.max_epochs == 9
    row = pipe.run().report.collect()[0]
    assert row["user_agent"] == "t/1" and row["max_epochs"] == 9


def test_parse_robots_longest_match_wins():
    text = """
User-agent: web
Disallow: /w

User-agent: webscrape-neko
Disallow: /n
"""
    # both tokens substring-match; RFC 9309: longest wins
    assert parse_robots(text, "webscrape-neko-jirushi/0.1") == [("/n", False)]
    assert parse_robots(text, "webby/2") == [("/w", False)]


def test_parse_robots_allow_longest_prefix_wins():
    """RFC 9309 path resolution: Allow exceptions under a broad
    Disallow; the LONGEST matching prefix decides, Allow wins ties."""
    from webscrape_neko_jirushi_spark.crawl.politeness import _rules_allow

    text = """
User-agent: *
Disallow: /private/
Allow: /private/public/
Allow: /ok
Disallow: /ok
"""
    rules = parse_robots(text, "anybot")
    assert rules == [
        ("/private/", False),
        ("/private/public/", True),
        ("/ok", True),
        ("/ok", False),
    ]
    assert not _rules_allow("/private/x.html", rules)
    assert _rules_allow("/private/public/x.html", rules)  # longer Allow wins
    assert _rules_allow("/ok/page", rules)                # tie -> Allow wins
    assert _rules_allow("/elsewhere", rules)              # no match -> allowed
    # legacy plain-string rules still read as Disallow prefixes
    assert not _rules_allow("/tmp/x", ["/tmp/"])
    assert _rules_allow("/fine", ["/tmp/"])
