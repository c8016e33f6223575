"""End-to-end curation composition (text/curation.py::curate_corpus):
every stage bites on a hand corpus, stage ordering is observable, and
the ledger contract holds."""

from __future__ import annotations

import pytest

from webscrape_neko_jirushi_spark.text.curation import curate_corpus

_BODY = (
    "the quick brown fox jumps over the lazy dog and then it runs far "
    "away to the hills where it rests in the warm sun for a while now"
)
_SHARED = "this shared boilerplate line is long and repeats in both docs"

DOCS = [
    # 1 and 2: exact duplicates AFTER encoding repair (2 is mojibake'd)
    (1, "src_a", _BODY + " café time"),
    (2, "src_a", _BODY.replace("the quick", "the quick") + " cafÃ© time"),
    # 3 and 4: share a long line -> 4 loses it to 3 (keep=first)
    (3, "src_b", _SHARED + " " + _BODY),
    (4, "src_b", _SHARED + " completely different tail content here "
        "that is long enough to stand on its own two feet as a doc "
        "with the usual words in it and some more of the filler text"),
    # 5: too short -> admission reject, still in the ledger
    (5, "src_b", "tiny"),
]


@pytest.fixture(scope="module")
def ledger(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    rows = curate_corpus(df, reline_words=8, min_chars=10).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_exact_dup_removed_after_repair(ledger):
    # 2's mojibake repairs to 1's bytes -> only min-id 1 survives
    assert 1 in ledger and 2 not in ledger


def test_shared_line_stripped_from_later_doc(ledger):
    # the shared 8-word-relined head line survives in 3, not in 4
    assert ledger[3]["n_kept"] == ledger[3]["n_lines"]
    assert ledger[4]["n_kept"] < ledger[4]["n_lines"]
    assert "shared boilerplate" in ledger[3]["text"]
    assert "shared boilerplate" not in ledger[4]["text"]


def test_admission_and_ledger_contract(ledger):
    assert ledger[5]["reason"] == "too_short" and not ledger[5]["keep"]
    assert ledger[1]["keep"] and ledger[1]["reason"] is None
    for r in ledger.values():
        assert r["source"] in ("src_a", "src_b")
        assert r["n_tokens"] >= 0


def test_stage_order_matters(spark):
    """Running line dedup BEFORE exact dedup would strip the copy's
    lines and let it survive as a distinct doc — the ledger must not
    show that: copies die at stage 2, full stop."""
    df = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    out = curate_corpus(df).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {1, 3, 4, 5}
