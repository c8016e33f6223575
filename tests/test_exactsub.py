"""Exact-substring span REMOVAL (text/substrings.py::
dup_span_intervals / remove_dup_substrings — the Lee-et-al.
ExactSubstr cut): planted ground-truth spans, both keep policies,
interval merging, and byte-level parity with the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from webscrape_neko_jirushi_spark.text import substrings

K = 8
BOILER = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit "
    "sed do eleven twelve"
)  # 12 tokens -> 5 windows fully inside, covering token range [0, 12)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, " ".join(f"u{i}w{j}" for j in range(20))) for i in range(4)
    ]
    rows.append((10, BOILER + " " + " ".join(f"a{j}" for j in range(8))))
    rows.append((11, BOILER + " " + " ".join(f"b{j}" for j in range(8))))
    rows.append((12, "too short"))
    rows.append((13, ""))
    # two disjoint boiler occurrences in one doc: 2 merged spans
    rows.append(
        (
            14,
            " ".join(f"m{j}" for j in range(4))
            + " " + BOILER + " mid " + BOILER + " tail1 tail2",
        )
    )
    # intra-doc-only repetition: one gram twice in ONE doc, nowhere else
    intra = " ".join(f"r{j}" for j in range(K))
    rows.append((15, intra + " " + intra))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _twin(rows, keep):
    vals = ", ".join(f"({d}, '{t}')" for d, t in rows)
    ctes = substrings.remove_dup_substrings_sql_ctes(
        "SELECT doc_id, text FROM t", k=K, keep=keep
    )
    return duckdb.connect().execute(
        f"WITH t(doc_id, text) AS (VALUES {vals}), {ctes} "
        "SELECT * FROM es_docs_out ORDER BY doc_id"
    ).fetchall()


def test_intervals_match_planted_ground_truth(spark, corpus):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substrings.dup_span_intervals(corpus, k=K).collect()
    }
    # keep='first': canonical (min doc_id, pos) = doc 10 keeps its run;
    # doc 11 loses [0,12); doc 14 loses both its occurrences
    # doc 14 layout: m0..m3 = tokens 0-3, boiler = 4-15, mid = 16,
    # boiler = 17-28, tails = 29-30
    assert got == {(11, 0, 12), (14, 4, 16), (14, 17, 29)}

    got_none = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substrings.dup_span_intervals(
            corpus, k=K, keep="none"
        ).collect()
    }
    assert got_none == got | {(10, 0, 12)}


def test_removal_semantics_and_survivors(spark, corpus):
    out = {
        r["doc_id"]: r
        for r in substrings.remove_dup_substrings(corpus, k=K).collect()
    }
    assert len(out) == 10  # every input doc survives as a row
    for d in range(4):
        r = out[d]
        assert (r["n_tokens"], r["n_tokens_removed"], r["n_spans_removed"]) == (
            20, 0, 0
        )
    assert out[10]["text"].startswith("lorem ipsum")  # canonical intact
    assert out[11]["text"] == " ".join(f"b{j}" for j in range(8))
    assert out[11]["n_tokens_removed"] == 12
    r14 = out[14]
    assert r14["text"] == "m0 m1 m2 m3 mid tail1 tail2"
    assert (r14["n_tokens_removed"], r14["n_spans_removed"]) == (24, 2)
    # sub-k and empty docs: untouched, zero counters
    assert out[12]["text"] == "too short" and out[12]["n_tokens"] == 2
    assert out[13]["text"] == "" and out[13]["n_tokens"] == 0
    # intra-doc repetition alone doesn't clear min_docs=2 distinct docs
    assert out[15]["n_tokens_removed"] == 0

    with pytest.raises(ValueError, match="keep"):
        substrings.remove_dup_substrings(corpus, keep="last")


def test_keep_none_removes_every_occurrence(spark, corpus):
    out = {
        r["doc_id"]: r
        for r in substrings.remove_dup_substrings(
            corpus, k=K, keep="none"
        ).collect()
    }
    assert out[10]["text"] == " ".join(f"a{j}" for j in range(8))
    assert out[10]["n_tokens_removed"] == 12
    # the boiler text occurs in NO output document
    assert all(BOILER not in r["text"] for r in out.values())


@pytest.mark.parametrize("keep", ["first", "none"])
def test_duckdb_twin_byte_parity(spark, corpus, keep):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    got = {
        r["doc_id"]: (
            r["text"], r["n_tokens"], r["n_tokens_removed"],
            r["n_spans_removed"],
        )
        for r in substrings.remove_dup_substrings(
            corpus, k=K, keep=keep
        ).collect()
    }
    for d, t, nt, nr, ns in _twin(rows, keep):
        assert got[d] == (t, nt, nr, ns), f"doc {d} diverged under keep={keep}"


def test_removal_then_ratio_is_clean(spark, corpus):
    """Composition: after keep='none' surgery the corpus has no
    cross-document duplicated window left (the planted spans were the
    only ones)."""
    cleaned = substrings.remove_dup_substrings(
        corpus, k=K, keep="none"
    ).select("doc_id", "text")
    ratios = substrings.substr_dup_ratio(cleaned, k=K).collect()
    assert all(r["n_dup_grams"] == 0 for r in ratios)
