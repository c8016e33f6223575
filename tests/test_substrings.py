"""Exact-substring duplication (text/substrings.py): planted
ground-truth spans, the per-doc ratio/filter semantics, and a DuckDB
twin that re-derives the same spans from the same corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.functions.hashing import portable_hash64_sql
from webscrape_neko_jirushi_spark.text import substrings

K = 8
BOILER = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eleven twelve"
# 12 tokens -> windows at positions 0..4 lie fully inside the prefix


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, " ".join(f"u{i}w{j}" for j in range(20))) for i in range(10)
    ]  # 10 mutually-distinct docs
    rows.append((10, BOILER + " " + " ".join(f"a{j}" for j in range(8))))
    rows.append((11, BOILER + " " + " ".join(f"b{j}" for j in range(8))))
    rows.append((12, "too short"))  # < k tokens: no windows
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_duplicated_spans_match_planted_ground_truth(spark, corpus):
    got = {
        (r["doc_id"], r["pos"], r["n_docs"])
        for r in substrings.duplicated_kgram_spans(corpus, k=K).collect()
    }
    # exactly the 5 boilerplate-internal windows, in docs 10 and 11,
    # each duplicated across exactly 2 docs; nothing else anywhere
    want = {(d, p, 2) for d in (10, 11) for p in range(5)}
    assert got == want


def test_substr_dup_ratio_and_filter_semantics(spark, corpus):
    ratios = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_ratio"])
        for r in substrings.substr_dup_ratio(corpus, k=K).collect()
    }
    assert len(ratios) == 13  # every doc present, incl. the short one
    for d in range(10):
        assert ratios[d] == (13, 0, 0.0)  # 20 tokens -> 13 windows
    for d in (10, 11):
        n, nd, r = ratios[d]
        assert (n, nd) == (13, 5) and abs(r - 5 / 13) < 1e-12
    assert ratios[12] == (0, 0, 0.0)  # shorter than k: nothing to dup

    kept = {
        r["doc_id"]: (r["keep"], r["reject_reason"])
        for r in substrings.substr_dup_filter(corpus, max_dup_ratio=0.3, k=K).collect()
    }
    assert all(kept[d] == (True, None) for d in list(range(10)) + [12])
    for d in (10, 11):
        keep, reason = kept[d]
        assert keep is False and reason == "substr_dup_ratio>0.3"

    with pytest.raises(ValueError, match="k=0"):
        substrings.kgram_spans(corpus, k=0)


def test_duplicated_spans_match_duckdb_twin(spark, corpus):
    import duckdb

    got = sorted(
        (r["doc_id"], r["pos"], r["gram_hash"], r["n_docs"])
        for r in substrings.duplicated_kgram_spans(corpus, k=K).collect()
    )
    vals = ", ".join(
        f"({r['doc_id']}, '{r['text']}')" for r in corpus.collect()
    )
    h = portable_hash64_sql(f"array_to_string(w[i : i + {K - 1}], ' ')")
    rows = duckdb.connect().execute(
        f"""
        WITH t(doc_id, text) AS (VALUES {vals}),
        words AS (
          SELECT doc_id, string_split(trim(text), ' ') AS w FROM t
        ),
        spans AS (
          SELECT doc_id, u.i - 1 AS pos, u.gh AS gram_hash
          FROM words,
          UNNEST(
            CASE WHEN len(w) >= {K}
                 THEN list_transform(range(1, len(w) - {K} + 2), i -> struct_pack(i := i, gh := {h}))
                 ELSE [] END
          ) AS s(u)
        ),
        dup AS (
          SELECT gram_hash, COUNT(DISTINCT doc_id) AS n_docs
          FROM spans GROUP BY gram_hash HAVING COUNT(DISTINCT doc_id) >= 2
        )
        SELECT s.doc_id, s.pos, s.gram_hash, d.n_docs
        FROM spans s JOIN dup d USING (gram_hash)
        """
    ).fetchall()
    want = sorted((int(a), int(b), int(c), int(d)) for a, b, c, d in rows)
    assert got == want


def test_spans_shuffle_payload_is_hashes_not_text(spark, corpus):
    """The fan-out row is (id, pos, gram_hash) — no window text
    column survives into the exchanged relation (at 100 TB the
    shuffle IS the job, and 8 bytes vs k tokens is the difference)."""
    spans = substrings.kgram_spans(corpus, k=K)
    assert set(spans.columns) == {"doc_id", "pos", "gram_hash"}
    assert dict(spans.dtypes)["gram_hash"] == "bigint"


def test_contamination_stats_and_decontaminate(spark, corpus):
    """Benchmark = the boilerplate text alone: doc 10/11 share exactly
    the 5 boiler-internal windows; the distinct docs share none."""
    bench = spark.createDataFrame([(0, BOILER)], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"], r["contamination_frac"])
        for r in substrings.contamination_stats(corpus, bench, k=K).collect()
    }
    assert len(got) == 13
    for d in range(10):
        assert got[d] == (13, 0, 0.0)
    for d in (10, 11):
        n, nc, frac = got[d]
        assert (n, nc) == (13, 5) and abs(frac - 5 / 13) < 1e-12
    assert got[12] == (0, 0, 0.0)

    # the benchmark side is broadcast by default (the 100-TB plan:
    # never shuffle the corpus side against a small eval set)
    plan = (
        substrings.contamination_stats(corpus, bench, k=K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Broadcast" in plan

    kept = {
        r["doc_id"]: (r["keep"], r["reject_reason"])
        for r in substrings.decontaminate(corpus, bench, k=K).collect()
    }
    for d in range(10):
        assert kept[d] == (True, None)
    for d in (10, 11):
        keep, reason = kept[d]
        assert keep is False and reason == "contamination>0.0"
    assert kept[12] == (True, None)
