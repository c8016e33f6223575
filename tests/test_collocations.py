"""X61 PMI collocations: brute-force mirror, DuckDB twin, window/count
semantics."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.text import collocations as C
from webscrape_neko_jirushi_spark.text.invindex import postings

DOCS = [
    (1, "new york is big and new york is loud"),
    (2, "new york new york the city"),
    (3, "big city big city big city"),
    (4, ""),
]


def brute(docs, window):
    pairs = Counter()
    uni = Counter()
    for _, text in docs:
        toks = text.lower().split()
        uni.update(toks)
        for i, a in enumerate(toks):
            for j in range(i + 1, min(i + window + 1, len(toks))):
                pairs[(a, toks[j])] += 1
    return pairs, uni


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pairs_match_bruteforce(spark, docs):
    for window in (1, 3):
        got = {
            (r["term_a"], r["term_b"]): r["cnt"]
            for r in C.cooccurrence_pairs(docs, window=window).collect()
        }
        want, _ = brute(DOCS, window)
        assert got == dict(want), window


def test_pmi_values(spark, docs):
    got = {
        (r["term_a"], r["term_b"]): r
        for r in C.pmi_collocations(docs, window=2, min_count=3).collect()
    }
    pairs, uni = brute(DOCS, 2)
    W = sum(pairs.values())
    N = sum(uni.values())
    for (a, b), r in got.items():
        assert pairs[(a, b)] >= 3
        want = math.log((pairs[(a, b)] / W) / ((uni[a] / N) * (uni[b] / N)))
        assert r["pmi"] == pytest.approx(want, abs=1e-12)
    # the classic collocation ranks above the hapax floor
    assert ("new", "york") in got
    assert got[("new", "york")]["pmi"] > 0


def test_duckdb_twin_bit_exact(spark, docs):
    got = sorted(
        (r["term_a"], r["term_b"], r["cnt"], r["pmi"])
        for r in C.pmi_collocations(docs, window=3, min_count=2).collect()
    )
    con = duckdb.connect()
    con.register("post_pd", postings(docs).toPandas())
    want = sorted(
        (a, b, int(c), p)
        for a, b, c, p in con.execute(
            "WITH post AS (SELECT * FROM post_pd),\n"
            + C.pmi_sql_ctes(window=3, min_count=2)
            + " SELECT term_a, term_b, cnt, pmi FROM pmi"
        ).fetchall()
    )
    assert [x[:3] for x in got] == [x[:3] for x in want]
    for g, w in zip(got, want):
        assert g[3] == w[3], (g, w)  # bit-exact doubles


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="window"):
        C.cooccurrence_pairs(docs, window=0)
