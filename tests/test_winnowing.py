"""X74 winnowing fingerprints: brute-force mirror parity, the paper's
match guarantee, short-doc edges, overlap detection with star cap,
and DuckDB twin equality."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from webscrape_neko_jirushi_spark.text import winnowing as WN

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown fox jumps over a sleepy cat"),
    (2, "completely unrelated content zzz qqq www"),
    (3, "short"),  # < k: no k-grams
    (4, ""),  # empty
    (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
]


def _h40(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % (1 << 40)


def _brute(text: str, k: int, w: int) -> set[tuple[int, int]]:
    hs = [_h40(text[i : i + k]) for i in range(max(len(text) - k + 1, 0))]
    out = set()
    for s in range(len(hs)):
        lo = max(0, s - w + 1)
        window = hs[lo : s + 1]
        m = min(window)
        # rightmost minimal in the window ending at s
        pos = lo + max(i for i, v in enumerate(window) if v == m)
        out.add((pos, hs[pos]))
    return out


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("k,w", [(4, 3), (8, 4), (2, 1)])
def test_brute_force_parity(spark, k, w):
    got = {
        (r["doc_id"], r["pos"], r["h"])
        for r in WN.winnow_fingerprints(_docs_df(spark), k=k, w=w).collect()
    }
    want = {
        (doc_id, pos, h)
        for doc_id, text in DOCS
        for pos, h in _brute(text, k, w)
    }
    assert got == want


def test_match_guarantee(spark):
    # docs 0 and 1 share " brown fox jumps over " (22 chars) —
    # any shared substring of length >= w + k - 1 = 11 must yield a
    # shared fingerprint hash
    k, w = 8, 4
    fps = WN.winnow_fingerprints(_docs_df(spark), k=k, w=w)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
    assert by_doc[0] & by_doc[1]
    assert 3 not in by_doc and 4 not in by_doc  # too short: no grams
    assert by_doc[0] == by_doc[5]  # exact dup: identical set


def test_overlap_pairs_and_cap(spark):
    fps = WN.winnow_fingerprints(_docs_df(spark), k=8, w=4)
    pairs = {
        (r["id_a"], r["id_b"]): r["shared"]
        for r in WN.fingerprint_overlap(fps, min_shared=2).collect()
    }
    assert (0, 5) in pairs  # exact dup: every fingerprint shared
    assert (0, 1) in pairs  # long shared span
    assert not any(2 in p for p in pairs)  # unrelated doc clean
    # a cap of 1 kills every bucket shared by >=2 docs -> no pairs
    assert (
        WN.fingerprint_overlap(fps, min_shared=1, max_bucket=1).count() == 0
    )


def test_duckdb_twins(spark):
    df = _docs_df(spark)
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    fps_sql = WN.winnow_fingerprints_sql("docs", k=8, w=4)
    got = sorted(
        tuple(r) for r in WN.winnow_fingerprints(df, k=8, w=4).collect()
    )
    want = sorted(tuple(r) for r in con.execute(fps_sql).fetchall())
    assert got == want

    fps = WN.winnow_fingerprints(df, k=8, w=4)
    got = sorted(
        tuple(r) for r in WN.fingerprint_overlap(fps, min_shared=2).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            WN.fingerprint_overlap_sql(f"({fps_sql})", min_shared=2)
        ).fetchall()
    )
    assert got == want


def test_validation(spark):
    with pytest.raises(ValueError):
        WN.winnow_fingerprints(_docs_df(spark), k=1)
    with pytest.raises(ValueError):
        WN.winnow_fingerprints(_docs_df(spark), w=0)
