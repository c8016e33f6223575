"""operators.interleave: interleaved (text AND media) near-dup pairs.

Gates: (1) both-modality requirement — same text + same media pairs,
same text + disjoint media rejected, different text + same media
never a candidate, (2) near-identical text (small edit) still pairs
when media agrees, (3) vacuous media agreement (both docs media-free)
passes, one-sided media fails, (4) DuckDB twin row-parity with the
driver's fuzz-gated simhash fragment.
"""

import duckdb

from webscrape_neko_jirushi_spark.operators import interleave as il

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)

BODY = "the quick brown fox jumps over the lazy dog near the river bank"
OTHER = "completely different prose about spark physical plans and shuffles"


def _doc(doc_id, words, refs):
    spans, off = [], 0
    for w in words.split(" "):
        spans.append(("text", w, None, off))
        off += 1
    for r in refs:
        spans.append(("image", None, r, off))
        off += 1
    return (doc_id, spans)


def _corpus(spark):
    rows = [
        _doc("same_a", BODY, ["m1", "m2"]),
        _doc("same_b", BODY, ["m1", "m2"]),          # full dup of same_a
        _doc("medless_a", BODY + " tail", []),        # text dup, no media
        _doc("medless_b", BODY + " tail", []),
        _doc("diffmedia", BODY, ["x1", "x2"]),        # text dup, media disjoint
        _doc("difftext", OTHER, ["m1", "m2"]),        # media dup, text far
        _doc("neartext", BODY.replace("lazy", "calm"), ["m1", "m2"]),
    ]
    return spark.createDataFrame(rows, SCHEMA).repartition(3)


def test_both_modalities_required(spark):
    got = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in il.interleaved_near_dups(
            _corpus(spark), max_hamming=6, min_media_jaccard=0.5
        ).collect()
    }
    assert ("same_a", "same_b") in got
    assert ("medless_a", "medless_b") in got  # vacuous media agreement
    assert ("neartext", "same_a") in got and ("neartext", "same_b") in got
    # text dup but disjoint media: rejected by the media leg
    assert not any("diffmedia" in p for p in got)
    # media dup but distant text: never a text candidate
    assert not any("difftext" in p for p in got)
    # text dup with one side media-free: jaccard 0, rejected
    assert not any(
        set(p) == {"same_a", "medless_a"} or set(p) == {"same_b", "medless_a"}
        for p in got
    )


def test_wide_path_same_planted_pairs(spark):
    """Forced 120-bit wide path (the >150k-doc auto-gate target):
    different signature, same planted verdicts on this corpus — the
    X81 gates all hold, and the auto-gate resolves from the n_docs
    hint without a probe job."""
    got = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in il.interleaved_near_dups(
            _corpus(spark), max_hamming=6, min_media_jaccard=0.5, wide=True
        ).collect()
    }
    assert ("same_a", "same_b") in got
    assert ("medless_a", "medless_b") in got
    assert not any("diffmedia" in p for p in got)
    assert not any("difftext" in p for p in got)
    # n_docs hint above the threshold selects wide without any count
    hinted = il.interleaved_near_dups(
        _corpus(spark), min_media_jaccard=0.5, n_docs=200_000
    )
    assert {
        tuple(sorted((r.id_a, r.id_b))) for r in hinted.collect()
    } >= {("same_a", "same_b"), ("medless_a", "medless_b")}


def test_duckdb_twin_matches(spark):
    import __spark_entry__ as entry

    docs = _corpus(spark)
    got = {
        (r.id_a, r.id_b, r.hamming, r.media_jaccard)
        for r in il.interleaved_near_dups(
            docs, max_hamming=6, min_media_jaccard=0.5
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE flat(doc_id VARCHAR, kind VARCHAR, text VARCHAR,"
        " media_ref VARCHAR, \"offset\" INTEGER)"
    )
    flat = [
        (d, k, t, m, o)
        for d, spans in [(r[0], r[1]) for r in docs.collect()]
        for (k, t, m, o) in spans
    ]
    con.executemany("INSERT INTO flat VALUES (?,?,?,?,?)", flat)
    ref = set(
        tuple(r)
        for r in con.execute(
            il.interleaved_near_dups_sql(
                "flat", entry._SIMHASH_SQL, max_hamming=6,
                min_media_jaccard=0.5,
            )
        ).fetchall()
    )
    assert got == ref
