"""operators.interleave media-reuse: chrome detection + strip stats
(the multimodal analog of X40 boilerplate).

Gates: (1) the evidence floor — a ref in min_docs-1 docs is content,
min_docs is chrome, (2) occurrence vs distinct-doc counting (the
same ref twice in ONE doc is not breadth), (3) strip stats per doc
incl. all-chrome docs landing at 0, (4) DuckDB twin cell-for-cell.
"""

import duckdb

from webscrape_neko_jirushi_spark.operators import interleave as il

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).repartition(3)


def _span(kind, payload, i):
    if kind == "text":
        return ("text", payload, None, i)
    return (kind, None, payload, i)


def _corpus(spark):
    rows = []
    # "logo" in 3 distinct docs (chrome at min_docs=3);
    # "twice" appears twice in ONE doc (occurrences=2, n_docs=1);
    # "photo{i}" unique per doc (content)
    for d in range(3):
        rows.append(
            (
                f"d{d}",
                [
                    _span("image", "logo", 0),
                    _span("text", "body", 1),
                    _span("image", f"photo{d}", 2),
                ],
            )
        )
    rows.append(
        ("dtwice", [_span("image", "twice", 0), _span("image", "twice", 1)])
    )
    rows.append(("dchromeonly", [_span("image", "logo", 0)]))
    return rows


def test_evidence_floor_and_occurrences(spark):
    docs = _docs(spark, _corpus(spark))
    got = {
        r.media_ref: (r.n_docs, r.n_occurrences, r.is_chrome)
        for r in il.media_reuse_report(docs, min_docs=4).collect()
    }
    assert got["logo"] == (4, 4, True)  # 3 + dchromeonly
    assert got["twice"] == (1, 2, False)
    assert got["photo0"] == (1, 1, False)


def test_strip_stats(spark):
    docs = _docs(spark, _corpus(spark))
    got = {
        r.doc_id: (r.n_media_before, r.n_media_after)
        for r in il.strip_chrome_stats(docs, min_docs=4).collect()
    }
    assert got["d0"] == (2, 1)  # logo stripped, photo kept
    assert got["dtwice"] == (2, 2)  # not chrome: breadth 1
    assert got["dchromeonly"] == (1, 0)  # all-chrome doc -> 0


def test_duckdb_twin_matches(spark):
    rows = []
    for d in range(30):
        spans = [_span("image", f"shared{d % 4}", 0),
                 _span("text", "t", 1),
                 _span("image", f"uniq{d}", 2)]
        rows.append((f"doc{d}", spans))
    docs = _docs(spark, rows)
    got_rep = {
        (r.media_ref, r.n_docs, r.n_occurrences, r.is_chrome)
        for r in il.media_reuse_report(docs, min_docs=5).collect()
    }
    got_strip = {
        (r.doc_id, r.n_media_before, r.n_media_after)
        for r in il.strip_chrome_stats(docs, min_docs=5).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE flat(doc_id VARCHAR, kind VARCHAR, text VARCHAR,"
        " media_ref VARCHAR, \"offset\" INTEGER)"
    )
    flat = [
        (d, k, t, m, o) for d, spans in rows for (k, t, m, o) in spans
    ]
    con.executemany("INSERT INTO flat VALUES (?,?,?,?,?)", flat)
    ref_rep = set(
        tuple(r)
        for r in con.execute(
            il.media_reuse_report_sql("flat", min_docs=5)
        ).fetchall()
    )
    ref_strip = set(
        tuple(r)
        for r in con.execute(
            il.strip_chrome_stats_sql("flat", min_docs=5)
        ).fetchall()
    )
    assert got_rep == ref_rep
    assert got_strip == ref_strip
