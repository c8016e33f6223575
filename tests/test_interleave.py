"""operators.interleave: caption mining + structure stats over
interleaved span documents (the BASELINE.json input_hint shape).

Gates: (1) hand-computed caption choices incl. the tie->before rule
and max_gap cut, (2) media with no text neighbor dropped but counted
in stats, (3) DuckDB twin row-for-row on a randomized-shape corpus,
(4) plan: one window shuffle, no Python.
"""

import duckdb
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import interleave as il

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _doc(doc_id, seq):
    """seq: list of ('text', body) or ('image', ref)."""
    spans = []
    for i, (kind, payload) in enumerate(seq):
        if kind == "text":
            spans.append(("text", payload, None, i))
        else:
            spans.append((kind, None, payload, i))
    return (doc_id, spans)


def test_caption_choice_and_ties(spark):
    docs = spark.createDataFrame(
        [
            # img1: text at gap 1 before and gap 2 after -> before
            _doc("d1", [("text", "a cat"), ("image", "img1"), ("text", "later"), ("text", "x")]),
            # img2: tie (gap 1 both sides) -> before wins
            _doc("d2", [("text", "left"), ("image", "img2"), ("text", "right")]),
            # img3: only a following text at gap 2 -> after
            _doc("d3", [("image", "img3"), ("image", "img4"), ("text", "tail")]),
        ],
        SCHEMA,
    ).repartition(3)
    got = {
        r.media_ref: (r.caption, r.gap, r.side)
        for r in il.mine_captions(docs, max_gap=3).collect()
    }
    assert got["img1"] == ("a cat", 1, "before")
    assert got["img2"] == ("left", 1, "before")
    assert got["img3"] == ("tail", 2, "after")
    assert got["img4"] == ("tail", 1, "after")


def test_max_gap_drops_far_pairs(spark):
    docs = spark.createDataFrame(
        [_doc("d", [("text", "far"), ("image", "m1"), ("image", "m2"),
                    ("image", "m3"), ("image", "m4")])],
        SCHEMA,
    )
    got = {r.media_ref for r in il.mine_captions(docs, max_gap=2).collect()}
    assert got == {"m1", "m2"}  # m3 gap 3, m4 gap 4: dropped


def test_stats_counts(spark):
    docs = spark.createDataFrame(
        [
            _doc("d1", [("text", "t"), ("image", "m"), ("text", "t2")]),
            _doc("d2", [("image", "m1"), ("image", "m2")]),  # uncaptionable
        ],
        SCHEMA,
    )
    got = {
        r.doc_id: (r.n_text, r.n_media, r.n_transitions, r.n_captioned)
        for r in il.interleave_stats(docs, max_gap=3).collect()
    }
    assert got["d1"] == (2, 1, 2, 1)
    assert got["d2"] == (0, 2, 0, 0)


def _flat_rows(docs_rows):
    out = []
    for doc_id, spans in docs_rows:
        for kind, text, ref, off in spans:
            out.append((doc_id, kind, text, ref, off))
    return out


def test_duckdb_twin_matches(spark):
    # deterministic pseudo-random interleaving shapes, incl. text-only
    # and media-only docs and repeated kinds
    rows = []
    for d in range(40):
        seq = []
        for i in range(1 + (d * 7) % 9):
            if (d * 31 + i * 17) % 3 == 0:
                seq.append(("image", f"m{d}_{i}"))
            else:
                seq.append(("text", f"body {d} {i}"))
        rows.append(_doc(f"doc{d}", seq))
    docs = spark.createDataFrame(rows, SCHEMA).repartition(5)
    got_caps = {
        (r.doc_id, r.media_ref, r.offset, r.caption, r.gap, r.side)
        for r in il.mine_captions(docs, max_gap=2).collect()
    }
    got_stats = {
        (r.doc_id, r.n_text, r.n_media, r.n_transitions, r.n_captioned)
        for r in il.interleave_stats(docs, max_gap=2).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE flat(doc_id VARCHAR, kind VARCHAR, text VARCHAR,"
        " media_ref VARCHAR, \"offset\" INTEGER)"
    )
    con.executemany(
        "INSERT INTO flat VALUES (?,?,?,?,?)", _flat_rows(rows)
    )
    ref_caps = set(
        tuple(r)
        for r in con.execute(il.mine_captions_sql("flat", max_gap=2)).fetchall()
    )
    ref_stats = set(
        tuple(r)
        for r in con.execute(
            il.interleave_stats_sql("flat", max_gap=2)
        ).fetchall()
    )
    assert got_caps == ref_caps
    assert got_stats == ref_stats


def test_duplicate_offsets_fail_loudly(spark):
    """Duplicate (doc, offset) makes every window peer order engine-
    dependent — the contract guard must raise, never return a
    nondeterministic caption (this bit for real: the sf testdata has
    duplicate (orderkey, linenumber) rows)."""
    import pytest

    bad = spark.createDataFrame(
        [("d", [("text", "a", None, 1), ("image", None, "m", 1)])], SCHEMA
    )
    with pytest.raises(Exception, match="duplicate span offset"):
        il.mine_captions(bad).collect()
    with pytest.raises(Exception, match="duplicate span offset"):
        il.interleave_stats(bad).collect()


def test_caption_plan_no_python_one_window(spark):
    docs = spark.createDataFrame(
        [_doc("d", [("text", "t"), ("image", "m")])], SCHEMA
    )
    df = il.mine_captions(docs)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "EvalPython" not in plan
    assert plan.count("Window") <= 2  # one logical window spec


# --------------------------------------------------------------------------
# X87: linearization
# --------------------------------------------------------------------------


def test_linearize_render_and_counts(spark):
    docs = spark.createDataFrame(
        [
            _doc("d1", [("text", "a cat photo"), ("image", "i1"), ("text", "tail")]),
            _doc("d2", [("image", "i2")]),
            ("d3", []),
        ],
        SCHEMA,
    )
    got = {r.doc_id: r for r in il.linearize_docs(docs).collect()}
    assert got["d1"].text == "a cat photo <|image|> tail"
    assert got["d1"].n_tokens == 3 + 1 + 1
    assert got["d1"].n_spans_kept == 3 and not got["d1"].truncated
    assert got["d1"].n_media_kept == 1
    assert got["d2"].text == "<|image|>"
    assert got["d3"].text == "" and got["d3"].n_spans_total == 0


def test_linearize_offset_order_not_input_order(spark):
    docs = spark.createDataFrame(
        [("d", [("text", "world", None, 2), ("text", "hello", None, 1)])],
        SCHEMA,
    )
    assert il.linearize_docs(docs).collect()[0].text == "hello world"


def test_linearize_budget_cuts_at_span_boundary(spark):
    docs = spark.createDataFrame(
        [
            _doc("d", [("text", "one two"), ("image", "i"), ("text", "x y z")]),
        ],
        SCHEMA,
    )
    r = il.linearize_docs(docs, budget=4).collect()[0]
    # 2 + 1 fits; the 3-token tail would make 6 > 4 -> dropped whole
    assert r.text == "one two <|image|>"
    assert r.n_tokens == 3 and r.n_spans_kept == 2 and r.truncated
    # budget 1 cannot even fit the first span -> empty render
    r0 = il.linearize_docs(docs, budget=1).collect()[0]
    assert r0.text == "" and r0.n_spans_kept == 0 and r0.truncated


def test_null_text_span_not_a_caption_candidate(spark):
    """A text-kind span with NULL text must be skipped as a WHOLE
    candidate: pairing the nearest non-null TEXT with the nearer null
    span's OFFSET mis-measures the gap (and can smuggle a pair past
    max_gap or emit a NULL caption)."""
    docs = spark.createDataFrame(
        [
            (
                "d",
                [
                    ("text", "hello", None, 0),
                    ("text", None, None, 1),
                    ("image", None, "m", 2),
                ],
            )
        ],
        SCHEMA,
    )
    # true gap to 'hello' is 2 > max_gap=1 -> no pair at all
    assert il.mine_captions(docs, max_gap=1).count() == 0
    got = il.mine_captions(docs, max_gap=3).collect()
    assert len(got) == 1
    assert got[0].caption == "hello" and got[0].gap == 2
    # the stats coverage flag agrees with the miner
    st1 = il.interleave_stats(docs, max_gap=1).collect()[0]
    assert st1.n_captioned == 0
    st3 = il.interleave_stats(docs, max_gap=3).collect()[0]
    assert st3.n_captioned == 1


def test_linearize_null_kind_counts_as_media(spark):
    """A NULL kind takes the media branch in rendering and costing
    (F.when otherwise) — n_media_kept must agree, not silently drop
    the span from the count via a NULL filter predicate."""
    docs = spark.createDataFrame(
        [("d", [("text", "hello", None, 1), (None, None, "i1", 2)])],
        SCHEMA,
    )
    r = il.linearize_docs(docs).collect()[0]
    assert r.text == "hello <|image|>"
    assert r.n_media_kept == 1
    assert r.n_tokens == 2


def test_linearize_null_spans_fail_loudly(spark):
    import pytest

    docs = spark.createDataFrame([("d", None)], SCHEMA)
    with pytest.raises(Exception) as ei:
        il.linearize_docs(docs).collect()
    assert "linearize" in str(ei.value)


def test_linearize_duckdb_twin(spark):
    import random

    rng = random.Random(87)
    rows = []
    for d in range(40):
        seq = []
        for _ in range(rng.randint(0, 8)):
            if rng.random() < 0.4:
                seq.append(("image", f"m{rng.randint(0, 5)}"))
            else:
                words = " ".join(
                    f"w{rng.randint(0, 9)}" for _ in range(rng.randint(0, 4))
                )
                seq.append(("text", words))
        rows.append(_doc(f"d{d}", seq))
    docs = spark.createDataFrame(rows, SCHEMA).repartition(5)
    for budget in (None, 0, 3, 7):
        got = sorted(
            tuple(r)
            for r in il.linearize_docs(docs, budget=budget).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE flat(doc_id VARCHAR, kind VARCHAR, text VARCHAR,"
            ' media_ref VARCHAR, "offset" INTEGER)'
        )
        con.executemany(
            "INSERT INTO flat VALUES (?,?,?,?,?)",
            [(d, *s) for d, spans in rows for s in spans],
        )
        con.execute(
            "CREATE TABLE spine(doc_id VARCHAR)"
        )
        con.executemany(
            "INSERT INTO spine VALUES (?)", [(d,) for d, _ in rows]
        )
        want = sorted(
            map(
                tuple,
                con.execute(
                    il.linearize_sql("flat", "spine", budget=budget)
                ).fetchall(),
            )
        )
        assert got == want, f"budget={budget}"


def test_linearize_plan_is_pure_projection(spark):
    from webscrape_neko_jirushi_spark.plans.inspect import physical_plan

    docs = spark.createDataFrame([_doc("d", [("text", "a")])], SCHEMA)
    plan = physical_plan(il.linearize_docs(docs, budget=8))
    assert "Exchange" not in plan  # zero shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
