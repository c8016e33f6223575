"""stats.corpus_diff: classification matrix + the fingerprint's
null-tagging (NULL, 'NULL', and '' must all be distinguishable, and
column boundaries must not shift)."""

from __future__ import annotations

from webscrape_neko_jirushi_spark.operators import stats


def test_corpus_diff_classification(spark):
    old = spark.createDataFrame(
        [
            (1, "alpha", "en"),
            (2, "beta", "en"),
            (3, "gamma", "ja"),
            (4, "delta", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha", "en"),  # unchanged
            (2, "beta-v2", "en"),  # changed text
            (4, "delta", "ja"),  # changed lang only
            (5, "epsilon", "en"),  # added
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r["change"]
        for r in stats.corpus_diff(old, new, "doc_id", ("text", "lang")).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "changed",
        5: "added",
    }


def test_corpus_diff_null_tagging_no_collisions(spark):
    """NULL, the literal string 'NULL', and '' are three different
    contents; and ('a', NULL) must not collide with ('a\\x1f', '')."""
    rows_old = [
        (1, None, "x"),
        (2, "NULL", "x"),
        (3, "", "x"),
        (4, "a", None),
    ]
    rows_new = [
        (1, "NULL", "x"),
        (2, "", "x"),
        (3, None, "x"),
        (4, "a\x1f", ""),
    ]
    old = spark.createDataFrame(rows_old, "doc_id long, text string, lang string")
    new = spark.createDataFrame(rows_new, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: r["change"]
        for r in stats.corpus_diff(old, new, "doc_id", ("text", "lang")).collect()
    }
    assert got == {1: "changed", 2: "changed", 3: "changed", 4: "changed"}


def test_corpus_diff_shuffle_carries_fingerprints_not_content(spark):
    """The join inputs are (id, fp) only — content columns are reduced
    away map-side before the exchange, so the optimized join operates
    on no content attribute (the 100-TB contract: the diff moves
    fingerprints, never the corpus)."""
    old = spark.createDataFrame(
        [(1, "x" * 1000, "en")], "doc_id long, text string, lang string"
    )
    new = spark.createDataFrame(
        [(1, "x" * 1000, "en")], "doc_id long, text string, lang string"
    )
    out = stats.corpus_diff(old, new)
    assert set(out.columns) == {"doc_id", "old_fp", "new_fp", "change"}
    joined = out._jdf.queryExecution().optimizedPlan().toString()
    join_op = [ln for ln in joined.splitlines() if "Join" in ln]
    assert join_op, "expected a join in the optimized plan"
    # the join condition references ids, never text/lang attributes
    assert all("text" not in ln and "lang" not in ln for ln in join_op)
