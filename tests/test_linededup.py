"""Corpus-wide line dedup (text/linededup.py): hand-built corpus with
a syndicated footer, first-instance survival, keep='none' mode, the
min-chars exemption, reassembly exactness, full-strip behavior,
partitioning invariance, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.text import linededup

FOOTER = "syndicated footer text"
DOCS = [
    (1, f"alpha body one\n{FOOTER}\n--"),
    (2, f"{FOOTER}\nbeta body two\n--"),
    (3, f"gamma body three\n{FOOTER}"),
    (4, FOOTER),  # nothing but the footer -> fully stripped
    (5, "unique content here\n--"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_dup_keys(docs):
    keys = linededup.line_dup_keys(docs, min_chars=5, min_dup_docs=2)
    rows = keys.collect()
    assert len(rows) == 1  # only the footer qualifies ('--' is exempt)
    r = rows[0]
    assert r["n_docs_with_line"] == 4
    assert r["n_instances"] == 4
    # canonical first instance: doc 1 pos 1 (min (doc_id, pos))
    assert (r["first_doc_id"], r["first_pos"]) == (1, 1)


def test_keep_first_reassembly(docs):
    out = {
        r["doc_id"]: r.asDict()
        for r in linededup.line_dedup(
            docs, min_chars=5, min_dup_docs=2
        ).collect()
    }
    assert out[1]["text"] == f"alpha body one\n{FOOTER}\n--"  # first kept
    assert out[2]["text"] == "beta body two\n--"
    assert out[3]["text"] == "gamma body three"
    assert out[4]["text"] == ""  # fully stripped, doc survives
    assert out[5]["text"] == "unique content here\n--"
    assert out[4]["n_lines"] == 1 and out[4]["n_kept"] == 0
    assert out[1]["n_kept"] == 3


def test_keep_none(docs):
    out = {
        r["doc_id"]: r["text"]
        for r in linededup.line_dedup(
            docs, min_chars=5, min_dup_docs=2, keep="none"
        ).collect()
    }
    assert out[1] == "alpha body one\n--"  # even the first goes
    assert out[4] == ""
    with pytest.raises(ValueError, match="keep"):
        linededup.line_dedup(docs, keep="both")


def test_min_chars_exemption(docs):
    # '--' appears in 3 docs but is shorter than min_chars -> kept
    out = {
        r["doc_id"]: r["text"]
        for r in linededup.line_dedup(
            docs, min_chars=5, min_dup_docs=2
        ).collect()
    }
    assert out[5].endswith("--")
    # lowering the bar makes '--' a duplicate too
    out2 = {
        r["doc_id"]: r["text"]
        for r in linededup.line_dedup(
            docs, min_chars=1, min_dup_docs=2
        ).collect()
    }
    assert out2[5] == "unique content here"


def test_partitioning_invariance(spark, docs):
    a = sorted(
        tuple(r)
        for r in linededup.line_dedup(docs, min_chars=5).collect()
    )
    b = sorted(
        tuple(r)
        for r in linededup.line_dedup(
            docs.repartition(7), min_chars=5
        ).collect()
    )
    assert a == b


def test_duckdb_twin(spark, docs):
    got_dups = sorted(
        tuple(r)
        for r in linededup.line_dup_keys(docs, min_chars=5).collect()
    )
    got_docs = sorted(
        tuple(r)
        for r in linededup.line_dedup(docs, min_chars=5).collect()
    )
    con = duckdb.connect()
    con.register("d", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    ctes = linededup.line_dedup_sql_ctes("SELECT * FROM d", min_chars=5)
    want_dups = sorted(
        tuple(r)
        for r in con.execute(
            f"WITH {ctes} SELECT * FROM ld_dups"
        ).fetchall()
    )
    want_docs = sorted(
        tuple(r)
        for r in con.execute(
            f"WITH {ctes} SELECT * FROM ld_docs_out"
        ).fetchall()
    )
    assert got_dups == want_dups
    assert got_docs == want_docs  # byte-identical reassembly
