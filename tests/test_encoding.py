"""Encoding-quality profiling/repair (text/encoding.py): hand-built
corruptions, repair exactness (including the Â-ordering pin), clean
text passing untouched, and the DuckDB twin on an adversarial mix."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.text import encoding

DIRTY = [
    (1, "cafÃ© rÃ©sumÃ©"),                      # classic cp1252 accents
    (2, "itâ€™s â€œquotedâ€“ish”"),        # windows punctuation
    (3, "bad byte � here �"),         # replacement chars
    (4, "ctrl\x01chars\x08gone\x0b"),           # C0 controls
    (5, "tab\tand\nnewline kept"),              # \t \n exempt
    (6, "clean ascii text"),
    (7, "Â nbsp artifact"),
    (8, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DIRTY, "doc_id long, text string")


def test_counts_and_verdict(docs):
    out = {
        r["doc_id"]: r.asDict()
        for r in encoding.encoding_profile(docs).collect()
    }
    assert out[1]["n_mojibake"] == 3 and out[1]["is_suspect"]
    assert out[2]["n_mojibake"] == 3  # â€™ â€œ â€“
    assert out[3]["n_replacement"] == 2
    assert out[4]["n_control"] == 3
    assert out[5] == {
        "doc_id": 5, "n_mojibake": 0, "n_replacement": 0,
        "n_control": 0, "is_suspect": False,
        "fixed": "tab\tand\nnewline kept",
    }
    assert not out[6]["is_suspect"]
    assert out[7]["n_mojibake"] == 1
    assert out[8]["fixed"] is None and out[8]["is_suspect"] is None


def test_repair_exact(docs):
    out = {
        r["doc_id"]: r["fixed"]
        for r in encoding.encoding_profile(docs).collect()
    }
    assert out[1] == "café résumé"
    assert out[2] == "it’s “quoted–ish”"
    assert out[4] == "ctrlcharsgone"
    assert out[6] == "clean ascii text"
    assert out[7] == " nbsp artifact"


def test_table_order_independence():
    # no repair may create a later pattern: applying the table to any
    # single corruption yields exactly its intended char
    for bad, good in encoding.MOJIBAKE_TABLE:
        s = f"x{bad}y"
        for b2, g2 in encoding.MOJIBAKE_TABLE:
            s = s.replace(b2, g2)
        assert s == f"x{good}y", (bad, good, s)


def test_duckdb_twin(spark, docs):
    got = sorted(
        tuple(r) for r in encoding.encoding_profile(docs).collect()
    )
    con = duckdb.connect()
    con.register(
        "d", pd.DataFrame(DIRTY, columns=["doc_id", "text"])
    )
    c = encoding.encoding_counts_sql("text")
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            SELECT doc_id, {c['n_mojibake']} AS n_mojibake,
                   {c['n_replacement']} AS n_replacement,
                   {c['n_control']} AS n_control,
                   ({c['n_mojibake']} > 0 OR {c['n_replacement']} > 0
                    OR {c['n_control']} > 0) AS is_suspect,
                   {encoding.fix_encoding_sql('text')} AS fixed
            FROM d
            """
        ).fetchall()
    )
    assert got == want
