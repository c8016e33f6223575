"""PII scrubbing (text/scrubbing.py): hand-built redactions, prose
false-positive safety, and the verbatim-pattern DuckDB twin."""

from __future__ import annotations

import pytest

from webscrape_neko_jirushi_spark.text import scrubbing

DOCS = [
    (0, "reach me at jane.doe+spam@example.co.uk or on +44 20-7946-0958"),
    (1, "server 10.0.255.7 and 192.168.1.1 rotate keys"),
    (2, "two mails a@b.io c.d@e-f.org one ip 8.8.8.8"),
    # prose that must NOT be eaten: bare numbers, version strings,
    # dates, an @handle without a TLD
    (3, "version 1.2.3 shipped 2024-12-01 to 5000 users @internal"),
    (4, ""),
    # single-digit area code (Tokyo style): the {2,4} first-group rule
    # silently let exactly these through
    (5, "call +81 3-1234-5678 today"),
    # overlap: the dotted run is consumed by the EMAIL redaction, so
    # n_ipv4 must report 0 actual IP redactions, not 1 phantom one
    (6, "contact 10.0.0.1@example.com please"),
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").cache()
    yield df
    df.unpersist()


def test_scrub_counts_and_text(spark, docs):
    got = {r["doc_id"]: r.asDict() for r in scrubbing.scrub_pii(docs).collect()}

    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 1
    assert got[0]["scrubbed"] == "reach me at <EMAIL> or on <PHONE>"

    assert got[1]["n_ipv4"] == 2 and got[1]["n_email"] == 0
    assert got[1]["scrubbed"] == "server <IP> and <IP> rotate keys"

    assert got[2]["n_email"] == 2 and got[2]["n_ipv4"] == 1
    assert got[2]["scrubbed"] == "two mails <EMAIL> <EMAIL> one ip <IP>"

    # conservative: normal prose survives untouched
    assert got[3]["scrubbed"] == DOCS[3][1]
    assert got[3]["n_email"] == got[3]["n_ipv4"] == got[3]["n_phone"] == 0

    assert got[4]["scrubbed"] == "" and got[4]["n_email"] == 0

    assert got[5]["n_phone"] == 1
    assert got[5]["scrubbed"] == "call <PHONE> today"

    assert got[6]["n_email"] == 1 and got[6]["n_ipv4"] == 0
    assert got[6]["scrubbed"] == "contact <EMAIL> please"


def test_scrub_matches_duckdb_twin(spark, docs):
    import duckdb

    got = sorted(tuple(r) for r in scrubbing.scrub_pii(docs).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = sorted(
        (int(a), int(b), int(c), int(d), str(e))
        for a, b, c, d, e in con.execute(scrubbing.scrub_pii_sql()).fetchall()
    )
    assert got == want
