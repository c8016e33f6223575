"""X86 URL-parameter significance mining: verdict law, strip
canonicalization, savings parity, guards, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from webscrape_neko_jirushi_spark.crawl import urlparams as up


def _log(spark, rows):
    return spark.createDataFrame(rows, "url string, digest string")


# content depends on page only; sess is noise; v is constant
_ROWS = [
    (f"https://h/x?page={p}&sess={s}&v=1", f"d{p}")
    for p in range(3)
    for s in range(4)
] + [
    # param-order variant of an existing URL: same canonical form
    ("https://h/x?sess=0&page=0&v=1", "d0"),
    # no-query URL: must be ignored by significance, kept by nothing
    ("https://h/plain", "dp"),
]


def test_verdicts(spark):
    rep = {
        r["param"]: r
        for r in up.param_significance(_log(spark, _ROWS)).collect()
    }
    assert rep["sess"]["verdict"] == "content_neutral"
    assert rep["page"]["verdict"] == "significant"
    assert rep["v"]["verdict"] == "insufficient_evidence"
    # sess probe groups: one per page value, each with 4 sess values
    assert rep["sess"]["n_probe_groups"] == 3
    assert rep["sess"]["n_varying_groups"] == 0
    assert rep["page"]["n_varying_groups"] >= 1
    assert rep["v"]["n_probe_groups"] == 0


def test_unstable_page_single_vote(spark):
    # same URL fetched twice with different digests: min(digest) is
    # the stable representative, so sess stays neutral
    rows = _ROWS + [("https://h/x?page=0&sess=0&v=1", "zz-unstable")]
    rep = {
        r["param"]: r["verdict"]
        for r in up.param_significance(_log(spark, rows)).collect()
    }
    assert rep["sess"] == "content_neutral"


def test_strip_params_column(spark):
    df = spark.createDataFrame(
        [
            ("https://h/x?b=2&a=1&sess=9",),
            ("https://h/x?sess=9",),
            ("https://h/plain",),
        ],
        "url string",
    ).select(up.strip_params(F.col("url"), ["sess"]).alias("u"))
    got = [r["u"] for r in df.collect()]
    assert got == ["https://h/x?a=1&b=2", "https://h/x", "https://h/plain"]


def test_savings_counts(spark):
    row = up.param_strip_savings(_log(spark, _ROWS)).collect()[0]
    # 13 distinct raw url strings with a query (12 + order variant);
    # canonical before: 12 (the order variant collapses); after
    # stripping sess: 3 page values
    assert row["n_urls_raw"] == 13
    assert row["n_neutral_params"] == 1
    assert row["n_canonical_before"] == 12
    assert row["n_canonical_after"] == 3
    assert row["n_saved"] == 9


def test_guards_raise(spark):
    for bad in ("https://h/x?a=1&a=2", "https://h/x?a=1=2"):
        df = up.param_significance(_log(spark, [(bad, "d")]))
        with pytest.raises(Exception) as ei:
            df.collect()
        assert "urlparams" in str(ei.value)


def test_bare_flag_value_empty(spark):
    rows = [(f"https://h/x?flag&page={p}", f"d{p}") for p in range(2)] + [
        ("https://h/x?flag&page=0", "d0")
    ]
    rep = {
        r["param"]: r["verdict"]
        for r in up.param_significance(_log(spark, rows)).collect()
    }
    assert rep["page"] == "significant"
    assert rep["flag"] == "insufficient_evidence"


def test_duckdb_twin_parity(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE log(url VARCHAR, digest VARCHAR)"
    )
    con.executemany("INSERT INTO log VALUES (?, ?)", _ROWS)
    want_sig = sorted(
        map(tuple, con.execute(up.param_significance_sql("log")).fetchall())
    )
    got_sig = sorted(
        tuple(r) for r in up.param_significance(_log(spark, _ROWS)).collect()
    )
    assert got_sig == want_sig
    want_sav = con.execute(up.param_strip_savings_sql("log")).fetchall()[0]
    got_sav = tuple(up.param_strip_savings(_log(spark, _ROWS)).collect()[0])
    assert got_sav == tuple(want_sav)
