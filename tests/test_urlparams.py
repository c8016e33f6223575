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


def test_second_question_mark_preserved(spark):
    """RFC 3986 allows '?' inside the query — a positional split
    would truncate '?d' from the value, merging distinct values and
    corrupting canonical forms."""
    got = [
        r["u"]
        for r in spark.createDataFrame(
            [("https://h/x?b=c?d&a=1",)], "url string"
        )
        .select(up.strip_params(F.col("url"), ["a"]).alias("u"))
        .collect()
    ]
    assert got == ["https://h/x?b=c?d"]
    # significance: two URLs differing only in b's '?'-bearing value,
    # same digest -> b is probed and content_neutral (pre-fix the
    # truncated values collapsed and b never formed a probe group)
    rows = [
        ("https://h/x?a=1&b=c?d", "d1"),
        ("https://h/x?a=1&b=e?f", "d1"),
    ]
    rep = {
        r["param"]: r["verdict"]
        for r in up.param_significance(_log(spark, rows)).collect()
    }
    assert rep["b"] == "content_neutral"


def test_malformed_skip_mode(spark):
    """malformed='skip' excludes list-param / un-encoded URLs from
    evidence instead of killing the job; verdicts over the clean rows
    are unchanged and the excluded count is reportable."""
    dirty = _ROWS + [
        ("https://h/x?tag=a&tag=b", "dd"),   # duplicate param name
        ("https://h/x?a=1=2", "de"),          # un-encoded '='
    ]
    # error mode still raises on the same corpus
    with pytest.raises(Exception):
        up.param_significance(_log(spark, dirty)).collect()
    rep = {
        r["param"]: r["verdict"]
        for r in up.param_significance(
            _log(spark, dirty), malformed="skip"
        ).collect()
    }
    assert rep["sess"] == "content_neutral"
    assert rep["page"] == "significant"
    assert "tag" not in rep and "a" not in rep
    mal = up.malformed_url_report(_log(spark, dirty)).collect()[0]
    assert mal["n_urls_with_query"] == 15  # 13 clean + 2 dirty
    assert mal["n_malformed"] == 2


def test_malformed_skip_twin_parity(spark):
    dirty = _ROWS + [
        ("https://h/x?tag=a&tag=b", "dd"),
        ("https://h/x?a=1=2", "de"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE log(url VARCHAR, digest VARCHAR)")
    con.executemany("INSERT INTO log VALUES (?, ?)", dirty)
    want = sorted(
        map(
            tuple,
            con.execute(
                up.param_significance_sql("log", malformed="skip")
            ).fetchall(),
        )
    )
    got = sorted(
        tuple(r)
        for r in up.param_significance(
            _log(spark, dirty), malformed="skip"
        ).collect()
    )
    assert got == want
    want_mal = tuple(
        con.execute(up.malformed_url_report_sql("log")).fetchall()[0]
    )
    got_mal = tuple(up.malformed_url_report(_log(spark, dirty)).collect()[0])
    assert got_mal == want_mal


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
