"""Differential fuzz of the MINHASH HASH FAMILY vs DuckDB (VERDICT r4
item #8): the scalar fuzz harness (test_fuzz_scalar.py) covers the
projection layer; this leg covers the conv/substring/md5 path under
every near-dup result — shingle construction and the
Kirsch-Mitzenmacher h1/h2 digest-half extraction — cell-by-cell on the
same adversarial corpus style. A silent divergence here (split
semantics, digest slicing, 48-bit overflow) would shift every minhash
signature and with it every LSH candidate set, while the sf-table
oracle gate (friendly generator text) could stay green.

The SQL twins are imported from ``__spark_entry__`` itself — the exact
fragments the driver oracle runs — so a failure indicts the
function/twin pair, not a test re-implementation.

NULL text is deliberately excluded: minhash of absent text is not a
meaningful signature, the driver corpus never produces one, and the
admission filters (text/analysis.py) drop NULL text before any dedup
stage; the EMPTY and whitespace-only strings here pin down the actual
boundary behavior both engines share.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from __spark_entry__ import _MINHASH_HS_SQL, _SHINGLES, _minhash_sql_cols
from webscrape_neko_jirushi_spark.operators import dedup

SEED = 20260817
N_HASHES = 16
K = 5

_FRAGMENTS = [
    "cat", "Foster", "neko", "猫", "ねこちゃん", "カタカナ", "😀🐈",
    "the and of to in", "hello, world!", "aaaaaaaaaa", "?!;:",
    "tab\there", "new\nline", "carriage\rreturn", "  spaced  ",
    "under_score", "-dash-", "image.JPG", "a:b:c", "50% off!",
    "…ellipsis…", "ÀÉÎÕÜ", "ｱｲｳｴｵ", "①②③", "ＦＵＬＬＷＩＤＴＨ",
]

_DIRECTED = [
    "", " ", "\t", "\n", "\r\n", "   \t  ",
    "one", "one two", "one two three four",          # n < k boundary
    "one two three four five",                        # n == k (1 shingle)
    "one two three four five six",                    # n == k+1
    "UPPER lower MiXeD case WORDS here now ok",
    "rep rep rep rep rep rep rep rep",                # identical shingles
    "a  b   c    d     e      f",                     # multi-space runs
    " leading and trailing spaces padded out fully ",
    "日本語のテキストはスペースがないので一トークン",
    "mixed 日本語 and english words in one doc here",
    "x" * 6000,
    "word " * 100,
    "tab\tsep\ttokens\tneed\tnormalizing\ttoo\tyes",
    "newline\nseparated\ntokens\nare\none\nrun\neach",
]


def _corpus() -> list[str]:
    rng = random.Random(SEED)
    rows = list(_DIRECTED)
    for _ in range(200):
        k = rng.randint(1, 12)
        rows.append(" ".join(rng.choice(_FRAGMENTS) for _ in range(k)))
    return rows


@pytest.fixture(scope="module")
def results(spark):
    rows = _corpus()
    pdf = pd.DataFrame({"i": range(len(rows)), "text": rows})
    sdf = spark.createDataFrame(pdf).coalesce(4)

    from pyspark.sql import functions as F

    got_sh = (
        sdf.select("i", dedup.shingles(F.col("text"), K).alias("sh"))
        .toPandas()
        .set_index("i")
        .sort_index()
    )
    got_mh = (
        dedup.minhash_signatures(sdf, "text", "i", N_HASHES, K)
        .toPandas()
        .set_index("i")
        .sort_index()
    )

    con = duckdb.connect()
    con.register("t", pdf)
    want_sh = (
        con.execute(f"SELECT i, {_SHINGLES} AS sh FROM t ORDER BY i")
        .df()
        .set_index("i")
        .sort_index()
    )
    want_mh = (
        con.execute(
            f"SELECT i, {_minhash_sql_cols()} "
            f"FROM (SELECT i, {_MINHASH_HS_SQL} FROM t) s ORDER BY i"
        )
        .df()
        .set_index("i")
        .sort_index()
    )
    return rows, got_sh, got_mh, want_sh, want_mh


def test_shingle_construction_matches_duckdb(results):
    rows, got_sh, _, want_sh, _ = results
    bad = []
    for i in got_sh.index:
        a = list(got_sh.loc[i, "sh"])
        b = list(want_sh.loc[i, "sh"])
        if a != b:
            bad.append((i, repr(rows[i])[:60], a[:3], b[:3]))
    assert not bad, f"{len(bad)} shingle divergences, first 3: {bad[:3]}"


def test_minhash_signatures_match_duckdb_cellwise(results):
    """Every (doc, hash_i) cell exactly equal — the h1/h2 halves and
    the h1 + i*h2 arithmetic must be engine-exact, not just
    distribution-equivalent."""
    rows, _, got_mh, _, want_mh = results
    bad = []
    for i in got_mh.index:
        for h in range(N_HASHES):
            a = int(got_mh.loc[i, f"mh_{h}"])
            b = int(want_mh.loc[i, f"mh_{h}"])
            if a != b:
                bad.append((i, h, repr(rows[i])[:50], a, b))
    assert not bad, f"{len(bad)} signature-cell divergences, first 5: {bad[:5]}"


def test_minhash_values_fit_the_overflow_free_envelope(results):
    """The family's stated invariant: h1 + 15*h2 < 2^53 (exact in
    doubles, overflow-free in int64 on any engine). Verify the fuzz
    corpus' actual signature values stay inside it."""
    _, _, got_mh, _, _ = results
    hi = max(
        int(got_mh.loc[i, f"mh_{h}"])
        for i in got_mh.index
        for h in range(N_HASHES)
    )
    assert 0 <= hi < (1 << 53), hex(hi)
