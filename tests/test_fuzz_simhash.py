"""Differential fuzz of the SIMHASH SIGNATURE PATH vs DuckDB: the
minhash fuzz leg (test_fuzz_minhash.py) covers the shingle + h1/h2
digest-half family; this leg covers the OTHER hash family every
simhash near-dup result sits on — per-token md5 -> top-15-hex-digit
60-bit hash -> per-bit majority vote — cell-by-cell on the same
adversarial corpus style. A silent divergence here (tokenizer split
semantics, digest slicing, majority-tie direction, bit-shift/sign
semantics) would shift every simhash signature and with it every
Hamming-banded candidate set, while the sf-table oracle gate
(friendly generator text) could stay green.

The SQL twin is imported from ``__spark_entry__`` (``_SIMHASH_SQL``)
— the exact expression the driver's simhash_near_dups oracle runs —
so a failure indicts the function/twin pair, not a test
re-implementation.

Signatures are exact integers (no float tolerance): any mismatch is a
real engine-semantics divergence.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from __spark_entry__ import _SIMHASH_SQL
from webscrape_neko_jirushi_spark.operators import dedup

SEED = 20260817

_FRAGMENTS = [
    "cat", "Foster", "neko", "猫", "ねこちゃん", "カタカナ", "😀🐈",
    "the and of to in", "hello, world!", "aaaaaaaaaa", "?!;:",
    "tab\there", "new\nline", "carriage\rreturn", "  spaced  ",
    "under_score", "-dash-", "image.JPG", "a:b:c", "50% off!",
    "…ellipsis…", "ÀÉÎÕÜ", "ｱｲｳｴｵ", "①②③", "ＦＵＬＬＷＩＤＴＨ",
]

_DIRECTED = [
    "", " ", "\t", "\n", "\r\n", "   \t  ",
    "one",                                     # single token
    "one two",                                 # even count: 2*b > n ties
    "one one",                                 # identical-token tie
    "one one two",                             # 2-of-3 majority
    "UPPER upper UpPeR",                       # case-folds to a 3-way tie
    "rep rep rep rep rep rep rep rep",         # one token, all votes
    "a  b   c    d     e      f",              # multi-space runs
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
    seps = ["", " ", "  ", ":", "\t", "_", "-", ".", "\n"]
    for _ in range(220):
        k = rng.randint(1, 12)
        parts = [rng.choice(_FRAGMENTS) for _ in range(k)]
        rows.append(rng.choice(seps).join(parts))
    return rows


@pytest.fixture(scope="module")
def results(spark):
    rows = _corpus()
    pdf = pd.DataFrame({"i": range(len(rows)), "text": rows})
    sdf = spark.createDataFrame(pdf).coalesce(4)

    got = {
        int(r["i"]): int(r["simhash"])
        for r in dedup.simhash_signatures(sdf, "text", "i").collect()
    }

    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        int(i): int(s)
        for i, s in con.execute(
            f"SELECT i, {_SIMHASH_SQL} AS simhash FROM t"
        ).fetchall()
    }
    return rows, got, want


def test_simhash_signatures_match_duckdb_cellwise(results):
    rows, got, want = results
    assert set(got) == set(want)
    bad = {
        i: (got[i], want[i], rows[i][:60])
        for i in got
        if got[i] != want[i]
    }
    assert not bad, f"{len(bad)} divergent signatures, sample: " + str(
        dict(list(bad.items())[:5])
    )


def test_simhash_values_fit_the_60_bit_envelope(results):
    """Signatures must stay inside the 60-bit positive envelope on
    BOTH engines — a value outside it means the digest slicing or the
    shift direction broke, even if the engines happen to agree."""
    _, got, want = results
    for sig in list(got.values()) + list(want.values()):
        assert 0 <= sig < (1 << 60), sig


def test_simhash_directed_corners_are_nontrivial(results):
    """The directed corpus must actually exercise the majority logic:
    at least one non-zero signature among the tie-shaped inputs, and
    identical normalized texts must collide exactly."""
    rows, got, _ = results
    by_text = {}
    for i, r in enumerate(rows):
        norm = " ".join(r.lower().split())
        by_text.setdefault(norm, set()).add(got[i])
    # identical normalized text -> identical signature, always
    for norm, sigs in by_text.items():
        assert len(sigs) == 1, (norm[:40], sigs)
    assert any(s != 0 for s in got.values())
