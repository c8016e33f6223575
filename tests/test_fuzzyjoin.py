"""X66 fuzzy join: brute-force parity (completeness + soundness),
planted-typo recall, DuckDB twin equality, validation."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.text import fuzzyjoin as FJ


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def brute(rows, d):
    out = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            dist = _lev(ta, tb)
            if dist <= d:
                a, b = sorted((ia, ib))
                out.add((a, b, dist))
    return out


WORDS = [
    (1, "widget"), (2, "widgets"), (3, "wdget"), (4, "gadget"),
    (5, "midget"), (6, "totally-different"), (7, "widget"),
    (8, "a"), (9, "b"), (10, "ab"), (11, ""), (12, "sitting"),
    (13, "kitten"), (14, "mitten"), (15, "written"),
]


@pytest.mark.parametrize("d", [1, 2])
def test_bruteforce_parity(spark, d):
    df = spark.createDataFrame(WORDS, "id int, name string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in FJ.fuzzy_self_pairs(df, "id", "name", d).collect()
    }
    assert got == brute(WORDS, d), d


def test_planted_typo_recall(spark):
    import random

    rng = random.Random(11)
    base = [f"document-title-{i:05d}" for i in range(200)]
    rows = [(i, t) for i, t in enumerate(base)]
    planted = []
    for j in range(40):  # one random edit each
        src = rng.randrange(200)
        t = list(base[src])
        op = rng.choice("sid")
        p = rng.randrange(len(t))
        if op == "s":
            t[p] = "Z"
        elif op == "i":
            t.insert(p, "Z")
        else:
            del t[p]
        rows.append((1000 + j, "".join(t)))
        planted.append((src, 1000 + j))
    df = spark.createDataFrame(rows, "id int, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in FJ.fuzzy_self_pairs(df, "id", "name", 1).collect()
    }
    # completeness: every planted single-edit neighbor is recovered
    # (base strings contain no 'Z', so every edit really changed it)
    for s, p in planted:
        assert (s, p) in got, (s, p)


def test_duckdb_twin(spark):
    df = spark.createDataFrame(WORDS, "id int, name string")
    for d in (1, 2):
        got = sorted(
            tuple(r) for r in FJ.fuzzy_self_pairs(df, "id", "name", d).collect()
        )
        con = duckdb.connect()
        con.register("w", pd.DataFrame(WORDS, columns=["id", "name"]))
        want = sorted(
            (int(a), int(b), int(x))
            for a, b, x in con.execute(
                FJ.fuzzy_self_pairs_sql("w", "id", "name", d)
            ).fetchall()
        )
        assert got == want, d


def test_null_and_validation(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "y")], "id int, name string"
    )
    got = FJ.fuzzy_self_pairs(df, "id", "name", 1).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(2, 3)}
    with pytest.raises(ValueError, match="max_dist"):
        FJ.fuzzy_self_pairs(df, "id", "name", 3)
