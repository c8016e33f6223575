"""operators.drift: snapshot distribution drift (TVD / L-inf /
per-bucket chi-square terms).

Gates: (1) hand-computed TVD/L-inf on a tiny known pair, (2) zero
drift on identical snapshots, disjoint supports -> TVD 1.0, (3) NULL
buckets participate, (4) one-sided buckets appear with zero counts,
(5) DuckDB twin cell-for-cell, (6) layout invariance (the reductions
are integer-exact, so repartitioning cannot move a single ulp).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import drift


def _df(spark, langs, parts=4):
    return spark.createDataFrame(
        [(x,) for x in langs], "lang string"
    ).repartition(parts)


def test_hand_computed_tvd(spark):
    # old: a x 3, b x 1  (p = .75/.25); new: a x 1, b x 3 (q = .25/.75)
    # TVD = .5*(|.5| + |-.5|) = 0.5 ; L_inf = 0.5
    old, new = _df(spark, ["a", "a", "a", "b"]), _df(spark, ["a", "b", "b", "b"])
    r = drift.drift_summary(old, new, F.col("lang")).collect()[0]
    assert r.n_buckets == 2
    assert r.tvd == pytest.approx(0.5)
    assert r.l_inf == pytest.approx(0.5)


def test_identity_and_disjoint(spark):
    a = _df(spark, ["x", "y", "y", "z"])
    same = drift.drift_summary(a, a, F.col("lang")).collect()[0]
    assert same.tvd == 0.0 and same.l_inf == 0.0
    b = _df(spark, ["p", "q"])
    dis = drift.drift_summary(a, b, F.col("lang")).collect()[0]
    assert dis.tvd == pytest.approx(1.0)


def test_null_and_one_sided_buckets(spark):
    old = _df(spark, ["a", None, None])
    new = _df(spark, ["a", "b"])
    rows = {
        r.bucket: (r.n_old, r.n_new)
        for r in drift.category_drift(old, new, F.col("lang")).collect()
    }
    assert rows[None] == (2, 0)
    assert rows["b"] == (0, 1)
    assert rows["a"] == (1, 1)


def test_duckdb_twin_matches(spark):
    langs_old = [f"l{i % 7}" for i in range(200)] + [None] * 5
    langs_new = [f"l{(i * 3) % 9}" for i in range(150)]
    old, new = _df(spark, langs_old, 5), _df(spark, langs_new, 3)
    got_rows = {
        (r.bucket, r.n_old, r.n_new, r.p_old, r.p_new, r.chi2_term)
        for r in drift.category_drift(old, new, F.col("lang")).collect()
    }
    got_sum = drift.drift_summary(old, new, F.col("lang")).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE o(lang VARCHAR)")
    con.execute("CREATE TABLE n(lang VARCHAR)")
    con.executemany("INSERT INTO o VALUES (?)", [(x,) for x in langs_old])
    con.executemany("INSERT INTO n VALUES (?)", [(x,) for x in langs_new])
    ref_rows = set(
        tuple(r)
        for r in con.execute(
            drift.category_drift_sql("o", "n", "lang")
        ).fetchall()
    )
    ref_sum = con.execute(
        drift.drift_summary_sql("o", "n", "lang")
    ).fetchone()
    assert got_rows == ref_rows
    assert (got_sum.n_buckets, got_sum.tvd, got_sum.l_inf) == ref_sum


def test_layout_invariance_bit_exact(spark):
    langs = [f"l{(i * 13) % 11}" for i in range(500)]
    a1, a2 = _df(spark, langs, 2), _df(spark, langs, 17)
    new = _df(spark, [f"l{i % 5}" for i in range(300)], 9)
    r1 = drift.drift_summary(a1, new, F.col("lang")).collect()[0]
    r2 = drift.drift_summary(a2, new, F.col("lang")).collect()[0]
    assert (r1.tvd, r1.l_inf) == (r2.tvd, r2.l_inf)  # == , not approx
