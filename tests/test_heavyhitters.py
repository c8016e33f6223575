"""operators.heavyhitters: Misra-Gries candidate pass + exact verify.

Gates: (1) parity with a plain groupBy top-m under planted zipf-ish
skew, (2) the certification guard actually FIRES when k is too small
for the skew (never a silent wrong answer), (3) partition-layout
invariance (the summaries are mergeable: any repartitioning gives the
same certified answer), (4) summary size stays bounded at <= k + 1
rows per partition, (5) NULL keys are excluded, not counted.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from webscrape_neko_jirushi_spark.operators import heavyhitters as hh


def _skewed(spark, parts=8):
    # key i appears (41 - 2i) times for i in 0..19 (821 rows total),
    # plus 200 singleton keys 1000..1199: clear, gap-separated top-10.
    rows = []
    for i in range(20):
        rows += [(i,)] * (41 - 2 * i)
    rows += [(1000 + j,) for j in range(200)]
    return spark.createDataFrame(rows, "user_id long").repartition(parts)


def _exact_top(df, m):
    return [
        (r.user_id, r.cnt)
        for r in df.filter("user_id is not null")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(m)
        .collect()
    ]


def test_parity_with_plain_groupby(spark):
    df = _skewed(spark)
    got = [
        (r.user_id, r.cnt)
        for r in hh.heavy_hitters_exact(df, "user_id", m=10, k=64).collect()
    ]
    assert sorted(got) == sorted(_exact_top(df, 10))


def test_certification_fires_when_k_too_small(spark):
    # 500 near-uniform keys, k=4: massive decrements, top-3 counts
    # cannot clear D. Must raise (plan-side), never return quietly.
    df = spark.createDataFrame(
        [(i % 500,) for i in range(5000)], "user_id long"
    ).repartition(4)
    with pytest.raises(Exception, match="not certifiable"):
        hh.heavy_hitters_exact(df, "user_id", m=3, k=4).collect()


def test_all_pruned_summaries_still_raise(spark):
    """Every key unique (each appears once): every partition summary
    prunes to EMPTY, so the candidate set is empty — the guard must
    still fire on the D>0 placeholder row, never return a silent
    empty 'top-m'."""
    df = spark.createDataFrame(
        [(i,) for i in range(2000)], "user_id long"
    ).repartition(4)
    with pytest.raises(Exception, match="not certifiable"):
        hh.heavy_hitters_exact(df, "user_id", m=3, k=4).collect()


def test_no_keys_at_all_is_a_clean_empty(spark):
    """Zero non-null keys: D == 0 and no candidates — the one case
    where an empty result IS the certified answer."""
    df = spark.createDataFrame([(None,), (None,)], "user_id string")
    assert hh.heavy_hitters_exact(df, "user_id", m=3, k=4).count() == 0


def test_partition_layout_invariance(spark):
    base = _skewed(spark, parts=3)
    a = hh.heavy_hitters_exact(base, "user_id", m=5, k=64).collect()
    b = hh.heavy_hitters_exact(
        base.repartition(17, "user_id"), "user_id", m=5, k=64
    ).collect()
    assert sorted((r.user_id, r.cnt) for r in a) == sorted(
        (r.user_id, r.cnt) for r in b
    )


def test_summary_bounded_and_accounting_rows(spark):
    df = spark.createDataFrame(
        [(i % 300,) for i in range(3000)], "user_id long"
    ).repartition(5)
    k = 16
    parts = hh.mg_partials(df, "user_id", k=k).collect()
    acct = [r for r in parts if r.key is None]
    real = [r for r in parts if r.key is not None]
    assert len(acct) == 5  # one accounting row per partition
    assert all(r.dec == 0 for r in real)
    assert len(real) <= 5 * k  # bounded summaries, not a groupBy
    # near-uniform 300 keys vs k=16: decrements must have happened
    assert sum(r.dec for r in acct) > 0


def test_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [(1,)] * 5 + [(2,)] * 3 + [(None,)] * 50, "user_id long"
    ).repartition(2)
    got = hh.heavy_hitters_exact(df, "user_id", m=2, k=8).collect()
    assert sorted((r.user_id, r.cnt) for r in got) == [(1, 5), (2, 3)]


def test_string_keys(spark):
    df = spark.createDataFrame(
        [("a",)] * 9 + [("b",)] * 7 + [("c",)] * 2 + [("d",)] * 1,
        "host string",
    ).repartition(3)
    got = hh.heavy_hitters_exact(df, "host", m=2, k=8).collect()
    assert sorted((r.host, r.cnt) for r in got) == [("a", 9), ("b", 7)]


def test_mg_prune_unit():
    s = pd.Series({10: 7, 11: 5, 12: 2, 13: 2, 14: 1})
    pruned, dec = hh._mg_prune(s, 2)
    assert dec == 2  # 3rd-largest value
    assert pruned.to_dict() == {10: 5, 11: 3}
    same, zero = hh._mg_prune(s, 5)
    assert zero == 0 and same.equals(s)
