"""similarity.topk_recall: ANN quality as a query.

Gates: (1) hand-computed overlap incl. zero-overlap -> recall 0 (not
an empty result), (2) per-query grouped form macro shape, (3) DuckDB
twin, (4) planted end-to-end: LSH ANN recall vs brute force on a
clustered corpus is high and the metric catches a broken index
(wrong-seed planes -> low recall).
"""

import duckdb
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import similarity as sim


def _tbl(spark, ids, extra_cols=None):
    return spark.createDataFrame([(i,) for i in ids], "vec_id long")


def test_single_query_overlap(spark):
    exact = _tbl(spark, range(10))
    approx = _tbl(spark, [0, 1, 2, 3, 4, 50, 51, 52, 53, 54])
    r = sim.topk_recall(exact, approx).collect()[0]
    assert (r.k, r.n_overlap, r.recall) == (10, 5, 0.5)
    none = sim.topk_recall(exact, _tbl(spark, range(100, 110))).collect()[0]
    assert (none.k, none.n_overlap, none.recall) == (10, 0, 0.0)


def test_per_query_grouped(spark):
    exact = spark.createDataFrame(
        [(q, i) for q in ("a", "b") for i in range(5)],
        "qid string, vec_id long",
    )
    approx = spark.createDataFrame(
        [("a", 0), ("a", 1), ("a", 99), ("b", 9), ("b", 8)],
        "qid string, vec_id long",
    )
    got = {
        r.qid: (r.k, r.n_overlap, r.recall)
        for r in sim.topk_recall(exact, approx, query_col="qid").collect()
    }
    assert got["a"] == (5, 2, 0.4)
    assert got["b"] == (5, 0, 0.0)


def test_duckdb_twin_matches(spark):
    exact_ids = list(range(12))
    approx_ids = [0, 2, 4, 6, 8, 10, 100, 101, 102, 103, 104, 105]
    got = sim.topk_recall(
        _tbl(spark, exact_ids), _tbl(spark, approx_ids)
    ).collect()[0]
    con = duckdb.connect()
    e_sql = "SELECT UNNEST(range(0,12)) AS vec_id"
    a_sql = (
        "SELECT UNNEST([0,2,4,6,8,10,100,101,102,103,104,105]) AS vec_id"
    )
    ref = con.execute(sim.topk_recall_sql(e_sql, a_sql)).fetchone()
    assert (got.k, got.n_overlap, got.recall) == ref


def test_catches_broken_index(spark):
    # clustered corpus: 4 tight clusters; query = a member of cluster 0
    import numpy as np

    rng = np.random.RandomState(11)
    centers = rng.randn(4, 16) * 5
    rows = []
    for i in range(400):
        c = i % 4
        rows.append((i, (centers[c] + rng.randn(16) * 0.1).tolist()))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("float")).alias("embedding")
    )
    qv = [float(x) for x in rows[0][1]]
    exact = sim.cosine_topk(e.filter("vec_id != 0"), qv, k=20)
    good = sim.ann_topk_lsh(
        e.filter("vec_id != 0"), qv, k=20, bits=6, seed=7, multiprobe_hamming=1
    )
    r_good = sim.topk_recall(exact, good).collect()[0]
    assert r_good.recall >= 0.8  # clustered data: LSH finds the cluster
    # "broken" = an index that returns the FARTHEST 20 of the top-100
    # pool (disjoint from the true top-20): recall must crater
    pool = sim.cosine_topk(e.filter("vec_id != 0"), qv, k=100)
    bad = pool.orderBy(F.asc("cosine")).limit(20)
    r_bad = sim.topk_recall(exact, bad.select("vec_id")).collect()[0]
    assert r_bad.recall <= 0.2
