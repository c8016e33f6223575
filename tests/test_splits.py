"""X73 leakage-safe split: group-atomic assignment, band bounds,
report + leakage audit, DuckDB twin equality, validation."""

from __future__ import annotations

import duckdb
import pytest

from webscrape_neko_jirushi_spark.text import splits as SP

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark):
    rows = [(i, f"s{i % 3}", 10 + i) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tok long")


def _clusters(spark):
    # docs 0..59 in 20 clusters of 3 (i, i+60, i+120 NOT used — keep
    # ids in range): cluster c groups {3c, 3c+1, 3c+2}
    rows = [(i, i // 3) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, cluster_id long")


def test_split_bounds_validation():
    with pytest.raises(ValueError):
        SP.split_bounds({"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        SP.split_bounds({})
    b = SP.split_bounds(FRACS)
    assert [n for n, _ in b] == ["train", "val", "test"]
    assert b[-1][1] == SP.HASH_SPACE


def test_groups_never_straddle(spark):
    a = SP.leakage_safe_split(_docs(spark), FRACS, clusters=_clusters(spark))
    rows = a.collect()
    by_cluster = {}
    for r in rows:
        if r["doc_id"] < 60:
            by_cluster.setdefault(r["doc_id"] // 3, set()).add(r["split"])
    assert all(len(v) == 1 for v in by_cluster.values())
    # ungrouped docs present and assigned
    assert all(r["split"] in FRACS for r in rows)
    assert len(rows) == 200


def test_fractions_roughly_hold(spark):
    a = SP.leakage_safe_split(_docs(spark), FRACS)
    counts = {r["split"]: r["n"] for r in a.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert counts.get("train", 0) > 100  # 80% of 200, loose bound
    assert sum(counts.values()) == 200


def test_report_and_leakage_audit(spark):
    a = SP.leakage_safe_split(_docs(spark), FRACS, clusters=_clusters(spark))
    rep = {r["split"]: r for r in SP.split_report(a, token_col="n_tok").collect()}
    assert all(r["leaked_groups"] == 0 for r in rep.values())
    assert sum(r["n_docs"] for r in rep.values()) == 200
    assert sum(r["n_tokens"] for r in rep.values()) == sum(10 + i for i in range(200))
    # an adversarial external assignment leaks
    import pyspark.sql.functions as F

    bad = a.withColumn(
        "split", F.when(F.col("doc_id") % 2 == 0, "train").otherwise("val")
    )
    leaked = SP.split_report(bad).collect()[0]["leaked_groups"]
    assert leaked > 0


def test_duckdb_twin(spark):
    docs, clus = _docs(spark), _clusters(spark)
    a = SP.leakage_safe_split(docs, FRACS, clusters=clus)
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    con.register("clus", clus.toPandas())
    sql = SP.leakage_safe_split_sql(
        "docs", FRACS, clusters_expr="clus", cols="d.doc_id, d.source, d.n_tok"
    )
    got = sorted(tuple(r) for r in a.collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want

    got = sorted(
        tuple(r) for r in SP.split_report(a, token_col="n_tok").collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            SP.split_report_sql(f"({sql})", token_col="n_tok")
        ).fetchall()
    )
    assert got == want
