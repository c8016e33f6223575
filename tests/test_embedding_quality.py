"""expectations.embedding_quality_report: vector-column health.

Gates: (1) each defect class counted exactly once with planted NULL /
wrong-dim / NaN / Inf / zero vectors, (2) defective vectors excluded
from the norm scan (min/max computed over valid only), (3) DuckDB
twin cell-for-cell, (4) clean table: all defect counts 0.
"""

import math

import duckdb

from webscrape_neko_jirushi_spark.operators import expectations as ex

SCHEMA = "vec_id long, embedding array<float>"


def _rows():
    return [
        (0, [3.0, 4.0]),                 # norm 5
        (1, [1.0, 0.0]),                 # norm 1
        (2, None),                       # null
        (3, [1.0, 2.0, 3.0]),            # wrong dim
        (4, [float("nan"), 1.0]),        # NaN
        (5, [float("inf"), 1.0]),        # Inf
        (6, [0.0, 0.0]),                 # zero vector
        (7, [1.0, None]),                # NULL element — its own bucket:
        # three-valued logic would otherwise make the row invisible to
        # EVERY count and diverge from the DuckDB twin
    ]


def test_defect_classes_and_norms(spark):
    df = spark.createDataFrame(_rows(), SCHEMA).repartition(3)
    r = ex.embedding_quality_report(df, dim=2).collect()[0]
    assert (
        r.n_vecs, r.n_null, r.n_wrong_dim, r.n_null_elem, r.n_nonfinite,
        r.n_zero,
    ) == (8, 1, 1, 1, 2, 1)
    assert r.min_norm == 0.0  # the zero vector is valid, norm 0
    assert r.max_norm == 5.0


def test_duckdb_twin_matches(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    got = ex.embedding_quality_report(df, dim=2).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE e(vec_id BIGINT, embedding FLOAT[])")
    for vid, vec in _rows():
        if vec is None:
            con.execute("INSERT INTO e VALUES (?, NULL)", [vid])
        else:
            vals = ", ".join(
                "NULL" if x is None
                else "'nan'::FLOAT" if math.isnan(x)
                else "'inf'::FLOAT" if math.isinf(x)
                else repr(x)
                for x in vec
            )
            con.execute(f"INSERT INTO e VALUES ({vid}, [{vals}])")
    ref = con.execute(
        ex.embedding_quality_report_sql("e", dim=2)
    ).fetchone()
    assert tuple(got) == ref


def test_clean_table(spark):
    df = spark.createDataFrame(
        [(i, [float(i + 1), 0.0]) for i in range(5)], SCHEMA
    )
    r = ex.embedding_quality_report(df, dim=2).collect()[0]
    assert (r.n_null, r.n_wrong_dim, r.n_null_elem, r.n_nonfinite, r.n_zero) == (
        0, 0, 0, 0, 0,
    )
    assert (r.min_norm, r.max_norm) == (1.0, 5.0)
