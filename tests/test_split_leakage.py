"""text.splits.split_asset_leakage: cross-split shared-asset audit.

Gates: (1) an asset in train-only or eval-only docs is NOT reported,
one in both IS, (2) distinct-doc counting (one train doc using the
asset twice is 1), (3) multi-eval splits (val + test) both count as
eval, (4) empty result on a leak-free assignment, (5) DuckDB twin.
"""

import duckdb

from webscrape_neko_jirushi_spark.text import splits


def _assign(spark):
    rows = [
        ("d1", "train"), ("d2", "train"), ("d3", "val"),
        ("d4", "test"), ("d5", "train"),
    ]
    return spark.createDataFrame(rows, "doc_id string, split string")


def _assets(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, media_ref string")


def test_leak_detection_and_distinct_docs(spark):
    assets = _assets(
        spark,
        [
            ("d1", "leaky"), ("d1", "leaky"), ("d3", "leaky"),  # train+val
            ("d1", "trainonly"), ("d2", "trainonly"),
            ("d3", "evalonly"), ("d4", "evalonly"),             # val+test only
            ("d5", "both_eval"), ("d4", "both_eval"),           # train+test
        ],
    )
    got = {
        r.media_ref: (r.n_train_docs, r.n_eval_docs)
        for r in splits.split_asset_leakage(_assign(spark), assets).collect()
    }
    assert got == {"leaky": (1, 1), "both_eval": (1, 1)}


def test_clean_assignment_empty(spark):
    assets = _assets(spark, [("d1", "a"), ("d2", "a"), ("d3", "b")])
    assert splits.split_asset_leakage(_assign(spark), assets).count() == 0


def test_duckdb_twin_matches(spark):
    assign_rows = [(f"d{i}", ["train", "val", "test"][i % 3]) for i in range(60)]
    asset_rows = [(f"d{i}", f"m{(i * 7) % 15}") for i in range(60)]
    asset_rows += [(f"d{i}", f"m{(i * 3) % 9}") for i in range(0, 60, 2)]
    assign = spark.createDataFrame(assign_rows, "doc_id string, split string")
    assets = _assets(spark, asset_rows)
    got = {
        (r.media_ref, r.n_train_docs, r.n_eval_docs)
        for r in splits.split_asset_leakage(assign, assets).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE asg(doc_id VARCHAR, split VARCHAR)")
    con.execute("CREATE TABLE ast(doc_id VARCHAR, media_ref VARCHAR)")
    con.executemany("INSERT INTO asg VALUES (?,?)", assign_rows)
    con.executemany("INSERT INTO ast VALUES (?,?)", asset_rows)
    ref = set(
        tuple(r)
        for r in con.execute(
            splits.split_asset_leakage_sql("asg", "ast")
        ).fetchall()
    )
    assert got == ref and len(got) > 0
