"""Domain-quality rollup (text/analysis.py): Wilson lower-bound math
vs a Python reference, the small-sample penalty the bound exists for,
and the DuckDB twin."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.text import analysis


def _wilson_ref(k, n, z=1.96):
    p = k / n
    z2 = z * z
    return (p + z2 / (2 * n) - z * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n)) / (
        1 + z2 / n
    )


def test_wilson_matches_python_reference(spark):
    cases = [(0, 10), (3, 4), (740, 1000), (25, 25), (1, 2), (60, 100)]
    df = spark.createDataFrame(cases, "k long, n long")
    got = {
        (r["k"], r["n"]): r["lb"]
        for r in df.select(
            "k",
            "n",
            analysis.wilson_lower_bound(F.col("k"), F.col("n")).alias("lb"),
        ).collect()
    }
    for k, n in cases:
        assert got[(k, n)] == pytest.approx(_wilson_ref(k, n), abs=1e-12)
    # k = 0 collapses to exactly 0 in this parenthesization
    assert got[(0, 10)] == 0.0


def test_small_sample_penalty(spark):
    # the bound's whole point: 3/4 must NOT outrank 740/1000
    df = spark.createDataFrame([(3, 4), (740, 1000)], "k long, n long")
    lb = {
        r["n"]: r["lb"]
        for r in df.select(
            "n", analysis.wilson_lower_bound(F.col("k"), F.col("n")).alias("lb")
        ).collect()
    }
    assert lb[4] < lb[1000]
    assert 3 / 4 > 740 / 1000  # while the point estimates say otherwise


def _docs():
    good = "the quick brown fox jumps over the lazy dog and runs on " * 3
    bad = "x" * 6000
    rows = []
    for i in range(20):  # big good domain: 18/20 admitted
        rows.append((f"d{i}", "big", good if i < 18 else bad))
    for i in range(4):  # small lucky domain: 4/4 admitted
        rows.append((f"s{i}", "small", good))
    for i in range(10):  # junk domain
        rows.append((f"j{i}", "junk", bad))
    return rows


def test_rollup_gates_on_lower_bound(spark):
    df = spark.createDataFrame(_docs(), "doc_id string, source string, text string")
    out = {
        r["source"]: r.asDict()
        for r in analysis.domain_quality_rollup(df, min_lb=0.6).collect()
    }
    assert out["big"]["n_docs"] == 20 and out["big"]["n_kept"] == 18
    assert out["big"]["keep_domain"]
    # 4/4 has admit_rate 1.0 but the bound refuses the luck
    assert out["small"]["admit_rate"] == 1.0
    assert out["small"]["wilson_lb"] < 0.6 and not out["small"]["keep_domain"]
    assert out["junk"]["n_kept"] == 0 and out["junk"]["wilson_lb"] == 0.0


def test_duckdb_twin_expression(spark):
    cases = [(0, 7), (3, 4), (740, 1000), (13, 25), (250, 250)]
    con = duckdb.connect()
    for k, n in cases:
        want = con.execute(
            f"SELECT {analysis.wilson_lb_sql(str(k), str(n))}"
        ).fetchone()[0]
        got = (
            spark.range(1)
            .select(
                analysis.wilson_lower_bound(
                    F.lit(k).cast("long"), F.lit(n).cast("long")
                ).alias("lb")
            )
            .collect()[0]["lb"]
        )
        assert got == want, (k, n)  # bit-identical IEEE, not approx
