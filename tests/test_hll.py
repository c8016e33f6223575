"""Relational HyperLogLog (operators/hll.py): accuracy vs exact
distinct, merge semantics, linear-counting branch, partitioning
invariance, and estimate magnitudes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import hll

P = 12  # 4096 registers, ~1.6% standard error


@pytest.fixture(scope="module")
def big(spark):
    # 50k distinct values, each appearing 1-3 times
    return spark.range(50_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("v"),
        F.explode(
            F.sequence(F.lit(1), (F.col("id") % 3 + 1).cast("int"))
        ).alias("rep"),
    )


def test_accuracy_within_5pct(big):
    regs = hll.hll_registers(big, "v", P)
    est = hll.hll_estimate(regs, P).collect()[0]
    assert abs(est["estimate"] - 50_000) / 50_000 < 0.05
    assert est["m"] == 4096


def test_duplicates_do_not_move_the_sketch(spark):
    a = spark.createDataFrame([(f"k{i}",) for i in range(1000)], "v string")
    b = a.unionByName(a).unionByName(a)
    ra = {(r["bucket"], r["register"]) for r in hll.hll_registers(a, "v", P).collect()}
    rb = {(r["bucket"], r["register"]) for r in hll.hll_registers(b, "v", P).collect()}
    assert ra == rb


def test_null_values_excluded_both_engines(spark):
    """A NULL is not a distinct value: unfiltered it inflates
    ``occupied`` (junk NULL-bucket row) on Spark and hashes the bare
    salt into a real register on DuckDB — registers must be identical
    with or without NULL rows, and the estimate unchanged."""
    import duckdb

    base = spark.createDataFrame([(f"v{i}",) for i in range(50)], "v string")
    with_nulls = base.unionByName(
        spark.createDataFrame([(None,)] * 7, "v string")
    )
    clean = {tuple(r) for r in hll.hll_registers(base, "v", p=8).collect()}
    dirty = {
        tuple(r) for r in hll.hll_registers(with_nulls, "v", p=8).collect()
    }
    assert clean == dirty
    con = duckdb.connect()
    con.register("t", with_nulls.toPandas())
    want = {
        tuple(r)
        for r in con.execute(hll.hll_registers_sql("v", 8)).fetchall()
    }
    assert dirty == want


def test_empty_register_table_estimates_zero(spark):
    """A legitimately empty day/source must estimate 0 (the linear-
    counting branch at zeros=m), not NULL-propagate through raw and
    estimate — and the DuckDB twin must agree."""
    import duckdb

    empty = spark.createDataFrame([], "v string")
    r = hll.hll_estimate(hll.hll_registers(empty, "v", p=8), p=8).collect()[0]
    assert (r["occupied"], r["zeros"]) == (0, 256)
    assert r["estimate"] == 0.0
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v VARCHAR)")
    ref = con.execute(
        hll.hll_estimate_sql(hll.hll_registers_sql("v", 8), 8)
    ).fetchone()
    assert (ref[1], ref[2], ref[4]) == (0, 256, 0.0)


def test_linear_counting_small_range(spark):
    small = spark.createDataFrame([(f"x{i}",) for i in range(100)], "v string")
    est = hll.hll_estimate(hll.hll_registers(small, "v", P), P).collect()[0]
    # small range: nearly exact via linear counting
    assert abs(est["estimate"] - 100) / 100 < 0.05
    assert est["zeros"] > 0


def test_merge_equals_union_sketch(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(5000)], "v string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(2500, 7500)], "v string"  # overlaps a
    )
    merged = hll.hll_merge(
        hll.hll_registers(a, "v", P), hll.hll_registers(b, "v", P)
    )
    direct = hll.hll_registers(a.unionByName(b), "v", P)
    got = {(r["bucket"], r["register"]) for r in merged.collect()}
    want = {(r["bucket"], r["register"]) for r in direct.collect()}
    assert got == want  # sketch of union == union of sketches, exactly


def test_partitioning_invariance(big):
    a = hll.hll_estimate(hll.hll_registers(big, "v", P), P).collect()[0]
    b = hll.hll_estimate(
        hll.hll_registers(big.repartition(17), "v", P), P
    ).collect()[0]
    assert a["occupied"] == b["occupied"]
    assert a["estimate"] == b["estimate"]


def test_bad_p_raises(big):
    with pytest.raises(ValueError, match="4 <= p"):
        hll.hll_registers(big, "v", 3)


def test_windowed_streaming_registers(spark, tmp_path):
    """Streaming face: per-window registers match the batch sketch of
    the same window's rows, and the estimate is near-exact at small n
    (linear counting)."""
    from pyspark.sql import types as T

    src = tmp_path / "hll_src"
    src.mkdir()
    rows = [("2024-01-01 00:%02d:00" % (i % 5), f"u{i % 40}") for i in range(200)]
    df = spark.createDataFrame(rows, "ts string, v string").select(
        F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    df.write.parquet(str(src / "b0"))
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.StringType())]
    )
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    regs = hll.windowed_hll_registers(stream, "ts", "v", P, window="5 minutes")
    q = (
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_win")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["bucket"], r["register"])
            for r in spark.sql("SELECT bucket, register FROM hll_win").collect()
        }
    finally:
        q.stop()
    want = {
        (r["bucket"], r["register"])
        for r in hll.hll_registers(df, "v", P).collect()
    }
    assert got == want  # one window holds all rows -> same sketch
    est = hll.hll_estimate(
        spark.createDataFrame(
            [(b, r) for b, r in got], "bucket long, register int"
        ),
        P,
    ).collect()[0]
    assert abs(est["estimate"] - 40) / 40 < 0.05
