"""operators.drift streaming face: windowed bucket counts + per-window
drift vs a pinned baseline.

Gates: (1) streaming windowed counts equal the batch groupBy of the
same rows (the X53 batch-parity guarantee), (2) windowed_drift per
window equals drift_summary computed in batch on that window's rows
vs the baseline (bit-exact — integer reductions), (3) baseline-only
and window-only buckets both participate.
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from webscrape_neko_jirushi_spark.operators import drift


def _rows():
    # two 5-minute windows with different lang mixes
    out = []
    for i in range(120):
        w = 0 if i % 2 == 0 else 7  # minutes 0-4 vs 5-9
        lang = f"l{i % 3}" if w == 0 else f"l{i % 5}"
        out.append((f"2024-01-01 00:{w:02d}:00", lang))
    return out


def test_streaming_counts_match_batch_and_drift(spark, tmp_path):
    src = tmp_path / "drift_src"
    src.mkdir()
    df = spark.createDataFrame(_rows(), "ts string, lang string").select(
        F.col("ts").cast("timestamp").alias("ts"), "lang"
    )
    df.write.parquet(str(src / "b0"))
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("lang", T.StringType())]
    )
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    counts = drift.windowed_bucket_counts(
        stream, "ts", F.col("lang"), window="5 minutes"
    )
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("drift_win")
        .start()
    )
    try:
        q.processAllAvailable()
        got_counts = {
            (r["window"]["start"].minute, r["bucket"], r["n"])
            for r in spark.sql("SELECT * FROM drift_win").collect()
        }
    finally:
        q.stop()
    want_counts = {
        (r["window"]["start"].minute, r["lang"], r["n"])
        for r in df.groupBy(
            F.window("ts", "5 minutes").alias("window"), F.col("lang")
        )
        .agg(F.count("*").alias("n"))
        .select("window", F.col("lang"), "n")
        .collect()
    }
    assert got_counts == want_counts

    # baseline: uniform over l0..l3 (l3 is baseline-only vs window 0;
    # l4 is window-only vs the baseline)
    baseline = spark.createDataFrame(
        [(f"l{i}", 25) for i in range(4)], "bucket string, n long"
    )
    wc = df.groupBy(
        F.window("ts", "5 minutes").alias("window"), F.col("lang").alias("bucket")
    ).agg(F.count("*").alias("n"))
    got = {
        r["window"]["start"].minute: (r.n_buckets, r.tvd, r.l_inf)
        for r in drift.windowed_drift(wc, baseline).collect()
    }
    assert set(got) == {0, 5}
    # batch reference per window via drift_summary on raw rows
    base_rows = spark.createDataFrame(
        [(f"l{i}",) for i in range(4) for _ in range(25)], "lang string"
    )
    for minute, row_minute in ((0, 0), (5, 7)):  # rows sit at 0 and 7
        w_rows = df.filter(F.minute("ts") == row_minute).select("lang")
        ref = drift.drift_summary(
            w_rows, base_rows, F.col("lang")
        ).collect()[0]
        # windowed_drift's old side is the WINDOW, baseline is new —
        # TVD and L-inf are symmetric, n_buckets identical
        assert got[minute][1] == ref.tvd
        assert got[minute][2] == ref.l_inf
        assert got[minute][0] == ref.n_buckets


def test_window0_has_baseline_only_bucket(spark):
    # window 0 uses l0..l2 only; baseline has l3 -> 4 buckets, and
    # the l3 term contributes its full baseline share to TVD
    wc = spark.createDataFrame(
        [("w0", "l0", 10), ("w0", "l1", 10)],
        "window string, bucket string, n long",
    )
    baseline = spark.createDataFrame(
        [("l0", 10), ("l3", 10)], "bucket string, n long"
    )
    r = drift.windowed_drift(wc, baseline).collect()[0]
    assert r.n_buckets == 3
    # p_w = (.5, .5, 0), p_b = (.5, 0, .5) -> TVD = .5, L_inf = .5
    assert r.tvd == 0.5 and r.l_inf == 0.5
