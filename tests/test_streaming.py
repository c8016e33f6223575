"""Streaming faces: windowed fetch metrics + foreachBatch epoch driver."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from webscrape_neko_jirushi_spark.streaming.epochs import windowed_fetch_metrics

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("fetched_at", T.TimestampType()),
        T.StructField("host", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("url_hash", T.LongType()),
    ]
)


def test_windowed_fetch_metrics_streaming(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    rows = [
        ("2024-01-01 00:01:00", "a.test", 200, 1),
        ("2024-01-01 00:02:00", "a.test", 404, 2),
        ("2024-01-01 00:03:00", "b.test", 200, 3),
        ("2024-01-01 00:07:00", "a.test", 200, 4),
    ]
    df = spark.createDataFrame(rows, "ts string, host string, status_code int, url_hash long")
    df.select(
        F.col("ts").cast("timestamp").alias("fetched_at"), "host", "status_code", "url_hash"
    ).write.parquet(str(src / "batch0"))

    stream = (
        spark.readStream.schema(FETCH_SCHEMA).parquet(str(src / "*"))
    )
    agg = windowed_fetch_metrics(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("fetch_metrics")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql(
            "SELECT host, n_fetches, n_failures FROM fetch_metrics ORDER BY host, n_fetches"
        ).collect()
    finally:
        q.stop()
    got = {(r["host"], r["n_fetches"], r["n_failures"]) for r in out}
    # window [00:00,00:05): a.test 2 fetches 1 failure, b.test 1/0
    # window [00:05,00:10): a.test 1/0
    assert (("a.test", 2, 1)) in got
    assert (("b.test", 1, 0)) in got
    assert (("a.test", 1, 0)) in got


HEALTH_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("epoch", T.IntegerType()),
        T.StructField("seq_in_host", T.IntegerType()),
    ]
)


def test_host_health_tracker_stateful(spark, tmp_path):
    """applyInPandasWithState: per-host counters persist ACROSS
    micro-batches; 3 consecutive failures flips throttled."""
    from webscrape_neko_jirushi_spark.streaming.epochs import host_health_tracker

    src = tmp_path / "health_src"
    src.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(rows, HEALTH_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )

    # batch 0: a.test 2 ok then 1 fail; b.test 1 ok
    write_batch(
        "b0",
        [("a.test", 200, 1, 1), ("a.test", 200, 1, 2), ("a.test", 500, 1, 3),
         ("b.test", 200, 1, 1)],
    )
    stream = spark.readStream.schema(HEALTH_SCHEMA).parquet(str(src / "*"))
    q = (
        host_health_tracker(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("host_health")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["host"]: (r["n_fetches"], r["n_failures"], r["consec_failures"], r["throttled"])
            for r in spark.sql("SELECT * FROM host_health").collect()
        }
        assert got["a.test"] == (3, 1, 1, False)
        assert got["b.test"] == (1, 0, 0, False)
        # batch 1: two more consecutive failures for a.test -> throttled
        write_batch("b1", [("a.test", 404, 2, 1), ("a.test", 404, 2, 2)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM host_health WHERE host = 'a.test'"
        ).collect()
        latest = max(rows, key=lambda r: r["n_fetches"])
        # state carried across batches: 5 total, 3 failures, 3 consecutive
        assert (
            latest["n_fetches"], latest["n_failures"],
            latest["consec_failures"], latest["throttled"],
        ) == (5, 3, 3, True)
    finally:
        q.stop()
