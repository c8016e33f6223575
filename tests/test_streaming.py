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
