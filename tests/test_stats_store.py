"""Snapshot-store utilities: listing (O4), retention (P21), export (S12)."""

from __future__ import annotations

from pyspark.sql import types as T

from webscrape_neko_jirushi_spark.crawl.snapshots import SnapshotStore
from webscrape_neko_jirushi_spark.operators.stats import (
    expire_snapshots,
    export_table,
    list_snapshots,
)

SCHEMA = T.StructType([T.StructField("x", T.LongType())])


def test_snapshot_listing_and_retention(spark, tmp_path):
    store = SnapshotStore(tmp_path / "s", spark)
    for epoch in range(1, 5):
        df = spark.range(epoch).withColumnRenamed("id", "x")
        store.commit(epoch, appends={"t": df})
    snaps = list_snapshots(store)
    assert [s["version"] for s in snaps] == [4, 3, 2, 1]  # newest first
    assert snaps[0]["tables"]["t"] == 4  # four appended dirs

    dropped = expire_snapshots(store, keep_last=2)
    assert dropped == 2
    assert [s["version"] for s in list_snapshots(store)] == [4, 3]
    # HEAD still reads the full table
    assert store.read("t", SCHEMA).count() == 1 + 2 + 3 + 4

    export_table(store, "t", SCHEMA, str(tmp_path / "export"))
    assert spark.read.parquet(str(tmp_path / "export")).count() == 10
