"""Snapshot-store utilities: listing (O4), retention (P21), export (S12)."""

from __future__ import annotations

from pyspark.sql import functions as F
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


def test_archive_snapshot_is_consistent_and_restorable(spark, tmp_path):
    """S12 zip backup: the archive carries exactly the current
    manifest's files; unzipping + reading yields the committed rows."""
    import json
    import zipfile

    from webscrape_neko_jirushi_spark.operators.stats import archive_snapshot

    store = SnapshotStore(tmp_path / "st", spark)
    df = spark.range(0, 100).select(F.col("id").cast("long").alias("id"))
    store.commit(1, replaces={"tbl": df}, write_partitions=2)
    out = archive_snapshot(store, str(tmp_path / "backup.zip"))

    dest = tmp_path / "restored"
    with zipfile.ZipFile(out) as z:
        z.extractall(dest)
        names = z.namelist()
    m = json.loads((dest / "manifest.json").read_text())
    assert m["version"] == 1 and list(m["tables"]) == ["tbl"]
    restored_dir = dest / "data" / m["tables"]["tbl"][0]
    got = {r["id"] for r in spark.read.parquet(str(restored_dir)).collect()}
    assert got == set(range(100))
    assert all(n == "manifest.json" or n.startswith("data/") for n in names)
