"""curation.deterministic_shuffle: reproducibility, seed sensitivity,
and the range-partitioned total order across output partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.text import curation


def _docs(spark, n=400):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.col("id").alias("payload"),
    )


def test_same_seed_same_permutation(spark):
    d = _docs(spark)
    a = [r["doc_id"] for r in curation.deterministic_shuffle(d, "s1").collect()]
    b = [r["doc_id"] for r in curation.deterministic_shuffle(d, "s1").collect()]
    assert a == b
    assert sorted(a) == sorted([r["doc_id"] for r in d.collect()])


def test_different_seed_different_permutation(spark):
    d = _docs(spark)
    a = [r["doc_id"] for r in curation.deterministic_shuffle(d, "s1").collect()]
    b = [r["doc_id"] for r in curation.deterministic_shuffle(d, "s2").collect()]
    assert a != b
    assert sorted(a) == sorted(b)


def test_range_partitions_give_total_order(spark):
    """Partition i's keys must all precede partition i+1's keys, and
    rows must be sorted within each partition — so a reader consuming
    partitions in index order sees one global sorted pass."""
    d = _docs(spark, 1000)
    shuffled = curation.deterministic_shuffle(d, "epoch-7", partitions=8)
    rows = shuffled.select(
        F.spark_partition_id().alias("pid"), "shuffle_key", "doc_id"
    ).collect()
    by_pid: dict[int, list] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append((r["shuffle_key"], r["doc_id"]))
    seen = []
    for pid in sorted(by_pid):
        part = by_pid[pid]
        assert part == sorted(part), f"partition {pid} not internally sorted"
        seen.extend(part)
    assert seen == sorted(seen), "partition ranges overlap"
    assert len(seen) == 1000
