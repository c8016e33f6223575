"""Bucketed-table co-location: the amortized-shuffle contract.

The claim under test is physical, not logical: after write_bucketed,
an equi-join between co-bucketed tables and a groupBy on the bucket
key plan with NO Exchange (the plain-parquet twins of the same
queries DO exchange), and results are identical to the unbucketed
plans. register_bucketed must restore the exchange-free plans for an
existing directory after the catalog entry is gone (the fresh-session
case)."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import bucketing
from webscrape_neko_jirushi_spark.plans.inspect import physical_plan


@contextlib.contextmanager
def _no_auto_broadcast(spark):
    """Force a merge join so the Exchange assertion is about bucketing,
    not about the small test tables fitting a broadcast."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in old.items():
            # unset keys that had no explicit value: leaving -1 set
            # leaks "auto-broadcast off" into every later test in the
            # session (it flipped fuzzy_name_pairs' sketch-side join
            # to CartesianProduct in the full-suite sweep once)
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    labels = spark.range(0, 2000, 2).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("label")
    )
    bucketing.write_bucketed(docs, str(root / "docs"), "b_docs", ["doc_id"], 8)
    bucketing.write_bucketed(labels, str(root / "labels"), "b_labels", ["doc_id"], 8)
    # the honest unbucketed twin: plain parquet read from disk (a
    # range-derived frame lets Catalyst plan shuffle-free aggregates)
    docs.write.parquet(str(root / "docs_plain"))
    labels.write.parquet(str(root / "labels_plain"))
    spark_ = docs.sparkSession
    plain_docs = spark_.read.parquet(str(root / "docs_plain"))
    plain_labels = spark_.read.parquet(str(root / "labels_plain"))
    yield {"root": root, "docs": plain_docs, "labels": plain_labels}
    for t in ("b_docs", "b_labels"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_one_file_per_bucket(spark, bucketed_pair):
    files = [
        p
        for p in (bucketed_pair["root"] / "docs").iterdir()
        if p.name.endswith(".parquet")
    ]
    assert len(files) == 8


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    with _no_auto_broadcast(spark):
        joined = spark.table("b_docs").join(spark.table("b_labels"), "doc_id")
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # the unbucketed twin of the same join shuffles both sides
        plain = bucketed_pair["docs"].join(bucketed_pair["labels"], "doc_id")
        assert "Exchange" in physical_plan(plain)
        # and produces the same rows
        got = {tuple(r) for r in joined.collect()}
        want = {tuple(r) for r in plain.collect()}
        assert got == want


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    agg = spark.table("b_docs").groupBy("doc_id").agg(F.count("*").alias("n"))
    assert "Exchange" not in physical_plan(agg)
    plain = (
        bucketed_pair["docs"].groupBy("doc_id").agg(F.count("*").alias("n"))
    )
    assert "Exchange" in physical_plan(plain)


def test_mismatched_bucket_counts_still_correct(spark, bucketed_pair, tmp_path):
    """A 4-bucket table joined to the 8-bucket one: co-location is not
    assumed (Spark may or may not coalesce), but results must match."""
    other = bucketed_pair["labels"].withColumn("label", F.col("label") + 10)
    bucketing.write_bucketed(other, str(tmp_path / "l4"), "b_labels4", ["doc_id"], 4)
    try:
        with _no_auto_broadcast(spark):
            got = {
                tuple(r)
                for r in spark.table("b_docs")
                .join(spark.table("b_labels4"), "doc_id")
                .collect()
            }
            want = {
                tuple(r)
                for r in bucketed_pair["docs"].join(other, "doc_id").collect()
            }
            assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_labels4")


def test_register_bucketed_restores_colocation(spark, bucketed_pair):
    """Simulate a fresh session: the catalog entry is dropped (in-memory
    catalogs die with the session), the directory survives, and
    register_bucketed brings the exchange-free plan back."""
    spark.sql("DROP TABLE IF EXISTS b_docs")
    df = bucketing.register_bucketed(
        spark, "b_docs", str(bucketed_pair["root"] / "docs"), ["doc_id"], 8
    )
    agg = df.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert "Exchange" not in physical_plan(agg)
    assert df.count() == 2000
    with _no_auto_broadcast(spark):
        joined = df.join(spark.table("b_labels"), "doc_id")
        assert "Exchange" not in physical_plan(joined)
        assert joined.count() == 1000


def test_append_preserves_buckets(spark, bucketed_pair):
    extra = spark.range(2000, 2400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    bucketing.write_bucketed(
        extra, str(bucketed_pair["root"] / "docs"), "b_docs", ["doc_id"], 8,
        mode="append",
    )
    t = spark.table("b_docs")
    assert t.count() == 2400
    agg = t.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert "Exchange" not in physical_plan(agg)


def test_n_buckets_for_sizing():
    assert bucketing.n_buckets_for(1) == 4  # floor
    assert bucketing.n_buckets_for(4_000_000) == 4
    assert bucketing.n_buckets_for(400_000_000) == 100
    assert bucketing.n_buckets_for(100_000_000_000, rows_per_bucket=10_000_000) == 10_000
