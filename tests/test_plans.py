"""Plan-quality gates (SURVEY.md §4): pushdown reaches the scan, small
dims broadcast, pure-Column cascades stay Python-free, codegen covers
the relational stages."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import cleaning
from webscrape_neko_jirushi_spark.plans import inspect as P
from webscrape_neko_jirushi_spark.sources.analog import images_analog

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    pushed = P.pushed_filters(q)
    assert any("l_quantity" in f for f in pushed), pushed


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity").groupBy("l_orderkey").count()
    schemas = P.read_schemas(q)
    assert schemas and all("l_extendedprice" not in s for s in schemas), schemas
    assert all("l_orderkey" in s for s in schemas)


def test_broadcast_join_for_small_dim(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    supplier = spark.read.parquet(f"{SF}/supplier.parquet")
    q = li.join(
        F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey
    ).join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
    assert P.has_broadcast_join(q)


def test_cleaning_cascade_is_python_free(spark):
    """The filter cascades are pure Column logic — the plan must contain
    ZERO Python eval nodes and at least one codegen stage."""
    imgs = images_analog(spark.read.parquet(f"{SF}/lineitem.parquet"))
    q = cleaning.cleaning_stats(cleaning.advanced_cascade(imgs), "doc_id")
    assert P.python_eval_count(q) == 0
    assert P.codegen_stage_count(q) >= 1


def test_agg_is_partial_final(spark):
    """Hash aggregation splits map-side partial + final (one shuffle)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = P.physical_plan(q)
    assert plan.count("HashAggregate") >= 2
    assert P.exchange_count(q) <= 2
