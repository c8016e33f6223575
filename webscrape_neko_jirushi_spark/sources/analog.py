"""Deterministic analog tables derived from the driver's parquet.

The cleaning/reorg operators act on image-metadata rows (FIXTURES.md
§4); the driver's oracle harness only exposes the TPC-H-ish tables. So
both sides derive the SAME synthetic ``images`` rows from ``lineitem``
with pure integer arithmetic: ``images_analog`` (Spark DataFrame) and
``IMAGES_ANALOG_SQL`` (the equivalent DuckDB CTE) are kept in lockstep
— planting the reference's literal edge cases (suspicious sizes
advanced_cleaning.py:72, problematic sizes aggressive_cleaning.py:66,
RGBA transparency, logo filenames, cross-group duplicate md5 groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def images_analog(lineitem: DataFrame) -> DataFrame:
    """One image row per lineitem row; all attributes are pure functions
    of (l_orderkey, l_partkey, l_suppkey, l_linenumber)."""
    pk, sk = F.col("l_partkey"), F.col("l_suppkey")
    ln = F.col("l_linenumber").cast("long")
    return lineitem.select(
        F.concat(F.lit("cat_"), (F.col("l_orderkey") % 500).cast("string")).alias("doc_id"),
        # unique per row ((okey, lineno, pkey, skey) is unique): the
        # deterministic tie-break for window orders
        (
            ((F.col("l_orderkey") * 10 + ln) * 2000 + pk) * 100 + sk
        ).alias("src_key"),
        F.col("l_linenumber").cast("int").alias("image_idx"),
        F.concat(
            F.lit("https://mirror-main.test/img/"),
            pk.cast("string"),
            F.lit("_"),
            ln.cast("string"),
            F.lit(".jpg"),
        ).alias("url"),
        F.concat(
            F.lit("image_"),
            ln.cast("string"),
            F.when(pk % 7 == 0, "_logo.png")
            .when(pk % 11 == 0, "_banner.jpg")
            .otherwise(".jpg"),
        ).alias("filename"),
        F.lit("image/jpeg").alias("content_type"),
        F.when(pk % 13 == 0, F.lit(43).cast("long"))
        .when(pk % 17 == 0, F.lit(6490).cast("long"))
        .when(pk % 23 == 0, F.lit(5871).cast("long"))
        .otherwise(3000 + (pk * 37) % 30000000)
        .alias("size_bytes"),
        (50 + (pk * 7919) % 1500).cast("int").alias("width"),
        (50 + (sk * 104729) % 1500).cast("int").alias("height"),
        F.when(pk % 19 == 0, "RGBA").otherwise("RGB").alias("mode"),
        F.when(pk % 38 == 0, 30).otherwise(255).cast("int").alias("alpha_max"),
        (((pk * 31) % 100) / 100.0).alias("top_color_ratio"),
        (((sk * 17) % 100) / 100.0).alias("warm_ratio"),
        F.md5((pk % 800).cast("string").cast("binary")).alias("md5"),
    )


IMAGES_ANALOG_SQL = """
SELECT
  CONCAT('cat_', CAST(l_orderkey % 500 AS VARCHAR))            AS doc_id,
  ((l_orderkey * 10 + l_linenumber) * 2000 + l_partkey) * 100 + l_suppkey AS src_key,
  CAST(l_linenumber AS INTEGER)                                 AS image_idx,
  CONCAT('https://mirror-main.test/img/', CAST(l_partkey AS VARCHAR),
         '_', CAST(l_linenumber AS VARCHAR), '.jpg')            AS url,
  CONCAT('image_', CAST(l_linenumber AS VARCHAR),
         CASE WHEN l_partkey % 7 = 0 THEN '_logo.png'
              WHEN l_partkey % 11 = 0 THEN '_banner.jpg'
              ELSE '.jpg' END)                                  AS filename,
  'image/jpeg'                                                  AS content_type,
  CASE WHEN l_partkey % 13 = 0 THEN 43
       WHEN l_partkey % 17 = 0 THEN 6490
       WHEN l_partkey % 23 = 0 THEN 5871
       ELSE 3000 + (l_partkey * 37) % 30000000 END              AS size_bytes,
  CAST(50 + (l_partkey * 7919) % 1500 AS INTEGER)               AS width,
  CAST(50 + (l_suppkey * 104729) % 1500 AS INTEGER)             AS height,
  CASE WHEN l_partkey % 19 = 0 THEN 'RGBA' ELSE 'RGB' END       AS mode,
  CAST(CASE WHEN l_partkey % 38 = 0 THEN 30 ELSE 255 END AS INTEGER) AS alpha_max,
  ((l_partkey * 31) % 100) / 100.0                              AS top_color_ratio,
  ((l_suppkey * 17) % 100) / 100.0                              AS warm_ratio,
  md5(CAST(l_partkey % 800 AS VARCHAR))                         AS md5
FROM lineitem
"""


def cat_info_analog(customer: DataFrame) -> DataFrame:
    """Cat-info rows with planted NULL/blank name fields so the coalesce
    chain (reorganize_dataset.py:37-57) is exercised on every branch."""
    ck = F.col("c_custkey")
    return customer.select(
        ck.alias("cat_id"),
        F.when(ck % 3 == 0, F.col("c_name")).alias("name"),
        F.when(ck % 3 == 1, F.concat(F.lit("neko-"), ck.cast("string"))).alias("cat_name"),
        F.when(ck % 9 == 2, F.lit("  ")).alias("title"),
        F.when(ck % 6 == 5, F.concat(F.lit("copy "), F.col("c_mktsegment"))).alias("catch_copy"),
    )


CAT_INFO_ANALOG_SQL = """
SELECT
  c_custkey AS cat_id,
  CASE WHEN c_custkey % 3 = 0 THEN c_name END                       AS name,
  CASE WHEN c_custkey % 3 = 1 THEN CONCAT('neko-', CAST(c_custkey AS VARCHAR)) END AS cat_name,
  CASE WHEN c_custkey % 9 = 2 THEN '  ' END                         AS title,
  CASE WHEN c_custkey % 6 = 5 THEN CONCAT('copy ', c_mktsegment) END AS catch_copy
FROM customer
"""
