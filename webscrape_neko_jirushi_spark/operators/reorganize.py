"""Rename/renumber projections + window operators (SURVEY.md §2.5 W1-W3,
§2.2 P5-P6, P10; reference: reorganize_dataset.py).

The reference copies files into ``cat_{counter:04d}_{name}/image_{i:03d}``
trees (reorganize_dataset.py:87,100-105). Relationally that's: a global
sequence over groups (W3), an ordinal per group (W2), and sanitize/
coalesce projections — no filesystem required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import coalesce_name, sanitize_filename


def ordinal_rename(
    images: DataFrame,
    group_col: str = "doc_id",
    order_col: str | list[str] = "image_idx",
) -> DataFrame:
    """W2/P10: image_{rn:03d}{ext} within each group, discovery order
    (reorganize_dataset.py:100-105)."""
    order_cols = [order_col] if isinstance(order_col, str) else order_col
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    ext = F.lower(F.regexp_extract("filename", r"(\.[A-Za-z0-9]+)$", 1))
    return images.withColumn(
        "new_name",
        F.format_string("image_%03d%s", F.row_number().over(w), ext),
    )


def renumber_groups(cats: DataFrame, cat_id_col: str = "cat_id") -> DataFrame:
    """W3/P5/P6: cat_{seq:04d}_{clean_name} with the global counter in
    sorted-id order (deterministic stand-in for dir-iteration order,
    reorganize_dataset.py:28,87). Single-partition window is acceptable:
    one row per group; at larger scale swap for zipWithIndex-style
    sequence assignment."""
    name = coalesce_name(
        F.col("name"),
        F.col("cat_name"),
        F.col("title"),
        F.col("catch_copy"),
        cat_id=F.col(cat_id_col),
    )
    w = Window.orderBy(F.col(cat_id_col))
    return cats.withColumn("resolved_name", name).withColumn(
        "clean_name", sanitize_filename(F.col("resolved_name"))
    ).withColumn(
        "new_dir",
        F.format_string(
            "cat_%04d_%s", F.row_number().over(w), F.col("clean_name")
        ),
    )


def resume_watermark(frontier_log: DataFrame, page_col: str = "page_now") -> DataFrame:
    """W5: start_page = max(last_page) + 1 (comprehensive_scraper.py:295)."""
    return frontier_log.agg((F.coalesce(F.max(page_col), F.lit(0)) + 1).alias("start_page"))
