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
    ext = F.lower(F.regexp_extract("filename", r"(\.[A-Za-z0-9]+)\z", 1))
    return images.withColumn(
        "new_name",
        F.format_string("image_%03d%s", F.row_number().over(w), ext),
    )


def global_sequence(
    df: DataFrame, order_col: str, buckets: int = 32, out_col: str = "seq"
) -> DataFrame:
    """W3 scale path: 1-based global sequence in ``order_col`` order
    WITHOUT a single-partition window (the zipWithIndex pattern, kept
    in the DataFrame API). Three phases:

    1. approx-quantile range boundaries for ``order_col`` (one sketch
       job; boundaries become plan literals);
    2. per-bucket ``row_number`` windows — ``buckets`` parallel sorts
       instead of one global one;
    3. bucket counts -> cumulative offsets (<= ``buckets`` rows via the
       driver) broadcast-joined back: seq = offset + local row number.

    Deterministic for unique order keys (ties within a key are
    window-nondeterministic, exactly as with the single window).
    """
    probs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(df.approxQuantile(order_col, probs, 0.001)))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col(order_col) > F.lit(b)).cast("int")
    # NULL keys sort first under Window.orderBy (NULLS FIRST) — give
    # them their own lowest bucket instead of a NULL bucket (which
    # would crash the offset sort and vanish from the equi-join)
    bucket = F.when(F.col(order_col).isNull(), F.lit(-1)).otherwise(bucket)
    w_local = Window.partitionBy("_gs_bucket").orderBy(order_col)
    with_rn = df.withColumn("_gs_bucket", bucket).withColumn(
        "_gs_rn", F.row_number().over(w_local)
    )
    counts = sorted(
        with_rn.groupBy("_gs_bucket").count().collect(),
        key=lambda r: r["_gs_bucket"],
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_gs_bucket"], acc))
        acc += r["count"]
    off_df = df.sparkSession.createDataFrame(
        offsets, "_gs_bucket int, _gs_off long"
    )
    return (
        with_rn.join(F.broadcast(off_df), "_gs_bucket")
        .withColumn(out_col, F.col("_gs_off") + F.col("_gs_rn"))
        .drop("_gs_bucket", "_gs_rn", "_gs_off")
    )


def renumber_groups(
    cats: DataFrame,
    cat_id_col: str = "cat_id",
    buckets: int | None = None,
    auto_threshold: int = 2_000_000,
    n_rows: int | None = None,
) -> DataFrame:
    """W3/P5/P6: cat_{seq:04d}_{clean_name} with the global counter in
    sorted-id order (deterministic stand-in for dir-iteration order,
    reorganize_dataset.py:28,87). The scale path is AUTO-SELECTED:
    above ``auto_threshold`` rows (one cheap count job) the sequence
    comes from ``global_sequence``'s bucketed two-phase ranking — no
    single-partition window anywhere in the plan; below it, one small
    sorted partition is cheaper than the extra quantile/count jobs.
    The auto gate is a LIMIT-bounded probe (column-pruned, stops after
    threshold+1 rows), not a full count — still one extra job over the
    upstream plan, so callers whose input is an expensive DAG should
    pass ``buckets`` explicitly (0 forces the single window, >0 the
    bucketed path) or an ``n_rows`` row-count hint, which resolves the
    auto gate with zero construction-time jobs. Output is identical
    for unique ids either way (test-proven)."""
    name = coalesce_name(
        F.col("name"),
        F.col("cat_name"),
        F.col("title"),
        F.col("catch_copy"),
        cat_id=F.col(cat_id_col),
    )
    named = cats.withColumn("resolved_name", name).withColumn(
        "clean_name", sanitize_filename(F.col("resolved_name"))
    )
    if buckets is None:
        if n_rows is not None:
            over = n_rows > auto_threshold
        else:
            over = (
                cats.select(cat_id_col).limit(auto_threshold + 1).count()
                > auto_threshold
            )
        if over:
            buckets = 32
    if buckets:
        seqd = global_sequence(named, cat_id_col, buckets=buckets, out_col="_seq")
    else:
        w = Window.orderBy(F.col(cat_id_col))
        seqd = named.withColumn("_seq", F.row_number().over(w))
    return seqd.withColumn(
        "new_dir",
        F.format_string("cat_%04d_%s", F.col("_seq").cast("int"), F.col("clean_name")),
    ).drop("_seq")


def resume_watermark(frontier_log: DataFrame, page_col: str = "page_now") -> DataFrame:
    """W5: start_page = max(last_page) + 1 (comprehensive_scraper.py:295)."""
    return frontier_log.agg((F.coalesce(F.max(page_col), F.lit(0)) + 1).alias("start_page"))
