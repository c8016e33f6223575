"""Filter cascades + cleaning statistics (SURVEY.md §2.2 P13-P20,
§2.4 A2-A9).

The reference's cleaners walk directories and delete files, counting
removals by reason (advanced_cleaning.py:128-204,
aggressive_cleaning.py:143-255, cleanup_dataset.py:159-230). Here each
cascade is a single ``withColumn`` when-chain producing
(keep: boolean, reason: string) — short-circuit first-match-wins order
preserved exactly, rejects kept as a side-output instead of deleted —
followed by plain hash aggregations for the report blocks.

Thresholds are the reference's literal constants; everything is
Catalyst-foldable Column logic (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import filename_class, suspicious_filename

# advanced_cleaning.py:51-72
ADV_MIN_FILE_SIZE = 5000
ADV_MAX_FILE_SIZE = 50 * 1024 * 1024
ADV_MIN_DIM = 100
ADV_MAX_DIM = 10000
ADV_MIN_ASPECT = 0.1
ADV_MAX_ASPECT = 10.0
ADV_SUSPICIOUS_SIZES = [
    43, 172, 281, 364, 883, 1300, 1500, 1900, 3400, 4000, 4058, 4500,
    5200, 5871, 6300, 6400, 6490, 6700, 6900, 7200,
]

# aggressive_cleaning.py:52-66
AGG_MIN_FILE_SIZE = 10000
AGG_MAX_FILE_SIZE = 20 * 1024 * 1024
AGG_MIN_DIM = 300
AGG_MAX_DIM = 8000
AGG_MIN_ASPECT = 0.3
AGG_MAX_ASPECT = 3.0
AGG_PROBLEMATIC_SIZES = [
    5276, 6490, 5871, 4058, 4560, 3480, 1964, 4634, 2713, 883, 1505,
    1320, 2326, 4356,
]


def advanced_cascade(images: DataFrame) -> DataFrame:
    """advanced_cleaning.py:128-149 order: file size -> filename pattern
    -> dimensions/aspect/transparency. Adds (keep, reason,
    reason_category)."""
    size = F.col("size_bytes")
    w, h = F.col("width"), F.col("height")
    aspect = w / h
    reason = (
        F.when(
            size.isin(ADV_SUSPICIOUS_SIZES) | (size < ADV_MIN_FILE_SIZE),
            F.concat(F.lit("File size suspicious: "), size),
        )
        .when(
            suspicious_filename(F.col("filename")),
            F.concat(F.lit("Filename suspicious: "), F.lower(F.col("filename"))),
        )
        .when(
            (w < ADV_MIN_DIM) | (h < ADV_MIN_DIM),
            F.concat(F.lit("Too small: "), w, F.lit("x"), h),
        )
        .when(
            (w > ADV_MAX_DIM) | (h > ADV_MAX_DIM),
            F.concat(F.lit("Too large: "), w, F.lit("x"), h),
        )
        .when(
            (aspect < ADV_MIN_ASPECT) | (aspect > ADV_MAX_ASPECT),
            F.concat(F.lit("Bad aspect ratio: "), F.round(aspect, 2)),
        )
        .when(
            F.col("mode").isin("RGBA", "LA") & (F.col("alpha_max") < 50),
            F.lit("Mostly transparent"),
        )
    )
    # the last category branch tests the remaining boolean conditions
    # directly instead of reason.isNotNull() — identical first-match
    # semantics (rows caught by the first two branches never reach it,
    # and the CASE skips NULL conditions either way), but consumers
    # that aggregate only (keep, reason_category) — removal_breakdown —
    # no longer drag the reason STRING construction into the plan (r6)
    category = (
        F.when(
            size.isin(ADV_SUSPICIOUS_SIZES) | (size < ADV_MIN_FILE_SIZE),
            "file_size",
        )
        .when(suspicious_filename(F.col("filename")), "pattern")
        .when(
            (w < ADV_MIN_DIM)
            | (h < ADV_MIN_DIM)
            | (w > ADV_MAX_DIM)
            | (h > ADV_MAX_DIM)
            | (aspect < ADV_MIN_ASPECT)
            | (aspect > ADV_MAX_ASPECT)
            | (F.col("mode").isin("RGBA", "LA") & (F.col("alpha_max") < 50)),
            "dimension",
        )
    )
    # keep as a standalone boolean (NOT reason.isNull()): identical
    # truth table — a CASE chain yields NULL iff no branch is TRUE, and
    # `~coalesce(any_cond, false)` is true in exactly that case — but
    # it lets Catalyst prune the reason/category STRING construction
    # (concat per row) out of consumers that only aggregate `keep`
    # (cleaning_stats), which `isnull(<string CASE>)` pins in the plan.
    removed = (
        size.isin(ADV_SUSPICIOUS_SIZES)
        | (size < ADV_MIN_FILE_SIZE)
        | suspicious_filename(F.col("filename"))
        | (w < ADV_MIN_DIM)
        | (h < ADV_MIN_DIM)
        | (w > ADV_MAX_DIM)
        | (h > ADV_MAX_DIM)
        | (aspect < ADV_MIN_ASPECT)
        | (aspect > ADV_MAX_ASPECT)
        | (F.col("mode").isin("RGBA", "LA") & (F.col("alpha_max") < 50))
    )
    return images.withColumn("reason", reason).withColumn(
        "reason_category", category
    ).withColumn("keep", ~F.coalesce(removed, F.lit(False)))


def aggressive_cascade(images: DataFrame) -> DataFrame:
    """aggressive_cleaning.py:143-168 order: min size -> max size ->
    problematic sizes -> content analysis (dims/aspect/transparency/
    uniform color)."""
    size = F.col("size_bytes")
    w, h = F.col("width"), F.col("height")
    aspect = w / h
    reason = (
        F.when(
            size < AGG_MIN_FILE_SIZE,
            F.concat(F.lit("File too small: "), size),
        )
        .when(
            size > AGG_MAX_FILE_SIZE,
            F.concat(F.lit("File too large: "), size),
        )
        .when(
            size.isin(AGG_PROBLEMATIC_SIZES),
            F.concat(F.lit("Known problematic size: "), size),
        )
        .when(
            (w < AGG_MIN_DIM) | (h < AGG_MIN_DIM),
            F.concat(F.lit("Too small: "), w, F.lit("x"), h),
        )
        .when(
            (w > AGG_MAX_DIM) | (h > AGG_MAX_DIM),
            F.concat(F.lit("Too large: "), w, F.lit("x"), h),
        )
        .when(
            (aspect < AGG_MIN_ASPECT) | (aspect > AGG_MAX_ASPECT),
            F.concat(F.lit("Bad aspect ratio: "), F.round(aspect, 2)),
        )
        .when(
            F.col("mode").isin("RGBA", "LA") & (F.col("alpha_max") < 50),
            F.lit("Mostly transparent"),
        )
        .when(F.col("top_color_ratio") > 0.8, F.lit("Too uniform (likely logo/icon)"))
    )
    # boolean last branch — see advanced_cascade's category note (r6)
    category = (
        F.when(
            (size < AGG_MIN_FILE_SIZE)
            | (size > AGG_MAX_FILE_SIZE)
            | size.isin(AGG_PROBLEMATIC_SIZES),
            "file_size",
        ).when(
            (w < AGG_MIN_DIM)
            | (h < AGG_MIN_DIM)
            | (w > AGG_MAX_DIM)
            | (h > AGG_MAX_DIM)
            | (aspect < AGG_MIN_ASPECT)
            | (aspect > AGG_MAX_ASPECT)
            | (F.col("mode").isin("RGBA", "LA") & (F.col("alpha_max") < 50))
            | (F.col("top_color_ratio") > 0.8),
            "content",
        )
    )
    # standalone boolean keep — see advanced_cascade for why
    removed = (
        (size < AGG_MIN_FILE_SIZE)
        | (size > AGG_MAX_FILE_SIZE)
        | size.isin(AGG_PROBLEMATIC_SIZES)
        | (w < AGG_MIN_DIM)
        | (h < AGG_MIN_DIM)
        | (w > AGG_MAX_DIM)
        | (h > AGG_MAX_DIM)
        | (aspect < AGG_MIN_ASPECT)
        | (aspect > AGG_MAX_ASPECT)
        | (F.col("mode").isin("RGBA", "LA") & (F.col("alpha_max") < 50))
        | (F.col("top_color_ratio") > 0.8)
    )
    return images.withColumn("reason", reason).withColumn(
        "reason_category", category
    ).withColumn("keep", ~F.coalesce(removed, F.lit(False)))


def heuristic_keep_score(images: DataFrame) -> DataFrame:
    """cleanup_dataset.py:75-190: filename 3-way class short-circuits;
    otherwise 0-4 indicator score; >=3 keep, <=1 remove, else keep."""
    w, h = F.col("width"), F.col("height")
    aspect = F.when(h > 0, w / h).otherwise(F.lit(0.0))
    i1 = (aspect >= 0.5) & (aspect <= 2.0)
    i2 = (w >= 100) & (h >= 100)
    i3 = (w <= 5000) & (h <= 5000)
    i4 = F.col("warm_ratio") > 0.1
    score = i1.cast("int") + i2.cast("int") + i3.cast("int") + i4.cast("int")
    fclass = filename_class(F.col("filename"))
    keep = (
        F.when(fclass == "block", F.lit(False))
        .when(fclass == "allow", F.lit(True))
        .when(score >= 3, F.lit(True))
        .when(score <= 1, F.lit(False))
        .otherwise(F.lit(True))  # borderline kept (cleanup_dataset.py:187-190)
    )
    return images.withColumn("cat_score", score).withColumn(
        "filename_class", fclass
    ).withColumn("keep", keep)


def yolo_filter(images: DataFrame, confidence: float = 0.3) -> DataFrame:
    """P22: keep images with >= 1 detection at/above the threshold
    (yolo_cat_detector.py:100-103,157-164) — higher-order ``exists``
    over the detections array; per-image confidence aggregates via
    builtin HOFs (A7)."""
    dets = F.filter(
        F.coalesce(F.col("detections"), F.array()),
        lambda d: d["confidence"] >= confidence,
    )
    total_conf = F.aggregate(
        dets, F.lit(0.0), lambda acc, d: acc + d["confidence"]
    )
    n = F.size(dets)
    return (
        images.withColumn("detection_count", n)
        .withColumn("total_confidence", F.round(total_conf, 6))
        .withColumn(
            "avg_confidence",
            F.round(F.when(n > 0, total_conf / n).otherwise(0.0), 6),
        )
        .withColumn("keep", n > 0)
    )


# ---------------------------------------------------------------------------
# report aggregations (A2, A3, A4, A5, A9)
# ---------------------------------------------------------------------------

def before_after_by_group(cascaded: DataFrame, group_col: str = "doc_id") -> DataFrame:
    """A2: per group images_before/after/removed (+ sorted reason list)."""
    return cascaded.groupBy(group_col).agg(
        F.count("*").alias("images_before"),
        F.sum(F.col("keep").cast("long")).alias("images_after"),
        F.sum((~F.col("keep")).cast("long")).alias("removed_count"),
        F.sort_array(
            F.collect_list(F.when(~F.col("keep"), F.col("reason")))
        ).alias("removed_reasons"),
    )


def removal_breakdown(cascaded: DataFrame) -> DataFrame:
    """A3: counts per reason category (removed rows only)."""
    return (
        cascaded.filter(~F.col("keep"))
        .groupBy("reason_category")
        .agg(F.count("*").alias("n_removed"))
    )


def size_distribution(images: DataFrame) -> DataFrame:
    """A4: file_size histogram."""
    return images.groupBy("size_bytes").agg(F.count("*").alias("n"))


def top_k_sizes(images: DataFrame, k: int = 10) -> DataFrame:
    """A5/O2: most frequent sizes, deterministic tie-break by size."""
    return (
        size_distribution(images)
        .orderBy(F.desc("n"), F.col("size_bytes"))
        .limit(k)
    )


def cleaning_stats(cascaded: DataFrame, group_col: str = "doc_id") -> DataFrame:
    """The statistics block (advanced_cleaning.py:37-48 counters):
    per-group rollup -> single global row, incl. cats_fully_removed (A9)."""
    per_group = before_after_by_group(cascaded, group_col)
    return per_group.agg(
        F.count("*").alias("total_groups"),
        F.sum("images_before").alias("total_images_before"),
        F.sum("images_after").alias("total_images_after"),
        F.sum("removed_count").alias("removed_images"),
        F.sum((F.col("removed_count") > 0).cast("long")).alias("groups_with_removals"),
        F.sum((F.col("images_after") == 0).cast("long")).alias("groups_fully_removed"),
    )
