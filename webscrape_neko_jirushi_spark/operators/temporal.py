"""Temporal joins Spark lacks as builtins (build-brief custom-operator
family: "as-of join, range join" re-expressed with existing DataFrame
ops).

``asof_join``: for every left row, attach the latest right row of the
same key with right_time <= left_time (backward as-of, exact matches
allowed) — the time-series enrichment join. No range-join explosion
and no per-key collect: both sides union into ONE stream sorted by
(key, time, side) and a ``last(ignorenulls)`` running window carries
the most recent right values forward into the left rows. One shuffle
on the key; within a partition the sort is the only extra cost, so at
100 TB this behaves like any other single-window op (skewed keys →
AQE or pre-salting, same as every windowed operator here).

Tie rule: right rows sort BEFORE left rows at the same timestamp, so a
right row exactly at left_time matches (DuckDB/pandas ``merge_asof``
backward semantics). Right-side duplicates at the same (key, time)
must be resolved by the caller (e.g. keep-max event id) — the window
would otherwise pick the last in sort order, which is not total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join; left rows with no prior right row keep
    NULLs (left-join semantics). Returns all left columns plus
    ``{prefix}{col}`` for each value col and ``{prefix}{right_time}``."""
    out_vals = [f"{prefix}{c}" for c in value_cols] + [f"{prefix}{right_time}"]
    # ONE struct payload per right row, filled by ONE last(ignorenulls)
    # window: the match is atomic — per-column fills would splice values
    # from DIFFERENT right rows whenever a value column is NULL. Rows
    # with NULL right_time can never match (t >= NULL is never true in
    # the reference ASOF semantics) and are dropped up front.
    payload = F.struct(
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
        F.col(right_time).alias(f"{prefix}{right_time}"),
    )
    r = right.filter(F.col(right_time).isNotNull()).select(
        F.col(on),
        F.col(right_time).alias("_asof_t"),
        F.lit(0).alias("_asof_side"),
        payload.alias("_asof_payload"),
    )
    left_cols = left.columns
    payload_type = r.schema["_asof_payload"].dataType
    l = left.select(  # noqa: E741
        on,
        F.col(left_time).alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(payload_type).alias("_asof_payload"),
        F.struct(*left_cols).alias("_asof_left"),
    )
    u = l.unionByName(
        r.withColumn(
            "_asof_left",
            F.lit(None).cast(
                l.select(F.col("_asof_left").alias("s")).schema["s"].dataType
            ),
        )
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_asof_t", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "_asof_side",
        "_asof_left",
        F.last("_asof_payload", ignorenulls=True).over(w).alias("_asof_payload"),
    )
    return filled.filter(F.col("_asof_side") == 1).select(
        *[F.col(f"_asof_left.{c}").alias(c) for c in left_cols],
        *[F.col(f"_asof_payload.{c}").alias(c) for c in out_vals],
    )


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 1 << 24,
    max_buckets_per_range: int = 4096,
) -> DataFrame:
    """Point-in-interval join (``lo <= point <= hi``, inclusive both
    ends) as an EQUI-join — the IP-to-ASN / value-to-band enrichment
    join. Naive Spark plans a non-equi theta join as
    BroadcastNestedLoopJoin (all pairs — a scale-killer even when one
    side fits in memory); here every range explodes into the
    fixed-width buckets it overlaps, every point maps to its ONE
    bucket, and the join is a plain shuffled equi-join on bucket plus
    a residual BETWEEN filter.

    Exactly-once guarantee (no distinct pass needed): a point lives in
    one bucket; a matching range covers that bucket and was exploded
    into it exactly once, so each (point, range) match appears once.

    Sizing rule: ``bucket_width`` ~ the median range width — explode
    factor stays O(1) per range while bucket occupancy stays bounded.
    A range wider than ``max_buckets_per_range * bucket_width`` raises
    (fail loudly: one continent-wide range silently exploding into
    10^6 rows is a pipeline bug, not a join input). Point skew (one
    hot bucket) is ordinary equi-join skew — AQE's skew-join handles
    it, same as every other join here.

    Preconditions: bounds and points are integers, NON-NEGATIVE (the
    ``div`` bucket id truncates toward zero, which equals floor only
    for nonnegatives), ``lo <= hi`` per range, and the two inputs
    share no column names. Returns points.* + ranges.* matched rows.

    For NON-overlapping sorted ranges an ``asof_join`` on ``lo``
    followed by a ``<= hi`` filter is the shuffle-equivalent
    alternative; this form exists because real range sets (ASN
    blocks, time windows, size bands) overlap.
    """
    if bucket_width <= 0:
        raise ValueError(f"range_join: bucket_width must be > 0, got {bucket_width}")
    overlap = set(points.columns) & set(ranges.columns)
    if overlap:
        raise ValueError(f"range_join: column collision {sorted(overlap)}")
    w = F.lit(int(bucket_width))
    n_b = (F.col(hi_col).cast("long") - F.col(lo_col).cast("long")) / w + 1
    guarded = ranges.withColumn(
        "_rj_nb",
        F.when(
            n_b > max_buckets_per_range,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"range_join: range wider than {max_buckets_per_range}"
                        f" buckets of {bucket_width} ("
                    ),
                    F.col(lo_col),
                    F.lit(".."),
                    F.col(hi_col),
                    F.lit("); raise bucket_width or split the range"),
                )
            ).cast("double"),
        ).otherwise(F.lit(0.0)),
    )
    exploded = guarded.select(
        *ranges.columns,
        F.explode(
            F.sequence(
                F.expr(f"{lo_col} div {int(bucket_width)}") + F.col("_rj_nb").cast("long"),
                F.expr(f"{hi_col} div {int(bucket_width)}"),
            )
        ).alias("_rj_bucket"),
    )
    keyed = points.withColumn(
        "_rj_bucket", F.expr(f"{point_col} div {int(bucket_width)}")
    )
    return (
        keyed.join(exploded, "_rj_bucket")
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_rj_bucket")
    )
