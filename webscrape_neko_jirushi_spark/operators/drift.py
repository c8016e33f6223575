"""Distribution-drift report between two corpus snapshots
(SURVEY.md §2.11 X79).

`stats.corpus_diff` answers "WHICH rows changed"; this answers "did
the SHAPE of the corpus change" — the pre-training gate for a refresh
(did the crawl's language mix / length profile / source mix move
under the new filters?). Standard drift scores (PSI, KL) need ln(),
and libm transcendentals are NOT bit-identical across engines — so
the summary uses two metrics that reduce over INTEGERS and admit no
float-ordering ambiguity:

- **Total variation distance**: TVD = 1/2 * sum_b |p_b - q_b|
  = sum_b |n_old_b * N_new - n_new_b * N_old| / (2 * N_old * N_new).
  The numerator is a SUM OF INTEGERS (decimal(38,0) — the X7
  convergence-sum rule: int64 cross products overflow at
  web-scale counts), so the reduction is exact and order-free; ONE
  double division at the end. No sorted-fold needed, unlike the
  float-sum normalizers in `text/curation.py`.
- **L-infinity**: max_b |p_b - q_b| — max is order-free by nature,
  same integer form.

Per-bucket rows additionally carry a chi-square term
(p-q)^2/(p+q) — one division per ROW is engine-exact; only its
cross-bucket SUM would need ordering discipline, so the summary
deliberately omits it (sum the column yourself with a sorted fold if
you want the statistic).

Shape: ONE union-tag scan of both snapshots -> one groupBy(bucket)
with two conditional counts -> a broadcast 1-row totals join (the
X61 closed-form-normalizer pattern: never re-execute the subtree to
get totals). NULL buckets are a real bucket (absent lang IS drift).
Callers bin numerics themselves (e.g. ``F.floor(col / width)``) —
binning is policy, the report is mechanism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _counts(old: DataFrame, new: DataFrame, bucket: Column) -> DataFrame:
    tagged = old.select(
        bucket.alias("bucket"), F.lit(1).alias("_o"), F.lit(0).alias("_n")
    ).unionByName(
        new.select(
            bucket.alias("bucket"), F.lit(0).alias("_o"), F.lit(1).alias("_n")
        )
    )
    counts = tagged.groupBy("bucket").agg(
        F.sum("_o").alias("n_old"), F.sum("_n").alias("n_new")
    )
    totals = counts.agg(
        F.sum("n_old").alias("_no"), F.sum("n_new").alias("_nn")
    )
    return counts.join(F.broadcast(totals))


def category_drift(
    old: DataFrame, new: DataFrame, bucket: Column
) -> DataFrame:
    """Per-bucket drift rows: (bucket, n_old, n_new, p_old, p_new,
    chi2_term). Buckets absent from one side appear with a zero
    count; ``bucket`` is any Column (a category, or a binned numeric
    like ``F.floor(F.col('n_chars') / 200)``)."""
    c = _counts(old, new, bucket)
    p_old = F.col("n_old") / F.col("_no")
    p_new = F.col("n_new") / F.col("_nn")
    diff = p_old - p_new
    return c.select(
        "bucket",
        "n_old",
        "n_new",
        p_old.alias("p_old"),
        p_new.alias("p_new"),
        ((diff * diff) / (p_old + p_new)).alias("chi2_term"),
    )


def drift_summary(
    old: DataFrame, new: DataFrame, bucket: Column
) -> DataFrame:
    """One row: (n_buckets, tvd, l_inf). Integer-exact reductions
    (see module docstring) — safe to gate a pipeline on equality."""
    c = _counts(old, new, bucket)
    cross = F.abs(
        F.col("n_old").cast(_DEC) * F.col("_nn").cast(_DEC)
        - F.col("n_new").cast(_DEC) * F.col("_no").cast(_DEC)
    )
    agg = c.agg(
        F.count("*").alias("n_buckets"),
        F.sum(cross).alias("_s"),
        F.max(cross).alias("_m"),
        F.first("_no").alias("_no"),
        F.first("_nn").alias("_nn"),
    )
    denom = F.col("_no").cast("double") * F.col("_nn").cast("double")
    return agg.select(
        "n_buckets",
        (F.col("_s").cast("double") / (F.lit(2.0) * denom)).alias("tvd"),
        (F.col("_m").cast("double") / denom).alias("l_inf"),
    )


def windowed_bucket_counts(
    stream: DataFrame,
    ts_col: str,
    bucket: Column,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face, stage 1: per-tumbling-window bucket counts
    over an event-time stream — pure builtin streaming ops
    (watermark + window + count), so state is bounded at
    buckets-per-open-window and late data folds into the same
    additive count merge. Feed the materialized windows to
    :func:`windowed_drift` (the X53 windowed-HLL two-stage shape)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), bucket.alias("bucket"))
        .groupBy(F.window(ts_col, window).alias("window"), F.col("bucket"))
        .agg(F.count("*").alias("n"))
    )


def windowed_drift(
    window_counts: DataFrame, baseline: DataFrame
) -> DataFrame:
    """Stage 2 (batch, over the materialized stream output): one row
    per window — (window, n_buckets, tvd, l_inf) of that window's
    bucket distribution vs a pinned ``baseline`` of (bucket, n)
    rows. Buckets on either side only still participate (zero on the
    other). Same integer-exact decimal reductions as
    :func:`drift_summary`; the baseline is broadcast against the
    window grid (windows x baseline-buckets rows — monitoring-sized,
    never corpus-sized)."""
    wins = window_counts.select("window").distinct()
    wc = window_counts.select(
        "window", "bucket", F.col("n").alias("_w"), F.lit(0).alias("_b")
    )
    bl = wins.join(
        F.broadcast(
            baseline.select("bucket", F.col("n").alias("_b"))
        )
    ).select("window", "bucket", F.lit(0).alias("_w"), "_b")
    per = (
        wc.unionByName(bl)
        .groupBy("window", "bucket")
        .agg(F.sum("_w").alias("n_w"), F.sum("_b").alias("n_b"))
    )
    tot_w = per.groupBy("window").agg(F.sum("n_w").alias("_nw"))
    tot_b = baseline.agg(F.sum("n").alias("_nb"))
    j = per.join(tot_w, "window").join(F.broadcast(tot_b))
    cross = F.abs(
        F.col("n_w").cast(_DEC) * F.col("_nb").cast(_DEC)
        - F.col("n_b").cast(_DEC) * F.col("_nw").cast(_DEC)
    )
    agg = j.groupBy("window").agg(
        F.count("*").alias("n_buckets"),
        F.sum(cross).alias("_s"),
        F.max(cross).alias("_m"),
        F.first("_nw").alias("_nw"),
        F.first("_nb").alias("_nb"),
    )
    denom = F.col("_nw").cast("double") * F.col("_nb").cast("double")
    return agg.select(
        "window",
        "n_buckets",
        (F.col("_s").cast("double") / (F.lit(2.0) * denom)).alias("tvd"),
        (F.col("_m").cast("double") / denom).alias("l_inf"),
    )


def _counts_sql(old_expr: str, new_expr: str, bucket_expr: str) -> str:
    return f"""
      SELECT c.*, t._no, t._nn
      FROM (
        SELECT bucket,
               CAST(SUM(_o) AS BIGINT) AS n_old,
               CAST(SUM(_n) AS BIGINT) AS n_new
        FROM (
          SELECT {bucket_expr} AS bucket, 1 AS _o, 0 AS _n FROM {old_expr}
          UNION ALL
          SELECT {bucket_expr} AS bucket, 0 AS _o, 1 AS _n FROM {new_expr}
        ) u GROUP BY bucket
      ) c
      CROSS JOIN (
        SELECT CAST(COUNT(*) AS BIGINT) AS _no,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {new_expr}) AS _nn
        FROM {old_expr}
      ) t
    """


def category_drift_sql(
    old_expr: str, new_expr: str, bucket_expr: str
) -> str:
    """DuckDB twin of :func:`category_drift` (nests, no WITH)."""
    return f"""
      SELECT bucket, n_old, n_new,
             n_old * 1.0 / _no AS p_old,
             n_new * 1.0 / _nn AS p_new,
             ((n_old * 1.0 / _no) - (n_new * 1.0 / _nn))
               * ((n_old * 1.0 / _no) - (n_new * 1.0 / _nn))
               / ((n_old * 1.0 / _no) + (n_new * 1.0 / _nn)) AS chi2_term
      FROM ({_counts_sql(old_expr, new_expr, bucket_expr)}) c
    """


def drift_summary_sql(
    old_expr: str, new_expr: str, bucket_expr: str
) -> str:
    """DuckDB twin of :func:`drift_summary`."""
    cross = (
        "ABS(CAST(n_old AS DECIMAL(38,0)) * CAST(_nn AS DECIMAL(38,0))"
        " - CAST(n_new AS DECIMAL(38,0)) * CAST(_no AS DECIMAL(38,0)))"
    )
    return f"""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(SUM({cross}) AS DOUBLE)
               / (2.0 * (CAST(ANY_VALUE(_no) AS DOUBLE)
                         * CAST(ANY_VALUE(_nn) AS DOUBLE))) AS tvd,
             CAST(MAX({cross}) AS DOUBLE)
               / (CAST(ANY_VALUE(_no) AS DOUBLE)
                  * CAST(ANY_VALUE(_nn) AS DOUBLE)) AS l_inf
      FROM ({_counts_sql(old_expr, new_expr, bucket_expr)}) c
    """
