"""HDR-histogram quantile sketch — bounded-memory, mergeable,
INTEGER-EXACT quantile estimation over non-negative int64 metrics
(latencies, sizes, counts). Completes the relational sketch family:
``operators/hll.py`` answers *how many distinct*, ``operators/cms.py``
*how often*, this *how large at rank q* — all three as plain
persistable rows that merge across days and twin exactly in DuckDB.

Why not ``percentile_approx``: Spark's KLL/GK aggregates live inside
opaque JVM state — un-persistable, un-mergeable across runs,
un-checkable elsewhere — and their estimates depend on merge ORDER.
This sketch is the High-Dynamic-Range histogram design (Tene's
HdrHistogram; the DDSketch bucket law with γ = 2^(1/2^sub_bits) in
Masson et al. 2019, VLDB): values bucket by (exponent, top
``sub_bits`` mantissa bits), so

- the bucket count is ≤ 2^sub_bits × 63 at ANY input cardinality
  (the 100 TB point: the sketch is a fixed-size table);
- counts per bucket are EXACT, so the rank is located exactly and the
  only error is within-bucket value collapse: estimates are
  one-sided (estimate ≤ truth) with relative error < 2^-sub_bits;
- merge = elementwise counter SUM — sketch-of-union ==
  union-of-sketches EXACTLY, independent of merge order;
- every step is pure INTEGER bit arithmetic (``length(bin(v))`` for
  bit-length — the ``hll.py`` trick; ``shiftright``/``shiftleft``
  for mantissa truncation), no log2 float edges anywhere, so the
  DuckDB twin matches cell-for-cell and the quantile answers match
  byte-for-byte.

Bucket law for ``v`` with ``s = sub_bits``: values below ``2^s`` are
their own bucket (``[v, v+1)`` — the exact branch, where relative
error would otherwise be unbounded); otherwise with ``e =
bit_length(v)`` and ``shift = e - 1 - s``, the bucket is ``[m <<
shift, (m+1) << shift)`` for ``m = v >> shift`` ∈ [2^s, 2^(s+1)).
Domain: ``0 ≤ v < 2^62`` — negatives and the top exponent raise
MID-PLAN (a silently mis-bucketed metric corrupts every later merge;
the ``morton_key`` rationale).

Quantile rule: nearest-rank-lower — for sorted values v_0..v_{n-1},
``quantile(q) = lo(bucket containing v_r)`` with ``r = floor(q *
(n-1))``; q literals cross engines as ``CAST('<repr>' AS DOUBLE)``
(the ``sql_vector_literal`` discipline) so the rank arithmetic is
bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_EXP = 62  # v < 2^62: keeps (m+1) << shift inside int64


def _dlit(x: float) -> str:
    """Bit-exact double literal for DuckDB (bare numeric literals
    parse as DECIMAL and double-round through DECIMAL→DOUBLE)."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def hdr_build(df: DataFrame, col: str, sub_bits: int = 8) -> DataFrame:
    """``(lo, hi, cnt)`` — one row per occupied bucket, ``hi``
    exclusive. One map-side projection + one bounded aggregate
    (≤ 2^sub_bits × 63 rows at any input size; hot buckets combine
    map-side)."""
    if not 1 <= sub_bits <= 16:
        raise ValueError(f"hdr_build: sub_bits={sub_bits} out of [1, 16]")
    sub = 1 << sub_bits
    v0 = F.col(col).cast("long")
    v = F.when(
        (v0 < 0) | (v0 >= (1 << MAX_EXP)) | v0.isNull(),
        F.raise_error(
            F.format_string(
                f"hdr_build: value %s outside [0, 2^{MAX_EXP}) for column "
                f"{col}",
                v0.cast("string"),
            )
        ).cast("long"),
    ).otherwise(v0)
    d1 = df.select(v.alias("_v"))
    d2 = d1.select(
        "_v", (F.length(F.bin("_v")) - 1 - F.lit(sub_bits)).alias("_sh")
    )
    lo = F.when(F.col("_v") < sub, F.col("_v")).otherwise(
        F.expr("shiftleft(shiftright(_v, _sh), _sh)")
    )
    width = F.when(F.col("_v") < sub, F.lit(1).cast("long")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), _sh)")
    )
    return (
        d2.select(lo.alias("lo"), (lo + width).alias("hi"))
        .groupBy("lo", "hi")
        .agg(F.count("*").alias("cnt"))
    )


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches built with the SAME sub_bits: elementwise
    counter SUM. Exact — merging is associative/commutative and
    ``hdr_build(A ∪ B) == hdr_merge(hdr_build(A), hdr_build(B))``
    cell-for-cell."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("lo", "hi").agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(sketch: DataFrame, qs: list[float]) -> DataFrame:
    """``(q, estimate)`` per requested quantile — nearest-rank-lower
    over the cumulative bucket counts: ``estimate = min lo with
    cum_cnt > floor(q * (n-1))``. Estimates are exact bucket lower
    bounds: ``estimate ≤ true v_r < estimate * (1 + 2^-sub_bits)``
    (and EXACT when v_r sits in the exact branch).

    The running-sum windows are single-partition BY DESIGN — the
    sketch is a ≤ 2^sub_bits × 63-row table regardless of corpus
    size, so "all data to one partition" is a few KB (same bounded
    shape ``cms_query`` broadcasts). Empty sketch → empty result."""
    if not qs:
        raise ValueError("hdr_quantiles: qs must be non-empty")
    if any(not 0.0 <= float(q) <= 1.0 for q in qs):
        raise ValueError(f"hdr_quantiles: quantiles outside [0, 1]: {qs}")
    w = Window.orderBy("lo").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "lo",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    expl = cum.select(
        "lo",
        "cum",
        "n",
        F.explode(
            F.array(*[F.lit(float(q)).cast("double") for q in qs])
        ).alias("q"),
    )
    rank = F.floor(F.col("q") * (F.col("n") - 1).cast("double")).cast("long")
    return (
        expl.filter(F.col("cum") > rank)
        .groupBy("q")
        .agg(F.min("lo").alias("estimate"))
    )


def hdr_build_sql(col_expr: str, sub_bits: int = 8) -> str:
    """DuckDB twin of ``hdr_build`` over table alias ``t`` — the same
    integer bucket law (``length(printf('%b', v))`` is the
    bit-length twin, ``>> <<`` the shifts)."""
    sub = 1 << sub_bits
    return f"""
    SELECT lo, lo + width AS hi, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT CASE WHEN _v < {sub} THEN _v
                  ELSE (_v >> _sh) << _sh END AS lo,
             CASE WHEN _v < {sub} THEN CAST(1 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) << _sh END AS width
      FROM (
        SELECT _v, length(printf('%b', _v)) - 1 - {sub_bits} AS _sh
        FROM (SELECT CAST({col_expr} AS BIGINT) AS _v FROM t) hb0
      ) hb1
    ) hb2
    GROUP BY lo, width"""


def hdr_quantiles_sql(sketch_sql: str, qs: list[float]) -> str:
    """DuckDB twin of ``hdr_quantiles`` over a ``(lo, hi, cnt)``
    relation — q literals string-cast for bit-exact rank arithmetic."""
    qlist = ", ".join(_dlit(q) for q in qs)
    return f"""
    SELECT q, MIN(lo) AS estimate
    FROM (
      SELECT c.lo, c.cum, c.n, u.q AS q
      FROM (
        SELECT lo,
               SUM(cnt) OVER (ORDER BY lo
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER () AS n
        FROM ({sketch_sql}) hq0
      ) c, UNNEST([{qlist}]) AS u(q)
    ) hq1
    WHERE cum > CAST(FLOOR(q * CAST(n - 1 AS DOUBLE)) AS BIGINT)
    GROUP BY q"""
