"""Count-min sketch — frequency estimation in bounded memory,
relational and mergeable (Cormode & Muthukrishnan 2005). The exact
key histogram (``stats.key_histogram``) is key-cardinality-sized; at
100 TB with billions of distinct URLs/hosts that table is itself a
dataset. The CMS is ``d x w`` counters NO MATTER THE CARDINALITY,
merges across days by elementwise SUM (the register-max analog of
``hll_merge``), and answers point queries with a one-sided
guarantee: estimate >= true count always, and exceeds it by more
than ``2n/w`` with probability at most ``(1/2)^d`` (the standard
pairwise-independence bound's conservative form).

Same portability contract as ``operators/hll.py``: rows ``(row,
bucket, cnt)`` over the portable 60-bit hash (row ``r`` uses salt
``"cms<r>"``), so sketches persist next to snapshots and every step
has a DuckDB twin. Build = one map-side explode to ``d`` rows per
input + one ``d*w``-bounded aggregate (hot keys combine map-side —
the skewed key IS the common case this sketch serves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql


def cms_build(
    df: DataFrame, col: str, w: int = 1 << 14, d: int = 4
) -> DataFrame:
    """(row, bucket, cnt) counters — only occupied cells are present
    (absent cell == 0). ``w`` buckets x ``d`` hash rows. NULL keys
    are EXCLUDED on both engines (a NULL is not a key): Spark's hash
    NULL-propagates into a junk NULL bucket while DuckDB's CONCAT
    skips NULL args and hashes the bare salt into a REAL cell —
    unfiltered, the sketches diverge cell-for-cell and the DuckDB
    estimates inflate by count(NULLs) on colliding keys."""
    if w < 2 or d < 1:
        raise ValueError(f"cms_build: need w >= 2, d >= 1, got w={w} d={d}")
    df = df.filter(F.col(col).isNotNull())
    cell = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    (
                        portable_hash64(
                            F.col(col).cast("string"), salt=f"cms{r}"
                        )
                        % w
                    ).alias("bucket"),
                )
                for r in range(d)
            ]
        )
    )
    return (
        df.select(cell.alias("c"))
        .select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches (same w, d): elementwise counter SUM."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame, keys: DataFrame, col: str, w: int, d: int
) -> DataFrame:
    """Point-frequency estimates for a keys table: each key probes its
    ``d`` cells (equi-join on (row, bucket) — the sketch side is
    ``d*w``-bounded, so it BROADCASTS at any corpus size) and takes
    the min. Absent cells count 0. Estimate >= truth, always."""
    probes = keys.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        (
                            portable_hash64(
                                F.col(col).cast("string"), salt=f"cms{r}"
                            )
                            % w
                        ).alias("bucket"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("c"),
    ).select(col, "c.row", "c.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate"))
    )


def cms_build_sql(col_expr: str, w: int, d: int) -> str:
    """DuckDB twin of ``cms_build`` over table alias ``t``."""
    arms = " UNION ALL ".join(
        f"SELECT {r} AS row, "
        f"{portable_hash64_sql(f'CAST({col_expr} AS VARCHAR)', salt=f'cms{r}')}"
        f" % {w} AS bucket FROM t WHERE {col_expr} IS NOT NULL"
        for r in range(d)
    )
    return f"SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM ({arms}) GROUP BY 1, 2"
