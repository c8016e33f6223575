"""Exact top-k heavy hitters via a Misra-Gries candidate pass
(SURVEY.md §2.11 X75).

The 100-TB-shaped alternative to ``GROUP BY key ORDER BY count DESC
LIMIT m``: a full group-by shuffles one row per DISTINCT key (billions
of URL hosts / user ids), when all anyone wanted was the top handful.
Misra-Gries (1982) summaries are mergeable (Agarwal et al., "Mergeable
Summaries", PODS 2012), so the plan is:

1. **Summary pass** — per partition, a ``k``-counter Misra-Gries
   summary built batch-wise over Arrow: each batch's exact
   ``value_counts`` (itself an MG summary with zero error) is merged
   into the running counters, then pruned back to ``k`` by
   subtracting the (k+1)-th largest counter value from all and
   dropping the non-positives (the classic merge-then-reduce; one
   vectorized pandas op per batch, no per-row Python). Emits <= k
   ``(key, est)`` rows per partition plus one accounting row carrying
   the partition's total decrement ``dec``.
2. **Merge** — ``groupBy(key).sum(est)`` over <= k x P summary rows
   (a shuffle of sketch rows, not data rows). Any key ABSENT from
   every partition summary has true count <= D = sum(dec): within a
   partition an absent key's count never exceeded that partition's
   total decrement, and the bound is additive across partitions.
3. **Exact verify** — broadcast the candidate keys back onto the raw
   table (map-side semi-join, partial agg) and count them exactly;
   take the top ``m`` by (count DESC, key ASC).
4. **Certification** — the result is PROVABLY the exact global top-m
   iff the m-th exact candidate count > D (every non-candidate is
   <= D). The check is embedded in the plan as a ``raise_error``
   guard, so an uncertifiable answer can never be silently returned;
   raise ``k`` (more counters -> smaller D) and rerun.

Memory is O(k + arrow-batch-distinct) per task regardless of key
cardinality; the only full-data pass is the two scans (summary +
verify), both map-side until the tiny sketch/candidate shuffles.
Reference analog: the per-extension / per-cat tallies the reference
computes by unbounded Counter dicts (`data_manager.py`,
`advanced_cleaning.py` "top sizes" report) — here the same answer is
exact with bounded state at any scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _mg_prune(counters: pd.Series, k: int) -> tuple[pd.Series, int]:
    """Prune an exact/merged counter Series down to <= k entries.
    Returns (pruned, decrement) where decrement is the value
    subtracted from every counter (0 when no prune was needed)."""
    if len(counters) <= k:
        return counters, 0
    # (k+1)-th largest value; subtracting it leaves <= k positives.
    t = int(counters.nlargest(k + 1).iloc[k])
    counters = counters - t
    return counters[counters > 0], t


def mg_partials(
    df: DataFrame, key_col: str, k: int = 4096
) -> DataFrame:
    """Per-partition Misra-Gries summaries: ``(key, est, dec)``.

    Real keys carry ``dec = 0``; one NULL-key accounting row per
    partition carries that partition's total decrement. ``est``
    under-counts by at most the partition's ``dec``; a key absent
    from the partition's rows has partition-count <= ``dec``.
    """
    if k < 1:
        raise ValueError(f"k={k} (>=1) required")
    key_field = df.schema[key_col]
    schema = StructType(
        [
            StructField("key", key_field.dataType, True),
            StructField("est", LongType(), False),
            StructField("dec", LongType(), False),
        ]
    )

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        dec_total = 0
        for pdf in batches:
            vc = pdf[key_col].dropna().value_counts()
            if vc.empty:
                continue
            counters = (
                vc
                if counters.empty
                else counters.add(vc, fill_value=0).astype("int64")
            )
            counters, dec = _mg_prune(counters, k)
            dec_total += dec
        out = pd.DataFrame(
            {
                "key": counters.index,
                "est": counters.to_numpy(dtype="int64"),
                "dec": 0,
            }
        )
        acct = pd.DataFrame({"key": [None], "est": [0], "dec": [dec_total]})
        yield pd.concat([out, acct], ignore_index=True)

    return df.select(key_col).mapInPandas(body, schema)


def heavy_hitters_exact(
    df: DataFrame, key_col: str, m: int = 10, k: int = 4096
) -> DataFrame:
    """Exact global top-``m`` keys by frequency, ``(key_col, cnt)``,
    ordered (cnt DESC, key ASC) — certified, or a loud plan-side
    error. NULL keys are excluded (they are the accounting rows'
    namespace, and a NULL "key" is not a key).

    Certification: with D = total decrement across all partition
    summaries, every non-candidate key has true count <= D, so the
    result is exactly the global top-m iff the m-th candidate count
    > D — and, when fewer than m candidates exist at all, iff D == 0
    (otherwise an unseen key could belong to the top-m). Both guards
    are part of the returned plan (``raise_error``), never a silent
    best-effort answer. ``k`` trades summary size for certifiable
    skew: larger k -> smaller D.
    """
    partials = mg_partials(df, key_col, k=k)
    cands = (
        partials.filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("est").alias("_est"))
        .select(F.col("key").alias(key_col))
    )
    bound = partials.agg(F.sum("dec").alias("_d"))
    exact = (
        df.filter(F.col(key_col).isNotNull())
        .join(F.broadcast(cands), key_col)
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(key_col))
        .limit(m)
    )
    # LEFT join FROM the always-1-row bound side: when every
    # partition summary pruned to empty (near-unique keys), `exact`
    # has ZERO rows and a guard living only on its rows could never
    # fire — the silent-empty answer is exactly what certification
    # exists to forbid. The placeholder row (NULL cnt) evaluates the
    # guard too: D > 0 with no candidates raises; D == 0 with no
    # candidates means the corpus had no non-null keys at all, and
    # the NULL row is filtered into a correct empty result.
    joined = bound.join(F.broadcast(exact), F.lit(True), "left")
    n_res = F.sum(F.col("cnt").isNotNull().cast("int")).over(
        Window.partitionBy(F.lit(1))
    )
    guard = F.when(
        (F.col("cnt") <= F.col("_d")) | ((n_res < m) & (F.col("_d") > 0)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"heavy_hitters_exact: top-{m} not certifiable "
                    f"(candidate count <= error bound D, or fewer "
                    f"than {m} candidates with D="
                ),
                F.col("_d").cast("string"),
                F.lit(f" > 0); raise k above {k} and rerun"),
            )
        ),
    )
    return (
        joined.select(
            key_col,
            F.coalesce(guard, F.col("cnt")).alias("cnt"),
        )
        .filter(F.col("cnt").isNotNull())
    )


def heavy_hitters_sql(
    table_expr: str, key_col: str, m: int = 10
) -> str:
    """DuckDB twin of :func:`heavy_hitters_exact` — the certified
    result IS the exact top-m, so the oracle is the plain group-by
    the sketch path avoids at scale (deterministic total tie-break)."""
    return f"""
      SELECT {key_col}, COUNT(*) AS cnt
      FROM {table_expr}
      WHERE {key_col} IS NOT NULL
      GROUP BY {key_col}
      ORDER BY cnt DESC, {key_col} ASC
      LIMIT {m}
    """
