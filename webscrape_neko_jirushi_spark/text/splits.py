"""Leakage-safe dataset splits: hash-assign by DUPLICATE GROUP, never
by document (SURVEY.md §2.11 X73).

The classic eval-contamination failure inside one corpus: doc A lands
in train, its near-duplicate B in validation, and the held-out metric
silently measures memorization. The fix every serious pretraining
pipeline applies is to split by the near-dup CLUSTER (the X7
connected-components labels, or any grouping key), so a whole
duplicate family moves as one unit:

- :func:`leakage_safe_split` — split key = the 60-bit portable hash
  of the group label (own id when ungrouped); the named fractions map
  to contiguous cumulative bands of the hash space, so assignment is
  a pure map-side CASE after ONE broadcastable left join to the
  (small) cluster-label table: no shuffle of the corpus, no RNG, no
  ``randomSplit`` (whose output depends on partitioning), and the
  same doc lands in the same split on every engine and every rerun.
  Integer band boundaries are precomputed driver-side and shared
  verbatim with the DuckDB twin.
- :func:`split_report` — the acceptance check as data: per-split doc
  and token tallies PLUS the leakage audit (count of groups spanning
  more than one split — structurally zero here, and the report
  proves it the same way for any external assignment).

Unlike the X20 stratified sample, bands are NOT nested across
fraction changes (boundaries shift with the cumulative sums);
re-splitting is a new experiment by design.

Cited reference behavior: the reference never splits (its dataset is
one training pool, cleanup_dataset.py keeps/removes only); first-class
per the build brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from .curation import HASH_SPACE

_SALT = "split:"


def split_bounds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper hash bound) per split, in dict order.
    The last bound is pinned to the full hash space so float rounding
    can never orphan a row. Fractions must sum to 1."""
    if not fractions:
        raise ValueError("fractions is empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {total}, expected 1.0")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("negative fraction")
    out, cum = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        out.append((name, int(cum * HASH_SPACE)))
    out.append((names[-1], HASH_SPACE))
    return out


def _band_case(h: Column, bounds: list[tuple[str, int]]) -> Column:
    expr = F.lit(bounds[-1][0])
    for name, ub in reversed(bounds[:-1]):
        expr = F.when(h < ub, F.lit(name)).otherwise(expr)
    return expr


def _band_case_sql(h: str, bounds: list[tuple[str, int]]) -> str:
    whens = " ".join(
        f"WHEN {h} < {ub} THEN '{name}'" for name, ub in bounds[:-1]
    )
    return f"CASE {whens} ELSE '{bounds[-1][0]}' END"


def leakage_safe_split(
    docs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    clusters: DataFrame | None = None,
    cluster_id_col: str = "cluster_id",
) -> DataFrame:
    """``docs`` + ``group_key`` + ``split``. ``clusters`` maps
    ``id_col -> cluster_id_col`` for grouped docs (near-dup labels,
    X7/X45); unlisted docs are their own group. The label table is a
    REDUCED table (one row per clustered doc, clusters are small
    families), so the join broadcasts under the threshold; assignment
    itself is map-side."""
    bounds = split_bounds(fractions)
    if clusters is not None:
        lab = clusters.select(
            F.col(id_col),
            F.col(cluster_id_col).cast("string").alias("_grp"),
        )
        d = docs.join(lab, id_col, "left")
    else:
        d = docs.withColumn("_grp", F.lit(None).cast("string"))
    key = F.coalesce(F.col("_grp"), F.col(id_col).cast("string"))
    h = portable_hash64(key, salt=_SALT)
    return d.withColumn("group_key", key).withColumn(
        "split", _band_case(h, bounds)
    ).drop("_grp")


def leakage_safe_split_sql(
    docs_expr: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    clusters_expr: str | None = None,
    cluster_id_col: str = "cluster_id",
    cols: str = "d.*",
) -> str:
    """DuckDB twin of :func:`leakage_safe_split` (no WITH — nests).
    ``docs_expr``/``clusters_expr`` are table names or parenthesized
    subqueries."""
    bounds = split_bounds(fractions)
    if clusters_expr is not None:
        join = (
            f"FROM {docs_expr} d LEFT JOIN "
            f"(SELECT {id_col}, CAST({cluster_id_col} AS VARCHAR) AS _grp "
            f"FROM {clusters_expr}) c USING ({id_col})"
        )
        key = f"COALESCE(c._grp, CAST(d.{id_col} AS VARCHAR))"
    else:
        join = f"FROM {docs_expr} d"
        key = f"CAST(d.{id_col} AS VARCHAR)"
    h = portable_hash64_sql(key, salt=_SALT)
    return f"""
      SELECT {cols}, {key} AS group_key,
             {_band_case_sql(h, bounds)} AS split
      {join}
    """


def split_report(
    assigned: DataFrame,
    token_col: str | None = None,
    group_col: str = "group_key",
) -> DataFrame:
    """Per-split tallies + the leakage audit. ``leaked_groups`` counts
    groups observed in MORE than one split — zero for any assignment
    produced by :func:`leakage_safe_split` (the hash is a function of
    the group), and the failure count for an external one. One
    aggregate per level; the group-level table is the reduced side of
    a broadcastable join back onto split names."""
    per_group = assigned.groupBy(group_col).agg(
        F.countDistinct("split").alias("_n_splits")
    )
    leaked = per_group.agg(
        F.coalesce(
            F.sum((F.col("_n_splits") > 1).cast("long")), F.lit(0)
        ).alias("leaked_groups")
    )
    tok = (
        F.sum(token_col).alias("n_tokens")
        if token_col
        else F.lit(None).cast("long").alias("n_tokens")
    )
    per_split = assigned.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(group_col).alias("n_groups"),
        tok,
    )
    return per_split.crossJoin(F.broadcast(leaked))


def split_report_sql(
    assigned_expr: str,
    token_col: str | None = None,
    group_col: str = "group_key",
) -> str:
    """DuckDB twin of :func:`split_report` (no WITH — nests)."""
    tok = (
        f"CAST(SUM({token_col}) AS BIGINT)" if token_col else "CAST(NULL AS BIGINT)"
    )
    return f"""
      SELECT s.split, s.n_docs, s.n_groups, s.n_tokens, l.leaked_groups
      FROM (
        SELECT split, COUNT(*) AS n_docs,
               COUNT(DISTINCT {group_col}) AS n_groups,
               {tok} AS n_tokens
        FROM {assigned_expr} GROUP BY split
      ) s CROSS JOIN (
        SELECT COALESCE(CAST(SUM(CASE WHEN _n_splits > 1 THEN 1 ELSE 0 END)
                        AS BIGINT), 0) AS leaked_groups
        FROM (
          SELECT {group_col}, COUNT(DISTINCT split) AS _n_splits
          FROM {assigned_expr} GROUP BY {group_col}
        ) g
      ) l
    """


def split_asset_leakage(
    assigned: DataFrame,
    assets: DataFrame,
    id_col: str = "doc_id",
    asset_col: str = "media_ref",
    train_split: str = "train",
) -> DataFrame:
    """(asset_col, n_train_docs, n_eval_docs): assets embedded in
    documents on BOTH sides of the train/eval boundary — the
    contamination a group-atomic TEXT split cannot see (the same
    photo re-hosted inside differently-worded pages lands its hosts
    in different text groups, and the IMAGE leaks into eval). Only
    leaking assets are returned (both counts > 0); an empty result is
    the audit passing.

    ``assigned`` is any (id_col, split) assignment (X73's output);
    ``assets`` is (id_col, asset_col) rows — media refs from
    interleaved spans, hosts, npm package names, whatever must not
    straddle the boundary. One equi-join on the doc id + one
    aggregate; distinct DOCS per side, not occurrences (the X80
    breadth rule)."""
    lab = assigned.select(id_col, "split")
    j = assets.select(id_col, asset_col).join(lab, id_col)
    per = j.groupBy(asset_col).agg(
        F.countDistinct(F.when(F.col("split") == train_split, F.col(id_col)))
        .alias("n_train_docs"),
        F.countDistinct(F.when(F.col("split") != train_split, F.col(id_col)))
        .alias("n_eval_docs"),
    )
    return per.filter(
        (F.col("n_train_docs") > 0) & (F.col("n_eval_docs") > 0)
    )


def split_asset_leakage_sql(
    assigned_expr: str,
    assets_expr: str,
    id_col: str = "doc_id",
    asset_col: str = "media_ref",
    train_split: str = "train",
) -> str:
    """DuckDB twin of :func:`split_asset_leakage` (nests, no WITH)."""
    return f"""
      SELECT {asset_col},
             CAST(COUNT(DISTINCT CASE WHEN split = '{train_split}'
                        THEN {id_col} END) AS BIGINT) AS n_train_docs,
             CAST(COUNT(DISTINCT CASE WHEN split <> '{train_split}'
                        THEN {id_col} END) AS BIGINT) AS n_eval_docs
      FROM (SELECT {id_col}, {asset_col} FROM {assets_expr} a) a
      JOIN (SELECT {id_col}, split FROM {assigned_expr} s) s USING ({id_col})
      GROUP BY {asset_col}
      HAVING COUNT(DISTINCT CASE WHEN split = '{train_split}'
               THEN {id_col} END) > 0
         AND COUNT(DISTINCT CASE WHEN split <> '{train_split}'
               THEN {id_col} END) > 0
    """
