"""Declarative data-quality expectations (SURVEY.md §2.11 X63) —
the Deequ/Great-Expectations layer a 100-TB ingestion pipeline runs on
every batch before publishing it: completeness, uniqueness, bounds,
format-conformance and volume checks, ALL evaluated in ONE aggregate
pass over the table (Schelter et al., "Automating Large-Scale Data
Quality Verification", VLDB 2018 — the single-pass metric computation
is the paper's core trick, re-expressed as one Spark agg).

The reference validates by crashing mid-pipeline (data_manager.py's
ad-hoc size checks, cleanup scripts re-scanning per rule); here every
constraint contributes aggregate COLUMNS to a single ``agg`` — one
corpus scan regardless of suite size, partial-aggregated map-side,
no per-rule jobs.

Design for oracle parity: every metric is a ratio/extremum of exact
integer aggregates (or a decimal-exact mean), composed in ONE fixed
IEEE expression order, so the DuckDB twin reproduces metrics
bit-identically; ``passed`` is a plain comparison on the metric.

- :class:`Check` — (name, metric Column, passed Column) triple; the
  factories below build the standard suite members.
- :func:`check_suite` — ONE aggregate pass → one row per check:
  ``(check, metric, passed)``.
- :func:`suite_passed` — the gate scalar (AND of all rows).
- :func:`baseline_compare` — metric drift vs a stored baseline run
  (join on check name; |delta| > tol flags drift) — the "yesterday's
  batch looked like this" monitor; persist baselines through
  ``SnapshotStore`` (they are 1-row-per-check tables).

Scale: the agg is a global 1-row aggregate — partial per partition,
one tiny final reduce; ``uniqueness`` adds a count-distinct (the
two-phase Expand plan). At 100 TB this is the cheapest full-table
statement the pipeline runs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One suite member: ``metric`` and ``passed`` are expressions over
    the ONE aggregate row (they may only reference aggregate
    functions of input columns)."""

    name: str
    metric: Column
    passed: Column


def _ratio(num: Column, den: Column) -> Column:
    # the one fixed expression order every twin mirrors:
    # CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 0-guarded
    return F.when(
        den > 0, num.cast("double") / den.cast("double")
    ).otherwise(F.lit(1.0))


def completeness(col: str, min_ratio: float = 1.0) -> Check:
    """Fraction of non-null values >= min_ratio."""
    m = _ratio(F.count(F.col(col)), F.count(F.lit(1)))
    return Check(f"completeness({col})", m, m >= float(min_ratio))


def uniqueness(col: str, min_ratio: float = 1.0) -> Check:
    """Distinct/total >= min_ratio (1.0 = a primary key). NULLs count
    as rows but not as a distinct value — a null-riddled key column
    fails uniqueness rather than slipping past it."""
    m = _ratio(F.countDistinct(F.col(col)), F.count(F.lit(1)))
    return Check(f"uniqueness({col})", m, m >= float(min_ratio))


def min_value(col: str, lo: float) -> Check:
    m = F.min(F.col(col)).cast("double")
    return Check(f"min({col})", m, m >= float(lo))


def max_value(col: str, hi: float) -> Check:
    m = F.max(F.col(col)).cast("double")
    return Check(f"max({col})", m, m <= float(hi))


def mean_between(col: str, lo: float, hi: float) -> Check:
    """Mean via DECIMAL(28,4)-exact sum / exact count — aggregation-
    order-independent, so both engines produce the identical double.
    Zero values -> NULL metric (not the ratio checks' 1.0 default: a
    fabricated mean could spuriously pass the bounds) -> NULL passed,
    which :func:`suite_passed` counts as FAILED."""
    cnt = F.count(F.col(col))
    m = F.when(
        cnt > 0,
        F.sum(F.col(col).cast("decimal(28,4)")).cast("double")
        / cnt.cast("double"),
    )
    return Check(
        f"mean({col})", m, (m >= float(lo)) & (m <= float(hi))
    )


def match_rate(col: str, pattern: str, min_ratio: float = 1.0) -> Check:
    """Fraction of non-null values matching ``pattern`` (Java/RE2
    common-subset regexes only — the X43 portability contract)."""
    m = _ratio(
        F.sum(F.col(col).rlike(pattern).cast("long")),
        F.count(F.col(col)),
    )
    return Check(f"match_rate({col})", m, m >= float(min_ratio))


def row_count_between(lo: int, hi: int | None = None) -> Check:
    m = F.count(F.lit(1)).cast("double")
    ok = m >= float(lo)
    if hi is not None:
        ok = ok & (m <= float(hi))
    return Check("row_count", m, ok)


def check_suite(df: DataFrame, checks: list[Check]) -> DataFrame:
    """ONE aggregate pass; one output row per check:
    ``(check, metric double, passed boolean)`` in suite order."""
    if not checks:
        raise ValueError("check_suite: empty suite")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"check_suite: duplicate check names in {names}")
    agg = df.agg(
        *[c.metric.alias(f"_m{i}") for i, c in enumerate(checks)],
        *[c.passed.alias(f"_p{i}") for i, c in enumerate(checks)],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.col(f"_m{i}").alias("metric"),
                F.col(f"_p{i}").alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return agg.select(F.inline(rows))


def suite_passed(results: DataFrame) -> bool:
    """The publish gate: True iff every check passed. A NULL
    ``passed`` (a bounds check over an empty table or all-NULL column
    never evaluated) counts as FAILED — F.min would silently skip the
    NULL row and publish a batch whose checks never ran."""
    row = results.agg(
        F.coalesce(
            F.min(F.coalesce(F.col("passed"), F.lit(False)).cast("int")),
            F.lit(1),
        ).alias("ok")
    ).first()
    return bool(row["ok"])


def baseline_compare(
    current: DataFrame, baseline: DataFrame, tol: float = 0.05
) -> DataFrame:
    """Metric drift vs a stored baseline run: one row per check name
    present in EITHER run — ``(check, metric, base_metric, delta,
    drifted)``; a check missing from one side has NULL there and
    drifts by definition (suite changes are drift too)."""
    cur = current.select("check", F.col("metric").alias("metric"))
    base = baseline.select("check", F.col("metric").alias("base_metric"))
    j = cur.join(base, "check", "full_outer")
    delta = F.col("metric") - F.col("base_metric")
    return j.select(
        "check",
        "metric",
        "base_metric",
        delta.alias("delta"),
        F.when(
            F.col("metric").isNull() | F.col("base_metric").isNull(), F.lit(True)
        )
        .otherwise(F.abs(delta) > float(tol))
        .alias("drifted"),
    )


def embedding_quality_report(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """One-row vector-column health report (SURVEY X85): the checks
    the generic suite can't phrase because they quantify INSIDE the
    array — (n_vecs, n_null, n_wrong_dim, n_null_elem, n_nonfinite,
    n_zero, min_norm, max_norm). A NaN survives every aggregate it
    touches and a zero vector poisons cosine with a 0/0, so both must
    be counted BEFORE any similarity op runs; ``dim`` pins the
    expected width (mixed widths silently break zip_with dot
    products).

    A NULL ELEMENT inside a vector is its own defect bucket
    (n_null_elem): under three-valued logic it would otherwise make
    the nonfinite/valid predicates NULL, silently dropping the row
    from EVERY count and the norm scan — the one health-report
    failure mode worse than a wrong number is an invisible row (and
    DuckDB's list_filter drops NULL predicate hits, so the engines
    would also disagree).

    All reductions are order-free (counts, min/max); the only
    in-vector fold (the squared-norm sum) runs in array order on both
    engines, and the norms are rounded to 6 dp at the boundary (the
    cosine-query rule). NULL, wrong-dim, and null-element vectors are
    excluded from the norm scan rather than poisoning it."""
    v = F.col(vec_col)
    is_null = v.isNull()
    wrong_dim = (
        ~is_null & (F.size(v) != F.lit(int(dim)))
        if dim is not None
        else F.lit(False)
    )
    null_elem = ~is_null & ~wrong_dim & F.exists(v, lambda x: x.isNull())
    nonfinite = ~is_null & ~wrong_dim & ~null_elem & F.exists(
        v, lambda x: F.isnan(x.cast("double")) | (F.abs(x) == float("inf"))
    )
    sq = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    valid = ~is_null & ~wrong_dim & ~null_elem & ~nonfinite
    zero = valid & (sq == 0.0)
    norm = F.round(F.sqrt(sq), 6)
    return df.agg(
        F.count("*").alias("n_vecs"),
        F.sum(is_null.cast("long")).alias("n_null"),
        F.sum(wrong_dim.cast("long")).alias("n_wrong_dim"),
        F.sum(null_elem.cast("long")).alias("n_null_elem"),
        F.sum(nonfinite.cast("long")).alias("n_nonfinite"),
        F.sum(zero.cast("long")).alias("n_zero"),
        F.min(F.when(valid, norm)).alias("min_norm"),
        F.max(F.when(valid, norm)).alias("max_norm"),
    )


def embedding_quality_report_sql(
    table_expr: str,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> str:
    """DuckDB twin of :func:`embedding_quality_report`."""
    v = vec_col
    wrong = (
        f"({v} IS NOT NULL AND length({v}) <> {int(dim)})"
        if dim is not None
        else "FALSE"
    )
    hasnull = (
        f"({v} IS NOT NULL AND NOT {wrong} AND "
        f"length(list_filter({v}, x -> x IS NULL)) > 0)"
    )
    nonfin = (
        f"({v} IS NOT NULL AND NOT {wrong} AND NOT {hasnull} AND "
        f"length(list_filter({v}, "
        f"x -> isnan(CAST(x AS DOUBLE)) OR abs(x) = CAST('inf' AS DOUBLE))) > 0)"
    )
    sq = (
        f"list_aggregate(list_transform({v}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
    )
    valid = (
        f"({v} IS NOT NULL AND NOT {wrong} AND NOT {hasnull} "
        f"AND NOT {nonfin})"
    )
    return f"""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(SUM(CASE WHEN {v} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             CAST(SUM(CASE WHEN {wrong} THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_dim,
             CAST(SUM(CASE WHEN {hasnull} THEN 1 ELSE 0 END) AS BIGINT) AS n_null_elem,
             CAST(SUM(CASE WHEN {nonfin} THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
             CAST(SUM(CASE WHEN {valid} AND {sq} = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
             MIN(CASE WHEN {valid} THEN ROUND(SQRT({sq}), 6) END) AS min_norm,
             MAX(CASE WHEN {valid} THEN ROUND(SQRT({sq}), 6) END) AS max_norm
      FROM {table_expr}
    """
