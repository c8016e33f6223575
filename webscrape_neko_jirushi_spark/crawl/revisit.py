"""Recrawl scheduling: change-rate estimation from fetch history and
exact crawl-budget allocation — the feedback loop that decides WHICH
known URLs a crawler re-fetches, where the reference re-walks every
listing page each run (complete_pipeline.py re-runs the full scrape;
data_manager.py's backups are its only notion of "what changed").
First-class per the build brief's crawl tier, next to the discovery
frontier (``crawl/engine.py``) and authority ranking
(``operators/graph.pagerank``).

- ``change_stats``: per page, how often consecutive fetches observed a
  DIFFERENT content fingerprint — the empirical change rate the
  Cho & Garcia-Molina revisit policies start from. ONE window (lag of
  the fingerprint within page, ordered by fetch time with a unique
  tie-break) + ONE hash aggregate; windows partition by page id, so
  the sort is per-page and embarrassingly parallel at any page count.
- ``revisit_priority``: staleness-weighted priority ``age_hours *
  change_rate`` (unknown rates — single-fetch pages — take a prior of
  0.5: never crawled-again beats never-scheduled). Pure map-side.
- ``allocate_budget``: split an INTEGER fetch budget across pages
  (hosts) proportional to a weight, with largest-remainder rounding —
  allocations sum to EXACTLY the budget (floor shares + the leftover
  distributed by descending fractional part, deterministic id
  tie-break). Two windows over the page-level table (small — one row
  per page, not per fetch). The per-host budget feeds
  ``crawl/politeness``'s host-budget frontier key.

All arithmetic is IEEE double in the DuckDB twin's operation order
(weights/budgets are exact int64 until the one share division), so
driver-oracle comparison holds at 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_stats(
    fetch_log: DataFrame,
    id_col: str = "url",
    ts_col: str = "ts",
    fingerprint_col: str = "fingerprint",
    seq_col: str | None = None,
) -> DataFrame:
    """Per page: ``n_fetches``, ``n_changes`` (consecutive-fetch
    fingerprint flips), ``change_rate = n_changes / (n_fetches - 1)``
    (NULL for single-fetch pages — unknown, not zero), ``last_ts``.
    ``seq_col`` breaks fetch-time ties deterministically (pass the
    fetch/event id; same-timestamp rows otherwise make lag()
    partitioning-dependent)."""
    order = [F.col(ts_col).asc()] + (
        [F.col(seq_col).asc()] if seq_col else []
    )
    w = Window.partitionBy(id_col).orderBy(*order)
    prev = F.lag(F.col(fingerprint_col)).over(w)
    changed = F.when(
        prev.isNotNull() & (F.col(fingerprint_col) != prev), 1
    ).otherwise(0)
    return (
        fetch_log.select(
            F.col(id_col),
            F.col(ts_col),
            changed.alias("chg"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum("chg").alias("n_changes"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            id_col,
            "n_fetches",
            "n_changes",
            F.when(
                F.col("n_fetches") > 1,
                F.col("n_changes").cast("double")
                / (F.col("n_fetches") - F.lit(1)).cast("double"),
            ).alias("change_rate"),
            "last_ts",
        )
    )


def revisit_priority(
    stats: DataFrame,
    horizon_epoch: float,
    unknown_rate: float = 0.5,
) -> DataFrame:
    """Staleness-weighted revisit priority: ``age_hours *
    coalesce(change_rate, unknown_rate)`` where age is measured from
    ``horizon_epoch`` (seconds, pass a FIXED value — "now" is not
    reproducible). Map-side; timestamps become epoch seconds via
    ``unix_micros / 1e6`` (sub-second fraction kept; the NTZ→LTZ cast
    is identity under the session's pinned UTC), with the twin doing
    the literally identical ``epoch_us / 1000000`` double division."""
    age_h = (
        F.lit(float(horizon_epoch))
        - F.unix_micros(F.col("last_ts").cast("timestamp")).cast("double")
        / F.lit(1000000.0)
    ) / F.lit(3600.0)
    return stats.withColumn(
        "priority",
        age_h * F.coalesce(F.col("change_rate"), F.lit(float(unknown_rate))),
    )


def allocate_budget(
    pages: DataFrame,
    budget: int,
    weight_col: str = "weight",
    id_col: str = "url",
) -> DataFrame:
    """Largest-remainder apportionment of an integer ``budget``:
    ``alloc = floor(budget * w / W)`` plus one extra for the
    ``budget - sum(floor)`` largest fractional parts (ties by id
    ascending). Output adds ``alloc``; ``sum(alloc) == budget``
    exactly whenever ``budget <= sum of weights``' precision allows —
    i.e. always, because shares are computed once in double from
    int64 weights and floored identically on both engines.

    Zero/negative weights get 0 shares (and never a remainder seat);
    an ALL-zero weight table fails loudly at execution via an
    explicit in-plan ``raise_error`` — callers own at least one
    positive weight. (The guard is explicit because double division
    does NOT fail on its own: 0.0/0.0 is IEEE NaN, ANSI
    divide-by-zero applies only to integral/decimal division, and a
    NaN share would silently hand the first ``budget`` hosts one
    fetch each.)

    Scale note: the input is one row per HOST (the politeness/budget
    granularity), not per URL, and the two global windows sort that
    host table in one partition — fine to ~10^6-10^7 hosts; past
    that, swap the ``row_number`` for
    ``reorganize.global_sequence(..., buckets=...)`` ordered by
    (-_frac, id) (the bucketed two-phase ranking this repo already
    uses above the window auto-gate)."""
    if budget < 0:
        raise ValueError(f"allocate_budget: budget must be >= 0, got {budget}")
    wsum = Window.partitionBy()
    wpos = F.when(F.col(weight_col) > 0, F.col(weight_col)).otherwise(
        F.lit(0)
    )
    total = F.sum(wpos.cast("long")).over(wsum)
    zero_guard = F.when(
        total <= 0,
        F.raise_error(
            F.lit(
                "allocate_budget: every weight is zero/negative — "
                "callers own at least one positive weight"
            )
        ),
    )
    share = F.coalesce(
        zero_guard,
        F.lit(int(budget)).cast("double")
        * wpos.cast("double")
        / total.cast("double"),
    )
    base = F.floor(share)
    frac = share - base
    with_share = pages.select(
        "*",
        base.alias("_base"),
        frac.alias("_frac"),
        total.alias("_total"),
    )
    leftover = F.lit(int(budget)) - F.sum("_base").over(wsum)
    rn = F.row_number().over(
        wsum.orderBy(F.col("_frac").desc(), F.col(id_col).asc())
    )
    out = with_share.select(
        "*",
        F.when(
            (F.col("_frac") > 0) & (rn <= leftover), F.col("_base") + 1
        )
        .otherwise(F.col("_base"))
        .cast("long")
        .alias("alloc"),
    ).drop("_base", "_frac", "_total")
    return out


def change_stats_sql_ctes(
    fetch_log_sql: str,
    horizon_epoch: float,
    unknown_rate: float = 0.5,
) -> str:
    """DuckDB twin of ``change_stats`` + ``revisit_priority`` over a
    relation ``(url, seq, ts, fingerprint)`` — ends in CTE
    ``revisit(url, n_fetches, n_changes, change_rate, priority)``."""
    return f"""
    rv_chg AS (
      SELECT url, ts,
        CASE WHEN LAG(fingerprint) OVER (PARTITION BY url ORDER BY ts, seq)
                  IS NOT NULL
              AND fingerprint <> LAG(fingerprint)
                  OVER (PARTITION BY url ORDER BY ts, seq)
             THEN 1 ELSE 0 END AS chg
      FROM ({fetch_log_sql})
    ),
    rv_stats AS (
      SELECT url, COUNT(*) AS n_fetches,
             CAST(SUM(chg) AS BIGINT) AS n_changes,
             MAX(ts) AS last_ts
      FROM rv_chg GROUP BY url
    ),
    revisit AS (
      SELECT url, n_fetches, n_changes,
        CASE WHEN n_fetches > 1
             THEN CAST(n_changes AS DOUBLE)
                  / CAST(n_fetches - 1 AS DOUBLE)
        END AS change_rate,
        (CAST({horizon_epoch!r} AS DOUBLE)
         - CAST(epoch_us(last_ts) AS DOUBLE) / CAST(1000000 AS DOUBLE))
          / CAST(3600 AS DOUBLE)
          * COALESCE(
              CASE WHEN n_fetches > 1
                   THEN CAST(n_changes AS DOUBLE)
                        / CAST(n_fetches - 1 AS DOUBLE) END,
              CAST({unknown_rate!r} AS DOUBLE)) AS priority
      FROM rv_stats
    )"""


def allocate_budget_sql(
    pages_sql: str, budget: int, weight_col: str = "weight"
) -> str:
    """DuckDB twin of ``allocate_budget`` over a relation with
    ``(url, {weight_col})`` — a SELECT adding ``alloc``."""
    b = int(budget)
    return f"""
    SELECT * EXCLUDE (_w, _base, _frac, _rn, _left), CAST(
      CASE WHEN _frac > 0 AND _rn <= _left THEN _base + 1 ELSE _base END
      AS BIGINT) AS alloc
    FROM (
      SELECT *,
        ROW_NUMBER() OVER (ORDER BY _frac DESC, url ASC) AS _rn,
        CAST({b} AS BIGINT) - SUM(CAST(_base AS BIGINT)) OVER () AS _left
      FROM (
        SELECT *,
          FLOOR(CAST({b} AS DOUBLE) * CAST(_w AS DOUBLE)
                / CAST(SUM(_w) OVER () AS DOUBLE)) AS _base,
          CAST({b} AS DOUBLE) * CAST(_w AS DOUBLE)
                / CAST(SUM(_w) OVER () AS DOUBLE)
          - FLOOR(CAST({b} AS DOUBLE) * CAST(_w AS DOUBLE)
                / CAST(SUM(_w) OVER () AS DOUBLE)) AS _frac
        FROM (
          SELECT *,
            CAST(CASE WHEN {weight_col} > 0 THEN {weight_col} ELSE 0 END
                 AS BIGINT) AS _w
          FROM ({pages_sql})
        )
      )
    )"""
