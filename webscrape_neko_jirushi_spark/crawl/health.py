"""Frontier health: starvation audit + skew fairness
(SURVEY.md §2.11 X89).

A politeness-bounded frontier can be healthy in aggregate and still
rotten per-host: a host with 10^6 queued URLs and a 100-fetch/epoch
budget will not drain for 10^4 epochs — every URL behind it is
effectively dead, and no global throughput number shows it. These are
the two reports a crawl operator actually pages on:

- :func:`frontier_health` — per-host queue depth, oldest queued age,
  epochs-to-drain at the politeness budget (exact ceil division), and
  a starvation flag. The age baseline is the frontier's OWN max
  timestamp (a broadcast 1-row join — the X61 closed-form-normalizer
  pattern), so the report is reproducible from the snapshot alone
  with no wall-clock in the plan.
- :func:`frontier_fairness` — ONE row quantifying pending-work skew
  across hosts: exact Gini coefficient over per-host depths. Gini is
  the direct input to the salting decision: ~0 means hash
  partitioning is fine, high means the hot hosts need salt shards
  (politeness.py) before they serialize an epoch.

Exactness discipline: ages are integer microsecond diffs
(``unix_micros`` / ``epoch_us`` — both engines exact BIGINTs, no
float seconds), floor-divided to seconds; Gini's rank sum uses the
invariance that tied depths contribute the same Σ rank·depth under
ANY tie order (swap two equal x's: i·x + j·x is unchanged), so the
bucketed two-phase ranking (``reorganize.global_sequence`` — no
single-partition window) and the twin's ROW_NUMBER agree without a
tie-break contract; the num/den pair is emitted as DECIMAL(38,0)
exact integers alongside the 6-dp convenience ratio.

Reference analog: the reference's crawl has one host and one queue
(comprehensive_scraper.py session loop) — per-host health is the
concept that only exists once the frontier is 10^10 URLs over 10^6+
hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.reorganize import global_sequence

_D38 = "decimal(38,0)"


def _depths(frontier: DataFrame, host_col: str) -> DataFrame:
    return (
        frontier.filter(F.col(host_col).isNotNull())
        .groupBy(F.col(host_col).alias("host"))
        .agg(F.count("*").alias("depth"))
    )


def frontier_health(
    frontier: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts",
    budget: int = 100,
    starve_epochs: int = 10,
) -> DataFrame:
    """(host, depth, oldest_age_sec, drain_epochs, starved): one row
    per host with a non-NULL name. ``budget`` is the per-epoch
    politeness fetch budget; ``drain_epochs = ceil(depth/budget)``;
    ``starved`` flags hosts whose queue outlives ``starve_epochs``."""
    if budget < 1:
        raise ValueError("frontier_health: budget must be >= 1")
    f = frontier.filter(F.col(host_col).isNotNull())
    # cast handles TIMESTAMP_NTZ sources (the session is pinned UTC,
    # and only DIFFS are emitted, so the epoch base cancels anyway)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_host = f.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("depth"),
        F.min(us).alias("_min_us"),
    )
    top = f.agg(F.max(us).alias("_max_us"))
    # `div` = exact integer division on longs (never a double detour —
    # a 10^10-deep queue must not round through float53)
    drain = F.expr(f"(depth + {budget - 1}) div {budget}")
    return (
        per_host.join(F.broadcast(top))
        .select(
            "host",
            "depth",
            F.expr("(_max_us - _min_us) div 1000000").alias("oldest_age_sec"),
            drain.alias("drain_epochs"),
        )
        .withColumn("starved", F.col("drain_epochs") > starve_epochs)
    )


def frontier_fairness(
    frontier: DataFrame, host_col: str = "host"
) -> DataFrame:
    """One row: (n_hosts, total_queued, max_depth, gini_num, gini_den,
    gini). Gini = (2·Σ rank·depth − (n+1)·Σdepth) / (n·Σdepth) over
    depths ranked ascending; num/den are exact DECIMAL(38,0), gini is
    their 6-dp double ratio. Empty frontier -> zero row with NULL
    gini (0/0 has no value, and a silent 0.0 would read as 'fair').

    The per-host depth table is localCheckpoint'ed before ranking:
    ``global_sequence`` runs two construction-time jobs (quantile
    sketch, bucket counts) and the caller's terminal agg is a third —
    without the checkpoint each would re-scan the FULL frontier, 3x
    the necessary I/O for a one-row report. Checkpointed, the
    frontier is scanned once and all three read the O(n_hosts)
    result."""
    depths = _depths(frontier, host_col).localCheckpoint(eager=False)
    ranked = global_sequence(depths, "depth", out_col="rk")
    s = F.sum(
        F.col("rk").cast(_D38) * F.col("depth").cast(_D38)
    ).alias("_s")
    agg = ranked.agg(
        F.count("*").alias("n_hosts"),
        F.coalesce(F.sum("depth"), F.lit(0)).cast("long").alias("total_queued"),
        F.coalesce(F.max("depth"), F.lit(0)).cast("long").alias("max_depth"),
        F.coalesce(s, F.lit(0).cast(_D38)).alias("_s"),
    )
    num = (
        F.lit(2).cast(_D38) * F.col("_s")
        - (F.col("n_hosts") + 1).cast(_D38) * F.col("total_queued").cast(_D38)
    )
    den = F.col("n_hosts").cast(_D38) * F.col("total_queued").cast(_D38)
    return agg.select(
        "n_hosts",
        "total_queued",
        "max_depth",
        num.cast(_D38).alias("gini_num"),
        den.cast(_D38).alias("gini_den"),
        F.when(
            den > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("gini"),
    )


def frontier_health_sql(
    from_sql: str,
    host_expr: str = "host",
    ts_expr: str = "ts",
    budget: int = 100,
    starve_epochs: int = 10,
) -> str:
    """DuckDB twin of :func:`frontier_health`."""
    return f"""
    WITH fh_src AS (
      SELECT {host_expr} AS host, epoch_us({ts_expr}) AS us
      FROM {from_sql} WHERE {host_expr} IS NOT NULL
    ),
    per_host AS (
      SELECT host, CAST(COUNT(*) AS BIGINT) AS depth,
             MIN(us) AS min_us
      FROM fh_src GROUP BY host
    ),
    top AS (SELECT MAX(us) AS max_us FROM fh_src)
    SELECT host, depth,
           CAST((max_us - min_us) // 1000000 AS BIGINT) AS oldest_age_sec,
           CAST((depth + {budget - 1}) // {budget} AS BIGINT) AS drain_epochs,
           (depth + {budget - 1}) // {budget} > {starve_epochs} AS starved
    FROM per_host, top
    """


def frontier_fairness_sql(from_sql: str, host_expr: str = "host") -> str:
    """DuckDB twin of :func:`frontier_fairness`."""
    return f"""
    WITH ff_d AS (
      SELECT {host_expr} AS host, CAST(COUNT(*) AS BIGINT) AS depth
      FROM {from_sql} WHERE {host_expr} IS NOT NULL
      GROUP BY host
    ),
    ff_rk AS (
      SELECT depth, ROW_NUMBER() OVER (ORDER BY depth) AS rk FROM ff_d
    ),
    ff_agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts,
             CAST(COALESCE(SUM(depth), 0) AS BIGINT) AS total_queued,
             CAST(COALESCE(MAX(depth), 0) AS BIGINT) AS max_depth,
             CAST(COALESCE(SUM(CAST(rk AS DECIMAL(38,0))
                               * CAST(depth AS DECIMAL(38,0))), 0)
                  AS DECIMAL(38,0)) AS s
      FROM ff_rk
    )
    SELECT n_hosts, total_queued, max_depth,
           CAST(2 * s - CAST(n_hosts + 1 AS DECIMAL(38,0))
                        * CAST(total_queued AS DECIMAL(38,0))
                AS DECIMAL(38,0)) AS gini_num,
           CAST(CAST(n_hosts AS DECIMAL(38,0))
                * CAST(total_queued AS DECIMAL(38,0))
                AS DECIMAL(38,0)) AS gini_den,
           CASE WHEN n_hosts * total_queued > 0 THEN
             ROUND(CAST(2 * s - CAST(n_hosts + 1 AS DECIMAL(38,0))
                                * CAST(total_queued AS DECIMAL(38,0))
                        AS DOUBLE)
                   / CAST(CAST(n_hosts AS DECIMAL(38,0))
                          * CAST(total_queued AS DECIMAL(38,0)) AS DOUBLE), 6)
           END AS gini
    FROM ff_agg
    """
