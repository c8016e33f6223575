"""Crawl-trap detection: per-host URL-pattern explosion, depth, and
duplicate-content signals — the guard that stops a frontier from
sinking its budget into calendars, session-id mazes, and mirror
farms. The reference walks a FIXED page list
(comprehensive_scraper.py's listing -> profile -> image cascade) so it
can't be trapped; a general frontier at 10^10-URL scale must detect
traps from the fetch log itself and this module is that feedback
signal, next to recrawl scheduling (``crawl/revisit.py``) and
authority ranking (``operators/graph.pagerank``).

Signals (all per host, the politeness/budget granularity):

- ``urls_per_template``: distinct URLs divided by distinct PATH
  TEMPLATES (digit runs collapsed to ``N``). Bounded listings
  (``/cat/37``) keep a small ratio; a calendar or session-id trap puts
  thousands of URLs under ONE template. The classic crawler-trap
  heuristic (Heydon & Najork's Mercator describes the manual
  blocklist this automates).
- ``max_depth``: path-segment count — runaway recursive links grow
  depth without bound.
- ``dup_content_ratio``: 1 - distinct fingerprints / fetches — mirror
  farms serve the same bytes under many URLs.

Execution shape: ONE map-side projection (host/template/depth are
regex + string ops in the Java-regex/RE2 common subset so the DuckDB
twin runs the same patterns verbatim) + ONE per-host aggregate. The
multi-count-distinct aggregate plans as Spark's Expand + two-phase
partial aggregation, so a hot host (exactly what a trap creates) is
combined map-side before the shuffle and the reduce side sees one row
per (host, distinct value) — no single-task pileup; AQE skew handling
covers the residual. ``flag_traps`` is pure map-side over the
host-level table (rows = hosts, tiny).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 common subset (no lookaround, no \z dependence on
# trailing-newline semantics — hosts/paths here never end in \n).
# Scheme letters are case-insensitive per RFC 3986 and real fetch
# logs contain 'HTTP://' rows — a lowercase-only anchor would pool
# every such URL into one phantom '' host that then flags as a
# template-explosion trap while the real hosts undercount.
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)"
_DIGITS_RE = "[0-9]+"


def host_of(url: Column) -> Column:
    """Host portion via regex (NOT parse_url: the twin needs the
    literally identical extraction)."""
    return F.regexp_extract(url, _HOST_RE, 1)


def path_of(url: Column) -> Column:
    """Path portion ('' for bare hosts — regexp_extract's no-match
    value on both engines)."""
    return F.regexp_extract(url, _PATH_RE, 1)


def path_template(path: Column) -> Column:
    """Digit runs collapsed to ``N``: ``/cal/2024/01/05`` and
    ``/cal/2025/12/31`` are the same crawl surface."""
    return F.regexp_replace(path, _DIGITS_RE, "N")


def path_depth(path: Column) -> Column:
    """Segment count = number of ``/`` in the path (int)."""
    return (
        F.length(path) - F.length(F.regexp_replace(path, "/", ""))
    ).cast("int")


def host_trap_stats(
    fetch_log: DataFrame,
    url_col: str = "url",
    fingerprint_col: str | None = None,
) -> DataFrame:
    """Per host: ``n_fetches``, ``n_urls`` (distinct), ``n_templates``
    (distinct digit-collapsed paths), ``urls_per_template``,
    ``max_depth``, and — when ``fingerprint_col`` is given —
    ``dup_content_ratio`` = 1 - distinct fingerprints / fetches.
    One projection + one hash aggregate; see the module docstring for
    why the count-distincts stay skew-safe."""
    u = F.col(url_col)
    path = path_of(u)
    rows = fetch_log.select(
        host_of(u).alias("host"),
        u.alias("_u"),
        path_template(path).alias("_tpl"),
        path_depth(path).alias("_depth"),
        *(
            [F.col(fingerprint_col).alias("_fp")]
            if fingerprint_col
            else []
        ),
    )
    aggs = [
        F.count("*").alias("n_fetches"),
        F.countDistinct("_u").alias("n_urls"),
        F.countDistinct("_tpl").alias("n_templates"),
        F.max("_depth").alias("max_depth"),
    ]
    if fingerprint_col:
        aggs.append(F.countDistinct("_fp").alias("_n_fp"))
    out = rows.groupBy("host").agg(*aggs)
    upt = F.col("n_urls").cast("double") / F.col("n_templates").cast(
        "double"
    )
    cols = [
        "host",
        "n_fetches",
        "n_urls",
        "n_templates",
        upt.alias("urls_per_template"),
        "max_depth",
    ]
    if fingerprint_col:
        cols.append(
            (
                F.lit(1.0)
                - F.col("_n_fp").cast("double")
                / F.col("n_fetches").cast("double")
            ).alias("dup_content_ratio")
        )
    return out.select(*cols)


def flag_traps(
    stats: DataFrame,
    max_urls_per_template: float = 300.0,
    max_depth: int = 8,
    max_dup_ratio: float = 0.9,
) -> DataFrame:
    """Adds ``trap_reason`` (first matching signal:
    ``template_explosion`` > ``depth`` > ``dup_content``, NULL when
    clean) and ``is_trap``. Map-side over the host-level table. The
    thresholds are floors a healthy site stays under: bounded listings
    keep urls_per_template near the listing size, hand-built sites
    rarely nest 8 deep, and <90% duplicate bytes tolerates re-fetch
    churn. Callers tune per corpus; the driver query pins literals so
    the oracle replays them."""
    has_dup = "dup_content_ratio" in stats.columns
    reason = F.when(
        F.col("urls_per_template") > F.lit(float(max_urls_per_template)),
        F.lit("template_explosion"),
    ).when(F.col("max_depth") > F.lit(int(max_depth)), F.lit("depth"))
    if has_dup:
        reason = reason.when(
            F.col("dup_content_ratio") > F.lit(float(max_dup_ratio)),
            F.lit("dup_content"),
        )
    return stats.select(
        "*",
        reason.alias("trap_reason"),
        reason.isNotNull().alias("is_trap"),
    )


def trap_sql_ctes(
    fetch_log_sql: str,
    fingerprint: bool = True,
    max_urls_per_template: float = 300.0,
    max_depth: int = 8,
    max_dup_ratio: float = 0.9,
) -> str:
    """DuckDB twin of ``host_trap_stats`` + ``flag_traps`` over a
    relation with ``(url[, fingerprint])`` — ends in CTE ``traps``."""
    fp_sel = (
        ", COUNT(DISTINCT fingerprint) AS _n_fp" if fingerprint else ""
    )
    dup_expr = (
        "1.0 - CAST(_n_fp AS DOUBLE) / CAST(n_fetches AS DOUBLE)"
        if fingerprint
        else "NULL"
    )
    dup_arm = (
        f"WHEN {dup_expr} > {float(max_dup_ratio)!r} THEN 'dup_content'"
        if fingerprint
        else ""
    )
    return f"""
    trap_rows AS (
      SELECT regexp_extract(url, '{_HOST_RE}', 1) AS host, url,
        regexp_replace(
          regexp_extract(url, '{_PATH_RE}', 1), '{_DIGITS_RE}', 'N', 'g'
        ) AS _tpl,
        CAST(LENGTH(regexp_extract(url, '{_PATH_RE}', 1))
             - LENGTH(REPLACE(regexp_extract(url, '{_PATH_RE}', 1),
                              '/', '')) AS INTEGER) AS _depth
        {", fingerprint" if fingerprint else ""}
      FROM ({fetch_log_sql})
    ),
    trap_stats AS (
      SELECT host, COUNT(*) AS n_fetches,
        COUNT(DISTINCT url) AS n_urls,
        COUNT(DISTINCT _tpl) AS n_templates,
        MAX(_depth) AS max_depth{fp_sel}
      FROM trap_rows GROUP BY host
    ),
    traps AS (
      SELECT host, n_fetches, n_urls, n_templates,
        CAST(n_urls AS DOUBLE) / CAST(n_templates AS DOUBLE)
          AS urls_per_template,
        max_depth,
        {f"{dup_expr} AS dup_content_ratio," if fingerprint else ""}
        CASE
          WHEN CAST(n_urls AS DOUBLE) / CAST(n_templates AS DOUBLE)
               > {float(max_urls_per_template)!r}
            THEN 'template_explosion'
          WHEN max_depth > {int(max_depth)} THEN 'depth'
          {dup_arm}
        END AS trap_reason,
        CASE
          WHEN CAST(n_urls AS DOUBLE) / CAST(n_templates AS DOUBLE)
               > {float(max_urls_per_template)!r}
            THEN 'template_explosion'
          WHEN max_depth > {int(max_depth)} THEN 'depth'
          {dup_arm}
        END IS NOT NULL AS is_trap
      FROM trap_stats
    )"""
