"""Anchor-text aggregation: what the web SAYS a page is about — per
link target, inlink counts, distinct-source breadth, and the majority
anchor term. The classic ranking/description signal (anchor text
describes the TARGET better than the target's own text — Brin & Page
1998 §2.2) that a crawl corpus feeds to indexing and quality scoring;
the reference never aggregates across pages at all.

Execution shape: one map-side tokenize+explode of the anchor strings,
ONE (target, term) count aggregate, ONE per-target winner aggregate
(lexicographic ``min(struct(-count, term))`` — count desc, term asc,
the tie-break baked into the comparison so any engine reproduces it;
the same winner-inside-aggregate pattern as ``text/repetition``, no
window over the exploded table), one edge-level aggregate for
inlink/source counts, and a final dst-keyed join of two already
dst-partitioned aggregates. Popular targets are the canonical skew
key: every aggregate here is partial/final (hot dst combines
map-side), and AQE covers the residual join skew.

Tokenization lives in the Java-regex/RE2 common subset
(``[^a-z0-9]+`` on lowercased text) so the DuckDB twin runs the same
pattern verbatim; empty tokens are filtered on both sides because the
engines disagree on trailing-empty conventions otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT_RE = "[^a-z0-9]+"


def anchor_stats(
    edges: DataFrame,
    dst_col: str = "dst",
    src_col: str = "src",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per target: ``n_inlinks`` (edges), ``n_sources`` (distinct
    linking pages), ``top_term`` (most frequent anchor token, ties to
    the lexicographically smallest), ``top_count``. Targets whose
    anchors tokenize to nothing keep their link counts with NULL
    term columns (left join — parity with the twin)."""
    terms = edges.select(
        F.col(dst_col).alias("dst"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(anchor_col)), _TOKEN_SPLIT_RE),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    counts = terms.groupBy("dst", "term").agg(F.count("*").alias("cnt"))
    winners = (
        counts.groupBy("dst")
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("nc"), F.col("term"))
            ).alias("w")
        )
        .select(
            "dst",
            F.col("w.term").alias("top_term"),
            (-F.col("w.nc")).alias("top_count"),
        )
    )
    edge_stats = edges.groupBy(F.col(dst_col).alias("dst")).agg(
        F.count("*").alias("n_inlinks"),
        F.countDistinct(src_col).alias("n_sources"),
    )
    return edge_stats.join(winners, "dst", "left").select(
        "dst", "n_inlinks", "n_sources", "top_term", "top_count"
    )


def anchor_sql_ctes(edges_sql: str) -> str:
    """DuckDB twin of ``anchor_stats`` over a relation
    ``(src, dst, anchor)`` — ends in CTE ``anchors``."""
    return f"""
    anc_terms AS (
      SELECT dst, unnest(list_filter(
        regexp_split_to_array(lower(anchor), '{_TOKEN_SPLIT_RE}'),
        t -> t <> '')) AS term
      FROM ({edges_sql})
    ),
    anc_counts AS (
      SELECT dst, term, COUNT(*) AS cnt
      FROM anc_terms GROUP BY dst, term
    ),
    anc_win AS (
      SELECT dst, term AS top_term, cnt AS top_count FROM (
        SELECT dst, term, cnt,
          ROW_NUMBER() OVER (
            PARTITION BY dst ORDER BY cnt DESC, term ASC) AS rn
        FROM anc_counts
      ) WHERE rn = 1
    ),
    anc_edges AS (
      SELECT dst, COUNT(*) AS n_inlinks,
             COUNT(DISTINCT src) AS n_sources
      FROM ({edges_sql}) GROUP BY dst
    ),
    anchors AS (
      SELECT e.dst, e.n_inlinks, e.n_sources, w.top_term,
             CAST(w.top_count AS BIGINT) AS top_count
      FROM anc_edges e LEFT JOIN anc_win w ON e.dst = w.dst
    )"""
