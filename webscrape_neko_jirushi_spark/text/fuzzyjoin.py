"""Bounded edit-distance fuzzy join (SURVEY.md §2.11 X66) — the
string-similarity member the dedup family is missing: shingle/minhash
(X2-X4) measures SET overlap and misses single-character typos in
short strings (two 12-char titles at edit distance 1 share few
5-shingles), while edit distance is THE metric for names, titles,
product codes and URLs-with-typos. The naive form is an O(n^2)
all-pairs Levenshtein — this module is the equi-join form (the
PassJoin idea, Li et al. 2011, reduced to its sound core):

**Pigeonhole blocking.** Split every string into ``d+1`` contiguous
segments. If ``ed(a, b) <= d``, then at least one segment of ``a``
appears in ``b`` EXACTLY, at a position shifted by at most ``d``
(each edit shifts downstream positions by <= 1). So:

- index side: each string emits its ``d+1`` segments keyed by
  ``(segment idx, string length, segment text)``;
- probe side: each string emits, for every candidate source length
  ``l`` in ``len±d``, every segment slot ``i``, and every shift in
  ``[-d, +d]``, the substring it would have to contain — a CONSTANT
  ``(d+1)(2d+1)^2`` rows per string (45 at d=2, 18 at d=1), all
  map-side;
- ONE equi-join on the key produces the candidate pairs; exact
  ``levenshtein(a, b) <= d`` verifies (built-in JVM-side; DuckDB's
  ``levenshtein`` agrees — cross-engine fuzz-tested).

Complete (never misses a true pair — planted-typo recall is pytest-
pinned) and sound after verify. Scale: candidates are equi-join-
bucketed by segment text — hot segments (common prefixes) behave
like hot LSH bands; the segment INDEX i and length l in the key keep
buckets from collapsing to "every string sharing one word". The
candidate multiplier is a compile-time constant in ``d`` (use d<=2;
the pigeonhole filter's selectivity collapses beyond that, the same
regime boundary every PassJoin implementation documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_bounds(i: F.Column, l: F.Column, d: int):
    """Start (0-based) and length of segment ``i`` of ``d+1`` even
    segments over a length-``l`` string: the first ``l % (d+1)``
    segments get the extra char — pure integer Column arithmetic,
    mirrored literally by the SQL twin."""
    k = F.lit(d + 1)
    base = (l / k).cast("long")
    rem = l % k
    start = i * base + F.least(i, rem)
    seglen = base + F.when(i < rem, F.lit(1)).otherwise(F.lit(0))
    return start, seglen


def _segments(df: DataFrame, id_col: str, text_col: str, d: int) -> DataFrame:
    s = F.col(text_col)
    l = F.length(s).cast("long")
    e = df.select(
        F.col(id_col).alias("_id"),
        s.alias("_s"),
        l.alias("_l"),
        F.explode(F.sequence(F.lit(0), F.lit(d))).alias("_i"),
    )
    start, seglen = _seg_bounds(F.col("_i"), F.col("_l"), d)
    return e.filter(seglen > 0).select(
        "_id",
        "_s",
        "_i",
        "_l",
        F.substring(F.col("_s"), (start + 1).cast("int"), seglen.cast("int")).alias(
            "_seg"
        ),
    )


def _probe_candidates(df: DataFrame, id_col: str, text_col: str, d: int) -> DataFrame:
    s = F.col(text_col)
    lb = F.length(s).cast("long")
    e = (
        df.select(
            F.col(id_col).alias("_pid"),
            s.alias("_ps"),
            lb.alias("_lb"),
            F.explode(
                F.sequence(F.greatest(F.lit(1), lb - d), lb + d)
            ).alias("_l"),
        )
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(d))).alias("_i"),
        )
        .select(
            "*",
            F.explode(F.sequence(F.lit(-d), F.lit(d))).alias("_shift"),
        )
    )
    start, seglen = _seg_bounds(F.col("_i"), F.col("_l"), d)
    pos = start + F.col("_shift")
    valid = (pos >= 0) & (pos + seglen <= F.col("_lb")) & (seglen > 0)
    return (
        e.filter(valid)
        .select(
            "_pid",
            "_ps",
            "_i",
            "_l",
            F.substring(
                F.col("_ps"), (pos + 1).cast("int"), seglen.cast("int")
            ).alias("_seg"),
        )
        .dropDuplicates(["_pid", "_i", "_l", "_seg"])
    )


def fuzzy_self_pairs(
    df: DataFrame, id_col: str, text_col: str, max_dist: int
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein <= max_dist`` —
    candidate generation by pigeonhole-segment equi-join, exact
    verify. Returns (id_a, id_b, dist). NULL texts drop (no distance
    is defined); ``max_dist`` in [1, 2] (see module docstring)."""
    if not 1 <= max_dist <= 2:
        raise ValueError(
            f"fuzzy_self_pairs: max_dist must be 1 or 2, got {max_dist}"
        )
    d = max_dist
    base = df.filter(F.col(text_col).isNotNull())
    seg = _segments(base, id_col, text_col, d)
    probe = _probe_candidates(base, id_col, text_col, d)
    # bidirectional: the pigeonhole guarantee needs len >= d+1 on the
    # SEGMENT side, so either string of a pair may have to play it —
    # match both directions, canonicalize to (least id, greatest id)
    lo = F.col("_id") < F.col("_pid")
    cand = (
        seg.join(probe, on=["_i", "_l", "_seg"])
        .filter(F.col("_id") != F.col("_pid"))
        .select(
            F.least("_id", "_pid").alias("id_a"),
            F.greatest("_id", "_pid").alias("id_b"),
            F.when(lo, F.col("_s")).otherwise(F.col("_ps")).alias("sa"),
            F.when(lo, F.col("_ps")).otherwise(F.col("_s")).alias("sb"),
        )
    )
    # strings of length <= d are within d of EACH OTHER by definition
    # (ed <= max(len)) and too short to provide d+1 non-empty segments
    # — pair the tiny class directly (constant-keyed equi-join: the
    # class is chars<=2 strings, negligible and bounded by contract)
    tiny = base.filter(F.length(F.col(text_col)) <= d).select(
        F.col(id_col).alias("_tid"),
        F.col(text_col).alias("_ts"),
        F.lit(0).alias("_k"),
    )
    t2 = tiny.select(
        F.col("_tid").alias("_tid2"), F.col("_ts").alias("_ts2"), "_k"
    )
    # pin the broadcast: the constant `_k` folds away, turning this
    # into a cross join — hinted it plans as BNLJ over the bounded
    # tiny class even when auto-broadcast is disabled session-wide
    # (unhinted it degraded to CartesianProduct under that conf)
    tiny_pairs = (
        tiny.join(F.broadcast(t2), "_k")
        .filter(F.col("_tid") < F.col("_tid2"))
        .select(
            F.col("_tid").alias("id_a"),
            F.col("_tid2").alias("id_b"),
            F.col("_ts").alias("sa"),
            F.col("_ts2").alias("sb"),
        )
    )
    cand = cand.unionByName(tiny_pairs).dropDuplicates(["id_a", "id_b"])
    dist = F.levenshtein(F.col("sa"), F.col("sb"))
    return cand.filter(dist <= d).select(
        "id_a", "id_b", dist.cast("int").alias("dist")
    )


def fuzzy_self_pairs_sql(
    rel: str, id_col: str, text_col: str, max_dist: int
) -> str:
    """DuckDB twin over relation ``rel``: a SELECT of
    (id_a, id_b, dist) mirroring :func:`fuzzy_self_pairs` exactly
    (same even-segment arithmetic, same shift window, same verify)."""
    d = int(max_dist)
    k = d + 1
    return f"""
      WITH base AS (
        SELECT {id_col} AS id, {text_col} AS s,
               CAST(length({text_col}) AS BIGINT) AS l
        FROM {rel} WHERE {text_col} IS NOT NULL
      ),
      seg AS (
        SELECT b.id, b.s, t.u AS i, b.l,
               substr(b.s,
                      CAST(t.u * (b.l // {k}) + least(t.u, b.l % {k}) + 1 AS INTEGER),
                      CAST((b.l // {k}) + CASE WHEN t.u < b.l % {k} THEN 1 ELSE 0 END AS INTEGER)
               ) AS segtxt
        FROM base b, LATERAL UNNEST(range(0, {k})) AS t(u)
        WHERE (b.l // {k}) + CASE WHEN t.u < b.l % {k} THEN 1 ELSE 0 END > 0
      ),
      probe AS (
        SELECT DISTINCT p.pid, p.ps, p.i, p.l,
               substr(p.ps, CAST(p.pos + 1 AS INTEGER), CAST(p.seglen AS INTEGER)) AS segtxt
        FROM (
          SELECT b.id AS pid, b.s AS ps, b.l AS lb, tl.u AS l, ti.u AS i,
                 ti.u * (tl.u // {k}) + least(ti.u, tl.u % {k}) + ts.u AS pos,
                 (tl.u // {k}) + CASE WHEN ti.u < tl.u % {k} THEN 1 ELSE 0 END AS seglen
          FROM base b,
          LATERAL UNNEST(range(greatest(1, b.l - {d}), b.l + {d} + 1)) AS tl(u),
          LATERAL UNNEST(range(0, {k})) AS ti(u),
          LATERAL UNNEST(range(-{d}, {d} + 1)) AS ts(u)
        ) p
        WHERE p.pos >= 0 AND p.pos + p.seglen <= p.lb AND p.seglen > 0
      ),
      cand AS (
        SELECT DISTINCT least(s.id, p.pid) AS id_a,
               greatest(s.id, p.pid) AS id_b,
               CASE WHEN s.id < p.pid THEN s.s ELSE p.ps END AS sa,
               CASE WHEN s.id < p.pid THEN p.ps ELSE s.s END AS sb
        FROM seg s JOIN probe p
          ON p.i = s.i AND p.l = s.l AND p.segtxt = s.segtxt
        WHERE s.id <> p.pid
        UNION
        SELECT a.id, b.id, a.s, b.s
        FROM base a JOIN base b ON a.id < b.id
        WHERE length(a.s) <= {d} AND length(b.s) <= {d}
      )
      SELECT id_a, id_b, CAST(levenshtein(sa, sb) AS INTEGER) AS dist
      FROM cand WHERE levenshtein(sa, sb) <= {d}
    """
