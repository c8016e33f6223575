"""Windowed co-occurrence counts + PMI collocation scoring
(SURVEY.md §2.11 X61) — the corpus-statistics operator behind
collocation mining, phrase-vocabulary induction (word2vec's phrase
pass), and topical association audits of a training corpus.

Pointwise mutual information over ordered within-window pairs:

    p(a,b) = c_ab / W      (W = total ordered pairs in the corpus)
    p(a)   = c_a / N       (N = total tokens; c_a = collection freq)
    pmi    = ln( (c_ab/W) / ((c_a/N) * (c_b/N)) )

Execution shape — LINEAR in tokens, never per-doc quadratic:

- the naive form (self-join postings on doc_id, filter the pos
  distance afterwards) evaluates len^2 candidate pairs per document;
  instead each posting is EXPLODED into ``window`` target positions
  (``pos + 1 .. pos + w`` via ``sequence``) and equi-joined back on
  ``(doc_id, pos)`` — ONE equi-join over window x tokens rows, the
  same trick the bucketized range join (X49) uses to stay equi;
- counts are exact integers; N and W are a 1-row scalar aggregate
  cross-joined back (the repo's scalar-join shape), so the PMI double
  is computed by the SAME IEEE expression order on any engine and any
  partitioning — the DuckDB twin mirrors the division order term for
  term;
- a ``min_count`` floor cuts the noise tail BEFORE the unigram joins
  (hapax pairs dominate raw collocation lists and their PMI is
  meaningless at small counts).

Skew: hot terms (stop words) concentrate pairs, but the aggregate is
(term_a, term_b)-keyed — far finer than per-term — and partial
aggregation absorbs the map-side mass; no single reducer key exceeds
the hottest PAIR, not the hottest term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .invindex import postings

# DuckDB twin fragments ----------------------------------------------------
# ordered within-window pairs over a postings CTE named `post`
PAIRS_SQL = """
  SELECT p0.term AS term_a, p1.term AS term_b
  FROM post p0
  JOIN post p1 ON p1.doc_id = p0.doc_id
              AND p1.pos - p0.pos BETWEEN 1 AND {window}
"""


def cooccurrence_pairs(
    documents: DataFrame,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    post: DataFrame | None = None,
) -> DataFrame:
    """Ordered (a before b, distance <= window) pair counts:
    (term_a, term_b, cnt). Pass an already-built ``post`` (the
    :func:`invindex.postings` relation) to share one postings
    definition with sibling aggregates (the ``phrase_match`` shape) —
    note the pair self-join still EXECUTES the tokenize subtree once
    per physical occurrence unless the caller checkpoints ``post``
    first (the X3 bucket_pairs trade, caller's decision)."""
    if window < 1:
        raise ValueError(f"cooccurrence_pairs: window must be >= 1, got {window}")
    if post is None:
        post = postings(documents, id_col, text_col)
    # linear form: explode each left posting into `window` target
    # positions, then ONE equi-join on (doc_id, pos)
    left = post.select(
        "doc_id",
        F.col("term").alias("term_a"),
        F.explode(F.sequence(F.col("pos") + 1, F.col("pos") + window)).alias("tpos"),
    )
    right = post.select(
        F.col("doc_id").alias("d2"),
        F.col("term").alias("term_b"),
        F.col("pos").alias("p2"),
    )
    return (
        left.join(
            right, (left["doc_id"] == right["d2"]) & (left["tpos"] == right["p2"])
        )
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("cnt"))
    )


def pmi_collocations(
    documents: DataFrame,
    window: int = 3,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term_a, term_b, cnt, pmi) for pairs with cnt >= min_count.
    PMI doubles are bit-identical across engines (integer counts +
    fixed expression order); round for display at the query boundary.
    """
    post = postings(documents, id_col, text_col)
    pairs = cooccurrence_pairs(documents, window, id_col, text_col, post=post)
    uni = post.groupBy("term").agg(F.count("*").alias("cf"))
    # W in CLOSED FORM from per-doc token counts — a length-L doc
    # contributes t(t+1)/2 + w*max(0, L-1-w) ordered pairs
    # (t = min(w, L-1)): one light aggregate over the postings, never
    # an execution of the pair table itself (measured: the
    # SUM(cnt)-over-pairs form re-ran the heavy explode+join subtree
    # just to produce one scalar — ~2x the whole query at 100x)
    L = F.col("_L")
    t = F.least(F.lit(window), L - 1)
    per_doc = (t * (t + 1) / 2).cast("long") + window * F.greatest(
        F.lit(0).cast("long"), L - 1 - window
    )
    totals = post.groupBy("doc_id").agg(F.count("*").alias("_L")).agg(
        F.sum("_L").alias("n_tok"), F.sum(per_doc).alias("n_pairs")
    )
    ua = uni.select(F.col("term").alias("term_a"), F.col("cf").alias("cf_a"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("cf").alias("cf_b"))
    j = (
        pairs.filter(F.col("cnt") >= min_count)
        .join(ua, "term_a")
        .join(ub, "term_b")
        .crossJoin(F.broadcast(totals))
    )
    # the exact expression order the SQL twin mirrors:
    # ln( (cnt/W) / ((cf_a/N) * (cf_b/N)) )
    pmi = F.log(
        (F.col("cnt").cast("double") / F.col("n_pairs").cast("double"))
        / (
            (F.col("cf_a").cast("double") / F.col("n_tok").cast("double"))
            * (F.col("cf_b").cast("double") / F.col("n_tok").cast("double"))
        )
    )
    return j.select("term_a", "term_b", "cnt", pmi.alias("pmi"))


def pmi_sql_ctes(window: int = 3, min_count: int = 5) -> str:
    """DuckDB twin over a postings CTE named ``post``; ends in CTE
    ``pmi(term_a, term_b, cnt, pmi)`` mirroring
    :func:`pmi_collocations`'s expression order exactly."""
    pairs = PAIRS_SQL.format(window=int(window))
    return f"""pairs AS (
      SELECT term_a, term_b, COUNT(*) AS cnt
      FROM ({pairs}) GROUP BY term_a, term_b
    ),
    uni AS (SELECT term, COUNT(*) AS cf FROM post GROUP BY term),
    totals AS (
      -- W in closed form (twin of the Spark side: t(t+1)/2 exact ->
      -- BIGINT cast is round==truncate-safe on the even product)
      SELECT CAST(SUM(_L) AS BIGINT) AS n_tok,
             CAST(SUM(CAST(t * (t + 1) / 2 AS BIGINT)
                      + {int(window)} * greatest(CAST(0 AS BIGINT), _L - 1 - {int(window)})) AS BIGINT) AS n_pairs
      FROM (
        SELECT COUNT(*) AS _L,
               least({int(window)}, COUNT(*) - 1) AS t
        FROM post GROUP BY doc_id
      ) wt
    ),
    pmi AS (
      SELECT p.term_a, p.term_b, p.cnt,
             LN((CAST(p.cnt AS DOUBLE) / CAST(t.n_pairs AS DOUBLE))
                / ((CAST(ua.cf AS DOUBLE) / CAST(t.n_tok AS DOUBLE))
                   * (CAST(ub.cf AS DOUBLE) / CAST(t.n_tok AS DOUBLE)))) AS pmi
      FROM pairs p
      JOIN uni ua ON ua.term = p.term_a
      JOIN uni ub ON ub.term = p.term_b
      CROSS JOIN totals t
      WHERE p.cnt >= {int(min_count)}
    )"""
