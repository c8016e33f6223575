"""BM25 relevance scoring for a literal query-term set — the
retrieval probe a curation pipeline runs against its corpus (score
training docs against benchmark queries, mine domain-relevant slices,
rank dedup survivors). Robertson/Lucene BM25:

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Engineered for determinism and scale, in that order:

- **No explode, no per-row float sums.** The query terms are a small
  LITERAL list, so per-term ``tf`` is a map-side ``size(filter(...))``
  column — the corpus is scanned ONCE and never shuffled. Corpus
  statistics (N, Σdl, df per term) are ONE aggregate of integer
  columns — integer sums are EXACT, so the scalars are bit-identical
  on any engine and any partitioning, unlike a float avg. The per-doc
  score is a FIXED-ORDER fold over the sorted term list (generated
  once, mirrored literally by the SQL twin), so no
  floating-point-addition-order nondeterminism exists anywhere.
- The 1-row stats table broadcast-joins back (BroadcastNestedLoopJoin
  against one row — the repo's scalar-join shape). At 100 TB this is
  two scans of the corpus (stats + score), both pipelined map-side.
- An inverted-index BM25 over ARBITRARY vocabulary needs the explode
  + (doc, term) aggregate path instead; this module is deliberately
  the bounded-query-set probe (the curation use-case), not a search
  engine.

Tokenization matches the repo's token conventions (`_TOKENS_SQL`):
whitespace split of lowercased trimmed text, dl = 0 for blank text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import word_tokens


def _toks(text: Column) -> Column:
    # the ONE shared tokenization surface (lm.word_tokens: trim +
    # \s+ split, NULL/blank -> EMPTY array — not a NULL that would
    # silently drop the row from _sumdl), lowercased for matching
    return word_tokens(F.lower(text))


def bm25_scores(
    documents: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adds ``dl`` (doc length in tokens), ``n_matched`` (query terms
    present), and ``bm25`` per document. See module docstring for the
    execution shape."""
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    toks = _toks(F.col(text_col))
    # word_tokens maps NULL/blank to an EMPTY array, so size() is the
    # correct dl=0 with no separate blank branch
    dl = F.size(toks).cast("long")
    def tf_of(term: str) -> Column:
        # single-arg lambda: PySpark reads filter-lambda ARITY, so a
        # bound default parameter would be mistaken for the index arg
        return F.size(F.filter(toks, lambda x: x == term)).cast("long")

    base = documents.select(
        F.col(id_col),
        dl.alias("dl"),
        *[tf_of(term).alias(f"_tf_{i}") for i, term in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("_n"),
        F.sum("dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    nd = F.col("_n").cast("double")
    avgdl = F.col("_sumdl").cast("double") / nd
    dld = F.col("dl").cast("double")
    k1f, bf = float(k1), float(b)

    def term_score(i: int) -> Column:
        tf = F.col(f"_tf_{i}")
        df = F.col(f"_df_{i}")
        idf = F.log(
            F.lit(1.0)
            + ((F.col("_n") - df).cast("double") + F.lit(0.5))
            / (df.cast("double") + F.lit(0.5))
        )
        tfd = tf.cast("double")
        s = (
            idf
            * (tfd * F.lit(k1f + 1.0))
            / (
                tfd
                + F.lit(k1f)
                * (F.lit(1.0) - F.lit(bf) + F.lit(bf) * (dld / avgdl))
            )
        )
        return F.when(tf > 0, s).otherwise(F.lit(0.0))

    score = term_score(0)
    for i in range(1, len(terms)):
        score = score + term_score(i)
    n_matched = (F.col("_tf_0") > 0).cast("int")
    for i in range(1, len(terms)):
        n_matched = n_matched + (F.col(f"_tf_{i}") > 0).cast("int")
    return j.select(
        id_col,
        "dl",
        n_matched.alias("n_matched"),
        score.alias("bm25"),
    )


def bm25_sql(
    documents_sql: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``bm25_scores`` — the literally identical fold
    over the same sorted term list; returns a full SELECT."""
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms:
        raise ValueError("bm25_sql: query_terms must be non-empty")
    k1f, bf = repr(float(k1)), repr(float(b))
    k1p1 = repr(float(k1) + 1.0)
    arr = f"regexp_split_to_array(lower(trim({text_col})), '\\s+')"
    tf_cols = ", ".join(
        f"CAST(len(list_filter({arr}, x -> x = '{term}')) AS BIGINT)"
        f" AS _tf_{i}"
        for i, term in enumerate(terms)
    )
    dl = (
        f"CAST(CASE WHEN trim({text_col}) = '' THEN 0 "
        f"ELSE len({arr}) END AS BIGINT)"
    )
    dfs = ", ".join(
        f"CAST(SUM(CASE WHEN _tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS _df_{i}"
        for i in range(len(terms))
    )

    def term_score(i: int) -> str:
        idf = (
            f"ln(1.0 + (CAST(_n - _df_{i} AS DOUBLE) + 0.5)"
            f" / (CAST(_df_{i} AS DOUBLE) + 0.5))"
        )
        return (
            f"CASE WHEN _tf_{i} > 0 THEN {idf}"
            f" * (CAST(_tf_{i} AS DOUBLE) * {k1p1})"
            f" / (CAST(_tf_{i} AS DOUBLE) + {k1f} * (1.0 - {bf} + {bf}"
            f" * (CAST(dl AS DOUBLE)"
            f" / (CAST(_sumdl AS DOUBLE) / CAST(_n AS DOUBLE)))))"
            f" ELSE 0.0 END"
        )

    score = term_score(0)
    for i in range(1, len(terms)):
        score = f"{score} + {term_score(i)}"
    matched = " + ".join(
        f"CASE WHEN _tf_{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(terms))
    )
    return f"""
    SELECT {id_col}, dl, CAST({matched} AS INTEGER) AS n_matched,
           {score} AS bm25
    FROM (
      SELECT {id_col}, {dl} AS dl, {tf_cols}
      FROM ({documents_sql})
    ) bm_base
    CROSS JOIN (
      SELECT COUNT(*) AS _n, CAST(SUM(dl) AS BIGINT) AS _sumdl, {dfs}
      FROM (
        SELECT {dl} AS dl, {tf_cols} FROM ({documents_sql})
      ) bm_inner
    ) bm_stats
    """
