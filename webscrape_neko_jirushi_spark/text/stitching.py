"""Paginated-document stitching (SURVEY.md §2.11 X90).

A crawl sees long articles as page fragments —
``example.com/article?page=1..N`` — and a training corpus built from
raw fetches either drops the tail pages (losing the long-document
signal LLM training most wants) or keeps them as N separate docs
(planting N-1 near-duplicates of the shared header/footer context).
The reference scraper walks paginated cat listings page-by-page
(comprehensive_scraper.py pagination loop) but never reassembles;
stitching is the operation that only matters once the corpus — not
the crawl session — is the product.

Pipeline shape (all built-ins, zero Python):

- pages arrive as ``(base, page, text)`` — base is the page-param-
  stripped canonical URL (X86 ``strip_params`` produces exactly
  this key);
- per page, the suffix/prefix overlap with its predecessor is the
  LARGEST ``k <= max_overlap`` with ``right(prev, k) = left(cur, k)``
  (sites repeat the last paragraph/nav crumb across the page break;
  re-serialized verbatim, so exact string match is the right test) —
  ONE lag window over (base ORDER BY page), overlap via an in-row
  array HOF (sequence → filter → array_max), cost O(max_overlap²)
  chars per page, scan-bound;
- the stitched doc is page 1 + each successor minus its overlap
  prefix, concatenated in page order — the groupBy(base) reuses the
  window's hash distribution, so the whole operator is ONE exchange
  at any corpus size.

Exactness discipline: ``k`` ranges over characters (both engines'
``length``/``substr`` are character-based); the twin replays the
identical sequence→filter→max arithmetic; a duplicate (base, page)
pair would make ``lag`` engine-dependent, so it raises in-plan (the
X78 contract, peer-count form). NULL text is treated as '' (a fetch
that stored an empty body still holds its page slot — dropping it
would silently splice page 3 onto page 1 as if adjacent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dup_guard():
    # NULL page raises too: Spark's window orderBy/array_sort place
    # NULLs first while the DuckDB twin's LAG/string_agg default to
    # NULLS LAST, so a NULL page would stitch in a different order on
    # the two engines instead of failing loudly (the module's lag-order
    # convention: ambiguity is an error, not a quiet reorder).
    peers = F.count("*").over(Window.partitionBy("base", "page"))
    return F.when(
        F.col("page").isNull() | (peers > 1),
        F.raise_error(
            F.concat(
                F.lit("stitching: duplicate page number or NULL page in chain "),
                F.coalesce(F.col("base").cast("string"), F.lit("NULL")),
                F.lit(" at page "),
                F.coalesce(F.col("page").cast("string"), F.lit("NULL")),
            )
        ),
    )


def _with_overlap(
    pages: DataFrame,
    max_overlap: int,
    base_col: str,
    page_col: str,
    text_col: str,
) -> DataFrame:
    """(base, page, _cur, overlap) — windows run over a pre-projected
    frame (a window referencing a same-select lateral alias is
    unsupported), so the rename select and the window select are two
    plan steps but still one exchange."""
    proj = pages.select(
        F.col(base_col).alias("base"),
        F.col(page_col).alias("page"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_cur"),
    )
    w = Window.partitionBy("base").orderBy("page")
    prev = F.lag("_cur").over(w)
    ov = F.coalesce(
        _dup_guard(), _overlap_col(prev, F.col("_cur"), max_overlap)
    )
    return proj.select("base", "page", "_cur", ov.alias("overlap"))


def _overlap_col(prev, cur, max_overlap: int):
    """Largest k in [1, max_overlap] with right(prev,k)=left(cur,k),
    else 0. NULL prev (first page) -> 0."""
    bound = F.least(
        F.length(prev), F.length(cur), F.lit(max_overlap)
    ).cast("int")
    ks = F.when(bound >= 1, F.sequence(F.lit(1), bound)).otherwise(
        F.array().cast("array<int>")
    )
    hit = F.filter(
        ks,
        lambda k: F.substring(prev, F.length(prev) - k + 1, k)
        == F.substring(cur, F.lit(1), k),
    )
    return F.coalesce(F.array_max(hit), F.lit(0))


def page_overlaps(
    pages: DataFrame,
    max_overlap: int = 64,
    base_col: str = "base",
    page_col: str = "page",
    text_col: str = "text",
) -> DataFrame:
    """Per-page overlap diagnosis: (base, page, n_chars, overlap,
    frag_chars). ``overlap`` is the char count shared with the
    predecessor page (0 for page 1 / no match); ``frag_chars`` is
    what the page contributes to the stitched doc. The QA face: a
    chain whose overlaps are all 0 was probably split on a param
    that isn't pagination at all."""
    if max_overlap < 1:
        raise ValueError("page_overlaps: max_overlap must be >= 1")
    ovd = _with_overlap(pages, max_overlap, base_col, page_col, text_col)
    return ovd.select(
        "base",
        "page",
        F.length("_cur").alias("n_chars"),
        "overlap",
        (F.length("_cur") - F.col("overlap")).alias("frag_chars"),
    )


def stitch_pages(
    pages: DataFrame,
    max_overlap: int = 64,
    base_col: str = "base",
    page_col: str = "page",
    text_col: str = "text",
) -> DataFrame:
    """One row per chain: (base, n_pages, raw_chars, trimmed_chars,
    stitched_chars, stitched_text). ``stitched_text`` is page 1's
    text plus each successor minus its suffix/prefix overlap, in
    page order; ``trimmed_chars`` = Σ overlaps (the duplicate text
    the stitch removed — at corpus scale, the near-dup mass that
    never reaches the dedup stage at all)."""
    if max_overlap < 1:
        raise ValueError("stitch_pages: max_overlap must be >= 1")
    ovd = _with_overlap(pages, max_overlap, base_col, page_col, text_col)
    # substring with a computed start: via expr over named columns
    frags = ovd.select(
        "base",
        "page",
        F.length("_cur").alias("n_chars"),
        "overlap",
        F.expr("substring(_cur, overlap + 1)").alias("frag"),
    )
    # groupBy(base) reuses the window's hashpartitioning(base): one
    # exchange total. array_sort on (page, frag) structs sorts by the
    # leading int field — page uniqueness is guard-enforced above.
    return frags.groupBy("base").agg(
        F.count("*").alias("n_pages"),
        F.sum("n_chars").cast("long").alias("raw_chars"),
        F.sum("overlap").cast("long").alias("trimmed_chars"),
        (F.sum("n_chars") - F.sum("overlap")).cast("long").alias("stitched_chars"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("page", "frag"))),
                lambda s: s["frag"],
            ),
            "",
        ).alias("stitched_text"),
    )


def _ov_sql(prev: str, cur: str, max_overlap: int) -> str:
    return f"""COALESCE(list_max(list_filter(
        range(1, CAST(LEAST(length({prev}), length({cur}), {max_overlap}) AS BIGINT) + 1),
        k -> substr({prev}, length({prev}) - CAST(k AS INT) + 1, CAST(k AS INT))
             = substr({cur}, 1, CAST(k AS INT)))), 0)"""


def page_overlaps_sql(
    from_sql: str,
    max_overlap: int = 64,
    base_expr: str = "base",
    page_expr: str = "page",
    text_expr: str = "text",
) -> str:
    """DuckDB twin of :func:`page_overlaps`."""
    return f"""
    WITH po_src AS (
      SELECT {base_expr} AS base, {page_expr} AS page,
             COALESCE({text_expr}, '') AS cur
      FROM {from_sql}
    ),
    po_lag AS (
      SELECT base, page, cur,
             LAG(cur) OVER (PARTITION BY base ORDER BY page) AS prev
      FROM po_src
    ),
    po_ov AS (
      SELECT base, page, cur,
             {_ov_sql('prev', 'cur', max_overlap)} AS ov
      FROM po_lag
    )
    SELECT base, page,
           CAST(length(cur) AS INTEGER) AS n_chars,
           CAST(ov AS INTEGER) AS overlap,
           CAST(length(cur) - ov AS INTEGER) AS frag_chars
    FROM po_ov
    """


def stitch_pages_sql(
    from_sql: str,
    max_overlap: int = 64,
    base_expr: str = "base",
    page_expr: str = "page",
    text_expr: str = "text",
) -> str:
    """DuckDB twin of :func:`stitch_pages`."""
    return f"""
    WITH sp_src AS (
      SELECT {base_expr} AS base, {page_expr} AS page,
             COALESCE({text_expr}, '') AS cur
      FROM {from_sql}
    ),
    sp_lag AS (
      SELECT base, page, cur,
             LAG(cur) OVER (PARTITION BY base ORDER BY page) AS prev
      FROM sp_src
    ),
    sp_ov AS (
      SELECT base, page, cur,
             {_ov_sql('prev', 'cur', max_overlap)} AS ov
      FROM sp_lag
    )
    SELECT base,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(length(cur)) AS BIGINT) AS raw_chars,
           CAST(SUM(ov) AS BIGINT) AS trimmed_chars,
           CAST(SUM(length(cur)) - SUM(ov) AS BIGINT) AS stitched_chars,
           string_agg(substr(cur, CAST(ov AS INT) + 1), '' ORDER BY page)
             AS stitched_text
    FROM sp_ov
    GROUP BY base
    """
