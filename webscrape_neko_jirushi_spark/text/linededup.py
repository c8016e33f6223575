"""Corpus-wide line-level deduplication with document reassembly —
the C4 "discard repeated spans" / RefinedWeb line-wise filtering
stage (Raffel et al. 2020 §2.2 dedupe at the three-sentence level;
Penedo et al. 2023 §4.3): a LINE that recurs across documents is
boilerplate or syndication, and every occurrence past the canonical
first one is removed, then each document's surviving lines are
stitched back together in their original order. The reference
scrapes one templated site so it never meets cross-document line
repetition; a general training-data pipeline always does.

Execution shape (the repo's standard disciplines):

- ONE ``posexplode`` DEFINITION over the split text, shared by the
  verdict aggregate and the join-back side. The plan still EXECUTES
  that subtree twice (verdict + join-back — the same self-join-shape
  trade as X3 ``bucket_pairs``): the single-execution alternative
  would ``collect_list`` every instance of a hot line inside the
  per-key aggregate, unbounded for a syndicated footer in 10⁶ docs.
  Callers who can afford materialization pass an upstream
  ``localCheckpoint``'d documents table to pay the split once.
- Duplicate verdicts are computed on ``md5(line)`` keys (constant
  width — line BODIES never enter the verdict aggregate) with the
  winner-in-aggregate pattern: ``min(struct(doc_id, pos))`` inside
  the per-key aggregate picks the canonical first instance with no
  window over the exploded table; hot lines (the skew case — a
  syndicated footer in 10⁶ docs) combine map-side in both the
  distinct-doc count and the winner.
- The verdict table is filtered to ACTUAL duplicates before joining
  back, so the join's build side is the duplicated-key set, not the
  corpus; the join is a plain equi-join on the md5 key (AQE handles
  residual skew — instances of a hot line all carry the same key).
- Reassembly is ``array_join(transform(array_sort(collect_list(
  struct(pos, line)))))`` per document — a document's own lines fit
  in memory by definition, so the sort is local and bounded.

Cross-engine determinism: positions are exact integers, the winner
is a total order on (doc_id, pos), and reassembly order is by pos —
no floats anywhere, so the DuckDB twin matches byte-for-byte
(asserted on md5 of the reassembled text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(documents: DataFrame, id_col: str, text_col: str, sep: str) -> DataFrame:
    """(doc_id, pos, line) — one row per line instance. ``sep`` is a
    literal separator (escaped for Java regex; Spark keeps trailing
    empty strings with the default -1 limit, matching DuckDB
    ``string_split``)."""
    import re

    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "pos", "line"
        ),
    )


def line_dup_keys(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 10,
    min_dup_docs: int = 2,
    lines: DataFrame | None = None,
) -> DataFrame:
    """Per duplicated line key: ``(line_md5, n_docs_with_line,
    n_instances, first_doc_id, first_pos)``. Lines shorter than
    ``min_chars`` are exempt (never counted — short lines like blank
    separators or "1." are legitimately common); a key qualifies when
    it appears in at least ``min_dup_docs`` DISTINCT documents.
    ``lines`` shares a prebuilt :func:`_lines` relation (the
    line_dedup composition)."""
    if lines is None:
        lines = _lines(documents, id_col, text_col, sep)
    eligible = lines.filter(F.length("line") >= F.lit(int(min_chars)))
    keyed = eligible.select(
        F.md5(F.col("line")).alias("line_md5"), "doc_id", "pos"
    )
    stats = keyed.groupBy("line_md5").agg(
        F.countDistinct("doc_id").alias("n_docs_with_line"),
        F.count("*").alias("n_instances"),
        F.min(F.struct("doc_id", "pos")).alias("_first"),
    )
    return stats.filter(
        F.col("n_docs_with_line") >= F.lit(int(min_dup_docs))
    ).select(
        "line_md5",
        "n_docs_with_line",
        "n_instances",
        F.col("_first.doc_id").alias("first_doc_id"),
        F.col("_first.pos").alias("first_pos"),
    )


def line_dedup(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 10,
    min_dup_docs: int = 2,
    keep: str = "first",
) -> DataFrame:
    """Reassembled corpus after line-level dedup: ``(doc_id, text,
    n_lines, n_kept)`` — every document survives (a fully-stripped
    document comes back with ``text = ''`` and ``n_kept = 0``; the
    admission cascade downstream decides its fate, not this
    operator).

    ``keep='first'`` preserves the canonical first instance of each
    duplicated line (C4's discipline: the content keeps one copy);
    ``keep='none'`` removes every instance (RefinedWeb's stance for
    lines flagged as boilerplate: if it repeats, it was never
    content)."""
    if keep not in ("first", "none"):
        raise ValueError(f"line_dedup: keep must be 'first' or 'none', got {keep!r}")
    lines = _lines(documents, id_col, text_col, sep)
    dups = line_dup_keys(
        documents, id_col, text_col, sep, min_chars, min_dup_docs,
        lines=lines,
    ).select("line_md5", "first_doc_id", "first_pos")
    withkey = lines.withColumn("_k", F.md5(F.col("line")))
    j = withkey.join(dups, withkey["_k"] == dups["line_md5"], "left")
    if keep == "first":
        is_removed = F.col("line_md5").isNotNull() & ~(
            (F.col("doc_id") == F.col("first_doc_id"))
            & (F.col("pos") == F.col("first_pos"))
        )
    else:
        is_removed = F.col("line_md5").isNotNull()
    flagged = j.select(
        "doc_id", "pos", "line", is_removed.alias("_rm")
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum((~F.col("_rm")).cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_rm"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda x: x["line"],
            ),
            sep,
        ).alias("text"),
    )
    return per_doc.select("doc_id", "text", "n_lines", "n_kept")


def line_dedup_sql_ctes(
    docs_sql: str,
    sep_sql: str = "chr(10)",
    min_chars: int = 10,
    min_dup_docs: int = 2,
    keep: str = "first",
) -> str:
    """DuckDB twin over a relation ``(doc_id, text)`` — ends in CTEs
    ``ld_dups`` (the ``line_dup_keys`` output) and ``ld_docs_out``
    (the ``line_dedup`` output). ``sep_sql`` is a SQL expression for
    the separator (default newline). The first-instance winner is a
    ROW_NUMBER over (doc_id, pos) — the twin of the struct-min."""
    if keep not in ("first", "none"):
        raise ValueError(f"line_dedup_sql_ctes: bad keep {keep!r}")
    rm = (
        "d.line_md5 IS NOT NULL AND NOT (l.doc_id = d.first_doc_id AND l.pos = d.first_pos)"
        if keep == "first"
        else "d.line_md5 IS NOT NULL"
    )
    return f"""
    ld_lines AS (
      SELECT doc_id, u.x.pos AS pos, u.x.line AS line
      FROM (
        SELECT doc_id,
               list_transform(string_split(text, {sep_sql}),
                 (x, i) -> struct_pack(pos := i - 1, line := x)) AS ls
        FROM ({docs_sql}) ld_in
      ) t, LATERAL UNNEST(t.ls) AS u(x)
    ),
    ld_stats AS (
      SELECT md5(line) AS line_md5,
             COUNT(DISTINCT doc_id) AS n_docs_with_line,
             COUNT(*) AS n_instances,
             MIN(doc_id) FILTER (WHERE rn = 1) AS first_doc_id,
             MIN(pos) FILTER (WHERE rn = 1) AS first_pos
      FROM (
        SELECT doc_id, pos, line,
               ROW_NUMBER() OVER (PARTITION BY md5(line)
                                  ORDER BY doc_id, pos) AS rn
        FROM ld_lines WHERE length(line) >= {int(min_chars)}
      ) e
      GROUP BY md5(line)
    ),
    ld_dups AS (
      SELECT line_md5, n_docs_with_line, n_instances,
             first_doc_id, first_pos
      FROM ld_stats WHERE n_docs_with_line >= {int(min_dup_docs)}
    ),
    ld_flagged AS (
      SELECT l.doc_id, l.pos, l.line,
             ({rm}) AS _rm
      FROM ld_lines l
      LEFT JOIN ld_dups d ON md5(l.line) = d.line_md5
    ),
    ld_docs_out AS (
      SELECT doc_id,
             COALESCE(string_agg(line, {sep_sql} ORDER BY pos)
                        FILTER (WHERE NOT _rm), '') AS text,
             COUNT(*) AS n_lines,
             CAST(COALESCE(SUM(CAST(NOT _rm AS BIGINT)), 0) AS BIGINT)
               AS n_kept
      FROM ld_flagged GROUP BY doc_id
    )"""
