"""Winnowing document fingerprints (MOSS; Schleimer, Wilkerson &
Aiken, SIGMOD 2003) + fingerprint-overlap detection
(SURVEY.md §2.11 X74).

The near-dup family member the minhash/simhash signatures miss:
winnowing guarantees POSITIONAL matches — any shared substring of
length >= w + k - 1 produces at least one shared (hash, offset)
fingerprint — so overlap evidence localizes to actual spans (the
plagiarism/attribution use case), where minhash only says "these bags
of shingles look alike". Everything is relational:

- :func:`winnow_fingerprints` — per doc: hash every char k-gram, then
  keep the RIGHTMOST MINIMAL hash of every w-window. The selection
  uses the classic equivalence (each window's winner = the
  rightmost-min of the window ENDING at each position, deduped), so
  it is ONE window-min over a (hash, flipped-pos) encoding packed
  into a single int64 — 40-bit hash * 2^20 + (2^20-1-pos) — because
  both engines order plain BIGINTs identically (struct-min inside a
  moving frame is not portable). One shuffle (partition by doc), no
  Python.
- :func:`fingerprint_overlap` — candidate pairs by equi-join on the
  fingerprint hash over per-doc DISTINCT hashes, with a
  ``max_bucket`` star cap on ubiquitous hashes (the boilerplate/
  stop-phrase analog of the X3 LSH cap — same documented recall
  trade), then one count aggregate per pair: shared >= min_shared
  survives. Never all-pairs.

The density guarantee (expected fingerprint rate 2/(w+1)) and the
match guarantee are the paper's; the DuckDB twins run the same
arithmetic so fingerprints match cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql

_POS_BITS = 20
_POS_CAP = 1 << _POS_BITS  # docs must be < 1M chars (guarded)
_H_MOD = 1 << 40


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, pos, h) — the winnowing fingerprint set: for every
    window of ``w`` consecutive k-gram hashes, the rightmost minimal
    one. Docs longer than 2^20 chars fail loudly (the packed-int64
    encoding's range; chunk first — X13)."""
    if k < 2 or w < 1:
        raise ValueError(f"k={k} (>=2) and w={w} (>=1) required")
    L = F.length(text_col)
    guard = F.when(
        L >= _POS_CAP,
        F.raise_error(
            F.concat(
                F.lit(f"winnow_fingerprints: doc exceeds {_POS_CAP} chars: "),
                F.col(id_col).cast("string"),
            )
        ),
    )
    pos = F.explode(
        F.when(L >= k, F.sequence(F.lit(0), L - k)).otherwise(
            F.array().cast("array<int>")
        )
    ).alias("pos")
    g = docs.select(id_col, F.coalesce(guard, F.col(text_col)).alias("_t"), pos)
    gram = F.substring("_t", F.col("pos") + 1, k)
    h40 = portable_hash64(gram) % _H_MOD
    key = h40 * _POS_CAP + (F.lit(_POS_CAP - 1) - F.col("pos"))
    keyed = g.select(id_col, "pos", key.alias("_key"))
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(w - 1), 0)
    )
    sel = keyed.select(id_col, F.min("_key").over(frame).alias("_sel")).distinct()
    return sel.select(
        id_col,
        (F.lit(_POS_CAP - 1) - F.col("_sel") % _POS_CAP).cast("int").alias("pos"),
        # integer `div`, never `/`+cast: double division loses low
        # bits above 2^53 (the packed key is 60-bit)
        F.expr(f"_sel div {_POS_CAP}").cast("long").alias("h"),
    )


def winnow_fingerprints_sql(
    docs_expr: str,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` (no WITH — nests).
    Same pack/min/decode arithmetic; ``range`` handles short docs."""
    gram = f"substr({text_col}, pos + 1, {k})"
    h40 = f"({portable_hash64_sql(gram)} % {_H_MOD})"
    key = f"({h40} * {_POS_CAP} + ({_POS_CAP - 1} - pos))"
    return f"""
      SELECT {id_col},
             CAST({_POS_CAP - 1} - _sel % {_POS_CAP} AS INTEGER) AS pos,
             CAST(_sel // {_POS_CAP} AS BIGINT) AS h
      FROM (
        SELECT DISTINCT {id_col},
               MIN({key}) OVER (
                 PARTITION BY {id_col} ORDER BY pos
                 ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW
               ) AS _sel
        FROM (
          SELECT {id_col}, {text_col},
                 CAST(u AS INTEGER) AS pos
          FROM {docs_expr},
               LATERAL UNNEST(range(0, GREATEST(length({text_col}) - {k} + 1, 0))) AS t(u)
        ) g
      ) s
    """


def fingerprint_overlap(
    fps: DataFrame,
    min_shared: int = 2,
    max_bucket: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, shared) pairs sharing >= ``min_shared`` DISTINCT
    fingerprint hashes, id_a < id_b. Hashes present in more than
    ``max_bucket`` docs are skipped before the self-join (boilerplate
    phrases — the X3 star-cap recall trade, documented not silent:
    a pair ONLY connected through ubiquitous hashes is not reported).
    Cost: sum of bucket^2 over surviving buckets, never corpus^2."""
    dh = fps.select(id_col, "h").distinct()
    sized = dh.groupBy("h").agg(F.count("*").alias("_n"))
    ok = sized.filter(F.col("_n") <= max_bucket).select("h")
    pruned = dh.join(ok, "h")
    a = pruned.select(F.col("h"), F.col(id_col).alias("id_a"))
    b = pruned.select(F.col("h"), F.col(id_col).alias("id_b"))
    pairs = a.join(b, "h").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def fingerprint_overlap_sql(
    fps_expr: str,
    min_shared: int = 2,
    max_bucket: int = 64,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`fingerprint_overlap` (no WITH — nests)."""
    return f"""
      SELECT id_a, id_b, COUNT(*) AS shared
      FROM (
        SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
        FROM (SELECT DISTINCT {id_col}, h FROM {fps_expr}) a
        JOIN (SELECT DISTINCT {id_col}, h FROM {fps_expr}) b USING (h)
        JOIN (
          SELECT h FROM (SELECT DISTINCT {id_col}, h FROM {fps_expr}) d
          GROUP BY h HAVING COUNT(*) <= {max_bucket}
        ) ok USING (h)
        WHERE a.{id_col} < b.{id_col}
      ) p
      GROUP BY id_a, id_b
      HAVING COUNT(*) >= {min_shared}
    """
