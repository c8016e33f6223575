"""Exact-substring duplication analysis — the span-level half of the
dedup story (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better": document-level near-dup removal misses the
boilerplate/license/template SUBSTRINGS repeated verbatim across
otherwise-distinct documents, and those are the memorization-prone
spans). The paper's suffix array is a single-machine structure; the
distributed re-expression is the k-gram inversion every MapReduce
shingling pipeline uses:

- ``kgram_spans``: one row per k-token window per document (builtin
  HOFs — ``sequence``/``slice``/``posexplode``, map-side, the
  ``chunk_spans`` mechanics with stride 1), each window carried as
  its 60-bit portable hash, never as text (k tokens of payload shrink
  to 8 bytes before the shuffle — at 100 TB the shuffle IS the job).
- ``duplicated_kgram_spans``: the windows whose hash occurs in >=
  ``min_docs`` DISTINCT documents — one groupBy on the hash (partial
  aggregation map-side) + one equi-join back to the spans. Output is
  every (doc, position) where a cross-document duplicated run starts;
  a maximal duplicated run of length L >= k appears as L-k+1
  consecutive positions, so consumers can reconstruct span extents
  without any substring comparison.
- ``substr_dup_ratio`` / ``substr_dup_filter``: the per-document
  admission form — fraction of a doc's windows that are duplicated
  elsewhere; docs above the threshold are boilerplate-heavy and leave
  the training set (the ``training_filter`` convention: a reject
  reason, not a silent drop).

Hash collisions (60-bit) conflate unrelated windows at ~n^2/2^61 —
negligible below ~10^9 distinct windows and ALWAYS
over-approximating duplication (safe direction for a filter); the
paper's exact-match guarantee needs one verify pass on collided
buckets, which ``min_docs`` consumers can add per-bucket.

Differentially tested against a DuckDB twin and against planted
ground truth in ``tests/test_substrings.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def kgram_spans(
    documents: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id_col, pos, gram_hash)`` — one row per k-token window,
    stride 1, hashed before the fan-out so no window text survives
    into the shuffle. Documents shorter than k tokens contribute no
    rows. Map-side only."""
    if k < 1:
        raise ValueError(f"kgram_spans: k={k} must be >= 1")
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    starts = F.when(
        (F.trim(F.col(text_col)) != "") & (n >= k),
        F.sequence(F.lit(0), n - F.lit(k)),
    ).otherwise(F.array().cast("array<int>"))
    hashes = F.transform(
        starts,
        lambda s: portable_hash64(F.concat_ws(" ", F.slice(words, s + 1, k))),
    )
    return documents.select(
        F.col(id_col), F.posexplode(hashes).alias("pos", "gram_hash")
    )


def duplicated_kgram_spans(
    documents: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Every ``(id_col, pos, gram_hash, n_docs)`` where the window's
    hash occurs in >= ``min_docs`` distinct documents — the start
    positions of cross-document duplicated runs. One hash-keyed
    aggregate + one equi-join back; both shuffle on ``gram_hash``
    (same key, so AQE/Catalyst reuse the partitioning where stats
    allow), nothing quadratic anywhere."""
    spans = kgram_spans(documents, k, text_col, id_col)
    dup = (
        spans.groupBy("gram_hash")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return spans.join(dup, "gram_hash").select(id_col, "pos", "gram_hash", "n_docs")


def substr_dup_ratio(
    documents: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """One row per document: ``n_grams`` (k-token windows),
    ``n_dup_grams`` (windows duplicated in >= ``min_docs`` docs) and
    ``dup_ratio`` in [0, 1] (0.0 for docs shorter than k tokens —
    nothing to duplicate). The document-level rollup of
    ``duplicated_kgram_spans``."""
    spans = kgram_spans(documents, k, text_col, id_col)
    dup = (
        spans.groupBy("gram_hash")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    flagged = spans.join(dup.select("gram_hash"), "gram_hash", "left_semi")
    per_doc = spans.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    dup_per_doc = flagged.groupBy(id_col).agg(F.count("*").alias("n_dup_grams"))
    return (
        documents.select(id_col)
        .join(per_doc, id_col, "left")
        .join(dup_per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0)
            )
            .otherwise(
                F.coalesce("n_dup_grams", F.lit(0)).cast("double")
                / F.col("n_grams")
            )
            .alias("dup_ratio"),
        )
    )


def substr_dup_filter(
    documents: DataFrame,
    max_dup_ratio: float = 0.5,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Admission form: documents plus ``dup_ratio`` and a ``keep`` /
    ``reject_reason`` pair (the ``training_filter`` convention — a
    boilerplate-heavy doc leaves the set with a stated reason, never
    silently)."""
    ratios = substr_dup_ratio(documents, k, text_col, id_col, min_docs)
    return documents.join(
        ratios.select(id_col, "dup_ratio"), id_col
    ).select(
        "*",
        (F.col("dup_ratio") <= F.lit(float(max_dup_ratio))).alias("keep"),
        F.when(
            F.col("dup_ratio") > F.lit(float(max_dup_ratio)),
            F.format_string("substr_dup_ratio>%s", F.lit(str(max_dup_ratio))),
        ).alias("reject_reason"),
    )


def contamination_stats(
    documents: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination — the eval-set twin of
    ``substr_dup_ratio``: per training document, how many of its
    k-token windows appear ANYWHERE in the benchmark corpus
    (``n_grams``, ``n_contaminated``, ``contamination_frac``). A doc
    quoting an eval question verbatim lights up with a run of
    contaminated windows; the standard pre-training hygiene check
    (the GPT-3 appendix-C / Lee et al. procedure, distributed as the
    same k-gram inversion both dedup ops use).

    The benchmark side reduces to DISTINCT gram hashes and is
    ``broadcast`` by default — eval sets are thousands of documents,
    so the right plan is a map-side semi-join against the corpus scan
    (no shuffle of the 100-TB side); pass
    ``broadcast_benchmark=False`` if the "benchmark" is itself
    corpus-sized (the plan degrades to a hash-keyed shuffle
    semi-join, which is what that case needs). 60-bit collisions only
    ever OVER-count contamination — the safe direction for a
    hygiene filter."""
    spans = kgram_spans(documents, k, text_col, id_col)
    bench = kgram_spans(benchmark, k, text_col, id_col).select(
        "gram_hash"
    ).distinct()
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    hits = spans.join(bench, "gram_hash", "left_semi")
    per_doc = spans.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hit_per_doc = hits.groupBy(id_col).agg(
        F.count("*").alias("n_contaminated")
    )
    return (
        documents.select(id_col)
        .join(per_doc, id_col, "left")
        .join(hit_per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_grams")
            )
            .alias("contamination_frac"),
        )
    )


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    max_frac: float = 0.0,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admission form of ``contamination_stats`` (the
    ``training_filter`` convention): any doc whose contamination
    fraction EXCEEDS ``max_frac`` leaves the set with a stated
    reason. The strict default 0.0 removes a doc for a single shared
    window — the usual eval-hygiene posture."""
    stats = contamination_stats(documents, benchmark, k, text_col, id_col)
    return documents.join(
        stats.select(id_col, "contamination_frac"), id_col
    ).select(
        "*",
        (F.col("contamination_frac") <= F.lit(float(max_frac))).alias("keep"),
        F.when(
            F.col("contamination_frac") > F.lit(float(max_frac)),
            F.format_string("contamination>%s", F.lit(str(max_frac))),
        ).alias("reject_reason"),
    )
