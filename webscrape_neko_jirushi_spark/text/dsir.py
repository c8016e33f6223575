"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
profile looks like a small TARGET corpus, by importance weights
between two bag-of-hashed-n-grams unigram models. The GPT-3/PaLM
curation recipe selects with a trained classifier (X33); DSIR is the
closed-form alternative — no training loop, just two count passes —
and the published accuracy is on par for domain selection.

Pipeline: ``dsir_log_ratios`` estimates both feature distributions
(two explode+count aggregates, integer-exact) and returns ``dim``
driver-side log-ratio literals (the Lloyd convention: the MODEL is
literals in the plan, the DATA never moves twice); ``dsir_importance``
scores every document MAP-SIDE — a fold over the document's own gram
sequence against the literal array, zero shuffles, zero Python —
and ``gumbel_topk`` turns scores into a deterministic sample drawn
WITHOUT replacement proportionally to ``exp(weight)`` (the
Gumbel-top-k trick: argtop-k of ``weight + Gumbel(hash-seeded)`` —
Vieira 2014), as one ``TakeOrderedAndProject``.

Determinism contract: features are hashed with ``portable_hash64``
(60-bit, nonnegative — ``% dim`` needs no sign fix); the per-doc fold
runs in DOCUMENT ORDER (unigrams then bigrams, each in token order),
the same fixed order the DuckDB twin's ``list_aggregate(..., 'sum')``
uses, so scores reproduce bit-for-bit up to the shared-libm ``ln``
(compared at 6 dp by the driver oracle). Gram construction (lower +
trim + ``\\s+`` split) is the fuzz-tested ``word_tokens`` surface.

Scale: distribution estimation shuffles (bucket, count) pairs —
``dim``-bounded output; scoring is a full-corpus map. The literal
array is fine to ``dim`` ~1e4 (DSIR's published setting is 1e4
buckets); past that, broadcast-join an exploded (bucket, log_ratio)
table against the gram stream instead — same result, one extra
shuffle of gram rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from .lm import word_tokens

_M53 = 1 << 53  # hash -> uniform(0,1) denominator (exact in double)


def gram_buckets(text: Column, dim: int) -> Column:
    """Hashed uni+bigram bucket sequence of a document, in document
    order (array<long>, each in [0, dim))."""
    toks = word_tokens(F.lower(text))
    n_bi = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_bi),
        F.slice(toks, 2, n_bi),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.transform(
        F.concat(toks, bigrams), lambda g: portable_hash64(g) % dim
    )


def bucket_counts(
    documents: DataFrame, dim: int, text_col: str = "text"
) -> DataFrame:
    """(bucket, cnt) distribution of hashed grams — ONE explode + ONE
    ``dim``-bounded hash aggregate (map-side combine absorbs hot
    buckets)."""
    return (
        documents.select(
            F.explode(gram_buckets(F.col(text_col), dim)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    dim: int,
    k: float = 0.5,
    text_col: str = "text",
) -> list[float]:
    """Per-bucket ``ln p_target(b) - ln p_raw(b)`` with add-k
    smoothing (unseen buckets stay finite). Two count aggregates,
    ``2*dim`` rows collected — the model state, driver-side."""
    if dim < 1:
        raise ValueError(f"dsir_log_ratios: dim must be >= 1, got {dim}")

    def dist(df):
        rows = bucket_counts(df, dim, text_col).collect()
        counts = [0] * dim
        total = 0
        for r in rows:
            counts[r["bucket"]] = r["cnt"]
            total += r["cnt"]
        # (cnt + k) / (total + k*dim), in this exact operation order
        return [(c + k) / (total + k * dim) for c in counts]

    p_raw, p_tgt = dist(raw), dist(target)
    return [math.log(t) - math.log(r) for t, r in zip(p_tgt, p_raw)]


def dsir_importance(
    documents: DataFrame,
    log_ratios: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document log importance weight: the document-order fold of
    ``log_ratios[bucket(gram)]`` — pure map-side Column logic (the
    gram array never explodes; zero shuffles at any corpus size)."""
    dim = len(log_ratios)
    lr = F.array(*[F.lit(float(v)) for v in log_ratios])
    w = F.aggregate(
        gram_buckets(F.col(text_col), dim),
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(lr, b.cast("int") + 1),
    )
    return documents.select(F.col(id_col), w.alias("weight"))


def gumbel_topk(
    scored: DataFrame,
    n: int,
    seed: str = "dsir",
    weight_col: str = "weight",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic sample of ``n`` docs without replacement,
    proportional to ``exp(weight)``: top-n of ``weight + Gumbel``
    where the Gumbel noise is seeded from ``hash(seed || id)`` —
    reproducible on any partitioning, and the global sort-limit plans
    as TakeOrderedAndProject (no full sort at any corpus size).
    ``u = (h % 2^53 + 0.5) / 2^53`` keeps the uniform strictly inside
    (0, 1) so the double log-log is always finite."""
    h = portable_hash64(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    u = ((h % _M53).cast("double") + 0.5) / float(_M53)
    key = F.col(weight_col) - F.log(-F.log(u))
    return (
        scored.withColumn("key", key)
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(n)
    )


# --- DuckDB twins ------------------------------------------------------


def gram_buckets_sql(text_expr: str, dim: int) -> str:
    """DuckDB twin of ``gram_buckets`` (list<bigint> in doc order)."""
    t = f"lower({text_expr})"
    w = (
        f"CASE WHEN {t} IS NULL OR trim({t}) = '' THEN []::VARCHAR[] "
        f"ELSE regexp_split_to_array(trim({t}), '\\s+') END"
    )
    grams = (
        f"list_concat({w}, list_transform("
        f"range(1, greatest(length({w}), 1)), "
        f"i -> {w}[i] || ' ' || {w}[i + 1]))"
    )
    return (
        f"list_transform({grams}, g -> {portable_hash64_sql('g')} % {dim})"
    )


def importance_fold_sql(buckets_expr: str, lr_list_expr: str) -> str:
    """Document-order fold of log-ratios over a bucket list, matching
    ``dsir_importance``'s ``F.aggregate``: index each bucket into a
    dense dim-length log-ratio LIST (build it once as
    ``list(log_ratio ORDER BY bucket)`` and cross-join the 1-row
    result), then ``list_aggregate('sum')`` in list order. COALESCE
    matches Spark's 0.0 fold seed on empty documents."""
    return (
        f"COALESCE(list_aggregate(list_transform({buckets_expr}, "
        f"b -> {lr_list_expr}[CAST(b AS INT) + 1]), 'sum'), 0.0)"
    )


def gumbel_key_sql(weight_expr: str, id_expr: str, seed: str = "dsir") -> str:
    h = portable_hash64_sql(f"CONCAT('{seed}', CAST({id_expr} AS VARCHAR))")
    u = f"((CAST({h} % {_M53} AS DOUBLE) + 0.5) / {float(_M53)!r})"
    return f"({weight_expr} - ln(-ln({u})))"
