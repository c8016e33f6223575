"""Deterministic sequence packing — the step between curation and
tokenization in a pretraining pipeline: concatenate documents (in a
reproducible order) into one virtual token stream and cut it every
``budget`` tokens, so every training sequence is exactly full (the
classic concat-then-chunk discipline; padding-free batches).

The operator never materializes the stream. It computes, per
document, the EXCLUSIVE prefix sum of token counts over the
hash-of-key order (``lo`` = the doc's global start offset), and each
document then owns the half-open token interval ``[lo, lo + n)``; the
sequences it straddles are ``lo div budget .. (lo + n - 1) div
budget``, emitted by one ``sequence``+``explode`` — pure integer
arithmetic, one row per (document x sequence) fragment:

- ``seq_id``      — which fixed-budget training sequence
- ``doc_offset``  — token offset WITHIN the document where the
                    fragment starts
- ``seq_offset``  — position within the sequence where it lands
- ``n_tokens``    — fragment length

Every sequence except the last is exactly ``budget`` tokens, a
document's fragments tile ``[0, n)`` in order, and a consumer
groupBy(seq_id) + sort(seq_offset) reconstructs each training row —
invariants pytest-gated, and the whole map reproduced by a DuckDB
twin (differential test + driver oracle).

Scale: the only global structure is the prefix sum. Below
``auto_threshold`` rows it is one window (``SUM OVER (ORDER BY
hash)``); above, the ``global_sequence`` discipline — approx-quantile
range buckets, per-bucket window sums, <= ``buckets`` bucket totals
cumulated driver-side and broadcast back — so no single-partition
sort ever appears in the plan (the ``renumber_groups`` auto-gate
contract, including the ``n_rows`` hint that resolves the gate with
zero construction-time jobs). Offsets are exact in int64; ``div`` is
integer division on both engines.

Hash order is a deterministic shuffle (the ``weighted_interleave``
rationale): adjacent input documents land far apart in the stream,
so a sequence mixes unrelated documents — and a re-run over the same
corpus emits the identical packing on any partitioning, which is
what makes packed datasets diffable/resumable. 60-bit hash ties
(~n^2/2^61) are window-order ties, the ``global_sequence`` caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from .analysis import token_count


def pack_sequences(
    documents: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    salt: str = "pack",
    buckets: int | None = None,
    auto_threshold: int = 2_000_000,
    n_rows: int | None = None,
) -> DataFrame:
    """``(id_col, seq_id, doc_offset, seq_offset, n_tokens)`` — one
    row per (document x sequence) fragment of the concat-then-chunk
    packing at ``budget`` tokens per sequence.

    ``tokens_col`` names a precomputed token-count column (the
    pipeline usually has one from admission filtering); otherwise the
    count comes from ``analysis.token_count(text_col)``. Zero-token
    documents contribute nothing to the stream and are dropped.
    ``buckets=0`` forces the single-window prefix sum, ``>0`` the
    bucketed two-phase path, ``None`` auto-gates on a LIMIT-bounded
    probe (or the free ``n_rows`` hint)."""
    if budget < 1:
        raise ValueError(f"pack_sequences: budget={budget} must be >= 1")
    n = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else token_count(F.col(text_col)).cast("long")
    )
    base = (
        documents.select(F.col(id_col), n.alias("_n"))
        .filter(F.col("_n") > 0)
        .withColumn(
            "_h", portable_hash64(F.col(id_col).cast("string"), salt=salt)
        )
    )

    use_buckets = buckets
    if use_buckets is None:
        if n_rows is not None:
            over = n_rows > auto_threshold
        else:
            over = (
                documents.select(id_col).limit(auto_threshold + 1).count()
                > auto_threshold
            )
        use_buckets = 32 if over else 0

    if use_buckets:
        probs = [i / use_buckets for i in range(1, use_buckets)]
        bounds = sorted(set(base.approxQuantile("_h", probs, 0.001)))
        bucket = F.lit(0)
        for b in bounds:
            bucket = bucket + (F.col("_h") > F.lit(b)).cast("int")
        w_local = Window.partitionBy("_pk_bucket").orderBy("_h")
        cum = base.withColumn("_pk_bucket", bucket).withColumn(
            "_cum", F.sum("_n").over(w_local)
        )
        totals = sorted(
            cum.groupBy("_pk_bucket").agg(F.sum("_n").alias("t")).collect(),
            key=lambda r: r["_pk_bucket"],
        )
        offsets, acc = [], 0
        for r in totals:
            offsets.append((r["_pk_bucket"], acc))
            acc += r["t"]
        off_df = documents.sparkSession.createDataFrame(
            offsets, "_pk_bucket int, _pk_off long"
        )
        cum = (
            cum.join(F.broadcast(off_df), "_pk_bucket")
            .withColumn("_lo", F.col("_pk_off") + F.col("_cum") - F.col("_n"))
            .drop("_pk_bucket", "_pk_off", "_cum")
        )
    else:
        w = Window.orderBy("_h")
        cum = base.withColumn(
            "_lo", F.sum("_n").over(w) - F.col("_n")
        )

    b = F.lit(int(budget)).cast("long")
    # exact int64 div: subtract pmod first, so the double division is
    # over an exact multiple (exact while seq_id <= 2^53)
    lo = F.col("_lo")
    hi_last = F.col("_lo") + F.col("_n") - 1
    s_min = ((lo - F.pmod(lo, b)) / b).cast("long")
    s_max = ((hi_last - F.pmod(hi_last, b)) / b).cast("long")
    frag = cum.select(
        F.col(id_col),
        F.col("_lo"),
        F.col("_n"),
        F.explode(F.sequence(s_min, s_max)).alias("seq_id"),
    )
    start = F.greatest(F.col("_lo"), F.col("seq_id") * b)
    end = F.least(F.col("_lo") + F.col("_n"), (F.col("seq_id") + 1) * b)
    return frag.select(
        id_col,
        "seq_id",
        (start - F.col("_lo")).alias("doc_offset"),
        (start - F.col("seq_id") * b).alias("seq_offset"),
        (end - start).alias("n_tokens"),
    )


def pack_sequences_sql(
    budget: int,
    relation: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
    salt: str = "pack",
) -> str:
    """DuckDB twin of ``pack_sequences`` (single-stream semantics;
    the bucketed path is parity-tested against the single window, so
    one twin covers both): same token count, same hash order, same
    integer arithmetic. Exposed for differential tests and the
    driver oracle."""
    h = portable_hash64_sql(f"CAST({id_expr} AS VARCHAR)", salt=salt)
    tok = (
        f"CASE WHEN trim({text_expr}) = '' THEN 0 "
        f"ELSE length(regexp_split_to_array(trim({text_expr}), '\\s+')) END"
    )
    return f"""
    WITH toks AS (
      SELECT {id_expr} AS doc_id, CAST({tok} AS BIGINT) AS n,
             {h} AS h
      FROM {relation}
    ),
    nz AS (SELECT * FROM toks WHERE n > 0),
    cum AS (
      SELECT doc_id, n,
             CAST(SUM(n) OVER (ORDER BY h) - n AS BIGINT) AS lo
      FROM nz
    ),
    frag AS (
      SELECT doc_id, lo, n, u AS seq_id
      FROM cum, UNNEST(range(lo // {budget}, (lo + n - 1) // {budget} + 1)) AS t(u)
    )
    SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
      CAST(GREATEST(lo, seq_id * {budget}) - lo AS BIGINT) AS doc_offset,
      CAST(GREATEST(lo, seq_id * {budget}) - seq_id * {budget} AS BIGINT) AS seq_offset,
      CAST(LEAST(lo + n, (seq_id + 1) * {budget}) - GREATEST(lo, seq_id * {budget}) AS BIGINT) AS n_tokens
    FROM frag
    """
