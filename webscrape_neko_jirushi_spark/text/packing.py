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


def _hashed_base(documents, id_col, n, salt):
    """(id, _n, _h) with positive counts only. NULL ids fail loudly
    IN-PLAN: stream positions are keyed on the id hash, and NULL
    hashes collide — tied rows share one RANGE-frame cumulative sum
    (overlapping fragments) in the single-window form and a NULL
    bucket (driver sort crash / join drop) in the bucketed form;
    neither is a packing."""
    null_guard = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(
                "packing: NULL id — offsets are keyed on the id hash, "
                "and a NULL id cannot hold a deterministic stream "
                "position"
            )
        ),
    )
    return (
        documents.select(F.col(id_col), n.alias("_n"))
        .filter(F.col("_n") > 0)
        .withColumn(
            "_h",
            F.coalesce(
                null_guard,
                portable_hash64(F.col(id_col).cast("string"), salt=salt),
            ),
        )
    )


def _stream_offsets(
    documents: DataFrame,
    base: DataFrame,
    id_col: str,
    buckets: int | None,
    auto_threshold: int,
    n_rows: int | None,
) -> DataFrame:
    """Shared prefix-sum core: given ``base`` = ``(id_col, _n, _h)``
    rows (positive token counts, deterministic hash), add ``_lo`` =
    the exclusive prefix sum of ``_n`` in ``_h`` order — each
    document's global start offset in the virtual concatenated token
    stream. ``buckets=0`` forces the single-window form, ``>0`` the
    bucketed two-phase form (per-bucket window sums + <= ``buckets``
    bucket totals cumulated driver-side and broadcast back — no
    single-partition sort), ``None`` auto-gates on a LIMIT-bounded
    probe or the free ``n_rows`` hint."""
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
        return (
            cum.join(F.broadcast(off_df), "_pk_bucket")
            .withColumn("_lo", F.col("_pk_off") + F.col("_cum") - F.col("_n"))
            .drop("_pk_bucket", "_pk_off", "_cum")
        )
    w = Window.orderBy("_h")
    return base.withColumn("_lo", F.sum("_n").over(w) - F.col("_n"))


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
    base = _hashed_base(documents, id_col, n, salt)

    cum = _stream_offsets(
        documents, base, id_col, buckets, auto_threshold, n_rows
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


def assign_shards(
    documents: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    salt: str = "shard",
    buckets: int | None = None,
    auto_threshold: int = 2_000_000,
    n_rows: int | None = None,
) -> DataFrame:
    """Token-balanced output sharding — the step that turns a curated
    corpus into the N physical training shards a data loader reads:
    ``(id_col, n_tokens, shard_id)`` with ``shard_id = lo * N div T``
    over the same hash-ordered virtual token stream ``pack_sequences``
    cuts (``lo`` = the document's exclusive prefix sum, ``T`` = the
    exact integer token total). Contiguous stream intervals map to
    shards, documents are never split, and each shard's token sum is
    within one document of the ideal ``T/N`` — the bin-packing
    guarantee without any bin-packing search, and deterministic on
    any partitioning (same hash order, same integer arithmetic ->
    the same assignment every run, which is what makes shards
    diffable across pipeline re-runs).

    Scale: the only global structure is the prefix sum (the
    ``_stream_offsets`` auto-gate: one window at test scale, bucketed
    two-phase above ``auto_threshold`` — no single-partition sort);
    ``T`` is one integer aggregate broadcast back as a 1-row join.
    Precondition (int64 exactness): ``T * n_shards < 2^63`` — at
    2.5e13 tokens (100 TB of text) and 65k shards that is 1.6e18,
    inside the budget. Zero-token documents carry no shardable
    payload and are dropped, mirroring ``pack_sequences``."""
    if n_shards < 1:
        raise ValueError(f"assign_shards: n_shards={n_shards} must be >= 1")
    n = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else token_count(F.col(text_col)).cast("long")
    )
    base = _hashed_base(documents, id_col, n, salt)
    cum = _stream_offsets(
        documents, base, id_col, buckets, auto_threshold, n_rows
    )
    total = cum.agg(F.sum("_n").cast("long").alias("_t"))
    scaled = F.col("_lo") * F.lit(int(n_shards)).cast("long")
    shard = ((scaled - F.pmod(scaled, F.col("_t"))) / F.col("_t")).cast(
        "long"
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("_n").alias("n_tokens"),
            shard.alias("shard_id"),
        )
    )


def assign_shards_sql(
    n_shards: int,
    relation: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
    salt: str = "shard",
) -> str:
    """DuckDB twin of ``assign_shards`` (single-stream semantics; the
    bucketed path is parity-tested against the single window): same
    token count, same hash order, same integer division."""
    h = portable_hash64_sql(f"CAST({id_expr} AS VARCHAR)", salt=salt)
    tok = (
        f"CASE WHEN trim({text_expr}) = '' THEN 0 "
        f"ELSE length(regexp_split_to_array(trim({text_expr}), '\\s+')) END"
    )
    return f"""
    WITH sh_toks AS (
      SELECT {id_expr} AS doc_id, CAST({tok} AS BIGINT) AS n,
             {h} AS h
      FROM {relation}
    ),
    sh_nz AS (SELECT * FROM sh_toks WHERE n > 0),
    sh_cum AS (
      SELECT doc_id, n,
             CAST(SUM(n) OVER (ORDER BY h) - n AS BIGINT) AS lo
      FROM sh_nz
    ),
    sh_tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM sh_nz)
    SELECT doc_id, n AS n_tokens,
           CAST((lo * {int(n_shards)}) // t AS BIGINT) AS shard_id
    FROM sh_cum, sh_tot
    """
