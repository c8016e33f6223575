"""Deterministic training-corpus curation: hash-stratified sampling
and weighted multi-corpus interleaving.

The operators a 100-TB pretraining pipeline runs BETWEEN dedup and
tokenization: pick a reproducible subset of each stratum (language,
quality band, source domain) and mix several corpora at target rates.
Both are expressed so a re-run over the same inputs emits the same
rows in the same mixture order — no RNG state, no
``DataFrame.sample`` (whose output depends on partitioning), no
driver-side shuffling:

- ``hash_stratified_sample`` keeps a row iff the 60-bit portable hash
  of its key falls under ``fraction x 2^60`` for its stratum — a pure
  map-side filter (no shuffle, pushdown-friendly) that is NESTED by
  construction: the 10% sample is a subset of the 20% sample, so
  scaling a mixture up or down never churns previously-selected
  documents (the property data-version control depends on).
- ``weighted_interleave`` is stride scheduling (the classic
  deterministic weighted-fair-queueing discipline) over per-source
  hash-ranked rows: source ``s`` with weight ``w`` emits its ``i``-th
  row at ``mix_key = i / w``, so ANY prefix of the output ordered by
  ``mix_key`` contains exactly ``floor(t * w)`` rows of each source —
  rates proportional to the weights until a source exhausts,
  independent of source sizes. The per-source rank comes from
  ``reorganize.global_sequence`` (bucketed two-phase ranking, no
  single-partition window) above the same auto-gate threshold as
  ``renumber_groups``, with the same ``n_rows`` hint to skip the
  construction-time probe.

Both use ``portable_hash64`` so a DuckDB twin reproduces the exact
row sets and mix keys (differentially tested in
``tests/test_curation.py``). Beyond the reference (its dataset is one
source, sampled by hand); first-class per the build brief's
training-data-pipeline mandate, alongside text/analysis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql

HASH_SPACE = 1 << 60  # portable_hash64 is 60 bits, always positive


def sample_threshold(fraction: float) -> int:
    """The inclusive-exclusive hash cutoff for ``fraction``: a row is
    kept iff ``hash < threshold``. Exposed (with the SQL twin below)
    so any engine reproduces the exact row set from the fraction
    alone."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} not in [0, 1]")
    return int(fraction * HASH_SPACE)


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Reproducible per-stratum sampling: keep a row iff
    ``portable_hash64(salt + key) < fraction(stratum) * 2^60``.

    Pure map-side filter — no shuffle, no job, survives predicate
    pushdown — and deterministic in the KEY, not the partitioning
    (``DataFrame.sample`` changes output when the input repartitions;
    this never does). Nested: for the same salt, a smaller fraction's
    sample is a strict subset of a larger one's, so mixture rebalances
    only add or remove the marginal rows. Strata absent from
    ``fractions`` are DROPPED (the dict is the whole mixture spec —
    an explicit 0.0 and an omitted stratum mean the same thing);
    a NULL stratum is likewise dropped. Change ``salt`` to draw an
    independent sample (held-out eval split vs train split)."""
    thresholds = F.create_map(
        *[
            lit
            for stratum, frac in fractions.items()
            for lit in (F.lit(stratum), F.lit(sample_threshold(frac)))
        ]
    )
    if not fractions:
        # the legal drop-everything spec (omitted stratum == dropped):
        # an empty create_map() types as VOID and the lookup fails
        # analysis — filter FALSE is the spec's meaning
        return df.filter(F.lit(False))
    h = portable_hash64(F.col(key_col).cast("string"), salt=salt)
    # missing stratum -> NULL threshold -> NULL predicate -> filtered
    return df.filter(h < thresholds[F.col(strata_col)])


def hash_stratified_sample_sql(
    strata_expr: str, fractions: dict[str, float], key_expr: str, salt: str = "strat"
) -> str:
    """DuckDB WHERE-clause twin of ``hash_stratified_sample`` (same
    thresholds, same portable hash) for differential tests and
    cross-engine reproduction. An empty ``fractions`` dict is the
    legal drop-everything spec (omitted stratum == dropped) — it must
    emit FALSE, not a WHEN-less CASE DuckDB rejects."""
    if not fractions:
        return "(FALSE)"
    cases = " ".join(
        f"WHEN {stratum!r} THEN CAST({sample_threshold(frac)} AS BIGINT)"
        for stratum, frac in fractions.items()
    )
    h = portable_hash64_sql(key_expr, salt=salt)
    return f"({h} < CASE {strata_expr} {cases} END)"


def weighted_interleave(
    sources: dict[str, tuple[DataFrame, float]],
    key_col: str,
    salt: str = "mix",
    buckets: int | None = None,
    auto_threshold: int = 2_000_000,
    n_rows: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministic weighted mixing of same-schema corpora: the
    output carries ``source`` and ``mix_key`` columns, and a consumer
    reading in ``(mix_key, source)`` order sees source ``s``'s rows
    arriving at rate proportional to its weight — exactly
    ``floor(t * w_s)`` rows of ``s`` in any prefix ``mix_key <= t``
    (stride scheduling), until ``s`` runs out of rows.

    Per source the emission order is its rows ranked by portable hash
    of the key (a deterministic shuffle — adjacent input rows land far
    apart), and ``mix_key = rank / weight`` as one double division so
    any engine reproduces the keys bit-identically. The rank uses one
    parallel window per source below ``auto_threshold`` rows and
    ``global_sequence``'s bucketed two-phase ranking above it
    (``buckets``/``n_rows`` follow ``renumber_groups``' contract:
    ``buckets=0`` forces the single window, ``>0`` the bucketed path,
    ``n_rows[name]`` resolves the auto gate with no probe job).
    Deterministic for unique keys; 60-bit hash ties are window-order
    ties, the ``global_sequence`` caveat.

    The result is NOT materialized in mix order — ordering is the
    consumer's terminal sort (or the write's sort-by), exactly like
    any other Spark ORDER BY; the operator's job is that the order
    EXISTS as a column."""
    from ..operators.reorganize import global_sequence

    if not sources:
        raise ValueError("weighted_interleave: no sources")
    out = None
    for name, (df, weight) in sources.items():
        if weight <= 0:
            raise ValueError(f"weighted_interleave: weight {weight} for {name!r}")
        clash = {"source", "mix_key"} & set(df.columns)
        if clash:
            raise ValueError(
                f"weighted_interleave: source {name!r} already has column(s) "
                f"{sorted(clash)} — they are this operator's output columns"
            )
        hashed = df.withColumn(
            "_mix_hash", portable_hash64(F.col(key_col).cast("string"), salt=salt)
        )
        use_buckets = buckets
        if use_buckets is None:
            if n_rows is not None and name in n_rows:
                over = n_rows[name] > auto_threshold
            else:
                over = (
                    df.select(key_col).limit(auto_threshold + 1).count()
                    > auto_threshold
                )
            use_buckets = 32 if over else 0
        if use_buckets:
            ranked = global_sequence(
                hashed, "_mix_hash", buckets=use_buckets, out_col="_mix_rank"
            )
        else:
            w = Window.orderBy("_mix_hash")
            ranked = hashed.withColumn("_mix_rank", F.row_number().over(w))
        tagged = ranked.select(
            "*",
            F.lit(name).alias("source"),
            (F.col("_mix_rank").cast("double") / F.lit(float(weight))).alias(
                "mix_key"
            ),
        ).drop("_mix_hash", "_mix_rank")
        out = tagged if out is None else out.unionByName(tagged)
    return out


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    strata_col: str,
    tokens_col: str,
    key_col: str,
    salt: str = "budget",
) -> DataFrame:
    """Budget-exact mixture execution — the step AFTER
    ``hash_stratified_sample``'s rate-based draw when the spec is
    absolute ("200B tokens of web, 40B of code"): per stratum, keep
    documents in portable-hash order until the token budget is
    reached. A document is kept iff the tokens BEFORE it (exclusive
    prefix sum in hash order) fit the budget, so the output overshoots
    by at most one document and never undershoots while eligible docs
    remain.

    Properties the data-version-control story needs, both inherited
    from the hash ordering: deterministic in the keys (not the
    partitioning), and NESTED in the budget — raising a stratum's
    budget only APPENDS documents (the kept prefix is a prefix of the
    larger one), so a mixture re-balance never churns already-selected
    data. Strata absent from ``budgets`` are dropped (the dict is the
    whole spec, the ``hash_stratified_sample`` convention).

    Scale shape: ONE window partitioned BY STRATUM — strata run in
    parallel and a single stratum's sort is bounded by its own rows,
    not the corpus (the usual mixture has tens of sources, each a
    shard of the corpus; for one pathologically dominant stratum,
    pre-filter with ``hash_stratified_sample`` to an over-sampled
    rate first, then budget-cut the remainder — rate-then-budget is
    also the cheaper plan at 100 TB because the rate filter is
    map-side and prunes before the sort)."""
    if any(b < 0 for b in budgets.values()):
        raise ValueError(f"token_budget_sample: negative budget in {budgets}")
    budget_map = F.create_map(
        *[
            lit
            for stratum, b in budgets.items()
            for lit in (F.lit(stratum), F.lit(int(b)).cast("long"))
        ]
    )
    h = portable_hash64(F.col(key_col).cast("string"), salt=salt)
    w = Window.partitionBy(strata_col).orderBy(h)
    before = F.sum(F.col(tokens_col).cast("long")).over(w) - F.col(
        tokens_col
    ).cast("long")
    # missing stratum -> NULL budget -> NULL predicate -> dropped
    return df.withColumn("_tb_before", before).filter(
        F.col("_tb_before") < budget_map[F.col(strata_col)]
    ).drop("_tb_before")


def deterministic_shuffle(
    df: DataFrame,
    seed: str,
    id_col: str = "doc_id",
    key_col: str = "shuffle_key",
    partitions: int | None = None,
) -> DataFrame:
    """Seeded, engine-reproducible GLOBAL shuffle — the "randomize the
    corpus before epoch e" step of a training-data pipeline, without
    RNG state or ``orderBy(rand())`` (whose output depends on
    partitioning and Spark version).

    The sort key is the 60-bit portable hash of ``seed || id``: a new
    seed is a fresh permutation, the same seed is byte-identical
    across runs AND engines (DuckDB twin:
    ``ORDER BY <portable_hash64_sql> , id``). The scale path is
    ``repartitionByRange(key, id)`` + ``sortWithinPartitions`` — a
    total order across output FILES via the range-sampling exchange,
    never a single-reducer global sort; downstream sequential readers
    (sequence packing, epoch sharding) consume partitions in index
    order. Compose with ``reorganize.global_sequence(key_col)`` when
    an explicit 1-based position is needed.
    """
    key = portable_hash64(F.col(id_col).cast("string"), salt=seed)
    out = df.withColumn(key_col, key)
    if partitions is not None:
        out = out.repartitionByRange(partitions, F.col(key_col), F.col(id_col))
    else:
        out = out.repartitionByRange(F.col(key_col), F.col(id_col))
    return out.sortWithinPartitions(key_col, id_col)


def deterministic_shuffle_sql(seed: str, id_expr: str = "doc_id") -> str:
    """The DuckDB ORDER BY fragment reproducing a
    ``deterministic_shuffle`` pass order (ties impossible: the id is
    the final key)."""
    h = portable_hash64_sql(f"CAST({id_expr} AS VARCHAR)", salt=seed)
    return f"{h}, {id_expr}"


def temperature_mixture(
    source_stats: DataFrame,
    alpha: float = 0.7,
    target_tokens: int | None = None,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Temperature-based source reweighting (the XLM-R / Pile mixing
    rule): sampling weight ``w_i ∝ p_i^alpha`` where ``p_i`` is the
    source's token share — alpha < 1 upsamples small sources, alpha=1
    is natural proportions, alpha=0 is uniform. Input is the tiny
    per-source stats table (one row per source, e.g. from
    ``source_mixture_report``); adds ``token_share``, ``weight``, and
    — when ``target_tokens`` is set — ``epochs`` (how many passes over
    the source a ``target_tokens`` budget implies; >1 flags
    repetition the mixture designer must sign off on).

    Deterministic cross-engine arithmetic: the token total is an
    INTEGER sum (exact); ``p^alpha`` is map-side per row; the
    normalizer Z is a fold over the GROUP-SORTED collected array — a
    fixed summation order, never a float groupBy sum whose order
    depends on partitioning. Both scalars broadcast back (1-row
    joins); everything is sized in sources, not documents."""
    if alpha < 0:
        raise ValueError(f"temperature_mixture: alpha must be >= 0, got {alpha}")
    tok = F.col(tokens_col)
    total = source_stats.agg(
        F.sum(tok.cast("long")).alias("_total")
    )
    with_p = source_stats.crossJoin(F.broadcast(total)).withColumn(
        "_raw",
        F.pow(
            tok.cast("double") / F.col("_total").cast("double"),
            F.lit(float(alpha)),
        ),
    )
    z = with_p.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col(group_col).alias("g"), F.col("_raw").alias("r")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["r"],
        ).alias("_z")
    )
    out = with_p.crossJoin(F.broadcast(z))
    share = tok.cast("double") / F.col("_total").cast("double")
    weight = F.col("_raw") / F.col("_z")
    cols = [
        group_col,
        tok.cast("long").alias(tokens_col),
        share.alias("token_share"),
        weight.alias("weight"),
    ]
    if target_tokens is not None:
        cols.append(
            (
                F.lit(float(int(target_tokens))) * weight / tok.cast("double")
            ).alias("epochs")
        )
    return out.select(*cols)


def temperature_mixture_sql(
    stats_sql: str,
    alpha: float = 0.7,
    target_tokens: int | None = None,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
) -> str:
    """DuckDB twin of ``temperature_mixture`` over a relation with
    ``({group_col}, {tokens_col})`` — a full SELECT with the literally
    identical fold order (list ordered by the group column)."""
    a = repr(float(alpha))
    p = f"(CAST({tokens_col} AS DOUBLE) / CAST(_total AS DOUBLE))"
    epochs = (
        f", CAST({int(target_tokens)} AS DOUBLE) * (_raw / _z)"
        f" / CAST({tokens_col} AS DOUBLE) AS epochs"
        if target_tokens is not None
        else ""
    )
    return f"""
    SELECT {group_col}, CAST({tokens_col} AS BIGINT) AS {tokens_col},
           {p} AS token_share, _raw / _z AS weight{epochs}
    FROM (
      SELECT *, pow({p}, {a}) AS _raw FROM ({stats_sql}) tm_s
      CROSS JOIN (
        SELECT CAST(SUM({tokens_col}) AS BIGINT) AS _total
        FROM ({stats_sql})
      ) tm_t
    ) tm_r
    CROSS JOIN (
      SELECT list_aggregate(list(_raw ORDER BY {group_col}), 'sum') AS _z
      FROM (
        SELECT {group_col}, pow({p}, {a}) AS _raw
        FROM ({stats_sql}) tm_s2
        CROSS JOIN (
          SELECT CAST(SUM({tokens_col}) AS BIGINT) AS _total
          FROM ({stats_sql})
        ) tm_t2
      ) tm_rr
    ) tm_z
    """


def curate_corpus(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = ("source",),
    reline_words: int | None = 8,
    min_chars: int = 10,
    min_dup_docs: int = 2,
) -> DataFrame:
    """The END-TO-END curation composition — the four load-bearing
    text stages chained in production order, each an existing
    operator of this engine:

    1. encoding repair (X43 ``fix_encoding``) — FIRST, because its C0
       strip is the pipeline contract that makes every later ``\\s``
       regex engine-portable, and mojibake must be repaired before
       content hashing or identical docs with different corruption
       survive dedup;
    2. exact dedup (X1 ``exact_dedup`` on the repaired-content md5,
       keep lowest id) — BEFORE line dedup: a verbatim copy processed
       by line-dedup first would lose all its lines to the original
       and stop being an exact duplicate;
    3. corpus-wide line dedup (X41 ``line_dedup``, keep=first) over
       the ``reline_words``-word line structure (``None`` = use the
       text's own newlines);
    4. admission cascade (X12 ``training_filter``) over the deduped
       text.

    Returns the LEDGER, one row per exact-dedup survivor: ``(id,
    carry..., text, n_lines, n_kept, reason, keep, n_tokens)`` —
    rejects stay queryable as data (the cascade convention), and
    removed exact-duplicates are the only dropped rows (their ids are
    recoverable by hash-joining the input).

    Scale: stage costs are exactly the component operators' measured
    costs (DEDUP_SCALE legs); nothing is added beyond one md5 window
    for stage 2 and map-side projections.
    """
    from ..operators.dedup import exact_dedup
    from .analysis import token_count, training_filter
    from .encoding import fix_encoding
    from .linededup import line_dedup

    t = F.col(text_col)
    fixed = documents.select(
        F.col(id_col), *[F.col(c) for c in carry_cols],
        fix_encoding(t).alias(text_col),
    )
    survivors = exact_dedup(
        fixed.withColumn("_fp", F.md5(F.col(text_col))), "_fp", [id_col]
    ).drop("_fp")
    if reline_words is not None:
        pat = r"((?:\S+\s+){%d}\S+)\s+" % (reline_words - 1)
        survivors = survivors.withColumn(
            text_col, F.regexp_replace(F.col(text_col), pat, "$1\n")
        )
    deduped = line_dedup(
        survivors.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        min_chars=min_chars,
        min_dup_docs=min_dup_docs,
    )
    admitted = training_filter(deduped, text_col)
    out = admitted.join(
        survivors.select(id_col, *[F.col(c) for c in carry_cols]), id_col
    )
    return out.withColumn("n_tokens", token_count(F.col(text_col)))


# ===========================================================================
# X70: deterministic per-group fixed-size sample
# ===========================================================================

def group_sample(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    key_col: str,
    salt: str = "gsamp",
) -> DataFrame:
    """EXACTLY ``min(k, |group|)`` rows per group, chosen uniformly
    and REPRODUCIBLY — the per-host QA-sample / per-source eval-slice
    primitive ``hash_stratified_sample`` can't provide (a fraction
    keeps a *rate*, not a count: tiny groups can sample to zero, hot
    groups still dominate). Rank = ``row_number`` over the portable
    hash of (salt, key) within the group, keep rank <= k; the hash
    makes the order — and therefore the SAMPLE SET — identical across
    runs, partitionings, and engines (the twin runs the same md5
    arithmetic), with ``key_col`` as the total-order tiebreak.

    Adds ``sample_rank`` (1-based). Skew note: each group pays one
    window sort of its own rows — bounded by the hottest group, the
    same shape every per-group ordinal in the repo uses
    (``reorganize.ordinal_rename``); for k=1 prefer the
    winner-in-aggregate form (``min(struct(hash, key))``) which never
    sorts."""
    if k < 1:
        raise ValueError(f"group_sample: k must be >= 1, got {k}")
    h = portable_hash64(F.col(key_col).cast("string"), salt=salt)
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def group_sample_sql(
    rel: str,
    group_cols: list[str],
    k: int,
    key_col: str,
    salt: str = "gsamp",
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`group_sample` over ``rel`` — identical
    hash, ordering, and rank filter."""
    h = portable_hash64_sql(f"CAST({key_col} AS VARCHAR)", salt=salt)
    gb = ", ".join(group_cols)
    return f"""
      SELECT {cols}, sample_rank FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY {gb} ORDER BY {h} ASC, {key_col} ASC
        ) AS sample_rank
        FROM {rel}
      ) WHERE sample_rank <= {int(k)}
    """
