"""Embedding-space eval decontamination (SURVEY.md §2.11 X92).

The n-gram decontaminator (``text/substrings.contamination_stats``,
the GPT-3/PaLM appendix method) catches verbatim and near-verbatim
benchmark leakage; it cannot see a PARAPHRASED eval item — same
meaning, no 13-gram in common — which is exactly the contamination
mode that inflates benchmark scores most deceptively. The
embedding-space check closes that gap: an eval item is contaminated
iff some training doc's embedding lies within cosine >= tau of it.

Scale shape (the asymmetry IS the design): the eval side is tiny
(10^3-10^5 items) and the train side is the 10^10-doc corpus, so
all-pairs cosine is out. Both sides are banded with the SAME
md5-derived hyperplanes (``similarity.emb_banded`` — fully determined
by (dim, n_bands, bits_per_band), so the two sides can never band
differently), the banded EVAL side broadcasts, and candidates come
from a map-side (band, bucket) equi-join against the streaming train
side — no train shuffle at all until the candidate set (bounded by
bucket collisions, not corpus size). Exact cosine verifies candidates
only, with the eval vectors hydrated through a second broadcast join.
Same OR-over-bands/AND-within-band recall guarantee as the near-dup
family: a positively-scaled paraphrase embedding (cosine 1.0) agrees
on every sign bit and is NEVER missed; sub-tau lookalikes die in the
exact verify.

Outputs face both directions: ``semantic_contamination_report`` is
the per-EVAL-item audit (how leaked is my benchmark?), and
``decontaminate_semantic`` is the TRAIN-side filter (one anti-join)
that removes the contaminated docs before training — the FLAN/Llama
recipe, but as a corpus-scale plan instead of a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _dot, _norm, emb_banded


def _checked_cols(train_id: str, eval_id: str) -> None:
    if train_id == eval_id:
        raise ValueError(
            f"semantic decontamination: train_id and eval_id must differ "
            f"(both {train_id!r}) — the candidate pair table carries both"
        )


def semantic_contamination_pairs(
    train: DataFrame,
    evals: DataFrame,
    dim: int,
    tau: float = 0.95,
    n_bands: int = 4,
    bits_per_band: int = 8,
    train_id: str = "doc_id",
    eval_id: str = "eval_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(train_id, eval_id, cosine) for every cross pair with cosine >=
    tau. Size ``bits_per_band`` by ``similarity.lsh_bits_for`` on the
    TRAIN corpus size — occupancy is governed by the big side."""
    _checked_cols(train_id, eval_id)
    tb = emb_banded(train, dim, n_bands, bits_per_band, train_id, vec_col)
    eb = emb_banded(evals, dim, n_bands, bits_per_band, eval_id, vec_col)
    cands = (
        tb.join(F.broadcast(eb), ["band", "bucket"])
        .select(train_id, eval_id)
        .distinct()
    )
    tv = train.select(
        F.col(train_id),
        F.col(vec_col).alias("_tv"),
        _norm(F.col(vec_col)).alias("_tn"),
    )
    ev = evals.select(
        F.col(eval_id),
        F.col(vec_col).alias("_ev"),
        _norm(F.col(vec_col)).alias("_en"),
    )
    cos = _dot(F.col("_tv"), F.col("_ev")) / (F.col("_tn") * F.col("_en"))
    return (
        cands.join(tv, train_id)
        .join(F.broadcast(ev), eval_id)
        .select(train_id, eval_id, cos.alias("cosine"))
        .filter(F.col("cosine") >= tau)
    )


def semantic_contamination_report(
    train: DataFrame,
    evals: DataFrame,
    dim: int,
    tau: float = 0.95,
    n_bands: int = 4,
    bits_per_band: int = 8,
    train_id: str = "doc_id",
    eval_id: str = "eval_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-eval-item audit: (eval_id, n_contaminated, max_cosine,
    status). Every eval item gets a row — a benchmark's contamination
    RATE is the headline number, and clean rows are half of it.
    max_cosine is 4-dp rounded (reported, not compared); NULL for
    clean rows rather than a fake 0 — 'no candidate survived' and
    'best candidate scored 0' are different facts."""
    pairs = semantic_contamination_pairs(
        train, evals, dim, tau, n_bands, bits_per_band,
        train_id, eval_id, vec_col,
    )
    hits = pairs.groupBy(eval_id).agg(
        F.count("*").cast("long").alias("n_contaminated"),
        F.round(F.max("cosine"), 4).alias("max_cosine"),
    )
    return (
        evals.select(eval_id)
        .join(hits, eval_id, "left")
        .select(
            eval_id,
            F.coalesce("n_contaminated", F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
            "max_cosine",
            F.when(F.col("n_contaminated").isNotNull(), F.lit("contaminated"))
            .otherwise(F.lit("clean"))
            .alias("status"),
        )
    )


def decontaminate_semantic(
    train: DataFrame,
    evals: DataFrame,
    dim: int,
    tau: float = 0.95,
    n_bands: int = 4,
    bits_per_band: int = 8,
    train_id: str = "doc_id",
    eval_id: str = "eval_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The surviving train corpus: every doc within tau of ANY eval
    item is dropped (one anti-join on the distinct contaminated doc
    set). Original columns untouched. The doomed side carries no
    broadcast hint: the EVAL side is small but its match set is not
    bounded by it — one eval item sitting in a boilerplate cluster can
    contaminate millions of train docs — so AQE decides (broadcast at
    runtime when small, shuffle anti-join when the corpus really is
    that leaky)."""
    doomed = (
        semantic_contamination_pairs(
            train, evals, dim, tau, n_bands, bits_per_band,
            train_id, eval_id, vec_col,
        )
        .select(train_id)
        .distinct()
    )
    return train.join(doomed, train_id, "left_anti")


# --------------------------------------------------------------------------
# DuckDB twin
# --------------------------------------------------------------------------

def _planes_sql(dim: int, n_bands: int, bits_per_band: int) -> str:
    """The md5_hyperplanes twin (same CTE the emb-LSH fuzz leg pins):
    component (p, j) from the first 15 hex chars of md5(p||'|'||j)."""
    return f"""sd_planes AS (
      SELECT CAST(p.p // {bits_per_band} AS INTEGER) AS band,
             CAST(p.p % {bits_per_band} AS INTEGER) AS bit,
             CAST(j.dim AS INTEGER) AS dim,
             CAST(CONCAT('0x', substr(md5(CONCAT(p.p, '|', j.dim)), 1, 15)) AS BIGINT)
               / 576460752303423488.0 - 1.0 AS w
      FROM range(0, {n_bands * bits_per_band}) p(p),
           range(1, {dim + 1}) j(dim)
    )"""


def _buckets_sql(rel: str, id_expr: str, name: str, dim: int) -> str:
    """Banded bucket CTEs for one relation (id, embedding DOUBLE[])."""
    return f"""{name}_proj AS (
      SELECT e.{id_expr} AS id, pl.band, pl.bit,
             SUM(e.embedding[pl.dim] * pl.w) AS s
      FROM {rel} e CROSS JOIN sd_planes pl
      GROUP BY e.{id_expr}, pl.band, pl.bit
    ),
    {name}_buckets AS (
      SELECT id, band,
        SUM(CASE WHEN ROUND(s, 9) >= 0
                 THEN CAST(1 AS BIGINT) << bit ELSE CAST(0 AS BIGINT) END)
          AS bucket
      FROM {name}_proj GROUP BY id, band
    )"""


def contamination_report_sql(
    train_sql: str,
    evals_sql: str,
    dim: int,
    tau: float,
    n_bands: int = 4,
    bits_per_band: int = 8,
    train_id: str = "doc_id",
    eval_id: str = "eval_id",
) -> str:
    """DuckDB twin of :func:`semantic_contamination_report`:
    ``train_sql``/``evals_sql`` are relations with (id, embedding
    DOUBLE[]); banding, candidate join, exact-cosine verify, and the
    per-eval rollup replay the Spark plan term for term (list folds
    run in array order on both engines; projections are HALF_UP-9
    rounded before the sign test, the twin discipline that keeps the
    candidate sets identical)."""
    d = dim
    dot = (
        f"list_aggregate(list_transform(range(1, {d + 1}), "
        f"i -> t.embedding[i] * v.embedding[i]), 'sum')"
    )
    nrm_t = (
        f"sqrt(list_aggregate(list_transform(range(1, {d + 1}), "
        f"i -> t.embedding[i] * t.embedding[i]), 'sum'))"
    )
    nrm_e = (
        f"sqrt(list_aggregate(list_transform(range(1, {d + 1}), "
        f"i -> v.embedding[i] * v.embedding[i]), 'sum'))"
    )
    return f"""
    WITH sd_train AS (SELECT * FROM {train_sql}),
    sd_evals AS (SELECT * FROM {evals_sql}),
    {_planes_sql(d, n_bands, bits_per_band)},
    {_buckets_sql('sd_train', train_id, 'sd_t', d)},
    {_buckets_sql('sd_evals', eval_id, 'sd_e', d)},
    sd_cands AS (
      SELECT DISTINCT t.id AS tid, e.id AS eid
      FROM sd_t_buckets t JOIN sd_e_buckets e
        ON t.band = e.band AND t.bucket = e.bucket
    ),
    sd_pairs AS (
      SELECT c.tid, c.eid, {dot} / ({nrm_t} * {nrm_e}) AS cosine
      FROM sd_cands c
      JOIN sd_train t ON t.{train_id} = c.tid
      JOIN sd_evals v ON v.{eval_id} = c.eid
      WHERE {dot} / ({nrm_t} * {nrm_e}) >= {tau}
    ),
    sd_hits AS (
      SELECT eid, CAST(COUNT(*) AS BIGINT) AS n_contaminated,
             ROUND(MAX(cosine), 4) AS max_cosine
      FROM sd_pairs GROUP BY eid
    )
    SELECT v.{eval_id},
           CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           h.max_cosine,
           CASE WHEN h.n_contaminated IS NOT NULL
                THEN 'contaminated' ELSE 'clean' END AS status
    FROM sd_evals v LEFT JOIN sd_hits h ON h.eid = v.{eval_id}
    """
