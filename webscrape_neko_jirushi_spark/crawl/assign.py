"""Rendezvous (highest-random-weight) consistent assignment
(SURVEY.md §2.11 X77).

The crawl scheduler's missing piece between "salted repartition"
(anonymous balance) and "a central host->fetcher map" (state to keep
consistent): HRW hashing (Thaler & Ravishankar, 1996) assigns every
key to the worker with the highest keyed hash score. No table, no
coordination — any executor computes the same owner from the key and
the worker list alone — and it has the property that matters for
long-running crawls: **removing a worker reassigns ONLY that worker's
keys** (every other key's argmax is untouched), where a modulo
assignment reshuffles nearly everything and breaks per-host
politeness state.

Shape: a pure per-row projection — zero shuffle, zero Python, no
joins. For each key, the score against worker i is the 60-bit
portable hash of ``key '|' worker_i`` truncated to 50 bits and packed
as ``score * W + i`` (fits int64 for W <= 512); the winner is ONE
``greatest(...)`` over W unrolled expressions (whole-stage codegen
keeps it a single projection), decoded by ``% W``. Ties between
truncated scores (P ~ W^2/2^51) break deterministically to the higher
index — both engines order plain BIGINTs identically, so the DuckDB
twin reproduces every assignment bit-for-bit.

Weighting: pass a worker name multiple times (vnodes) — a worker
listed twice owns ~2x the keyspace; decode maps every vnode back to
the name. Each occurrence is salted with its occurrence ordinal
(``name#0``, ``name#1``, ...) so repeated vnodes score independently
(identical salts would collapse to one score and add no keyspace).

Reference analog: the reference pins ALL hosts to its single process
(`comprehensive_scraper.py` session loop); at 10^10-URL scale host
ownership must be a pure function, not a registry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql

_SCORE_MOD = 1 << 50
_MAX_WORKERS = 512


def _check_workers(workers: list[str]) -> None:
    if not workers:
        raise ValueError("rendezvous: empty worker list")
    if len(workers) > _MAX_WORKERS:
        raise ValueError(
            f"rendezvous: {len(workers)} workers > {_MAX_WORKERS} "
            f"(packed int64 range); shard the worker list"
        )
    if any("|" in w or "#" in w for w in workers):
        raise ValueError(
            "rendezvous: worker names must not contain '|' or '#'"
        )


def _vnode_salts(workers: list[str]) -> list[str]:
    """Distinct per-occurrence salts: name#ordinal."""
    seen: dict[str, int] = {}
    salts = []
    for w in workers:
        n = seen.get(w, 0)
        seen[w] = n + 1
        salts.append(f"{w}#{n}")
    return salts


def rendezvous_score(key: Column, worker: str) -> Column:
    """50-bit HRW score of (key, worker) — deterministic, portable."""
    return portable_hash64(
        F.concat(key.cast("string"), F.lit("|" + worker))
    ) % F.lit(_SCORE_MOD)


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    workers: list[str],
    out_col: str = "worker",
) -> DataFrame:
    """Adds ``out_col``: the HRW owner of ``key_col`` among
    ``workers`` (NULL keys get NULL owners). Pure projection."""
    _check_workers(workers)
    w_count = len(workers)
    packed = [
        rendezvous_score(F.col(key_col), s) * w_count + i
        for i, s in enumerate(_vnode_salts(workers))
    ]
    best = packed[0] if w_count == 1 else F.greatest(*packed)
    owner = F.element_at(
        F.array(*[F.lit(w) for w in workers]),
        (best % w_count + 1).cast("int"),
    )
    return df.withColumn(
        out_col,
        F.when(F.col(key_col).isNotNull(), owner),
    )


def rendezvous_assign_sql(
    key_expr: str, workers: list[str], alias: str = "worker"
) -> str:
    """DuckDB twin of :func:`rendezvous_assign` — one SELECT column."""
    _check_workers(workers)
    w_count = len(workers)
    scores = []
    for i, s in enumerate(_vnode_salts(workers)):
        salted = f"CAST({key_expr} AS VARCHAR) || '|{s}'"
        scores.append(
            f"({portable_hash64_sql(salted)} % {_SCORE_MOD})"
            f" * {w_count} + {i}"
        )
    best = scores[0] if w_count == 1 else "GREATEST(" + ", ".join(scores) + ")"
    names = ", ".join("'" + w + "'" for w in workers)
    return (
        f"CASE WHEN {key_expr} IS NULL THEN NULL "
        f"ELSE [{names}][CAST(({best}) % {w_count} AS INTEGER) + 1] "
        f"END AS {alias}"
    )
