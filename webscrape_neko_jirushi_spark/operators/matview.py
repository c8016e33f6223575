"""Incremental aggregate maintenance (SURVEY.md §2.11 X65) — the
materialized-view half of the lakehouse write path: a 100-TB pipeline
cannot re-scan the corpus to refresh "events per user", "bytes per
host", "admission rate per source" after every append; it maintains
MERGEABLE partial states and folds each delta in at delta cost
(the classic incremental view maintenance result for distributive
aggregates; same algebra Spark itself uses between partial and final
hash aggregation — re-expressed here at the TABLE level so the state
survives across jobs).

Supported aggregates are the distributive/algebraic set whose state
is a fixed-width row: ``count``, ``sum``, ``min``, ``max`` (+ ``avg``
derived at READ time as sum/count — never stored, so merges stay
exact). Sums go through DECIMAL — merge order cannot perturb them,
which is what makes `incremental == full recompute` an EQUALITY claim
(the driver oracle) instead of a tolerance claim. Holistic aggregates
(median, exact distinct) have no bounded mergeable state — use the
sketch family (X53 HLL for distinct, X57 HDR for quantiles), which
this module deliberately does not duplicate.

Flow: ``mv_state(delta, keys, spec)`` → partial state of any slice
(the SAME function builds the initial state and every delta's state);
``mv_merge(a, b, keys, spec)`` → one groupBy over the union (state
tables are group-sized, not row-sized — the merge never touches the
fact table); ``mv_read(state, spec)`` → final metrics. Persist states
through ``SnapshotStore.commit(replaces=...)`` or bucket them through
``operators/merge.build_merge_table`` for file-pruned COW refreshes
of hot groups (composition documented in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# spec entry: (out_name, kind, col) — kind in count|sum|min|max|avg
_KINDS = ("count", "sum", "min", "max", "avg")


def _validate(spec: list[tuple[str, str, str | None]]) -> None:
    if not spec:
        raise ValueError("matview: empty aggregate spec")
    names = [n for n, _, _ in spec]
    if len(set(names)) != len(names):
        raise ValueError(f"matview: duplicate output names in {names}")
    for n, kind, col in spec:
        if kind not in _KINDS:
            raise ValueError(f"matview: unsupported aggregate {kind!r} for {n!r}")
        if kind != "count" and col is None:
            raise ValueError(f"matview: {kind} needs a column for {n!r}")


def _state_cols(spec):
    """The stored state columns a spec needs (avg stores sum+count;
    shared sub-states are deduplicated)."""
    cols: dict[str, tuple[str, str | None]] = {}
    for name, kind, col in spec:
        if kind == "count":
            cols["_cnt"] = ("count", None)
        elif kind == "avg":
            cols[f"_sum_{col}"] = ("sum", col)
            cols[f"_cntv_{col}"] = ("cntv", col)
        else:
            cols[f"_{kind}_{col}"] = (kind, col)
    return cols


def mv_state(df: DataFrame, keys: list[str], spec) -> DataFrame:
    """Partial state of ``df`` — used for the initial build AND every
    delta (they are the same computation; that symmetry IS the
    incremental algorithm)."""
    _validate(spec)
    aggs = []
    for sname, (kind, col) in _state_cols(spec).items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(sname))
        elif kind == "cntv":
            aggs.append(F.count(F.col(col)).alias(sname))
        elif kind == "sum":
            aggs.append(F.sum(F.col(col).cast("decimal(28,6)")).alias(sname))
        elif kind == "min":
            aggs.append(F.min(F.col(col)).alias(sname))
        else:
            aggs.append(F.max(F.col(col)).alias(sname))
    return df.groupBy(*keys).agg(*aggs)


def mv_merge(a: DataFrame, b: DataFrame, keys: list[str], spec) -> DataFrame:
    """Merge two state tables: one groupBy over their union — counts
    and sums add, mins/maxes fold; group-sized inputs, delta-sized
    cost."""
    _validate(spec)
    aggs = []
    for sname, (kind, _col) in _state_cols(spec).items():
        if kind in ("count", "cntv", "sum"):
            aggs.append(F.sum(F.col(sname)).alias(sname))
        elif kind == "min":
            aggs.append(F.min(F.col(sname)).alias(sname))
        else:
            aggs.append(F.max(F.col(sname)).alias(sname))
    merged = a.unionByName(b).groupBy(*keys).agg(*aggs)
    # decimal sums widen under SUM-of-SUM; pin the state schema so a
    # twice-merged state unions cleanly with a fresh delta's state
    casts = [
        F.col(s).cast("decimal(28,6)").alias(s) if k[0] == "sum" else F.col(s)
        for s, k in _state_cols(spec).items()
    ]
    return merged.select(*keys, *casts)


def mv_read(state: DataFrame, keys: list[str], spec) -> DataFrame:
    """Final metrics from a state table; ``avg`` is derived here
    (decimal-exact sum / exact count, one fixed expression order —
    never stored)."""
    _validate(spec)
    out = []
    for name, kind, col in spec:
        if kind == "count":
            out.append(F.col("_cnt").cast("long").alias(name))
        elif kind == "sum":
            out.append(F.col(f"_sum_{col}").cast("double").alias(name))
        elif kind == "avg":
            out.append(
                F.when(
                    F.col(f"_cntv_{col}") > 0,
                    F.col(f"_sum_{col}").cast("double")
                    / F.col(f"_cntv_{col}").cast("double"),
                ).alias(name)
            )
        else:
            out.append(F.col(f"_{kind}_{col}").alias(name))
    return state.select(*keys, *out)


def mv_refresh(
    state: DataFrame | None, delta: DataFrame, keys: list[str], spec
) -> DataFrame:
    """One maintenance step: fold ``delta`` (raw fact rows) into
    ``state`` (None = first build). Cost: delta-sized aggregate +
    group-sized merge — the fact history is never re-read."""
    d = mv_state(delta, keys, spec)
    if state is None:
        # pin the same schema the merge path produces
        return mv_merge(d, d.limit(0), keys, spec)
    return mv_merge(state, d, keys, spec)
