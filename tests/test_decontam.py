"""Embedding-space eval decontamination (operators/decontam.py):
planted paraphrase-contamination recall (scaled copies are
sign-bit-identical, never missed), clean-eval separation, the
per-eval audit values, train-side removal + the re-audit-clean law,
the column-name guard, and the DuckDB twin over the identical
banding/verify arithmetic."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.operators import decontam

DIM = 8


def _vec(seed: int) -> list[float]:
    # deterministic pseudo-random vector confined to the FIRST 6
    # coordinates (no RNG library); the last two stay 0 so the clean
    # evals below can be orthogonal BY CONSTRUCTION, not by luck
    return [
        float((seed * 31 + j * 17) % 13) - 6.0 if j < 6 else 0.0
        for j in range(DIM)
    ]


# train corpus: 30 docs (the mod-13 generator repeats directions —
# fine: extra same-direction pairs only ADD contaminated hits)
TRAIN = [(i, _vec(i)) for i in range(30)]
# evals: 3 contaminated (positively-scaled copies of train docs — the
# paraphrase stand-in: same direction, different magnitude), 3 clean
# (supported on the last two coordinates only -> cosine exactly 0
# against every train vector)
EVALS = [
    (100, [x * 2.5 for x in _vec(3)]),
    (101, [x * 0.5 for x in _vec(7)]),
    (102, _vec(11)),
    (200, [0.0] * 6 + [1.0, 2.0]),
    (201, [0.0] * 6 + [-3.0, 1.0]),
    (202, [0.0] * 6 + [2.0, -5.0]),
]


@pytest.fixture(scope="module")
def train(spark):
    return spark.createDataFrame(
        TRAIN, "doc_id long, embedding array<double>"
    )


@pytest.fixture(scope="module")
def evals(spark):
    return spark.createDataFrame(
        EVALS, "eval_id long, embedding array<double>"
    )


def test_pairs_recall_planted(train, evals):
    pairs = decontam.semantic_contamination_pairs(
        train, evals, dim=DIM, tau=0.999
    ).collect()
    got = {(r["doc_id"], r["eval_id"]) for r in pairs}
    # scaled copies MUST be found (sign bits identical on every band)
    assert {(3, 100), (7, 101), (11, 102)} <= got
    for r in pairs:
        assert r["cosine"] >= 0.999


def test_report(train, evals):
    rep = {
        r["eval_id"]: r.asDict()
        for r in decontam.semantic_contamination_report(
            train, evals, dim=DIM, tau=0.999
        ).collect()
    }
    assert len(rep) == len(EVALS)  # every eval item gets a row
    for eid in (100, 101, 102):
        assert rep[eid]["status"] == "contaminated"
        assert rep[eid]["n_contaminated"] >= 1
        assert rep[eid]["max_cosine"] == 1.0
    for eid in (200, 201, 202):
        assert rep[eid]["status"] == "clean"
        assert rep[eid]["n_contaminated"] == 0
        assert rep[eid]["max_cosine"] is None


def test_decontaminate_and_law(train, evals):
    surv = decontam.decontaminate_semantic(train, evals, dim=DIM, tau=0.999)
    surv_ids = {r["doc_id"] for r in surv.collect()}
    contaminated = {
        r["doc_id"]
        for r in decontam.semantic_contamination_pairs(
            train, evals, dim=DIM, tau=0.999
        ).collect()
    }
    assert {3, 7, 11} <= contaminated
    assert surv_ids == set(range(30)) - contaminated
    # the law: re-auditing against the decontaminated corpus is clean
    rep = decontam.semantic_contamination_report(
        surv, evals, dim=DIM, tau=0.999
    )
    assert {r["status"] for r in rep.collect()} == {"clean"}


def test_same_column_name_raises(train, evals):
    with pytest.raises(ValueError, match="must differ"):
        decontam.semantic_contamination_pairs(
            train, evals, dim=DIM, train_id="doc_id", eval_id="doc_id"
        )


def test_duckdb_twin(train, evals):
    got = sorted(
        tuple(r)
        for r in decontam.semantic_contamination_report(
            train, evals, dim=DIM, tau=0.9
        ).collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(TRAIN, columns=["doc_id", "embedding"]))
    con.register("v", pd.DataFrame(EVALS, columns=["eval_id", "embedding"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            decontam.contamination_report_sql("t", "v", dim=DIM, tau=0.9)
        ).fetchall()
    )
    assert got == want
