"""DSIR importance resampling (text/dsir.py): gram construction,
log-ratio estimation vs a Python reference, map-side scoring (plan
gated), Gumbel-top-k determinism/bias, and the DuckDB twin."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.text import dsir

DIM = 64
K = 0.5

RAW = [
    (1, "stock market prices fell again today"),
    (2, "the cat sat on the warm mat"),
    (3, "market volatility and bond yields"),
    (4, "the cat chased the yarn and kitten care"),
    (5, "quarterly earnings beat market expectations"),
    (6, ""),
]
TARGET = [
    (101, "cat adoption and kitten care"),
    (102, "the cat chased the yarn ball"),
    (103, "cat care and warm places to sleep"),
]


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    w = text.lower().strip().split()
    return w + [f"{a} {b}" for a, b in zip(w, w[1:])]


def _buckets(text: str) -> list[int]:
    return [_h(g) % DIM for g in _grams(text)]


def _ref_log_ratios() -> list[float]:
    def dist(rows):
        counts = [0] * DIM
        for _, t in rows:
            for b in _buckets(t):
                counts[b] += 1
        total = sum(counts)
        return [(c + K) / (total + K * DIM) for c in counts]

    pr, pt = dist(RAW), dist(TARGET)
    return [math.log(t) - math.log(r) for t, r in zip(pt, pr)]


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(RAW, "doc_id long, text string")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(TARGET, "doc_id long, text string")


def test_gram_buckets_match_reference(raw):
    rows = raw.select(
        "doc_id", dsir.gram_buckets(F.col("text"), DIM).alias("b")
    ).collect()
    got = {r["doc_id"]: r["b"] for r in rows}
    for i, t in RAW:
        assert got[i] == _buckets(t), f"doc {i}"


def test_log_ratios_match_reference(raw, target):
    lr = dsir.dsir_log_ratios(raw, target, DIM, k=K)
    ref = _ref_log_ratios()
    assert len(lr) == DIM
    for a, b in zip(lr, ref):
        assert a == b  # same exact op order -> bit-identical


def test_importance_prefers_target_like(raw, target):
    lr = dsir.dsir_log_ratios(raw, target, DIM, k=K)
    w = {
        r["doc_id"]: r["weight"]
        for r in dsir.dsir_importance(raw, lr).collect()
    }
    # cat docs (2, 4) must outscore finance docs (1, 3, 5)
    assert min(w[2], w[4]) > max(w[1], w[3], w[5])
    assert w[6] == 0.0  # empty doc: fold seed


def test_importance_matches_python_fold(raw, target):
    lr = dsir.dsir_log_ratios(raw, target, DIM, k=K)
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir.dsir_importance(raw, lr).collect()
    }
    for i, t in RAW:
        ref = 0.0
        for b in _buckets(t):
            ref += lr[b]
        assert got[i] == pytest.approx(ref, abs=1e-12), f"doc {i}"


def test_importance_is_map_side(raw, target):
    from webscrape_neko_jirushi_spark.plans.inspect import physical_plan

    lr = dsir.dsir_log_ratios(raw, target, DIM, k=K)
    plan = physical_plan(dsir.dsir_importance(raw, lr))
    for op in ("Exchange", "Generate", "BatchEvalPython", "ArrowEvalPython"):
        assert op not in plan, f"{op} in scoring plan:\n{plan}"


def test_gumbel_topk_deterministic_and_partition_invariant(raw, target):
    lr = dsir.dsir_log_ratios(raw, target, DIM, k=K)
    scored = dsir.dsir_importance(raw, lr)
    a = [tuple(r) for r in dsir.gumbel_topk(scored, 3).collect()]
    b = [
        tuple(r)
        for r in dsir.gumbel_topk(scored.repartition(7), 3).collect()
    ]
    assert a == b
    assert len(a) == 3


def test_gumbel_topk_bias(spark):
    """With a dominating weight gap the high-weight docs are always
    drawn first (Gumbel noise is O(1))."""
    rows = [(i, 50.0 if i < 5 else 0.0) for i in range(100)]
    scored = spark.createDataFrame(rows, "doc_id long, weight double")
    picked = {r["doc_id"] for r in dsir.gumbel_topk(scored, 5).collect()}
    assert picked == {0, 1, 2, 3, 4}


def test_duckdb_twin_scores(raw, target):
    """Full twin: distributions, log ratios, fold, and gumbel key in
    DuckDB match Spark at 1e-9 (shared-libm ln)."""
    lr = dsir.dsir_log_ratios(raw, target, DIM, k=K)
    scored = dsir.dsir_importance(raw, lr)
    got = {
        r["doc_id"]: (r["weight"], r["key"])
        for r in dsir.gumbel_topk(scored, len(RAW)).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE raw(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", RAW)
    con.execute("CREATE TABLE tgt(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tgt VALUES (?, ?)", TARGET)
    b = dsir.gram_buckets_sql("text", DIM)
    sql = f"""
    WITH rb AS (SELECT {b} AS b FROM raw),
    tb AS (SELECT {b} AS b FROM tgt),
    rc AS (SELECT u.x AS bucket, COUNT(*) AS c FROM rb, UNNEST(b) AS u(x) GROUP BY 1),
    tc AS (SELECT u.x AS bucket, COUNT(*) AS c FROM tb, UNNEST(b) AS u(x) GROUP BY 1),
    rtot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM rc),
    ttot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tc),
    lr AS (
      SELECT d.bucket,
             ln((COALESCE(tc.c, 0) + {K}) / (ttot.n + {K} * {DIM}))
           - ln((COALESCE(rc.c, 0) + {K}) / (rtot.n + {K} * {DIM})) AS log_ratio
      FROM (SELECT UNNEST(range({DIM})) AS bucket) d
      LEFT JOIN rc ON rc.bucket = d.bucket
      LEFT JOIN tc ON tc.bucket = d.bucket
      CROSS JOIN rtot CROSS JOIN ttot
    ),
    lrl AS (SELECT list(log_ratio ORDER BY bucket) AS l FROM lr),
    w AS (
      SELECT doc_id,
             {dsir.importance_fold_sql(f"({b})", "lrl.l")} AS weight
      FROM raw CROSS JOIN lrl
    )
    SELECT doc_id, weight, {dsir.gumbel_key_sql('weight', 'doc_id')} AS key
    FROM w
    """
    for i, weight, key in con.execute(sql).fetchall():
        assert got[i][0] == pytest.approx(weight, abs=1e-9), f"w doc {i}"
        assert got[i][1] == pytest.approx(key, abs=1e-9), f"key doc {i}"
