"""Product-quantization family (similarity.pq_*): training
determinism, recall vs the exact baseline, the encode contract pinned
against an unrolled DuckDB twin, index/manifest round-trip with
pinned codebooks, and the probe staying JVM-side (no Python in the
scan that replaces the full-precision corpus at 100 TB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import similarity
from webscrape_neko_jirushi_spark.sources.synth_corpus import (
    synth_clustered_embeddings,
)

DIM, M, KSUB = 32, 8, 8


@pytest.fixture(scope="module")
def corpus(spark):
    vecs = synth_clustered_embeddings(spark, 800, n_clusters=8, dim=DIM).cache()
    e = vecs.select("vec_id", "embedding")
    books = similarity.pq_train(e, DIM, m=M, ksub=KSUB, seed=7, n_vecs=800)
    yield vecs, e, books
    vecs.unpersist()


def test_pq_train_shape_and_determinism(spark, corpus):
    vecs, e, books = corpus
    assert len(books) == M
    assert all(len(b) == KSUB for b in books)
    assert all(len(c) == DIM // M for b in books for c in b)
    again = similarity.pq_train(e, DIM, m=M, ksub=KSUB, seed=7, n_vecs=800)
    assert books == again
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train(e, DIM, m=5, ksub=KSUB)
    with pytest.raises(ValueError, match="ksub"):
        similarity.pq_train(e, DIM, m=M, ksub=300)


def test_pq_topk_recall_vs_planted_clusters(spark, corpus):
    """The ANN claim on this corpus: within a tight planted cluster
    every member sits at cosine ~1 - noise, and PQ quantizes exactly
    that noise away — so the meaningful assertions are CLUSTER-level
    (the same contract the IVF recall tests use), not overlap with the
    noise-decided exact top-10 ordering:

    - every pq_topk(10) hit belongs to the query's planted cluster
      (purity: quantization never ranks a wrong-cluster vector above
      true neighbours);
    - pq_topk at the cluster size recovers >=90% of the cluster
      (recall: the compressed ranking finds the true neighbourhood)."""
    vecs, e, books = corpus
    members = {
        r["vec_id"]: r["cluster"]
        for r in vecs.select("vec_id", "cluster").collect()
    }
    by_cluster: dict[int, set[int]] = {}
    for vid, c in members.items():
        by_cluster.setdefault(c, set()).add(vid)
    codes = similarity.pq_encode(e, books).cache()
    for qid in (3, 205, 641):
        qv = [
            float(x)
            for x in e.filter(F.col("vec_id") == qid).head()["embedding"]
        ]
        home = by_cluster[members[qid]]
        top10 = {
            r["vec_id"] for r in similarity.pq_topk(codes, books, qv, k=10).collect()
        }
        assert top10 <= home, top10 - home
        wide = {
            r["vec_id"]
            for r in similarity.pq_topk(codes, books, qv, k=len(home)).collect()
        }
        recall = len(wide & home) / len(home)
        assert recall >= 0.9, (qid, recall)
    codes.unpersist()


def test_pq_encode_matches_duckdb_twin(spark, corpus):
    """The encode contract (normalize -> per-subspace squared L2 ->
    HALF_UP ROUND to 9 decimals -> argmin with ties to the lowest
    code), unrolled in DuckDB SQL from the same codebook literals —
    code-for-code equality on 100 corpus vectors, so any engine can
    re-derive identical codes from the pinned codebooks alone."""
    import duckdb

    vecs, e, books = corpus
    sample = e.filter(F.col("vec_id") < 100)
    got = {
        int(r["vec_id"]): [int(c) for c in r["code"]]
        for r in similarity.pq_encode(sample, books).collect()
    }

    dsub = DIM // M
    cb_values = ", ".join(
        f"({j}, {c}, [{', '.join(repr(float(x)) for x in books[j][c])}])"
        for j in range(M)
        for c in range(KSUB)
    )
    d2 = (
        "list_aggregate(list_transform(range(1, %d), i -> "
        "(n.e[cb.j * %d + i] - cb.c[i]) * (n.e[cb.j * %d + i] - cb.c[i])), 'sum')"
        % (dsub + 1, dsub, dsub)
    )
    rows = duckdb.connect().execute(
        f"""
        WITH raw AS (
          SELECT vec_id, e FROM (VALUES {", ".join(
            f"({vid}, [{', '.join(repr(float(x)) for x in r['embedding'])}])"
            for vid, r in (
              (row["vec_id"], row) for row in sample.collect()
            )
          )} ) t(vec_id, e)
        ),
        dbl AS (
          SELECT vec_id, list_transform(e, x -> CAST(x AS DOUBLE)) AS e
          FROM raw
        ),
        n AS (
          SELECT vec_id, list_transform(e, x -> x /
            CASE WHEN sqrt(list_aggregate(list_transform(e, y -> y*y), 'sum')) = 0
                 THEN 1.0
                 ELSE sqrt(list_aggregate(list_transform(e, y -> y*y), 'sum')) END
          ) AS e FROM dbl
        ),
        cb0(j, code, c) AS (VALUES {cb_values}),
        cb AS (
          SELECT j, code, list_transform(c, x -> CAST(x AS DOUBLE)) AS c
          FROM cb0
        ),
        scored AS (
          SELECT n.vec_id, cb.j, cb.code,
                 ROW_NUMBER() OVER (PARTITION BY n.vec_id, cb.j
                   ORDER BY ROUND({d2}, 9), cb.code) AS rn
          FROM n CROSS JOIN cb
        )
        SELECT vec_id, j, code FROM scored WHERE rn = 1
        """
    ).fetchall()
    want: dict[int, list[int]] = {}
    for vid, j, code in rows:
        want.setdefault(int(vid), [0] * M)[int(j)] = int(code)
    assert got == want


def test_pq_index_roundtrip_append_and_validation(spark, corpus, tmp_path):
    vecs, e, books = corpus
    path = str(tmp_path / "pq")
    old = e.filter(F.col("vec_id") < 700)
    new = e.filter(F.col("vec_id") >= 700)
    similarity.build_pq_index(old, path, books, n_shards=4)

    qv = [float(x) for x in e.filter(F.col("vec_id") == 3).head()["embedding"]]
    direct = similarity.pq_topk(
        similarity.pq_encode(old, books), books, qv, k=5
    ).collect()
    indexed = similarity.pq_topk_indexed(spark, path, qv, k=5).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in indexed]

    # append encodes with the MANIFEST's codebooks and becomes visible
    similarity.append_pq_index(new, path)
    all_ids = {
        r["vec_id"]
        for r in similarity.pq_topk_indexed(spark, path, qv, k=800).collect()
    }
    assert all_ids == {r["vec_id"] for r in e.collect()}

    # wrong-geometry query fails loudly instead of ranking garbage
    with pytest.raises(ValueError, match="geometry"):
        similarity.pq_topk_indexed(spark, path, qv[: DIM // 2], k=5)
    # probing a PQ index with the ANN operator fails loudly
    with pytest.raises(ValueError, match="not a 'bucket' index"):
        similarity.ann_topk_indexed(spark, path, qv, k=5)


def test_pq_probe_is_jvm_side_and_compressed(spark, corpus):
    """The probe plan over the code table must contain no Python
    evaluation (encode is the only Pandas stage, probe is pure
    codegen), and the code payload is m smallints per vector."""
    vecs, e, books = corpus
    codes = similarity.pq_encode(e, books)
    assert dict(codes.dtypes)["code"] == "array<smallint>"
    qv = [float(x) for x in e.head()["embedding"]]
    plan = similarity.pq_topk(
        codes.sparkSession.createDataFrame(
            codes.limit(50).collect(), codes.schema
        ),
        books,
        qv,
        k=5,
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_pq_topk_matches_duckdb_end_to_end(spark, corpus):
    """Full-probe differential gate: DuckDB independently re-derives
    the ENTIRE PQ pipeline from (vectors, codebook literals, query) —
    normalize -> encode (the pinned HALF_UP/ties-to-lowest contract)
    -> asymmetric-distance lookup-sum in j-order (mirroring the
    ``zip_with``/``aggregate`` left fold of ``pq_distance_col``,
    so double addition associates identically) -> rank asc with
    vec_id ties — and the two engines must produce the same top-10
    (ids AND distances). The encode twin above pins the codes; this
    pins the ADC ranking those codes feed."""
    import duckdb

    vecs, e, books = corpus
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).head()["embedding"]]
    got = [
        (int(r["vec_id"]), float(r["pq_dist"]))
        for r in similarity.pq_topk(similarity.pq_encode(e, books), books, qv, k=10)
        .select("vec_id", F.round("pq_dist", 6).alias("pq_dist"))
        .collect()
    ]

    dsub = DIM // M
    # the SAME flattened distance-table doubles pq_distance_col builds
    import math

    qn = math.sqrt(sum(x * x for x in qv)) or 1.0
    q = [x / qn for x in qv]
    flat = []
    for j in range(M):
        sub = q[j * dsub : (j + 1) * dsub]
        for c in books[j]:
            flat.append(sum((a - b) ** 2 for a, b in zip(sub, c)))
    flat_lit = "[" + ", ".join(repr(float(x)) for x in flat) + "]"

    cb_values = ", ".join(
        f"({j}, {c}, [{', '.join(repr(float(x)) for x in books[j][c])}])"
        for j in range(M)
        for c in range(KSUB)
    )
    vec_values = ", ".join(
        f"({r['vec_id']}, [{', '.join(repr(float(x)) for x in r['embedding'])}])"
        for r in e.collect()
    )
    d2 = (
        "list_aggregate(list_transform(range(1, %d), i -> "
        "(n.e[cb.j * %d + i] - cb.c[i]) * (n.e[cb.j * %d + i] - cb.c[i])), 'sum')"
        % (dsub + 1, dsub, dsub)
    )
    rows = duckdb.connect().execute(
        f"""
        WITH raw(vec_id, e0) AS (VALUES {vec_values}),
        dbl AS (
          SELECT vec_id, list_transform(e0, x -> CAST(x AS DOUBLE)) AS e FROM raw
        ),
        n AS (
          SELECT vec_id, list_transform(e, x -> x /
            CASE WHEN sqrt(list_aggregate(list_transform(e, y -> y*y), 'sum')) = 0
                 THEN 1.0
                 ELSE sqrt(list_aggregate(list_transform(e, y -> y*y), 'sum')) END
          ) AS e FROM dbl
        ),
        cb0(j, code, c0) AS (VALUES {cb_values}),
        cb AS (
          SELECT j, code, list_transform(c0, x -> CAST(x AS DOUBLE)) AS c FROM cb0
        ),
        scored AS (
          SELECT n.vec_id, cb.j, cb.code,
                 ROW_NUMBER() OVER (PARTITION BY n.vec_id, cb.j
                   ORDER BY ROUND({d2}, 9), cb.code) AS rn
          FROM n CROSS JOIN cb
        ),
        codes AS (
          SELECT vec_id, list(code ORDER BY j) AS code
          FROM scored WHERE rn = 1 GROUP BY vec_id
        ),
        dist AS (
          SELECT vec_id,
                 list_aggregate(list_transform(range(0, {M}),
                   j -> ({flat_lit})[j * {KSUB} + code[j + 1] + 1]), 'sum') AS d
          FROM codes
        )
        SELECT vec_id, ROUND(d, 6) AS pq_dist
        FROM dist ORDER BY d ASC, vec_id ASC LIMIT 10
        """
    ).fetchall()
    want = [(int(v), float(d)) for v, d in rows]
    assert got == want
