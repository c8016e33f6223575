"""Properties of the scale-evidence synthetic corpus generator.

The generator backs BENCH/run_dedup_scale.py's claim that near-dup
query runtime grows linearly with corpus size — that claim is only
meaningful if the corpus's duplicate DENSITY is constant in n and the
generation is reproducible. Both properties are asserted here at
small n (the generator is a pure function of (seed, id, position), so
they hold at any size by construction)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import dedup
from webscrape_neko_jirushi_spark.sources.synth_corpus import (
    synth_documents,
    synth_embeddings,
)


def test_documents_deterministic(spark):
    a = synth_documents(spark, 120, seed="t1").orderBy("doc_id").collect()
    b = synth_documents(spark, 120, seed="t1").orderBy("doc_id").collect()
    assert a == b
    c = synth_documents(spark, 120, seed="t2").orderBy("doc_id").collect()
    assert [r.text for r in a] != [r.text for r in c]


def test_planted_doc_dups_verify_and_uniques_do_not(spark):
    n, dup_frac = 200, 0.10
    docs = synth_documents(spark, n, dup_frac=dup_frac)
    n_base = int(n * (1 - dup_frac))
    # shingle-set Jaccard of every (dup, base) pair — all must clear
    # the 0.5 verify threshold the ngram query uses
    sh = docs.select(
        "doc_id",
        "base_id",
        F.array_distinct(dedup.shingles(F.col("text"), 5)).alias("sh"),
    )
    dups = sh.filter(F.col("base_id").isNotNull()).alias("d")
    bases = sh.select(F.col("doc_id").alias("base_id"), F.col("sh").alias("bsh")).alias(
        "b"
    )
    jac = (
        dups.join(bases, "base_id")
        .select(
            (
                F.size(F.array_intersect("sh", "bsh"))
                / F.size(F.array_union("sh", "bsh"))
            ).alias("j")
        )
        .collect()
    )
    assert len(jac) == n - n_base
    assert all(0.5 <= r.j < 1.0 for r in jac)
    # base docs are mutually non-duplicate: the exact ngram verify over
    # ALL base-base pairs finds nothing
    base_pairs = dedup.ngram_jaccard_pairs(
        docs.filter(F.col("base_id").isNull()), "text", "doc_id", 5, 0.5
    )
    assert base_pairs.count() == 0


def test_planted_embedding_dups_cosine(spark):
    n, dup_frac, dim = 150, 0.10, 16
    emb = synth_embeddings(spark, n, dim=dim, dup_frac=dup_frac)
    n_base = int(n * (1 - dup_frac))
    rows = {r.vec_id: r.embedding for r in emb.collect()}
    assert len(rows) == n and all(len(v) == dim for v in rows.values())

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    base_rows = (
        synth_embeddings(spark, n, dim=dim, dup_frac=dup_frac)
        .filter(F.col("vec_id") >= n_base)
        .select("vec_id")
        .collect()
    )
    assert len(base_rows) == n - n_base
    # recompute each dup's base id the way the generator does
    import hashlib

    for r in base_rows:
        h = int(
            hashlib.md5(f"scale-emb-1|{r.vec_id}|base".encode()).hexdigest()[:8], 16
        )
        base = h % n_base
        assert cos(rows[r.vec_id], rows[base]) > 0.99


def test_lsh_bits_for_sizing_rule():
    """Band width grows with corpus size (constant expected occupancy)
    and clamps at the documented bounds."""
    from webscrape_neko_jirushi_spark.operators.similarity import lsh_bits_for

    assert lsh_bits_for(2_000) == 8          # clamp floor
    assert lsh_bits_for(200_000) == 15       # ceil(log2(200k/8))
    assert lsh_bits_for(10**10) == 24        # clamp ceiling
    # occupancy stays ~target across the unclamped range
    for n in (10_000, 100_000, 1_000_000, 10_000_000):
        b = lsh_bits_for(n)
        assert n / (1 << b) <= 8.0 < 2 * n / (1 << b)
