"""End-to-end RECALL of the near-dup pipelines on planted ground truth.

Oracle parity proves Spark and DuckDB compute the same thing; the plan
gates prove no quadratic join. Neither proves the pipelines FIND the
duplicates they exist to find. The synthetic corpus carries its ground
truth (``base_id``), so recall is directly measurable:

- text: minhash -> LSH banding -> exact Jaccard verify must recover
  most planted (dup, base) pairs. Banding recall at the planted
  Jaccard ~0.76 with 4 bands x 4 rows is ~1-(1-0.76^4)^4 ~ 0.80
  theoretical; the verify stage never drops a true pair (threshold
  0.5 < 0.76), so the pipeline floor asserted here is 0.70.
- embeddings: banded hyperplane LSH -> cosine >= 0.99 verify on
  planted ~0.9998-cosine dups; 4x8-bit bands give per-band agreement
  ~0.9936^8 ~ 0.95, OR-recall ~1 - 0.05^4 ~ 0.999999 — asserted
  floor 0.98.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import dedup, similarity
from webscrape_neko_jirushi_spark.sources.synth_corpus import (
    synth_documents,
    synth_embeddings,
)


def test_text_near_dup_pipeline_recall(spark):
    n = 2000
    docs = synth_documents(spark, n, dup_frac=0.10).cache()
    truth = {
        (max(r.doc_id, r.base_id), min(r.doc_id, r.base_id))
        for r in docs.filter(F.col("base_id").isNotNull()).collect()
        if r.doc_id != r.base_id
    }
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", 16, 5)
    cands = dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 4)
    found = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b))
        for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", 5, 0.5, candidates=cands
        ).collect()
    }
    docs.unpersist()
    recall = len(truth & found) / len(truth)
    assert recall >= 0.70, f"text pipeline recall {recall:.3f} < 0.70"
    # and nothing outside the planted structure is reported: every found
    # pair involves a planted dup (no base-base false positives)
    n_base = int(n * 0.9)
    assert all(a >= n_base or b >= n_base for a, b in found)


def test_embedding_near_dup_pipeline_recall(spark):
    n, dim = 1500, 32
    vecs = synth_embeddings(spark, n, dim=dim, dup_frac=0.10).cache()
    e = vecs.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    import hashlib

    n_base = int(n * 0.9)
    truth = set()
    for vid in range(n_base, n):
        h = int(hashlib.md5(f"scale-emb-1|{vid}|base".encode()).hexdigest()[:8], 16)
        truth.add((vid, h % n_base))
    cands = similarity.banded_lsh_candidates(e, dim=dim, n_bands=4, bits_per_band=8)
    found = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b))
        for r in dedup.embedding_near_dups(e, tau=0.99, candidates=cands).collect()
    }
    vecs.unpersist()
    recall = len(truth & found) / len(truth)
    assert recall >= 0.98, f"embedding pipeline recall {recall:.3f} < 0.98"


def test_candidate_output_grows_linearly_not_quadratically(spark):
    """Deterministic twin of BENCH/run_dedup_scale.py's wall-time
    evidence: with constant planted duplicate density, the LSH
    candidate-pair COUNT must grow ~linearly with corpus size. A
    regression to an effectively-quadratic candidate plan (fixed
    bucket space, dropped banding, broken dedup of band matches)
    shows up here as a ~16x jump across a 4x size step — timing-free,
    so immune to shared-host load waves."""
    counts = {}
    for n in (400, 1600):
        docs = synth_documents(spark, n, dup_frac=0.10)
        sigs = dedup.minhash_signatures(docs, "text", "doc_id", 16, 5)
        counts[n] = dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 4).count()
    ratio = counts[1600] / max(counts[400], 1)
    assert 2.5 <= ratio <= 7.0, f"pair growth {ratio:.1f}x on 4x data ({counts})"


def test_ngram_restrict_candidates_is_pure_optimization(spark):
    """restrict_candidates=True must return EXACTLY the rows of the
    default lazy form — it is a shuffle-size optimization (semi-join
    below the explode), never a semantics change."""
    docs = synth_documents(spark, 1500, dup_frac=0.10).cache()
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", 16, 5)
    cands = dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 4)
    plain = {
        tuple(r)
        for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", 5, 0.5, cands
        ).collect()
    }
    restricted = {
        tuple(r)
        for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", 5, 0.5, cands, restrict_candidates=True
        ).collect()
    }
    docs.unpersist()
    assert plain == restricted and len(plain) > 50
