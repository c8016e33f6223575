"""Deterministic distributed synthetic corpus for scale evidence.

The driver testdata tops out at sf0.1 (5,000 documents / 2,000
embeddings) — far too small to demonstrate that the near-dup family's
banded plans grow linearly rather than quadratically. This module
generates arbitrarily large document/embedding corpora entirely with
builtin Column expressions over ``spark.range``:

- no driver-side data and no RNG state — every value is a pure
  function of ``(seed, id, position)`` through md5, so generation is
  embarrassingly parallel across executors and byte-reproducible at
  any size (the property ``Date.now()``-style seeding would break);
- a planted near-duplicate structure whose DENSITY is constant in the
  corpus size: a fixed fraction ``dup_frac`` of documents are one-word
  perturbations of a uniformly-chosen base document, so the true
  near-dup pair count (and hence any correct near-dup query's output)
  grows linearly with n. A corpus of 10 verbatim copies per doc would
  instead grow pair output quadratically per group and measure the
  output sink, not the join strategy.

Used by ``BENCH/run_dedup_scale.py`` (scale-growth evidence) and
``tests/test_synth_corpus.py`` (determinism + planted-pair properties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _u32(*cols) -> F.Column:
    """Uniform 32-bit value as a pure function of the argument columns
    (md5 of the '|'-joined rendering — the same portable construction
    the minhash/simhash families use)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 8), 16, 10
    ).cast("long")


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    dup_frac: float = 0.10,
    n_words: int = 40,
    vocab: int = 8000,
    seed: str = "scale-corpus-1",
    partitions: int | None = None,
) -> DataFrame:
    """``n_docs`` documents of ``n_words`` space-separated tokens drawn
    from a ``vocab``-word vocabulary.

    Documents with ``doc_id < n_base`` are mutually (near-)disjoint:
    tokens are uniform over the vocabulary, so a shared 5-shingle
    between two base docs has probability ~``vocab**-5`` per position
    pair — negligible. Documents with ``doc_id >= n_base`` are planted
    near-duplicates: they copy the token sequence of base document
    ``u32(seed, doc_id) % n_base`` with exactly ONE position rewritten
    to a token from a disjoint namespace (5-shingle Jaccard ≈
    (n-k-4)/(n-k+6) ≈ 0.76 for n=40, k=5 — above the 0.5 verify
    threshold, below exact equality)."""
    n_base = max(1, int(n_docs * (1.0 - dup_frac)))
    rng = spark.range(0, n_docs, 1, partitions) if partitions else spark.range(n_docs)
    df = rng.withColumnRenamed("id", "doc_id")
    sid = F.col("doc_id").cast("string")
    is_dup = F.col("doc_id") >= n_base
    basis = F.when(
        is_dup, F.pmod(_u32(F.lit(seed), sid, F.lit("base")), F.lit(n_base))
    ).otherwise(F.col("doc_id")).cast("string")
    perturb = F.pmod(_u32(F.lit(seed), sid, F.lit("pp")), F.lit(n_words))

    def token(ns, basis_col, p):
        # the rendered token embeds the namespace ("w123" vs "x123") so
        # the perturbation vocabulary is DISJOINT from the base one — a
        # shared prefix would let ~1/vocab of planted near-dups collide
        # into byte-identical copies of their base, breaking the
        # "below exact equality" invariant
        return F.concat(
            F.lit("w" if ns == "w" else "x"),
            F.pmod(
                _u32(F.lit(seed), F.lit(ns), basis_col, p.cast("string")),
                F.lit(vocab),
            ).cast("string"),
        )

    words = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda p: F.when(is_dup & (p == perturb), token("alt", sid, p)).otherwise(
            token("w", basis, p)
        ),
    )
    return df.select(
        "doc_id",
        F.concat_ws(" ", words).alias("text"),
        F.when(is_dup, F.pmod(_u32(F.lit(seed), sid, F.lit("base")), F.lit(n_base)))
        .otherwise(F.lit(None).cast("long"))
        .alias("base_id"),
    )


def synth_clustered_embeddings(
    spark: SparkSession,
    n_vecs: int,
    n_clusters: int = 8,
    dim: int = 32,
    spread: float = 0.05,
    seed: str = "cluster-emb-1",
    partitions: int | None = None,
) -> DataFrame:
    """``n_vecs`` vectors in ``n_clusters`` well-separated planted
    clusters — the ground truth for IVF centroid-training quality
    (``similarity.ivf_train_centroids``).

    Cluster centers are deterministic uniform vectors (pure functions of
    ``(seed, cluster, dim)``, mutually near-orthogonal in expectation:
    E[cos] = 0, |cos| < ~0.6 w.h.p. at dim 32); each vector is its
    cluster's center plus per-dimension noise uniform in
    [-spread, +spread) — cosine vs the center ~1 for small ``spread``,
    so the true nearest-neighbour set of any vector lies inside its own
    cluster. Returns (vec_id, cluster, embedding). Same generator
    discipline as the rest of the module: no RNG state, byte-stable at
    any size, embarrassingly parallel over ``spark.range``."""
    rng = spark.range(0, n_vecs, 1, partitions) if partitions else spark.range(n_vecs)
    df = rng.withColumnRenamed("id", "vec_id")
    sid = F.col("vec_id").cast("string")
    cluster = F.pmod(_u32(F.lit(seed), sid, F.lit("cl")), F.lit(n_clusters))

    def unit(ns, basis_col, d):
        return (
            _u32(F.lit(seed), F.lit(ns), basis_col, d.cast("string")).cast("double")
            / F.lit(float(1 << 31))
            - F.lit(1.0)
        )

    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            unit("ctr", cluster.cast("string"), d)
            + unit("ns", sid, d) * F.lit(float(spread))
        ).cast("float"),
    )
    return df.select(
        "vec_id", cluster.cast("int").alias("cluster"), comps.alias("embedding")
    )


def synth_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 32,
    dup_frac: float = 0.10,
    seed: str = "scale-emb-1",
    partitions: int | None = None,
) -> DataFrame:
    """``n_vecs`` float vectors with components uniform in [-1, 1).

    Vectors with ``vec_id >= n_base`` are planted near-duplicates of
    base vector ``u32(seed, vec_id) % n_base``: the base components
    plus per-dimension noise uniform in [-0.02, 0.02) — cosine vs the
    base ≈ 0.999 for dim 32 (above any realistic tau), while two
    independent base vectors have E[cos] = 0 and |cos| < ~0.6 w.h.p."""
    n_base = max(1, int(n_vecs * (1.0 - dup_frac)))
    rng = spark.range(0, n_vecs, 1, partitions) if partitions else spark.range(n_vecs)
    df = rng.withColumnRenamed("id", "vec_id")
    sid = F.col("vec_id").cast("string")
    is_dup = F.col("vec_id") >= n_base
    basis = F.when(
        is_dup, F.pmod(_u32(F.lit(seed), sid, F.lit("base")), F.lit(n_base))
    ).otherwise(F.col("vec_id")).cast("string")

    def unit(ns, basis_col, d):
        # uniform in [-1, 1): 32-bit hash scaled by 2^-31, shifted
        return (
            _u32(F.lit(seed), F.lit(ns), basis_col, d.cast("string")).cast("double")
            / F.lit(float(1 << 31))
            - F.lit(1.0)
        )

    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            unit("c", basis, d)
            + F.when(is_dup, unit("n", sid, d) * F.lit(0.02)).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    return df.select("vec_id", comps.alias("embedding"))
