"""Takedown / RTBF enforcement (operators/takedown.py): per-kind
matching (url / host / prefix / media), the audit report with
no_match visibility, survivor anti-join + the nothing-matches-after
law, span-level media stripping (order preserved, empty-array
survival), the unknown-kind in-plan guard, the DuckDB twin, and
copy-on-write index tombstone propagation (affected-partitions-only
rewrite, emptied-partition drop, time travel until expire+vacuum)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import takedown
from webscrape_neko_jirushi_spark.operators.index_store import IndexManifest

DOCS = [
    # doc_id, url, spans as (kind, text, media_ref, offset)
    (1, "https://a.example/doc/1",
     [("text", "one", None, 1), ("image", None, "img://100", 2)]),
    (2, "https://a.example/doc/2",
     [("image", None, "img://100", 1), ("image", None, "img://200", 2)]),
    (3, "https://b.example/doc/3", [("text", "three", None, 1)]),
    (4, "https://b.example/post/4", [("image", None, "img://300", 1)]),
    (5, "https://c.example/doc/5", []),
]
SPANS_SCHEMA = (
    "doc_id long, url string, spans array<struct<kind:string,"
    "text:string,media_ref:string,offset:int>>"
)
REQS = [
    (10, "url", "https://a.example/doc/1"),
    (11, "host", "b.example"),
    (12, "prefix", "https://a.example/doc/"),
    (13, "media", "img://100"),
    (14, "url", "https://nowhere.example/x"),  # no_match
    (15, "prefix", "https://b.example/post/"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, SPANS_SCHEMA)


@pytest.fixture(scope="module")
def reqs(spark):
    return spark.createDataFrame(
        REQS, "request_id long, kind string, key string"
    )


def test_match_kinds(docs, reqs):
    m = sorted(
        (r["request_id"], r["doc_id"])
        for r in takedown.match_takedowns(docs, reqs).collect()
    )
    assert m == [(10, 1), (11, 3), (11, 4), (12, 1), (12, 2), (15, 4)]


def test_audit(docs, reqs):
    a = {
        r["request_id"]: r.asDict()
        for r in takedown.takedown_audit(docs, reqs).collect()
    }
    assert a[10]["n_docs_removed"] == 1
    assert a[11]["n_docs_removed"] == 2
    assert a[12]["n_docs_removed"] == 2
    # img://100 appears in docs 1 and 2, and BOTH are removed outright
    # by doc-level requests 10/12: the key matched 2 span instances,
    # but the composed pipeline (enforce -> strip) performs 0 strips —
    # enforced via coverage, never 'no_match'
    assert a[13] == {
        "request_id": 13, "kind": "media", "key": "img://100",
        "n_docs_removed": 0, "n_spans_matched": 2,
        "n_spans_stripped": 0, "status": "enforced",
    }
    assert a[14]["status"] == "no_match"
    assert a[14]["n_docs_removed"] == 0
    assert a[15]["n_docs_removed"] == 1
    assert all(a[i]["status"] == "enforced" for i in (10, 11, 12, 13, 15))


def test_enforce_and_law(docs, reqs):
    surv = takedown.enforce_takedowns(docs, reqs)
    assert sorted(r["doc_id"] for r in surv.collect()) == [5]
    # the enforcement law: re-matching the survivors finds nothing
    assert takedown.match_takedowns(surv, reqs).count() == 0


def test_strip_media_spans(docs, reqs):
    out = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in takedown.strip_media_spans(docs, reqs).collect()
    }
    assert len(out) == 5
    assert out[1] == [("text", "one", None, 1)]
    # doc 2: img://100 stripped, img://200 kept, order preserved
    assert out[2] == [("image", None, "img://200", 2)]
    assert out[3] == [("text", "three", None, 1)]
    assert out[4] == [("image", None, "img://300", 1)]
    assert out[5] == []  # empty stays empty, doc survives


def test_strip_media_spans_preserves_columns(docs, reqs):
    """Only spans_col is replaced — url (and any other corpus column)
    passes through, in the original column order, so the stripped
    corpus can feed enforce_takedowns directly."""
    out = takedown.strip_media_spans(docs, reqs)
    assert out.columns == docs.columns
    urls = {r["doc_id"]: r["url"] for r in out.collect()}
    assert urls[1] == "https://a.example/doc/1"


def test_host_kind_key_port_stripped(docs, spark):
    """A traps-derived 'host:port' key matches: doc hosts are
    extracted port-stripped, and host-kind KEYS are normalized with
    the same discipline (HOST_KEY_RE)."""
    reqs = spark.createDataFrame(
        [(20, "host", "b.example:8443")],
        "request_id long, kind string, key string",
    )
    m = sorted(
        (r["request_id"], r["doc_id"])
        for r in takedown.match_takedowns(docs, reqs).collect()
    )
    assert m == [(20, 3), (20, 4)]


def test_unknown_kind_raises(docs, spark):
    bad = spark.createDataFrame(
        [(1, "regex", "x.*")], "request_id long, kind string, key string"
    )
    with pytest.raises(SparkRuntimeException, match="unknown request kind"):
        takedown.match_takedowns(docs, bad).collect()


def test_duckdb_twin(docs, reqs):
    got = sorted(
        tuple(r) for r in takedown.takedown_audit(docs, reqs).collect()
    )
    con = duckdb.connect()
    con.register(
        "d", pd.DataFrame([(i, u) for i, u, _ in DOCS],
                          columns=["doc_id", "url"])
    )
    con.register(
        "s",
        pd.DataFrame(
            [(i, sp[2]) for i, _, spans in DOCS for sp in spans
             if sp[2] is not None],
            columns=["doc_id", "media_ref"],
        ),
    )
    con.register(
        "r", pd.DataFrame(REQS, columns=["request_id", "kind", "key"])
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            takedown.takedown_audit_sql("d", "r", "s")
        ).fetchall()
    )
    assert got == want


def _build_index(spark, root):
    df = spark.createDataFrame(
        [(i, i % 4, f"payload-{i}") for i in range(40)],
        "id long, bucket int, payload string",
    )
    df.repartition("bucket").write.partitionBy("bucket").mode(
        "overwrite"
    ).parquet(str(root))
    return IndexManifest.commit(root, "bucket", meta={"dim": 0})


def _ids(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "id long")


def test_delete_from_index(spark, tmp_path):
    root = tmp_path / "idx"
    m0 = _build_index(spark, root)
    # ids 0,4,8,... live in bucket 0; 1 lives in bucket 1
    audit = takedown.delete_from_index(spark, root, _ids(spark, [0, 4, 1]))
    assert audit == {
        "n_rows_deleted": 3,
        "partitions_rewritten": 2,
        "version": m0.version + 1,
    }
    m1 = IndexManifest.load(root)
    live = spark.read.option("basePath", str(root)).parquet(
        *m1.files_for(m1.partitions.keys())
    )
    got = sorted(r["id"] for r in live.collect())
    assert got == sorted(set(range(40)) - {0, 4, 1})
    # untouched partitions keep their original files verbatim
    assert m1.partitions["2"] == m0.partitions["2"]
    assert m1.partitions["3"] == m0.partitions["3"]
    # time travel: the PREVIOUS version still resolves the full corpus
    assert len(IndexManifest.all_referenced_files(root)) > m1.n_files()


def test_delete_from_index_no_match_and_empty_partition(spark, tmp_path):
    root = tmp_path / "idx2"
    _build_index(spark, root)
    a0 = takedown.delete_from_index(spark, root, _ids(spark, [999]))
    assert a0["n_rows_deleted"] == 0 and a0["partitions_rewritten"] == 0
    # tombstone EVERY row of bucket 3 -> the partition leaves the head
    a1 = takedown.delete_from_index(
        spark, root, _ids(spark, list(range(3, 40, 4)))
    )
    assert a1["n_rows_deleted"] == 10 and a1["partitions_rewritten"] == 1
    m = IndexManifest.load(root)
    assert "3" not in m.partitions
    # physical erasure completes via expire + vacuum
    IndexManifest.expire_versions(root, keep_last=1)
    deleted = IndexManifest.vacuum(root, older_than_sec=0.0)
    assert deleted > 0
    live = spark.read.option("basePath", str(root)).parquet(
        *m.files_for(m.partitions.keys())
    )
    assert live.count() == 30


def test_delete_from_real_lsh_text_index(spark, tmp_path):
    """Tombstone propagation against a REAL engine index (the banded
    minhash text index, multiple rows per doc across pb partitions):
    after delete_from_index, an incremental candidate query can never
    pair a new doc with the taken-down one."""
    from webscrape_neko_jirushi_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"some shared phrase body {i % 4} tail tokens here") for i in range(24)],
        "doc_id long, text string",
    )
    root = str(tmp_path / "lshidx")
    dedup.build_lsh_text_index(docs, root, n_subparts=16)
    m0 = IndexManifest.load(root)
    before = spark.read.option("basePath", str(m0.root)).parquet(
        *m0.files_for(m0.partitions.keys())
    )
    n_bands_rows = before.filter(F.col("doc_id") == 7).count()
    assert n_bands_rows > 0  # doc 7 really is in the index
    audit = takedown.delete_from_index(
        spark,
        root,
        spark.createDataFrame([(7,)], "doc_id long"),
        id_col="doc_id",
    )
    assert audit["n_rows_deleted"] == n_bands_rows
    m1 = IndexManifest.load(root)
    after = spark.read.option("basePath", str(m1.root)).parquet(
        *m1.files_for(m1.partitions.keys())
    )
    assert after.filter(F.col("doc_id") == 7).count() == 0
    # a near-identical NEW doc no longer finds the tombstoned one
    delta = spark.createDataFrame(
        [(1000, "some shared phrase body 3 tail tokens here")],
        "doc_id long, text string",
    )
    pairs = dedup.lsh_candidates_incremental(spark, delta, root)
    hits = {r["id_a"] for r in pairs.collect()} | {
        r["id_b"] for r in pairs.collect()
    }
    assert 7 not in hits
    assert hits  # it still pairs with the surviving same-bucket docs


def test_delete_from_index_null_partition_key(spark, tmp_path):
    """Rows in the Hive default (NULL-key) partition must really be
    rewritten, not silently skipped via str(None) != the manifest's
    directory-derived '__HIVE_DEFAULT_PARTITION__' key."""
    root = tmp_path / "idxnull"
    df = spark.createDataFrame(
        [(i, None if i % 4 == 0 else i % 4, f"p-{i}") for i in range(40)],
        "id long, bucket int, payload string",
    )
    df.repartition("bucket").write.partitionBy("bucket").mode(
        "overwrite"
    ).parquet(str(root))
    m0 = IndexManifest.commit(root, "bucket", meta={"dim": 0})
    assert "__HIVE_DEFAULT_PARTITION__" in m0.partitions
    # ids 0,4,8 live in the NULL partition; 1 lives in bucket 1
    audit = takedown.delete_from_index(spark, root, _ids(spark, [0, 4, 8, 1]))
    assert audit["n_rows_deleted"] == 4
    assert audit["partitions_rewritten"] == 2
    m1 = IndexManifest.load(root)
    live = spark.read.option("basePath", str(root)).parquet(
        *m1.files_for(m1.partitions.keys())
    )
    got = sorted(r["id"] for r in live.collect())
    assert got == sorted(set(range(40)) - {0, 4, 8, 1})


def test_enforce_takedowns_filters_frontier(spark, reqs):
    """The prevention face: the same enforcement call filters a
    frontier table (doc_col = the URL itself) before fetch."""
    frontier = spark.createDataFrame(
        [("https://a.example/doc/1",), ("https://b.example/anything",),
         ("https://c.example/doc/99",)],
        "url string",
    )
    surv = takedown.enforce_takedowns(
        frontier, reqs, doc_col="url", url_col="url"
    )
    assert [r["url"] for r in surv.collect()] == ["https://c.example/doc/99"]


def test_null_kind_raises(docs, spark):
    """ADVICE r5: `~isin` alone is NULL (not true) for a NULL kind, so
    the guard never fired and a NULL-kind request silently matched
    nothing — the guard must be NULL-safe and raise."""
    bad = spark.createDataFrame(
        [(1, None, "x.example")], "request_id long, kind string, key string"
    )
    with pytest.raises(SparkRuntimeException, match="unknown request kind"):
        takedown.match_takedowns(docs, bad).collect()
