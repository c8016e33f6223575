"""WARC source/sink (sources/warc.py): framing parser unit tests
(pure bytes), malformed-input failure contract, gzip record members,
Spark roundtrip determinism, and the binaryFile read path."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.sources import warc

DOCS = [
    (0, "plain doc zero"),
    (1, "doc one with trailing newline\n"),
    (2, ""),  # empty body
    (3, "payload that contains WARC/1.0\r\nWARC-Type: fake\r\n\r\n inside"),
    (8, "same shard as zero"),
]


def _blob(docs=DOCS, **kw) -> bytes:
    return b"".join(
        warc.warc_record_bytes(
            f"https://corpus.example/doc/{i}",
            warc.HTTP_HEAD.encode() + t.encode(),
            **kw,
        )
        for i, t in docs
    )


def test_parse_roundtrip_pure_bytes():
    recs = warc.parse_warc_records(_blob(), "f")
    assert [r["record_idx"] for r in recs] == list(range(len(DOCS)))
    for (i, t), r in zip(DOCS, recs):
        assert r["target_uri"] == f"https://corpus.example/doc/{i}"
        assert r["payload"] == warc.HTTP_HEAD.encode() + t.encode()
        assert r["content_length"] == len(r["payload"])
        assert r["warc_type"] == "response"
        assert r["record_id"].startswith("<urn:md5:")


def test_content_length_framing_survives_embedded_warc_header():
    # doc 3's payload contains a full fake WARC header — the parser
    # must frame by Content-Length, never by scanning for 'WARC/'
    recs = warc.parse_warc_records(_blob(), "f")
    assert len(recs) == len(DOCS)
    assert b"WARC-Type: fake" in recs[3]["payload"]


def test_gzip_multi_member():
    members = b"".join(
        gzip.compress(
            warc.warc_record_bytes(f"u:{i}", f"body {i}".encode()), mtime=0
        )
        for i in range(3)
    )
    recs = warc.parse_warc_records(members, "gz")
    assert [r["payload"] for r in recs] == [b"body 0", b"body 1", b"body 2"]


@pytest.mark.parametrize(
    "data,msg",
    [
        (b"HTTP/1.1 200 OK\r\n\r\n", "version line"),
        (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n", "no Content-Length"),
        (
            b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort",
            "truncated",
        ),
        (b"WARC/1.0\r\nContent-Length: 5", "unterminated"),
    ],
)
def test_malformed_raises(data, msg):
    with pytest.raises(ValueError, match=msg):
        warc.parse_warc_records(data, "bad")


def test_docs_to_warc_deterministic_and_partition_invariant(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {
        r["shard"]: bytes(r["content"])
        for r in warc.docs_to_warc(docs, n_shards=4).collect()
    }
    b = {
        r["shard"]: bytes(r["content"])
        for r in warc.docs_to_warc(docs.repartition(5), n_shards=4).collect()
    }
    assert a == b
    assert set(a) == {0, 1, 2, 3}
    # shard 0 holds docs 0 and 8, sorted by id
    recs = warc.parse_warc_records(a[0], "s0")
    assert [r["target_uri"] for r in recs] == [
        "https://corpus.example/doc/0",
        "https://corpus.example/doc/8",
    ]


def test_spark_roundtrip_with_compression(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    blobs = warc.docs_to_warc(docs, n_shards=2, compressed=True).select(
        F.col("shard").cast("string").alias("path"), "content"
    )
    recs = warc.parse_warc_blobs(blobs)
    got = {
        r["target_uri"]: bytes(r["payload"]) for r in recs.collect()
    }
    assert len(got) == len(DOCS)
    for i, t in DOCS:
        assert got[f"https://corpus.example/doc/{i}"] == (
            warc.HTTP_HEAD.encode() + t.encode()
        )


def test_read_warc_binaryfile(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_blob(DOCS[:2]))
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(_blob(DOCS[2:3]), mtime=0)
    )
    (tmp_path / "ignored.txt").write_bytes(b"not a warc")
    recs = warc.read_warc(spark, str(tmp_path)).collect()
    assert len(recs) == 3
    by_file = {}
    for r in recs:
        by_file.setdefault(r["path"].rsplit("/", 1)[-1], []).append(r)
    assert len(by_file["a.warc"]) == 2
    assert len(by_file["b.warc.gz"]) == 1
