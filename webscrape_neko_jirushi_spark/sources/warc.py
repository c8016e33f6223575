"""WARC record source/sink — the container format 100 TB web corpora
actually arrive in (ISO 28500; Common Crawl publishes ~64k WARC files
per monthly crawl). The reference persists scraped pages as loose
image files + a JSON state blob (data_manager.py); a corpus-scale
pipeline instead reads framed records: this module parses the WARC
framing (version line, CRLF headers, Content-Length-delimited block,
CRLF CRLF trailer) from binary blobs, and writes it, so the rest of
the engine (X46 extraction -> X43 encoding -> dedup -> curation)
starts from the real on-disk shape.

Spark surface: ``read_warc`` scans a directory with ``binaryFile``
and explodes each file into records via Arrow-batched ``mapInPandas``
(one Python pass per FILE, not per record-field — the payload bytes
move through Arrow once); ``docs_to_warc`` builds deterministic WARC
shards from a documents table with ``applyInPandas`` (records sorted
by id within a shard, fixed timestamp — byte-reproducible output,
diffable across runs).

Parallelism note (the real-scale contract): WARC parallelizes per
FILE — the format has no intra-file split points without a CDX index
(record-gzip members are not seekable from byte offsets alone), and
every public Spark/CC pipeline shards by file. ``binaryFile`` gives
exactly that: one task per file, 64k files/crawl >> any cluster's
task slots. Per-record gzip members (``compressed=True``) decompress
with stdlib multi-member gzip.

Failure contract: a malformed version line or a truncated content
block raises (a silently half-read shard would vanish from the
corpus); records of unknown type are PRESERVED with their headers —
filtering is the caller's query, not the parser's policy.
"""

from __future__ import annotations

import gzip
import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def parse_warc_records(data: bytes, path: str = "") -> list[dict]:
    """Parse one WARC file's bytes into record dicts (RECORD_SCHEMA
    fields). Pure function of the bytes — unit-testable without
    Spark. Raises ValueError on framing violations."""
    if data[:2] == b"\x1f\x8b":  # gzip magic: multi-member stream
        data = gzip.decompress(data)
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        while data.startswith(CRLF, pos):  # inter-record separators
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError(f"{path}: unterminated WARC header at byte {pos}")
        lines = data[pos:hdr_end].decode("utf-8").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"{path}: expected WARC version line at byte {pos}, "
                f"got {lines[0][:40]!r}"
            )
        headers: dict[str, str] = {}
        for line in lines[1:]:
            key, _, val = line.partition(":")
            headers[key.strip().lower()] = val.strip()
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise ValueError(f"{path}: record at byte {pos} has no Content-Length")
        body_start = hdr_end + len(_HDR_END)
        payload = data[body_start : body_start + clen]
        if len(payload) != clen:
            raise ValueError(
                f"{path}: truncated record at byte {pos} "
                f"(want {clen} bytes, have {len(payload)})"
            )
        out.append(
            {
                "path": path,
                "record_idx": len(out),
                "warc_type": headers.get("warc-type"),
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "content_length": clen,
                "payload": payload,
            }
        )
        pos = body_start + clen
    return out


def parse_warc_blobs(blobs: DataFrame) -> DataFrame:
    """Explode (path, content) binary blobs into WARC records — one
    Arrow-batched Python pass per file blob."""

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RECORD_SCHEMA.fields]
        for pdf in it:
            rows: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_records(bytes(content), str(path)))
            yield pd.DataFrame(rows, columns=cols)

    return blobs.select("path", "content").mapInPandas(_parse, RECORD_SCHEMA)


def read_warc(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """Scan a WARC directory: one task per file (the format's real
    parallelism unit), records exploded via ``parse_warc_blobs``."""
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return parse_warc_blobs(blobs)


# --- deterministic writer (tests + the roundtrip driver query) --------

_FIXED_DATE = "2026-01-01T00:00:00Z"
HTTP_HEAD = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"


def warc_record_bytes(
    target_uri: str,
    payload: bytes,
    warc_type: str = "response",
    date: str = _FIXED_DATE,
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """One framed WARC record. The record id is content-derived
    (md5 of uri + payload) so output is byte-reproducible."""
    rid = hashlib.md5(target_uri.encode() + b"\x00" + payload).hexdigest()
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    )
    return head.encode() + payload + CRLF + CRLF


def docs_to_warc(
    documents: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    uri_prefix: str = "https://corpus.example/doc/",
    compressed: bool = False,
) -> DataFrame:
    """Documents -> (shard, content) WARC blobs: each doc becomes one
    response record (HTTP head + utf-8 text), records sorted by id
    within their ``id % n_shards`` shard — deterministic bytes on any
    partitioning. ``compressed`` gzips each record as its own member
    (the Common Crawl record-gzip layout), mtime pinned to 0 so the
    bytes stay reproducible."""

    def _build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        parts = []
        for i, txt in zip(pdf[id_col], pdf[text_col]):
            payload = HTTP_HEAD.encode() + ("" if txt is None else str(txt)).encode()
            rec = warc_record_bytes(f"{uri_prefix}{i}", payload)
            if compressed:
                rec = gzip.compress(rec, mtime=0)
            parts.append(rec)
        return pd.DataFrame(
            {"shard": [int(key[0])], "content": [b"".join(parts)]}
        )

    shard = (F.col(id_col) % n_shards).cast("int")
    return (
        documents.select(shard.alias("shard"), id_col, text_col)
        .groupBy("shard")
        .applyInPandas(_build, "shard int, content binary")
    )
