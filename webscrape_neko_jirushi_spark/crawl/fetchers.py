"""Fetcher implementations (SURVEY.md §2.8 F3, §2.1 S3/S8).

P12 (the reference's ``json.dumps(search_cond)`` POST-body encode,
CS:121-124) lives in the HTTP fetcher's request construction; the
listing-page URL scheme of the mirror stands in for it in tests.

The engine is fetcher-agnostic: anything with
``fetch(selected: DataFrame) -> DataFrame`` adding (kind, status_code,
content_type, body) works. Three shapes:

- ``MirrorFetcher`` (crawl/engine.py): join against a pages table —
  the deterministic, scale-shaped default for tests/bench.
- ``PandasMirrorFetcher``: ``mapInPandas`` over the salted (host,
  shard) partitions probing a broadcast mirror dict — the exact
  execution shape of a real HTTP fetcher (per-partition sequential,
  politeness schedule enforceable with wall-clock sleeps), usable when
  the mirror fits in memory.
- ``HttpFetcher``: the real thing — requests.Session per partition,
  retry with jittered backoff (comprehensive_scraper.py:126-137),
  failures as data rows never task errors. Gated behind an import-try;
  NOT exercised in this sandbox (no network).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FETCH_COLS = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("priority", T.LongType()),
        T.StructField("epoch", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("api_image_1", T.StringType()),
        T.StructField("slot", T.IntegerType()),
        T.StructField("seq_in_host", T.IntegerType()),
        T.StructField("scheduled_ms", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)

_PASSTHROUGH = [f.name for f in _FETCH_COLS.fields[:12]]


class PandasMirrorFetcher:
    """mapInPandas fetch against a broadcast in-memory mirror.

    ``enforce_wall_clock=True`` sleeps each row to its token-bucket
    ``scheduled_ms`` (relative to the partition's first fetch) — the
    production politeness behavior; False (default) keeps the schedule
    virtual for tests/bench.
    """

    salted_input = True  # engine pre-partitions by (host, salt shard)

    def __init__(self, spark: SparkSession, mirror, enforce_wall_clock: bool = False):
        from ..fixtures import mirror as mirror_mod

        self._lookup = mirror_mod.lookup_page
        self.bc = spark.sparkContext.broadcast(mirror)
        self.enforce_wall_clock = enforce_wall_clock

    def fetch(self, selected: DataFrame) -> DataFrame:
        bc = self.bc
        lookup = self._lookup
        enforce = self.enforce_wall_clock

        def _fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            mirror = bc.value
            t0 = time.monotonic()
            for pdf in it:
                # within a partition fetch in schedule order (the
                # per-host sequential invariant, T3)
                pdf = pdf.sort_values(["host", "scheduled_ms", "seq_in_host"])
                kinds, statuses, cts, bodies = [], [], [], []
                for url, sched in zip(pdf["url"], pdf["scheduled_ms"]):
                    if enforce and sched > 0:
                        wait = sched / 1000.0 - (time.monotonic() - t0)
                        if wait > 0:
                            time.sleep(wait)
                    page = lookup(mirror, url)
                    kinds.append(page["kind"])
                    statuses.append(page["status_code"])
                    cts.append(page["content_type"])
                    bodies.append(page["body"])
                out = pdf[_PASSTHROUGH].copy()
                out["kind"] = kinds
                out["status_code"] = statuses
                out["content_type"] = cts
                out["body"] = bodies
                yield out

        return selected.select(*_PASSTHROUGH).mapInPandas(_fetch, _FETCH_COLS)


class HttpFetcher:
    """Real HTTP fetch stage: per-partition requests.Session, in-UDF
    retry (3 attempts, jittered 2-5 s backoff — the reference's policy,
    comprehensive_scraper.py:126-137), per-host politeness by the
    engine's schedule. Failures become fetch_log rows (status_code
    set, body None) — never Spark task failures.

    Sandbox note: NO network here; constructing is allowed (for plan
    shape tests), calling fetch() raises unless requests is importable
    and ``allow_network=True``.
    """

    salted_input = True

    def __init__(self, headers: dict | None = None, timeout: float = 30.0,
                 retries: int = 3, allow_network: bool = False):
        self.headers = headers or {}
        self.timeout = timeout
        self.retries = retries
        self.allow_network = allow_network

    def fetch(self, selected: DataFrame) -> DataFrame:
        if not self.allow_network:
            raise NotImplementedError(
                "HttpFetcher is the production fetch stage; this sandbox "
                "has no network. Use MirrorFetcher/PandasMirrorFetcher."
            )
        try:
            import requests  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError("requests not installed") from e

        headers, timeout, retries = self.headers, self.timeout, self.retries

        def _fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
            import random

            import requests

            session = requests.Session()
            session.headers.update(headers)
            t0 = time.monotonic()
            for pdf in it:
                pdf = pdf.sort_values(["host", "scheduled_ms", "seq_in_host"])
                kinds, statuses, cts, bodies = [], [], [], []
                for url, sched in zip(pdf["url"], pdf["scheduled_ms"]):
                    wait = sched / 1000.0 - (time.monotonic() - t0)
                    if wait > 0:
                        time.sleep(wait)
                    status, ct, body = None, None, None
                    for attempt in range(retries):
                        try:
                            resp = session.get(url, timeout=timeout)
                            status = resp.status_code
                            ct = resp.headers.get("content-type")
                            body = resp.text if status == 200 else None
                            break
                        except requests.RequestException:
                            if attempt < retries - 1:
                                time.sleep(random.uniform(2, 5))
                            else:
                                status = -1  # terminal network failure
                    kinds.append(
                        "listing" if "ajax" in url else
                        ("image" if (ct or "").startswith("image/") else "profile")
                    )
                    statuses.append(status)
                    cts.append(ct)
                    bodies.append(body)
                out = pdf[_PASSTHROUGH].copy()
                out["kind"] = kinds
                out["status_code"] = statuses
                out["content_type"] = cts
                out["body"] = bodies
                yield out

        return selected.select(*_PASSTHROUGH).mapInPandas(_fetch, _FETCH_COLS)
