"""The epoch-loop crawl engine (SURVEY.md §3.2 Spark re-expression).

Each epoch is one batch DataFrame pipeline committed atomically:

    frontier(pending)
      -> bloom-prefiltered exact anti-join vs url_seen          (J1)
      -> per-host budget select + token-bucket schedule          (T3, O3)
      -> salted repartition fetch                                (S3/F3)
      -> from_json listing parse | mapInPandas span extraction   (S2, F2)
      -> discoveries: union + keep-min dedup + anti-join seen    (U1, J3)
      -> single snapshot commit: documents/url_seen/fetch_log/
         lineage appends + frontier replace                      (T2)

Also covers: S1 (paginated listing scan: ``next_pages``), S5 (outlink
scan via span children), S7 (API seed source: ``seed``), S11 (state
sinks = snapshot commits), T1 (the micro-batch epoch loop itself), T5
(failures become fetch_log rows, dead-lettered via anti-join), T6 (stop
conditions: frontier drain / target cap in ``run``), T7 (url_seen grows
monotonically across epochs), O1 (ascending page order via the priority
encoding below), O5 (target-count limit in ``run``), D1 (the 3-stage
discover->fetch->extract DAG chained in one epoch plan), D2 (stage
preconditions = snapshot version checks in ``seed``), D3 (config
cascade = constructor knobs), P11 (lineage ``committed_at``
timestamping).

The reference's analogue is the sequential loop at
comprehensive_scraper.py:301-336 (page -> profiles -> images, progress
saved per page); here the same traversal is a parallel wave per epoch
with identical final seen-set and per-host order (verified against
crawl/oracle.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import schemas
from ..functions.urls import canonicalize_url, host_col, url_hash_col
from ..operators.spans import extract_spans, parse_listing
from .bloom import BloomShards, CuckooShards
from .politeness import select_budget_annotated
from .snapshots import SnapshotStore

# priority encoding: children of a page get parent_priority * FANOUT +
# child_idx (idx < 4096); the NEXT listing page gets parent_priority + 1
# so an 11k-page pagination chain stays flat instead of exponentiating.
# Bounded to ~5 levels in a signed long — the test mirror's depth; at
# 10^10 scale the order key is the composite (depth, epoch, priority)
# columns, so the encoding only needs to be locally monotone.
FANOUT = 4096
SEEN_SHARDS = 64


class MirrorFetcher:
    """Deterministic fetch against the synthetic mirror: a left join on
    URL (the scale-shape of a fetch stage — candidates shuffle to the
    data, bodies never move twice). Unknown media-looking URLs resolve
    to synthetic image responses, everything else 404
    (fixtures.mirror.lookup_page semantics).

    ``co_partitions`` pre-hash-partitions AND caches the pages table on
    the join key once, so every epoch's fetch join elides the big-side
    exchange (only the small candidate side shuffles) and never rescans
    parquet — the bucketed-table pattern, in-memory.

    ``salted_input = False``: this fetcher joins by url, so the
    engine's (host, salt) repartition of candidates would be a wasted
    shuffle (an HTTP fetcher needs it; a join fetcher does not).
    """

    salted_input = False

    def __init__(self, pages: DataFrame, co_partitions: int | None = None):
        if co_partitions:
            pages = pages.repartition(co_partitions, "url").persist()
        self.pages = pages

    def fetch(self, selected: DataFrame) -> DataFrame:
        p = self.pages.select(
            F.col("url").alias("p_url"),
            F.col("kind").alias("p_kind"),
            F.col("status_code").alias("p_status"),
            F.col("content_type").alias("p_ct"),
            F.col("body").alias("p_body"),
        )
        j = selected.join(p, selected.url == p.p_url, "left")
        ext = F.lower(F.regexp_extract("url", r"\.([a-z0-9]+)\z", 1))
        is_image_url = ext.isin("jpg", "jpeg", "png", "webp", "gif")
        ct_map = F.when(ext.isin("jpg", "jpeg"), "image/jpeg").otherwise(
            F.concat(F.lit("image/"), ext)
        )
        return (
            j.withColumn(
                "kind",
                F.coalesce(
                    F.col("p_kind"), F.when(is_image_url, F.lit("image")).otherwise("missing")
                ),
            )
            .withColumn(
                "status_code",
                F.coalesce(
                    F.col("p_status"),
                    F.when(is_image_url, F.lit(200)).otherwise(404),
                ).cast("int"),
            )
            .withColumn(
                "content_type",
                F.coalesce(F.col("p_ct"), F.when(is_image_url, ct_map).otherwise("text/html")),
            )
            .withColumn("body", F.col("p_body"))
            .drop("p_url", "p_kind", "p_status", "p_ct", "p_body")
        )


@dataclass
class EpochStats:
    epoch: int
    selected: int
    fetched_ok: int
    failed: int
    documents: int
    discoveries: int
    pending_after: int


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        fetcher,
        host_budget: DataFrame,
        base_url: str,
        n_salts: int = 4,
        fetch_images: bool = True,
        bloom_fpr: float = 0.01,
        write_partitions: int | None = 8,
        collect_stats: bool = True,
        robots_map: dict[str, list[str]] | None = None,
        use_cuckoo: bool = False,
    ):
        self.spark = spark
        self.store = store
        self.fetcher = fetcher
        self.host_budget = host_budget
        self.base_url = base_url
        self.n_salts = n_salts
        self.fetch_images = fetch_images
        self.bloom_fpr = bloom_fpr
        self.write_partitions = write_partitions
        # False skips the optional per-epoch bookkeeping counts
        # (documents/discoveries in EpochStats become -1) — fewer
        # driver-serial jobs on the throughput path
        self.collect_stats = collect_stats
        # T4: robots cache — host -> disallowed path prefixes, applied as
        # a broadcast-map filter on candidates and on discoveries (north
        # rule; the reference sends polite headers but never parses
        # robots, comprehensive_scraper.py:32-42)
        self.robots_map = robots_map
        # one broadcast for the crawl's lifetime (the map is immutable)
        self._robots_bc = (
            spark.sparkContext.broadcast(robots_map) if robots_map else None
        )
        # driver-held incremental bloom over url_seen; rebuilt from the
        # committed seen table on resume, extended per epoch after that.
        # use_cuckoo swaps in deletion-capable cuckoo shards (recrawl
        # expiry deletes instead of forcing a rebuild); their per-epoch
        # insert/delete maintenance is distributed (per-shard
        # applyInPandas via CuckooShards.apply_delta — eviction chains
        # are shard-local, the driver only merges packed tables). Bloom
        # stays the default for its smaller per-shard footprint.
        self.use_cuckoo = use_cuckoo
        self._bloom: BloomShards | CuckooShards | None = None

    def _robots_filter(self, df: DataFrame) -> DataFrame:
        """Drop robots-disallowed rows (never fetched, never re-queued:
        a disallowed URL simply leaves the pipeline, like the
        reference's skip). robots_map is immutable for the crawl's
        lifetime (one broadcast at construction) — guard on the
        broadcast itself so a post-init mutation can't silently filter
        against stale rules or probe a missing broadcast."""
        if self._robots_bc is None:
            return df
        from .politeness import robots_allowed_bc

        return df.filter(
            robots_allowed_bc(F.col("url"), F.col("host"), self._robots_bc)
        )

    # -- state --------------------------------------------------------------
    def frontier(self) -> DataFrame:
        return self.store.read("frontier", schemas.FRONTIER)

    def url_seen(self) -> DataFrame:
        return self.store.read("url_seen", schemas.URL_SEEN)

    def documents(self) -> DataFrame:
        return self.store.read("documents", schemas.DOCUMENTS)

    def fetch_log(self) -> DataFrame:
        return self.store.read("fetch_log", schemas.FETCH_LOG)

    def media(self) -> DataFrame:
        return self.store.read("media", schemas.MEDIA)

    def lineage(self) -> DataFrame:
        return self.store.read("lineage", schemas.LINEAGE)

    def seed(self, seed_urls: list[str]) -> None:
        if self.store.version() > 0:
            return  # resume: state already committed
        rows = [(u, i + 1) for i, u in enumerate(seed_urls)]
        df = self.spark.createDataFrame(rows, "raw_url string, priority long")
        frontier = (
            df.withColumn("url", canonicalize_url(F.col("raw_url")))
            .withColumn("url_hash", url_hash_col(F.col("url")))
            .withColumn("host", host_col(F.col("url")))
            .withColumn("depth", F.lit(0))
            .withColumn("epoch", F.lit(0))
            .withColumn("status", F.lit("pending"))
            .withColumn("api_image_1", F.lit(None).cast("string"))
            .select([f.name for f in schemas.FRONTIER.fields])
        )
        self.store.commit(0, replaces={"frontier": frontier})

    def inject_probe_ranges(
        self, ranges: list[tuple[int, int]], step: int = 5, depth: int = 0
    ) -> int:
        """S6: union an ID-range probe sweep into the frontier
        (smart_cat_discovery.py:158-173). Probe URLs already seen,
        already pending, or previously failed (failures live in
        url_seen) are dropped by anti-join before the commit. Returns
        the number of injected URLs."""
        from .probe import id_range_probe

        epoch = self.store.epoch()
        probes = id_range_probe(
            self.spark, self.base_url, ranges, step, depth=depth, epoch=epoch
        )
        frontier = self.frontier()
        new = (
            probes.join(self.url_seen().select("url_hash"), "url_hash", "left_anti")
            .join(frontier.select("url_hash"), "url_hash", "left_anti")
            .persist()
        )
        n = new.count()
        if n:
            self.store.commit(
                epoch,
                replaces={"frontier": frontier.unionByName(new)},
                write_partitions=self.write_partitions,
            )
        new.unpersist()
        return n

    def _ensure_bloom(self) -> BloomShards | CuckooShards | None:
        """Driver-incremental bloom/cuckoo; distributed rebuild only on
        resume (both filters build per-shard via applyInPandas)."""
        if self._bloom is None:
            seen = self.url_seen()
            if self.use_cuckoo:
                if self.store.version() > 0:
                    # size shards for the seen count at ~80% target load
                    # (insert failure raises rather than dropping keys)
                    n = seen.count()
                    per_shard = max(1, (n // 16) + 1)
                    buckets = 1 << max(
                        16, (int(per_shard / (CuckooShards.SLOTS * 0.8)) - 1).bit_length()
                    )
                    self._bloom = CuckooShards.build(
                        seen, n_shards=16, n_buckets=buckets
                    )
                else:
                    self._bloom = CuckooShards.empty(n_shards=16, n_buckets=1 << 16)
            elif self.store.version() > 0:
                # resume path: one distributed build over the seen table
                self._bloom = BloomShards.build(
                    seen, n_shards=16, expected_per_shard=1 << 19, fpr=self.bloom_fpr
                )
            else:
                self._bloom = BloomShards.empty(
                    n_shards=16, expected_per_shard=1 << 19, fpr=self.bloom_fpr
                )
        return self._bloom

    # -- one epoch ------------------------------------------------------------
    def run_epoch(self) -> EpochStats:
        epoch = self.store.epoch() + 1
        pending = self.frontier()
        seen = self.url_seen()

        # J1: exact anti-join with sharded-bloom pre-filter. Bloom-negative
        # rows skip the join entirely; positives (incl. FPs) are re-checked
        # exactly, so the seen set stays exact.
        bloom = self._ensure_bloom()
        filt_state = getattr(bloom, "bits", None) or getattr(bloom, "tables", None)
        if bloom is not None and filt_state:
            flagged = bloom.prefilter(self.spark, pending)
            definite_new = flagged.filter(~F.col("bloom_maybe_seen")).drop("bloom_maybe_seen")
            maybe = (
                flagged.filter(F.col("bloom_maybe_seen"))
                .drop("bloom_maybe_seen")
                .join(seen.select("url_hash"), "url_hash", "left_anti")
            )
            candidates = definite_new.unionByName(maybe)
        else:
            candidates = pending
        candidates = self._robots_filter(candidates)  # T4

        # ONE cached DataFrame carries the bloom probe + ranking window;
        # selected/deferred are cheap filters over it (without this the
        # frontier commit recomputes the whole selection pipeline)
        annotated = select_budget_annotated(
            candidates, self.host_budget, self.n_salts
        ).persist()
        selected = annotated.filter(F.col("chosen"))
        deferred = annotated.filter(~F.col("chosen")).drop(
            "chosen", "slot", "seq_in_host", "scheduled_ms", "shard",
            "max_per_epoch", "min_delay_ms",
        )
        if getattr(self.fetcher, "salted_input", True):
            # salted repartition: spread one host's fetch work across
            # shards while select_budget's slot arithmetic keeps the
            # per-host politeness schedule exact (SURVEY §7.2 crux).
            # Join-based fetchers skip this (they reshuffle by url).
            selected = selected.repartition(
                max(self.spark.sparkContext.defaultParallelism, self.n_salts),
                "host",
                "shard",
            )
        fetched_full = self.fetcher.fetch(selected)
        # persist only body-free columns: bodies are huge and flow ONLY
        # into span extraction (one streaming pass join -> Arrow -> UDF);
        # caching them would dominate memory + serialization time
        fetched = fetched_full.drop("body").persist()
        # one combined count job (replaces separate count()s per branch)
        counts = fetched.agg(
            F.count("*").alias("n"),
            F.sum((F.col("status_code") == 200).cast("long")).alias("ok"),
        ).collect()[0]
        n_selected, n_ok = counts["n"], int(counts["ok"] or 0)
        if n_selected == 0:
            fetched.unpersist()
            annotated.unpersist()
            # nothing fetchable: frontier drained
            return EpochStats(epoch, 0, 0, 0, 0, 0, 0)

        ok = fetched.filter(F.col("status_code") == 200)

        # documents from profile pages (bodies stream straight from the
        # fetch join into the extraction UDF, never cached)
        profiles = fetched_full.filter(
            (F.col("status_code") == 200) & (F.col("kind") == "profile")
        )
        docs_with_meta = extract_spans(
            profiles.select("url", "body", "api_image_1", "depth", "priority"),
            self.base_url,
            passthrough=True,
        ).persist()
        docs = docs_with_meta.select("doc_id", "spans")

        # discoveries -----------------------------------------------------
        listings_full = fetched_full.filter(
            (F.col("status_code") == 200) & (F.col("kind") == "listing")
        )
        listing_rows = parse_listing(listings_full).join(
            ok.select(F.col("url").alias("listing_url"), "depth", "priority"),
            "listing_url",
        )
        child_profiles = listing_rows.filter(F.col("cat_id").isNotNull()).select(
            canonicalize_url(F.col("profile_path"), F.lit(self.base_url)).alias("url"),
            (F.col("depth") + 1).alias("depth"),
            (F.col("priority") * FANOUT + F.col("child_idx")).alias("priority"),
            F.col("image_1").alias("api_image_1"),
        )
        next_pages = (
            listing_rows.filter(F.col("page_now") < F.col("all_page"))
            .select("listing_url", "page_now", "depth", "priority")
            .distinct()
            .select(
                canonicalize_url(
                    F.concat(
                        F.lit(self.base_url + "/foster/cat/contents/?p="),
                        (F.col("page_now") + 1).cast("string"),
                    )
                ).alias("url"),
                F.col("depth").alias("depth"),
                (F.col("priority") + 1).alias("priority"),
                F.lit(None).cast("string").alias("api_image_1"),
            )
        )
        span_kinds = ["image", "link"] if self.fetch_images else ["link"]
        span_children = (
            docs_with_meta.select("depth", "priority", F.explode("spans").alias("s"))
            .filter(F.col("s.kind").isin(span_kinds))
            .select(
                F.col("s.media_ref").alias("url"),
                (F.col("depth") + 1).alias("depth"),
                (F.col("priority") * FANOUT + F.col("s.offset")).alias("priority"),
                F.lit(None).cast("string").alias("api_image_1"),
            )
        )

        discoveries = child_profiles.unionByName(next_pages).unionByName(span_children)
        discoveries = (
            discoveries.withColumn("url_hash", url_hash_col(F.col("url")))
            .withColumn("host", host_col(F.col("url")))
        )
        discoveries = self._robots_filter(discoveries)  # T4: never enqueued
        discoveries = (
            discoveries
            .withColumn("epoch", F.lit(epoch))
            .withColumn("status", F.lit("pending"))
        )
        # J3/U1: keep-min (depth, priority) per URL within the epoch, then
        # drop anything already seen, just fetched, or still pending
        w = Window.partitionBy("url_hash").orderBy("depth", "priority")
        discoveries = discoveries.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        ).drop("rn")
        just_fetched = fetched.select("url_hash")
        discoveries = (
            discoveries.join(seen.select("url_hash"), "url_hash", "left_anti")
            .join(just_fetched, "url_hash", "left_anti")
            .join(deferred.select("url_hash"), "url_hash", "left_anti")
            .select([f.name for f in schemas.FRONTIER.fields])
        )

        new_frontier = deferred.select(
            [f.name for f in schemas.FRONTIER.fields]
        ).unionByName(discoveries).persist()

        # commit ----------------------------------------------------------
        seen_append = fetched.select(
            "url_hash",
            F.pmod("url_hash", F.lit(SEEN_SHARDS)).cast("int").alias("shard"),
        )
        fetch_log_append = fetched.select(
            "url",
            "url_hash",
            "host",
            "status_code",
            "content_type",
            F.lit(epoch).alias("epoch"),
            F.col("seq_in_host").cast("long"),
            "scheduled_ms",
            F.lit(1).alias("attempt"),
            F.when(F.col("status_code") != 200, F.concat(F.lit("http_"), F.col("status_code"))).alias(
                "error"
            ),
        )
        lineage_append = (
            fetched.groupBy("shard", "host")
            .agg(
                F.count("*").alias("urls_in"),
                F.sum((F.col("status_code") == 200).cast("long")).alias("fetched"),
                F.sum((F.col("status_code") != 200).cast("long")).alias("failed"),
            )
            .select(
                F.lit(epoch).alias("epoch"),
                F.col("shard").alias("partition_id"),
                F.pmod(F.xxhash64("host"), F.lit(64)).cast("int").alias("host_shard"),
                "urls_in",
                "fetched",
                "failed",
                F.current_timestamp().alias("committed_at"),
            )
        )

        appends = {
            "url_seen": seen_append,
            "fetch_log": fetch_log_append,
            "documents": docs,
            "lineage": lineage_append,
        }
        if self.fetch_images:
            # S8: downloaded media as binary rows in the same atomic
            # commit (the reference's per-file disk writes,
            # comprehensive_scraper.py:233-259). The mirror serves no
            # real bytes, so the payload is a 16-byte md5-of-url stub
            # while size_bytes carries a deterministic pseudo-realistic
            # value (~1-49 KB) so downstream size-based cascades see a
            # plausible mix WITHOUT writing gigabytes of filler — a
            # production fetcher swaps in the response body (and then
            # len(content) == size_bytes); the sink (schema, append,
            # atomic commit) is the real path either way.
            n_rep = (F.pmod("url_hash", F.lit(3000)) + F.lit(63)).cast("int")
            appends["media"] = fetched.filter(
                (F.col("status_code") == 200) & (F.col("kind") == "image")
            ).select(
                "url",
                "url_hash",
                "content_type",
                (n_rep * 16).cast("long").alias("size_bytes"),
                F.to_binary(F.md5(F.col("url")), F.lit("hex")).alias("content"),
                F.lit(epoch).alias("epoch"),
            )
        self.store.commit(
            epoch,
            appends=appends,
            replaces={"frontier": new_frontier},
            write_partitions=self.write_partitions,
        )
        # post-commit bookkeeping: counts on persisted/parquet-metadata
        # inputs (cheap jobs) + distributed bloom delta: executors fold
        # the epoch's hashes into packed per-shard bitsets; the driver
        # only OR-merges a bounded n_shards * n_bits/8 bytes (never the
        # row stream — at 10^8 rows/epoch a toPandas() here would be
        # the driver bottleneck).
        n_pending_after = self.frontier().count()  # footer-only count
        if self.collect_stats:
            n_docs = docs.count()
            n_disc = n_pending_after - deferred.count()
        else:
            n_docs = -1
            n_disc = -1
        if self._bloom is not None:
            if hasattr(self._bloom, "merge_delta"):
                self._bloom.merge_delta(
                    self._bloom.build_delta(fetched.select("url_hash"))
                )
            else:
                # cuckoo: eviction chains are not OR-mergeable, but they
                # ARE shard-local — the delta inserts run per-shard in
                # applyInPandas (group = shard) and only the packed
                # tables come back (bounded bytes, same contract as the
                # bloom merge). A full shard raises inside the task: a
                # dropped fingerprint would read 'definitely unseen'
                # and duplicate fetches.
                self._bloom.apply_delta(
                    self.spark, fetched.select("url_hash"), op="insert"
                )
        fetched.unpersist()
        docs_with_meta.unpersist()
        annotated.unpersist()
        new_frontier.unpersist()
        return EpochStats(
            epoch=epoch,
            selected=n_selected,
            fetched_ok=n_ok,
            failed=n_selected - n_ok,
            documents=n_docs,
            discoveries=n_disc,
            pending_after=n_pending_after,
        )

    def run(
        self, max_epochs: int = 100, target_docs: int | None = None
    ) -> list[EpochStats]:
        stats: list[EpochStats] = []
        docs_total = self.documents().count() if target_docs is not None else 0
        pending = self.frontier().count()
        for _ in range(max_epochs):
            if target_docs is not None and docs_total >= target_docs:
                break
            if pending == 0:
                break
            s = self.run_epoch()
            stats.append(s)
            if s.documents >= 0:
                docs_total += s.documents
            elif target_docs is not None:
                # collect_stats=False reports documents=-1; a target cap
                # still needs a real count (footer-only metadata job)
                docs_total = self.documents().count()
            pending = s.pending_after
            if s.selected == 0:
                break
        return stats
