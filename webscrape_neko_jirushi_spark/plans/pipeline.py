"""Complete-pipeline orchestrator (SURVEY.md §2.10 D1-D4; reference:
complete_pipeline.py:61-133 run_pipeline).

The reference chains three subprocess stages (scrape -> YOLO filter ->
reorganize) with file-existence preconditions and a JSON completion
report. Here the stages are DataFrame plans over the engine's committed
snapshot tables, each guarded by an explicit precondition (D2), with
stage flags + error strings accumulated into the one-row run report
(D4 via ``stats.run_report``):

1. **crawl**    — ``CrawlEngine.run`` (precondition: seeded frontier or
   resumable snapshot version).
2. **probe+clean** — binary media table -> ``multimodal.probe_images``
   (Arrow batches; PIL swap point) -> the advanced/aggressive cascade
   (pure Column).
3. **dedup**    — keep-first by content md5 (W1/F6).
4. **report**   — single-row aggregates broadcast-joined + config echo.

Everything between commits is one Catalyst plan per stage; no driver
loops over rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import cleaning, dedup, stats
from ..sources import multimodal


@dataclass
class PipelineResult:
    report: DataFrame
    survivors: DataFrame | None
    stages_completed: dict[str, bool] = field(default_factory=dict)
    errors: list[str] = field(default_factory=list)


class CompletePipeline:
    """D1: the 3-stage DAG with D2 preconditions and a D4 report."""

    def __init__(
        self,
        engine,
        cascade: str = "advanced",
        max_epochs: int | None = None,
        target_docs: int | None = None,
        config=None,
    ):
        """``config`` (a ``crawl.config.CrawlConfig``) supplies
        max_epochs/target_docs via the D3 cascade and is echoed into
        the run report; explicit kwargs still win (most-specific layer,
        None = not set — an explicit value is never overridden)."""
        if cascade not in ("advanced", "aggressive"):
            raise ValueError(f"unknown cascade {cascade!r}")
        self.engine = engine
        self.cascade = cascade
        self.config = config
        if max_epochs is None:
            max_epochs = config.max_epochs if config is not None else 50
        if target_docs is None and config is not None:
            target_docs = config.target_docs
        self.max_epochs = max_epochs
        self.target_docs = target_docs

    def run(self) -> PipelineResult:
        flags = {"scraping": False, "cleaning": False, "dedup": False}
        errors: list[str] = []

        # stage 1: crawl (D2: something to crawl or resume)
        if (
            self.engine.store.version() == 0
            and self.engine.frontier().limit(1).count() == 0
        ):
            errors.append("precondition failed: empty frontier and no snapshot")
            empty = self.engine.media().limit(0)
            return PipelineResult(
                stats.run_report(
                    empty.select(F.lit("none").alias("doc_id")),
                    errors=self.engine.spark.createDataFrame(
                        [(e,) for e in errors], "error string"
                    ),
                    config=self._config_echo(flags, errors),
                ),
                None,
                flags,
                errors,
            )
        self.engine.run(max_epochs=self.max_epochs, target_docs=self.target_docs)
        flags["scraping"] = True

        # stage 2: probe + clean (D2: media table committed).
        # A recrawl re-fetch appends a second media row for the same
        # url; keep only the latest epoch per url_hash so the probe's
        # path equi-join below stays 1:1 (a duplicated url would fan
        # out quadratically and inflate total_images/report counts).
        media = dedup.exact_dedup(
            self.engine.media(), "url_hash", [F.desc("epoch")]
        )
        if media.limit(1).count() == 0:
            errors.append("precondition failed: no media rows after crawl")
            cascaded = None
        else:
            probed = multimodal.probe_images(
                media.select(F.col("url").alias("path"), "content")
            ).drop("size_bytes")  # media.size_bytes is authoritative
            # (the sandbox payload is a 16-byte stub; a real fetcher's
            # len(content) equals it)
            imgs = (
                probed.join(
                    media.select(
                        F.col("url").alias("path"),
                        "url",
                        "content_type",
                        "content",
                        "size_bytes",
                    ),
                    "path",
                )
                .withColumn(
                    "filename", F.element_at(F.split(F.col("url"), "/"), -1)
                )
                .withColumn(
                    "doc_id",
                    F.coalesce(
                        F.nullif(
                            F.regexp_extract(F.col("url"), r"(?:cat|foster)_(\d+)", 1),
                            F.lit(""),
                        ),
                        F.lit("unknown"),
                    ),
                )
                .withColumn("md5", F.md5(F.col("content")))
            )
            cascade_fn = (
                cleaning.advanced_cascade
                if self.cascade == "advanced"
                else cleaning.aggressive_cascade
            )
            cascaded = cascade_fn(imgs)
            flags["cleaning"] = True

        # stage 3: dedup (D2: cleaning produced keepers)
        survivors = None
        if cascaded is not None:
            survivors = dedup.exact_dedup(
                cascaded.filter(F.col("keep")), "md5", ["url"]
            )
            flags["dedup"] = True

        # stage 4: report (always emitted — the reference reports even on
        # partial failure, complete_pipeline.py:134-202)
        base = (
            cascaded
            if cascaded is not None
            else self.engine.media().select(F.lit("none").alias("doc_id"))
        )
        report = stats.run_report(
            base,
            # the driver-side error strings become a (bounded) one-column
            # table so the report row carries the reference's 'errors'
            # array (complete_pipeline.py:164-179), not just n_errors
            errors=self.engine.spark.createDataFrame(
                [(e,) for e in errors], "error string"
            ),
            config=self._config_echo(flags, errors),
        )
        if survivors is not None:
            surv_agg = survivors.agg(F.count("*").alias("surviving_images"))
            report = report.crossJoin(F.broadcast(surv_agg))
        return PipelineResult(report, survivors, flags, errors)

    def _config_echo(self, flags: dict, errors: list[str]) -> dict:
        echo = {
            "cascade": self.cascade,
            "max_epochs": self.max_epochs,
            "scraping_completed": flags["scraping"],
            "cleaning_completed": flags["cleaning"],
            "dedup_completed": flags["dedup"],
            "n_errors": len(errors),
        }
        if self.config is not None:
            # D3 -> D4: the resolved cascade, echoed verbatim
            # (reference: configuration block of the completion report)
            for k, v in self.config.echo().items():
                echo.setdefault(k, v)
        return echo
