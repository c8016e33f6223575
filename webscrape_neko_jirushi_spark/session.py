"""SparkSession factory.

Local-mode defaults are tuned for the sandbox (single JVM, N threads);
on a real cluster the same builder is used with ``master`` unset so
spark-submit controls deployment. All engine code assumes only:
AQE on, Arrow on, UTC session timezone, shuffle partitions ~ cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "webscrape_neko_jirushi_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cores=None`` uses ``local[*]`` locally; an int pins ``local[N]``
    (used by the scaling bench to evidence N -> 4N efficiency).
    """
    if cores is None:
        env_cores = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env_cores}]" if env_cores else "local[*]"
        n_threads = int(env_cores) if env_cores else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n_threads = cores

    if shuffle_partitions is None:
        shuffle_partitions = max(n_threads, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(n_threads))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate clones the ENTIRE generator
        # expression into a `size(e) > 0 AND e IS NOT NULL` filter
        # below every explode, and filter pushdown then carries that
        # clone through projections and exchanges down to the scan —
        # where column-projection fixes no longer apply, so array
        # builders (shingles, bigrams, k-gram windows) are evaluated
        # a second time per row WITH the interpreted-HOF per-element
        # re-derivation this engine's projections exist to avoid
        # (r6; e.g. source_overlap_exact 5.0 s -> 1.9 s,
        # containment_pairs 6.1 s -> 1.4 s at sf0.1). The rule's only
        # benefit is skipping Generate input rows whose array is
        # empty/NULL — rows that produce zero output either way; no
        # result changes, and none of this engine's generators feed
        # from prunable scans. Scale-independent: the clone cost
        # grows WITH data, so the exclusion matters more at 100 TB,
        # not less.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # parquet scan batching: keep partitions bounded so 100TB scans
        # spill-free with default executor memory
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
