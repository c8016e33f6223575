"""Scale-adaptive scan fan-out (spark_optimization_guide.md §1.2 step 1,
§2.4, §6).

Parquet scans parallelize at file-split granularity, and a split can
never cut a row group in half: a table stored as ONE file with ONE row
group scans as ONE task no matter how many cores the session has. Every
map-side pipeline above such a scan — shingling + md5 MinHash,
SimHash token hashing, hyperplane projections, the image-analog
column block — then runs single-threaded on ``local[N]`` while N-1
cores idle. That is exactly the shape of the driver's sf tables
(one ~0.5-11 MB file, one row group each), and it is invisible in the
physical plan: the "before" plans are Exchange-free, which normally
reads as ideal but here means *no parallelism at all*.

``fan_out`` repairs it adaptively: if the DataFrame's physical plan
already yields at least the session's default parallelism in
partitions (the 100 TB case — a big scan produces thousands of
splits), it is returned UNCHANGED, so nothing here is tuned to local
mode. Only when the scan under-splits does it insert one explicit
hash repartition. Hash-on-a-key is chosen over round-robin
deliberately (guide §2.5): keyless ``repartition(n)`` pays a local
sort of the input for retry determinism (``sortBeforeRepartition``),
while hashing a deterministic high-cardinality key is retry-safe for
free and spreads evenly whenever the key has >> target distinct
values (every call site here keys on a row-unique id).

The repartition cost is one exchange of the *source columns actually
used* (Catalyst projects below the exchange), paid once, against a
per-row compute pipeline that is otherwise serialized; measured on the
sf0.1 tables this is 4-10x per query (e.g. minhash_signatures 3.7 s ->
0.4 s on local[32]).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_splits(spark: SparkSession, path: str) -> int:
    """Estimate how many scan partitions a parquet path will produce,
    from the filesystem alone (no Spark job, no plan compilation —
    ``df.rdd.getNumPartitions()`` gives the exact answer but costs
    ~0.5 s of plan/RDD conversion per call, more than the fan-out can
    save). Mirrors FilePartition packing: each file contributes
    ``ceil(size / maxPartitionBytes)`` splits. The estimate is an
    UPPER bound on useful parallelism (row-group boundaries can make
    some splits empty), so it errs toward fanning out — the safe
    direction, since ``fan_out`` is only called above per-row-heavy
    pipelines."""
    max_bytes = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    if os.path.isdir(path):
        sizes = [
            e.stat().st_size
            for e in os.scandir(path)
            if e.is_file() and not e.name.startswith(("_", "."))
        ]
    elif os.path.exists(path):
        sizes = [os.path.getsize(path)]
    else:  # non-local FS (hdfs://, s3://...): let the caller fan out
        return 1
    return max(1, sum(-(-s // max_bytes) for s in sizes))


def fan_out(
    df: DataFrame,
    *keys: str,
    target: int | None = None,
    splits: int | None = None,
) -> DataFrame:
    """Ensure ``df`` evaluates with at least ``target`` partitions
    (default: the session's ``defaultParallelism``).

    ``splits`` is the caller's estimate of the plan's current scan
    partition count (use :func:`scan_splits` on the input path); when
    it already reaches ``target`` — the 100 TB case, where scans
    naturally over-split — the DataFrame is returned UNCHANGED, so
    nothing here is tuned to local mode. ``keys`` should be
    deterministic, high-cardinality columns (a row id); they are
    hashed into ``target`` partitions. With no keys a round-robin
    repartition is used (pays the deterministic local pre-sort —
    prefer keys)."""
    spark = df.sparkSession
    n = target or spark.sparkContext.defaultParallelism
    if splits is not None and splits >= n:
        return df
    if keys:
        return df.repartition(n, *[F.col(k) for k in keys])
    return df.repartition(n)
