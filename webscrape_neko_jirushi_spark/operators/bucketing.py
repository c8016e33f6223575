"""Bucketed-table storage: amortize the join/agg shuffle ONCE at
write time.

Every equi-join and keyed aggregation in the engine shuffles both
sides on the key unless Spark can prove the data is already
distributed that way. At 100 TB the repeated ones dominate: the
crawl's per-epoch URL-seen anti-join re-shuffles the (growing) seen
set every epoch, and the dedup verify stages re-shuffle the corpus
for every candidate join. Bucketing is the storage-level fix Spark
ships for exactly this (`DataFrameWriter.bucketBy`, the Hive/Iceberg
bucket-transform equivalent): the table is written pre-hash-
partitioned into a FIXED number of buckets on the key, the layout is
recorded in the catalog, and from then on every equi-join between
co-bucketed tables and every groupBy on the bucket key plans with NO
Exchange on the bucketed side — the one-time write shuffle is
amortized over every subsequent query. (A ``repartition()`` achieves
the same distribution for ONE job; bucketing persists it across
jobs, sessions, and writers.)

Scale notes, in the order they bite:

- **Bucket count is frozen at write time** — size it with
  ``n_buckets_for`` so a bucket stays a few executor-task units of
  work at the table's TARGET size, not its current one. Joining two
  tables bucketed at DIFFERENT counts re-shuffles one side (Spark
  only plans bucket coalescing when one count divides the other), so
  standardize counts per key domain.
- **One file per bucket per write**: ``write_bucketed`` repartitions
  by the bucket expression before writing, otherwise every write
  task emits a file into every bucket (tasks x buckets small files —
  the classic bucketBy footgun).
- **The catalog entry, not the directory, carries bucketedness.**
  Spark's in-memory catalog dies with the session; the data files
  survive. ``register_bucketed`` re-declares an existing bucketed
  directory in a fresh session (schema inferred from the files) so
  the exchange-free plans come back without rewriting anything.
- Sort order within buckets (``SORTED BY``) is recorded but Spark
  still plans a Sort before a merge join by default
  (``spark.sql.legacy.bucketedTableScan.outputOrdering`` gates
  trusting it); the win this module defends is the absent Exchange,
  which the tests gate on the physical plan.

Reference parity: the reference has no storage layer at all (it
re-reads its JSON state files per script run — data_manager.py); this
module is part of the engine's 100-TB re-expression of that state,
alongside the snapshot store and the index manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def n_buckets_for(n_rows: int, rows_per_bucket: int = 4_000_000) -> int:
    """Bucket-count sizing rule (the ``lsh_bits_for`` discipline
    applied to storage): enough buckets that one bucket is a
    single-task unit of work at the table's target size. Size for the
    TABLE'S FUTURE — the count is frozen at write time and a too-small
    count turns buckets into skew at 100x growth, while a too-large
    one fragments small tables into empty files."""
    return max(4, -(-max(n_rows, 1) // rows_per_bucket))


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an EXTERNAL parquet table at ``path``, bucketed
    into ``n_buckets`` on ``bucket_cols`` and registered as ``table``
    in the session catalog. ``mode="overwrite"`` replaces both the
    catalog entry and the data; ``mode="append"`` adds files into the
    existing buckets (same hash function, so co-location is
    preserved — but each append adds one file per non-empty bucket,
    so compact periodically).

    The pre-write ``repartition`` puts each bucket's rows in exactly
    one task, so the table has one file per bucket per write — at
    100 TB that keeps the file count equal to the bucket count
    instead of (write parallelism x bucket count)."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.format("parquet")
        .mode(mode)
        .option("path", str(path))
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table)


def register_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Re-declare an existing bucketed directory as ``table`` in THIS
    session's catalog (schema inferred from the parquet files). The
    bucket spec must match what ``write_bucketed`` used — Spark trusts
    the declaration and routes rows by the recorded hash, so a wrong
    count or column silently breaks co-location (joins would return
    correct rows but plan an Exchange; a mismatched count against
    actually-written bucket file names is the dangerous case, which is
    why the spec belongs next to the path in caller config)."""
    schema_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in spark.read.parquet(str(path)).schema.fields
    )
    cluster = ", ".join(f"`{c}`" for c in bucket_cols)
    sort = ", ".join(f"`{c}`" for c in (sort_cols or bucket_cols))
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({cluster}) SORTED BY ({sort}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )
    return spark.table(table)
