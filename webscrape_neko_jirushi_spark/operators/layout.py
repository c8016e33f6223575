"""Z-order (Morton) data layout — multi-column scan pruning at write
time, the Delta/Iceberg ``OPTIMIZE ZORDER BY`` idea as a first-class
operator. Hash bucketing (``bucketing.py``) co-locates EQUALITY keys;
Z-order co-locates RANGE neighborhoods in SEVERAL columns at once:
interleaving the bits of k columns makes points close in any queried
column land in the same files/row-groups, so parquet min/max stats
prune a box predicate on ANY of the interleaved columns — the layout
fix for "we filter this 100 TB table by host AND by date AND by
size, and can't bucket on all three".

``morton_key`` is pure Column bit arithmetic (the classic
spread-bits magic numbers — 5 shift/mask steps per column, JVM-side
codegen, zero Python) and has a verbatim SQL twin, so the key itself
is oracle-checkable. ``zorder_write`` = ``repartitionByRange`` on the
key (contiguous key intervals per file) + ``sortWithinPartitions``
(contiguous intervals per ROW GROUP — parquet writes min/max stats
per group, so pushed predicates skip inside files too).

Out-of-domain inputs raise mid-plan (``raise_error`` column — a
value past ``bits`` would silently interleave garbage and file
placement would be wrong forever after; the write is the wrong place
to be lenient). Nonnegative ints only; map monotonically (dates ->
days, strings -> dictionary ranks) before interleaving.

Evidence contract (tests/test_layout.py): for a box predicate on
either column, the z-ordered layout touches a FRACTION of the files
a single-column sort touches, returning identical rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# spread the low 32 bits of x so consecutive bits land 2 apart
_SPREAD2 = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread2(x: Column) -> Column:
    # Column.bitwiseOR/AND, not |/& (those are boolean ops in PySpark)
    for shift, mask in _SPREAD2:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def _spread2_sql(e: str) -> str:
    for shift, mask in _SPREAD2:
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


def _guard(col: Column, name: str, bits: int) -> Column:
    bad = (col < 0) | (col >= F.lit(1 << bits))
    return F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(f"morton_key: {name} out of [0, 2^{bits}): "),
                col.cast("string"),
            )
        ).cast("long"),
    ).otherwise(col.cast("long"))


def morton_key(a: Column, b: Column, bits: int = 31) -> Column:
    """Interleave the low ``bits`` bits of two nonnegative integer
    columns into one long (a's bits at even positions): the 2-D
    Z-order key. ``bits <= 31`` keeps the result inside a signed
    int64. Out-of-domain values raise (see module docstring)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"morton_key: need 1 <= bits <= 31, got {bits}")
    return _spread2(_guard(a, "a", bits)).bitwiseOR(
        F.shiftleft(_spread2(_guard(b, "b", bits)), 1)
    )


def morton_key_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB twin of ``morton_key`` (same shifts, same masks; the
    domain guard is Spark-side — feed the twin in-domain exprs)."""
    return (
        f"({_spread2_sql(f'CAST({a_expr} AS BIGINT)')}"
        f" | ({_spread2_sql(f'CAST({b_expr} AS BIGINT)')} << 1))"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    n_files: int,
    bits: int = 31,
) -> None:
    """Write ``df`` z-ordered on (a, b): range-partitioned into
    ``n_files`` contiguous morton intervals (one file each), sorted
    within so every parquet row group covers a tight interval —
    min/max stats then prune box predicates on EITHER column."""
    keyed = df.withColumn("_z", morton_key(F.col(a), F.col(b), bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_touched(df: DataFrame) -> int:
    """How many distinct files contribute rows to this (filtered)
    scan — the layout-quality probe the tests assert on."""
    return (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )
