"""HyperLogLog distinct-count sketch — relational, engine-portable,
mergeable. Spark ships ``approx_count_distinct`` (HLL++), but its
sketch lives inside an opaque JVM aggregate: you cannot persist the
registers next to a snapshot, merge yesterday's sketch with today's
delta, or re-check the estimate in another engine. This HLL is built
from the repo's portable 60-bit hash as PLAIN ROWS (bucket, rho), so
registers union across days/sources with one ``groupBy(bucket).max``
(the same incremental-maintenance pattern as the X15 index family)
and every step has a verbatim DuckDB twin.

Flajolet et al. 2007 with the standard small-range correction:
``bucket`` = top ``p`` hash bits, ``rho`` = leading-zero count of the
remaining ``60 - p`` bits + 1 (computed EXACTLY as ``width -
bit_length(rem) + 1`` — integer ops only, no log2 float edges),
``E = alpha_m * m^2 / sum(2^-register)`` with absent buckets counting
``2^0``, and linear counting ``m * ln(m / zeros)`` when ``E <=
2.5 m`` and empty registers exist.

Scale shape: one map-side projection + one ``m``-bounded hash
aggregate (hot buckets combine map-side); the register table is
``<= m`` rows no matter the corpus — the whole point at 100 TB.
Standard error ~ 1.04 / sqrt(m): p=12 -> ~1.6%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql

_HASH_BITS = 60  # portable_hash64 is a 60-bit nonnegative hash


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_registers(
    df: DataFrame, col: str, p: int = 12, salt: str = ""
) -> DataFrame:
    """(bucket, register) rows — only OCCUPIED buckets are present
    (absent bucket == register 0, the estimator accounts for them).
    Mergeable: union register tables and re-``groupBy(bucket).max``.
    NULL values are EXCLUDED on both engines (a NULL is not a
    distinct value — the X63 uniqueness convention): unfiltered,
    Spark emits a junk NULL-bucket row that inflates ``occupied``
    and shrinks ``zeros`` in the estimator, while DuckDB's CONCAT
    skips the NULL and hashes the bare salt into a REAL register —
    both estimates wrong, and differently."""
    if not 4 <= p <= 18:
        raise ValueError(f"hll_registers: need 4 <= p <= 18, got {p}")
    df = df.filter(F.col(col).isNotNull())
    width = _HASH_BITS - p
    h = portable_hash64(F.col(col).cast("string"), salt=salt)
    bucket = F.shiftright(h, width)
    rem = h.bitwiseAND(F.lit((1 << width) - 1))
    # exact leading-zero count: bit_length(rem) via length(bin()) —
    # bin(0) is "0" (length 1), so rem=0 needs the explicit width+1
    rho = F.when(rem == 0, width + 1).otherwise(
        width - F.length(F.bin(rem)) + 1
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(registers: DataFrame, p: int) -> DataFrame:
    """ONE-row estimate from a register table: ``m``, occupied
    bucket count, ``zeros``, the raw HLL estimate, and ``estimate``
    with the linear-counting small-range branch applied."""
    m = 1 << p
    alpha = _alpha(m)
    agg = registers.agg(
        F.count("*").alias("occupied"),
        # coalesce: an EMPTY register table (legitimately empty
        # day/source) must estimate 0 via the linear-counting branch,
        # not NULL-propagate through raw/estimate
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("register"))), F.lit(0.0)
        ).alias("_s"),
    )
    zeros = F.lit(m) - F.col("occupied")
    # absent buckets contribute 2^0 = 1 each
    raw = F.lit(alpha * m * m) / (F.col("_s") + zeros.cast("double"))
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("occupied"),
        zeros.alias("zeros"),
        raw.alias("raw_estimate"),
        est.alias("estimate"),
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union sketches (same p, same salt): elementwise register max."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("register").alias("register"))


def hll_registers_sql(col_expr: str, p: int, salt: str = "") -> str:
    """DuckDB twin of ``hll_registers`` (a SELECT producing
    (bucket, register) from table alias ``t``)."""
    width = _HASH_BITS - p
    h = portable_hash64_sql(f"CAST({col_expr} AS VARCHAR)", salt=salt)
    return f"""
      SELECT (h >> {width}) AS bucket,
             MAX(CASE WHEN (h & {(1 << width) - 1}) = 0 THEN {width + 1}
                      ELSE {width} - length(printf('%b', h & {(1 << width) - 1})) + 1
                 END) AS register
      FROM (SELECT {h} AS h FROM t WHERE {col_expr} IS NOT NULL) GROUP BY 1
    """


def hll_estimate_sql(registers_sql: str, p: int) -> str:
    """DuckDB twin of ``hll_estimate`` over a registers subquery."""
    m = 1 << p
    alpha = _alpha(m)
    return f"""
      SELECT {m} AS m, occupied, zeros, raw_estimate,
             CASE WHEN raw_estimate <= 2.5 * {m} AND zeros > 0
                  THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / zeros)
                  ELSE raw_estimate END AS estimate
      FROM (
        SELECT CAST(COUNT(*) AS BIGINT) AS occupied,
               CAST({m} - COUNT(*) AS BIGINT) AS zeros,
               {alpha * m * m!r} / (COALESCE(SUM(power(2.0, -register)), 0.0)
                                    + ({m} - COUNT(*))) AS raw_estimate
        FROM ({registers_sql})
      )
    """


def windowed_hll_registers(
    stream: DataFrame,
    ts_col: str,
    col: str,
    p: int = 12,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face: per-tumbling-window register tables over an
    event-time stream (distinct visitors/URLs per window at sketch
    cost). Pure builtin streaming ops — watermark + window + max —
    so state is bounded (<= m registers per open window) and late
    data folds in via the same register-max merge as ``hll_merge``.
    Feed any window's rows to ``hll_estimate`` for the count."""
    if not 4 <= p <= 18:
        raise ValueError(f"windowed_hll_registers: need 4 <= p <= 18, got {p}")
    width = _HASH_BITS - p
    h = portable_hash64(F.col(col).cast("string"))
    rem = h.bitwiseAND(F.lit((1 << width) - 1))
    rho = F.when(rem == 0, width + 1).otherwise(
        width - F.length(F.bin(rem)) + 1
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.shiftright(h, width).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(F.window(ts_col, window).alias("window"), F.col("bucket"))
        .agg(F.max("rho").alias("register"))
    )
