"""Portable deterministic hashing: identical in Spark and DuckDB.

Engine-internal identity uses the builtin ``xxhash64`` (fast, JVM-side),
but operators whose results are oracle-checked against DuckDB need a
hash BOTH engines compute bit-identically: md5 -> 15 hex chars -> int64
(60 bits, always positive).

Spark:  cast(conv(substr(md5(cast(x as binary)),1,15),16,10) as bigint)
DuckDB: CAST(CONCAT('0x', substr(md5(x),1,15)) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column, salt: str = "") -> Column:
    """60-bit deterministic hash of a string column (DuckDB-matchable)."""
    salted = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(salted.cast("binary")), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str, salt: str = "") -> str:
    """The matching DuckDB SQL fragment for ``portable_hash64``.

    NULL caveat: DuckDB's CONCAT skips NULL arguments, so on NULL
    input this fragment yields CAST('0x' AS BIGINT) — a conversion
    ERROR — while the Spark side NULL-propagates to NULL. Wrap in
    ``CASE WHEN <expr> IS NULL THEN NULL ELSE ... END`` when the
    column is nullable (fuzz-tested in test_fuzz_scalar.py)."""
    salted = f"CONCAT('{salt}', {expr})" if salt else expr
    return f"CAST(CONCAT('0x', substr(md5({salted}), 1, 15)) AS BIGINT)"
