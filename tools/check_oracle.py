"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same sf dir; compare row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

from pyspark.sql.types import ArrayType, MapType, StructType  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from webscrape_neko_jirushi_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(rows, colnames) -> tuple[int, str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(norm_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(lines), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # the DRIVER's canonicalizer sorts result columns through
            # pandas and dies on list/struct/map cells (unhashable) —
            # fail the same way here so a non-scalar output column can
            # never look green locally and red in CORRECTNESS_r{N}.json
            bad = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if bad:
                print(
                    f"FAIL  {name}: non-scalar output columns {bad} "
                    "(driver canonicalizer cannot sort list cells — "
                    "serialize with to_json at the query boundary)"
                )
                failures.append(name)
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{t1-t0:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            failures.append(name)
            continue
        sn, sh = table_hash(srows, scols)
        dn, dh = table_hash(drows, dcols)
        status = "OK   " if (sn, sh) == (dn, dh) else "FAIL "
        print(f"{status} {name}: spark {sn} rows / duck {dn} rows hash "
              f"{'match' if sh == dh else f'{sh[:8]}!={dh[:8]}'} [{t1-t0:.1f}s]")
        if status.startswith("FAIL"):
            failures.append(name)
            # print a small diff sample
            sset = set(
                "|".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                for r in srows
            )
            dset = set(
                "|".join(norm_cell(r[i]) for i in sorted(range(len(dcols)), key=lambda i: dcols[i]))
                for r in drows
            )
            for x in list(sset - dset)[:3]:
                print(f"        spark-only: {x[:160]}")
            for x in list(dset - sset)[:3]:
                print(f"        duck-only : {x[:160]}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
