"""Plan-quality helpers (SURVEY.md §4): the hand-rolled optimizations
the reference encodes in loop order must show up in the Catalyst
physical plan as pushdown/pruning/broadcast — these helpers make that
checkable in tests and during tuning.

- ``physical_plan``: formatted physical plan text
- ``pushed_filters`` / ``read_schema``: what reached the parquet scan
- ``has_broadcast_join`` / ``has_sort_merge_join``
- ``codegen_stage_count``: whole-stage codegen coverage
- ``python_eval_count``: how many Python-UDF eval nodes the plan has
  (0 for pure-Column operators — the 'UDFs are the slow path' check)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    plan = physical_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen subtree count. AQE hides codegen subtrees
    until execution, so the plan is re-derived with AQE off just for
    this introspection (the logical plan is identical)."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        fresh = df.filter(F.lit(True))  # new QueryExecution under AQE-off
        text = fresh._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            fresh._jdf.queryExecution(), "codegen"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0


def python_eval_count(df: DataFrame) -> int:
    plan = physical_plan(df)
    return len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges — the metric to minimize per §4.2."""
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", physical_plan(df)))
