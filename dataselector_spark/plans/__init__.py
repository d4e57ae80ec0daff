"""Physical-plan inspection helpers (SURVEY.md §4).

The reference has no optimizer; Catalyst is ours, but only if the plans we
declare actually optimize: filters must reach the parquet scan, small dims
must broadcast, global top-k must plan as TakeOrderedAndProject, expression
pipelines must stay inside WholeStageCodegen. These helpers turn those
expectations into assertions (tests/test_plans.py) so a regression in plan
shape fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan node in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings from every scan (column-pruning witness)."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    return physical_plan(df).count("WholeStageCodegen")


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (the scale currency)."""
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", physical_plan(df)))
