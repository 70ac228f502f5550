"""Physical-plan inspection helpers.

The 100 TB contract is enforced here: tests assert that dimension joins
broadcast, that filters reach the parquet scan, and that Python never
appears in a hot path — not by eyeballing `.explain()` output but
programmatically, so a regression that silently de-broadcasts a join or
breaks pushdown fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the formatted plan."""
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def scans_columns(df: DataFrame) -> str:
    """ReadSchema line(s) — verifies column pruning reached the scan."""
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "ReadSchema" in line)


def has_python_eval(df: DataFrame) -> bool:
    """True when the plan contains a Python-worker stage (UDF boundary)."""
    plan = formatted_plan(df)
    return "BatchEvalPython" in plan or "ArrowEvalPython" in plan or "MapInPandas" in plan


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
