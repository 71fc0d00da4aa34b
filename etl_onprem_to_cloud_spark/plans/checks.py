"""Physical-plan assertions.

Scale discipline is only real if it is enforced: these helpers read
``df.explain`` output so tests can assert that a dim join broadcasts,
a filter reaches the parquet scan, and no Python UDF sneaks into a hot
path (SURVEY.md section 4's anti-pattern list).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_python_udf(df: DataFrame) -> bool:
    plan = explain_str(df)
    return "BatchEvalPython" in plan or "ArrowEvalPython" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every scan node in the plan."""
    plan = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def shuffle_count(df: DataFrame) -> int:
    # simple mode lists each node once (formatted mode repeats nodes in
    # the detail section and would double-count).
    plan = explain_str(df, mode="simple")
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning", plan))


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters lists from every file scan in the plan -- the
    evidence that a filter on a partition column prunes DIRECTORIES
    (never reads the files) rather than rows."""
    plan = explain_str(df)
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
