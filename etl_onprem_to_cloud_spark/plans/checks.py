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


def array_typed_exchanges(df: DataFrame) -> list[str]:
    """``"NodeName:column"`` for every array-typed column carried
    through any Exchange in the physical plan (empty = every shuffle
    moves only scalar columns).

    This is the invariant behind the count-carry verify
    (llm/dedup.count_carry_jaccard): both r7 sf100 failures -- the
    native path's 46 GB spill and the MLlib twin's 48 GB-heap hash-
    build OOM -- were shingle ARRAYS attached to corpus-scaled pair
    rows and pushed through shuffles.  Exchange-count budgets cannot
    catch a reintroduction (the skinny shape legitimately has MORE
    exchanges); the typed walk can.  Descends AQE initial plans,
    cached (pinned) relations' build plans, and subquery plans, so a
    pinned array relation that shuffles -- or one hidden in a scalar/
    IN subquery -- still trips it.  The type check is on the type's
    simpleString, so arrays NESTED inside structs/maps (and map
    columns, the other unbounded-width payload) are caught too: the
    r7 regression wrapped in a struct is still the r7 regression.
    """
    out: list[str] = []
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            stack.append(node.initialPlan())
        elif name == "InMemoryTableScan":
            stack.append(node.relation().cachedPlan())
        elif "Exchange" in name:
            attrs = node.output()
            for i in range(attrs.size()):
                a = attrs.apply(i)
                ts = a.dataType().simpleString()
                if "array<" in ts or "map<" in ts:
                    out.append(f"{name}:{a.name()}")
        sq = node.subqueries()
        for i in range(sq.size()):
            stack.append(sq.apply(i))
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters lists from every file scan in the plan -- the
    evidence that a filter on a partition column prunes DIRECTORIES
    (never reads the files) rather than rows."""
    plan = explain_str(df)
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
