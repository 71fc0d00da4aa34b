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
    seen: set[int] = set()  # SparkPlan.id(): initial/executed plans share
    # nodes before execution; dedupe so each physical node reports once.
    while stack:
        node = stack.pop()
        nid = node.id()
        if nid in seen:
            continue
        seen.add(nid)
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            # Walk BOTH the initial plan and the current executed plan.
            # Before execution the two coincide; after execution the
            # executed plan is the AQE re-optimized tree, so a caller
            # checking a materialized DataFrame also covers runtime
            # rewrites.  (AQE preserves exchange output types, so the
            # initial plan alone was sound -- ADVICE r8 asked that the
            # guard not silently depend on that invariant.)  We never
            # touch finalPhysicalPlan, which would FORCE execution.
            stack.append(node.initialPlan())
            try:
                stack.append(node.executedPlan())
            except Exception:
                pass  # pre-4.x shims without the accessor
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


#: Fixture tables whose row counts scale linearly with SF.  nation and
#: region are FIXED catalogs (25 / 5 rows at every SF) and are absent.
CORPUS_TABLES = frozenset(
    {"customer", "supplier", "part", "orders", "lineitem",
     "documents", "embeddings", "events"}
)

#: Logical nodes that BOUND the rows flowing out of a subtree
#: independently of the corpus size underneath: a global/grouped
#: aggregate (output = one row, or one row per group over a
#: bounded-cardinality key -- the residual risk of a corpus-keyed
#: groupBy being re-broadcast is accepted and documented here) and
#: limits (top-k).
_BOUNDING_NODES = frozenset({"Aggregate", "GlobalLimit", "LocalLimit"})


def _leaf_source_names(node) -> set[str]:
    """Basenames (without extension) of the files a LEAF logical node
    reads, e.g. ``{"lineitem"}`` for a parquet scan of
    ``.../lineitem.parquet``; empty for in-memory leaves."""
    names: set[str] = set()
    try:
        paths = node.relation().location().rootPaths()
        for i in range(paths.size()):
            names.add(paths.apply(i).getName().split(".")[0])
        return names
    except Exception:
        pass
    for m in re.finditer(r"([A-Za-z0-9_]+)\.(?:parquet|csv|json|orc)", node.toString()):
        names.add(m.group(1))
    return names


def corpus_broadcast_hints(
    df: DataFrame, corpus_tables: frozenset[str] = CORPUS_TABLES
) -> list[str]:
    """``"hint->table"`` for every explicit broadcast hint in the
    ANALYZED logical plan whose subtree reaches a corpus-scaled fixture
    table without passing through a bounding node (aggregate / limit).

    The invariant behind the r8/r9 never-broadcast sweeps: an
    ``F.broadcast`` hint DISABLES the size estimator, so a hint on a
    relation that scales with the corpus passes every test SF and then
    builds a multi-GB broadcast at deployment scale -- the r8 sf100
    probe measured q18's hinted customer (15M rows) at scaling exponent
    1.25 vs 1.04 unhinted.  Hints on nation/region (fixed catalogs),
    1-row or grouped aggregates, and top-k outputs are legitimate and
    pass.  Walks subquery plans too.  Empty list = the plan obeys the
    rule.
    """
    out: list[str] = []
    hint_children = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if (
            node.nodeName() == "ResolvedHint"
            and "broadcast" in node.hints().toString().lower()
        ):
            hint_children.append(node.child())
        sq = node.subqueries()
        for i in range(sq.size()):
            stack.append(sq.apply(i))
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    for hc in hint_children:
        stack = [hc]
        while stack:
            node = stack.pop()
            if node.nodeName() in _BOUNDING_NODES:
                continue  # bounded: do not descend past it
            if node.children().size() == 0:
                for t in sorted(_leaf_source_names(node) & corpus_tables):
                    out.append(f"broadcast->{t}")
            # NOTE: expression subqueries are NOT walked here -- a
            # scalar/IN subquery inside a hinted subtree contributes a
            # value to a predicate, not rows to the broadcast build.
            ch = node.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
    return out


def unpartitioned_corpus_windows(
    df: DataFrame, corpus_tables: frozenset[str] = CORPUS_TABLES
) -> list[str]:
    """``"window->table"`` for every GLOBAL window (empty
    ``partitionBy``) in the analyzed logical plan whose input reaches
    a corpus-scaled fixture table without a bounding aggregate/limit.

    A window with no partition spec executes as ONE task holding every
    input row (`WindowExec: No Partition Defined` at runtime) -- fine
    over a bounded stream (a global rank of 25 nation rollups), a
    scale-killer over a corpus-width one (a global rank of raw
    lineitem never finishes at 100 TB).  Same bounding walk as
    :func:`corpus_broadcast_hints`: aggregates and limits between the
    window and the scan bound the stream; anything else corpus-rooted
    is flagged.  Sibling of the broadcast-hint guard, enforced
    registry-wide in tests/test_plans.py."""
    out: list[str] = []
    window_children = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().size() == 0:
            window_children.append(node.child())
        sq = node.subqueries()
        for i in range(sq.size()):
            stack.append(sq.apply(i))
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    for wc in window_children:
        stack = [wc]
        while stack:
            node = stack.pop()
            if node.nodeName() in _BOUNDING_NODES:
                continue
            if node.children().size() == 0:
                for t in sorted(_leaf_source_names(node) & corpus_tables):
                    out.append(f"window->{t}")
            # expression subqueries feed predicates, not window rows
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
