"""Post-execution plan metrics -- "measure, don't guess" for shuffles.

``explain`` shows the plan you asked for; these helpers read what an
execution actually DID: bytes/records through every Exchange, spill
sizes, and rows out of every scan, pulled from the executed plan's
SQLMetrics after an action.  This is how the bench's shuffle-budget
claims get numbers attached (a q01 "one shuffle" assertion is a plan
property; "that shuffle moved 1.4 MB for 600k input rows" is a
measurement).

Usage::

    df = QUERIES["q01_pricing_summary"].fn(spark, sf_dir)
    m = execution_metrics(df)       # executes df's own plan JVM-side
    m["shuffle_bytes_written"]      # int: total across all exchanges
    m["spill_bytes"]                # int: disk+memory spill, 0 is the goal
    m["nodes"]                      # per-node [(name, {metric: value})]

The helper drives the DataFrame's OWN query execution
(``executedPlan().executeCollect()`` -- a Python-side ``df.count()``
would build a different aggregate plan whose metrics say nothing about
``df``), then walks the AQE FINAL plan (the tree actually run,
including inside materialized query stages).  Values are summed across
a node's SQLMetrics by metric *name*, so Spark-version metric renames
degrade to missing keys, not errors.

``executeCollect`` (not ``execute().count()``): counting the plan's
raw RDD runs OUTSIDE the SQL execution path and measured up to ~3x
slower on compute-heavy final stages (the round-4 rehearsal's one
SUPER-LINEAR flag, q_nb_calibration_bins 31s -> ~4s at sf1, was
entirely this harness artifact).  ``executeCollect`` is the same
adaptive SQL path ``df.collect()`` uses; results stay in the driver
JVM (never shipped to Python), so callers must pass bounded-output
plans -- which every report/top-k query here is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# executed-plan metric names -> summary keys (Spark 3.5/4.x names).
_SHUFFLE_WRITE = ("shuffle bytes written",)
_SHUFFLE_RECORDS = ("shuffle records written",)
_SPILL = ("spill size", "memory spilled", "disk spilled")
_SCAN_ROWS = ("number of output rows",)


def _walk(jnode):
    yield jnode
    it = jnode.children().iterator()
    while it.hasNext():
        yield from _walk(it.next())
    # AQE wraps executed subtrees: AdaptiveSparkPlanExec.executedPlan()
    # is the final tree; QueryStageExec.plan() is the stage's subtree;
    # ReusedExchangeExec.child() aliases the original exchange.  None of
    # these appear in children().
    cls = jnode.getClass().getName()
    for attr in ("executedPlan", "plan", "child"):
        if hasattr(jnode, attr) and (
            "adaptive" in cls or "ReusedExchange" in cls
        ):
            try:
                sub = getattr(jnode, attr)()
                if sub is not None and sub.getClass().getName().startswith(
                    "org.apache.spark.sql.execution"
                ):
                    yield from _walk(sub)
            except Exception:
                pass


def execution_metrics(df: DataFrame, execute: bool = True) -> dict:
    """Collect SQLMetrics from ``df``'s executed plan.  With
    ``execute=True`` (default) the plan is run first via the adaptive
    SQL path (``executeCollect``; rows stay in the driver JVM, never
    shipped to Python -- see module docstring for why not
    ``execute().count()``); pass False when an action on this exact
    DataFrame already ran."""
    jplan = df._jdf.queryExecution().executedPlan()  # type: ignore[attr-defined]
    if execute:
        jplan.executeCollect()
    totals = {
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "spill_bytes": 0,
        "scan_output_rows": 0,
    }
    nodes: list[tuple[str, dict[str, int]]] = []
    seen = set()
    for node in _walk(jplan):
        # Reused exchanges alias the same node: count each once.
        ident = node.id() if hasattr(node, "id") else id(node)
        if ident in seen:
            continue
        seen.add(ident)
        name = node.nodeName()
        vals: dict[str, int] = {}
        mit = node.metrics().iterator()
        while mit.hasNext():
            kv = mit.next()
            metric = kv._2()
            vals[str(metric.name().get() if metric.name().isDefined() else kv._1())] = (
                metric.value()
            )
        if vals:
            nodes.append((str(name), vals))
        for key, names_ in (
            ("shuffle_bytes_written", _SHUFFLE_WRITE),
            ("shuffle_records_written", _SHUFFLE_RECORDS),
            ("spill_bytes", _SPILL),
        ):
            for m in names_:
                if m in vals:
                    totals[key] += int(vals[m])
        if str(name).startswith("Scan") or "FileScan" in str(name):
            for m in _SCAN_ROWS:
                if m in vals:
                    totals["scan_output_rows"] += int(vals[m])
    totals["nodes"] = nodes
    return totals
