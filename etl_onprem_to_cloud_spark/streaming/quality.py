"""Streaming data-quality monitoring.

The batch expectation suite (``operators/quality.py``) evaluated per
micro-batch: a ``foreachBatch`` function that appends one report row
per (batch_id, check) to a parquet report table.  This is the
continuous-ingest counterpart of a gate -- a pipeline can alert on
``passed = false`` rows or compute violation-rate trends over
batch_id, without ever blocking the stream.

Scale shape: per batch it is the same single-pass conditional
aggregation as the batch suite (map-side partials, 1-row exchange,
unpivot to one row per check); the report write is batch-scoped
(``batch_id=<n>`` partition, overwrite) so crash-replays of a batch
rewrite the identical rows instead of duplicating them -- the same
idempotence contract as ``sinks.partitioned_parquet_writer``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.quality import Check, predicate_report


def quality_monitor_batch_fn(checks: list[Check], report_path: str):
    """foreachBatch function: evaluate ``checks`` on each micro-batch,
    write the per-check report under ``report_path/batch_id=<n>``."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        report = predicate_report(batch_df, checks).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("bigint")
        )
        report.write.mode("overwrite").parquet(
            f"{report_path}/batch_id={int(batch_id)}"
        )

    return fn


def monitor_stream_quality(
    stream_df: DataFrame,
    checks: list[Check],
    report_path: str,
    checkpoint_dir: str,
):
    """Attach a quality monitor to a streaming DataFrame.  Returns the
    started query (caller awaits/stops it).  Uses availableNow-friendly
    foreachBatch so the same code path serves tests and production."""
    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(quality_monitor_batch_fn(checks, report_path))
        .trigger(availableNow=True)
        .start()
    )
