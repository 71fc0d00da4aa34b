"""Structured Streaming windows over the ``events`` table.

The reference is pure batch (its 5-minute Airflow cron is commented out,
reference dags/etl_csv_to_dwh.py:14); the PySpark-native engine gets
real streams.  Every aggregation here is written against an unbounded
DataFrame and therefore works identically in batch mode -- the batch
queries in queries.py reuse these functions, which is also how their
DuckDB oracles validate the streaming semantics.

Watermarking: ``withWatermark("ts", ...)`` bounds state for late data;
state size is O(active windows x keys), independent of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def stream_events(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over parquet event files (replay)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(events_dir)
    )


def _with_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    """Watermarks require TIMESTAMP (not TIMESTAMP_NTZ); with the
    engine's fixed UTC session time zone the cast is value-preserving."""
    if watermark is None:
        return events
    return events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Per (tumbling window, event_type): count + value sum."""
    src = _with_watermark(events, watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per (sliding window, event_type) count: each event lands in
    window/slide overlapping windows."""
    src = _with_watermark(events, watermark)
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session windows with a fixed inactivity gap: a new
    session starts when the gap since the previous event is >= ``gap``."""
    src = _with_watermark(events, watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# --- Custom stateful operator: per-user running totals kept in
# applyInPandasWithState (the escape hatch for semantics the built-in
# window aggregations can't express).

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def user_running_totals_stateful(events: DataFrame) -> DataFrame:
    """Streaming per-user lifetime counters via applyInPandasWithState.

    State is two scalars per user -- bounded by |users|, not stream
    length.  Batch-mode equivalent: groupBy(user_id).agg(count, sum).
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            ts_max = pdf["ts"].max()
            last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last_ts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithState twin: the arbitrary-state API that supersedes
# applyInPandasWithState (typed state handles, timers, state TTL).  Kept
# alongside the classic op so both stateful surfaces stay covered; needs
# the RocksDB state store provider (see user_running_totals_tws).

_TWS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

try:  # pyspark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-user lifetime (count, sum) in a typed ValueState."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, float(total)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [float(total)],
                }
            )

        def close(self) -> None:
            pass

    # The transformWithState wire protocol needs protobuf; without it
    # the driver worker crashes at init, so runnability is gated
    # separately from the API being importable.
    try:
        from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

        HAS_TWS = True
    except ImportError:  # pragma: no cover - container lacks protobuf
        HAS_TWS = False
except ImportError:  # pragma: no cover - pyspark < 4
    RunningTotalsProcessor = None
    HAS_TWS = False


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """user_running_totals_stateful re-expressed on transformWithState
    (same semantics, new API).  The session must run the RocksDB state
    store provider:

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    """
    if not HAS_TWS:
        raise NotImplementedError(
            "transformWithState needs pyspark >= 4.0 AND the protobuf "
            "package (its state-server wire protocol); this environment "
            "lacks one of them -- use user_running_totals_stateful, the "
            "applyInPandasWithState twin with identical semantics"
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=_TWS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def stream_dedup(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first arrival per key wins; duplicates
    arriving within the watermark window are dropped.

    State holds one entry per key seen inside the watermark horizon
    (dropDuplicatesWithinWatermark evicts beyond it), so state size is
    bounded by key arrival rate x watermark -- the streaming counterpart
    of llm/dedup.exact_dedup.
    """
    src = _with_watermark(events, watermark)
    return src.dropDuplicatesWithinWatermark(key_cols)


def stream_static_enrich(
    stream: DataFrame,
    static: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich each micro-batch against a batch-side
    dimension.  The static side is broadcast per micro-batch (re-read
    from source each trigger, so slowly-changing dims refresh without
    restarting the query)."""
    return stream.join(F.broadcast(static), on, how)
