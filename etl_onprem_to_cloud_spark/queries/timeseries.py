"""Time-series and sampling queries (operators/timeseries.py,
operators/sampling.py): gap-filled resampling with LOCF, interval
containment joins, and deterministic stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..operators.sampling import duck_hash_gate, stratified_sample
from ..operators.timeseries import interval_join, resample_gapfill_locf
from ._util import cat, fmt_ts
from . import query


@query(
    "q_sample_stratified_docs",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE {duck_hash_gate('CAST(doc_id AS VARCHAR)')} <
  CASE lang WHEN 'en' THEN {int(0.5 * ((1 << 31) - 1))}
            WHEN 'es' THEN {int(0.3 * ((1 << 31) - 1))}
            ELSE {int(0.1 * ((1 << 31) - 1))} END
""",
    tags=("sampling", "ring-c"),
    description="Deterministic stratified sampling: hash-gate on doc_id "
    "with per-language rates (en 50%, es 30%, rest 10%); stable under "
    "repartitioning, unlike df.sample().",
)
def q_sample_stratified_docs(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "es": 0.3}, default_rate=0.1
    ).select("doc_id", "lang")


@query(
    "q_resample_hourly_locf",
    oracle="""
WITH pts AS (
  SELECT user_id AS key, date_trunc('hour', ts) AS bucket_start,
    count(*) AS n_points,
    sum(CAST(value AS DECIMAL(18,6))) AS value
  FROM events WHERE user_id % 50 = 0
  GROUP BY 1, 2
),
spans AS (
  SELECT key, min(bucket_start) AS lo, max(bucket_start) AS hi FROM pts GROUP BY 1
),
grid AS (
  SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start
  FROM spans
),
filled AS (
  SELECT g.key, g.bucket_start,
    coalesce(p.n_points, 0) AS n_points, p.value,
    last_value(p.value IGNORE NULLS) OVER (
      PARTITION BY g.key ORDER BY g.bucket_start
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS value_locf
  FROM grid g LEFT JOIN pts p USING (key, bucket_start)
)
SELECT key, strftime(bucket_start, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  n_points,
  CAST(round(value, 2) AS DOUBLE) AS value,
  CAST(round(value_locf, 2) AS DOUBLE) AS value_locf
FROM filled
""",
    tags=("time-series", "resample", "gapfill", "locf"),
    description="Hourly resample with full gap-filled grid per user and "
    "last-observation-carried-forward (operators/timeseries.py): the "
    "hypertable time_bucket_gapfill shape.",
)
def q_resample_hourly_locf(spark, sf_dir):
    ev = cat(spark, sf_dir).events.filter(F.col("user_id") % 50 == 0)
    out = resample_gapfill_locf(
        ev.withColumn("value_dec", dec("value")),
        key_col="user_id",
        ts_col="ts",
        value_col="value_dec",
        step="1 hour",
        agg="sum",
    )
    return out.select(
        "key",
        fmt_ts("bucket_start", "bucket_ts"),
        "n_points",
        F.round("value", 2).cast("double").alias("value"),
        F.round("value_locf", 2).cast("double").alias("value_locf"),
    )


@query(
    "q_interval_join_busy_hours",
    oracle="""
WITH busy AS (
  SELECT user_id AS b_user, date_trunc('hour', ts) AS win_start,
    date_trunc('hour', ts) + INTERVAL 1 HOUR - INTERVAL 1 MICROSECOND AS win_end,
    count(*) AS n_window_events
  FROM events GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT event_id, user_id,
  strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
  n_window_events
FROM events JOIN busy
  ON user_id = b_user AND ts >= win_start AND ts <= win_end
WHERE event_type = 'purchase'
""",
    tags=("time-series", "range-join", "interval"),
    description="Interval containment join: purchases mapped into their "
    "user's busy hours (>=3 events).  Equality key carries the shuffle; "
    "the range predicate filters within key groups, never a cartesian.",
)
def q_interval_join_busy_hours(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    hour = F.date_trunc("hour", F.col("ts"))
    busy = (
        ev.groupBy(F.col("user_id").alias("b_user"), hour.alias("win_start"))
        .agg(F.count(F.lit(1)).alias("n_window_events"))
        .filter(F.col("n_window_events") >= 3)
        .withColumn(
            "win_end",
            F.col("win_start")
            + F.expr("INTERVAL 1 HOUR")
            - F.expr("INTERVAL 1 MICROSECOND"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = interval_join(
        purchases,
        busy.withColumnRenamed("b_user", "user_id"),
        on=["user_id"],
        point_ts="ts",
        start_col="win_start",
        end_col="win_end",
    )
    return joined.select(
        "event_id",
        purchases["user_id"].alias("user_id"),
        fmt_ts("win_start", "window_start"),
        "n_window_events",
    )
