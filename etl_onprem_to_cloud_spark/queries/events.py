"""Event-stream queries: windowed aggregations with batch/streaming-
identical semantics (streaming/windows.py holds the streaming entry
points; these batch twins are what the DuckDB oracle validates), plus
JSON extraction over the ``props`` payload column.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..functions.numeric import dec
from ._util import cat, fmt_ts
from . import query


@query(
    "q_events_tumbling_hourly",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  count(*) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("events", "window-agg", "streaming-twin"),
    description="Tumbling 1h windows per event_type (streaming twin: "
    "streaming.tumbling_window_agg with a watermark).",
)
def q_events_tumbling_hourly(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("sum_value"),
        )
        .select(
            fmt_ts(F.col("w.start"), "window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_events_sliding_half_hour",
    oracle="""
WITH expanded AS (
  SELECT event_type,
    unnest([
      time_bucket(INTERVAL '30 minutes', ts),
      time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE
    ]) AS window_start
  FROM events
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type, count(*) AS n_events
FROM expanded
GROUP BY 1, 2
""",
    tags=("events", "window-agg", "streaming-twin"),
    description="Sliding 1h/30m windows: every event lands in 2 windows.",
)
def q_events_sliding_half_hour(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            fmt_ts(F.col("w.start"), "window_start"),
            "event_type",
            "n_events",
        )
    )


@query(
    "q_events_user_sessions",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
),
sessions AS (
  SELECT user_id, ts, value,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  count(*) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_id
""",
    tags=("events", "session-window", "streaming-twin"),
    description="Per-user session windows (10 min inactivity gap); "
    "streaming twin: streaming.session_window_agg.",
)
def q_events_user_sessions(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            fmt_ts(F.col("w.start"), "session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_events_user_stats",
    oracle="""
SELECT user_id,
  count(*) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM events
GROUP BY user_id
""",
    tags=("events", "agg", "streaming-twin"),
    description="Per-user lifetime counters (batch twin of the "
    "applyInPandasWithState operator in streaming/windows.py).",
)
def q_events_user_stats(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(dec("value")), 2).cast("double").alias("total_value"),
        fmt_ts(F.min("ts"), "first_ts"),
        fmt_ts(F.max("ts"), "last_ts"),
    )


@query(
    "q_events_json_extract",
    oracle="""
SELECT event_type,
  count(*) AS n_events,
  CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
  min(CAST(props->>'$.k' AS INTEGER)) AS min_k,
  max(CAST(props->>'$.k' AS INTEGER)) AS max_k,
  count(props->>'$.missing') AS n_missing
FROM events
GROUP BY event_type
""",
    tags=("events", "json"),
    description="JSON path extraction from the props payload column.",
)
def q_events_json_extract(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("int")
    missing = F.get_json_object("props", "$.missing")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count(missing).alias("n_missing"),
    )


@query(
    "q_asof_join_click_attribution",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
-- Pre-aggregate to one click per (user_id, ts): DuckDB's ASOF JOIN
-- leaves the pick among equal-ts rows undefined, while the Spark side
-- tiebreaks on max click_id; max(event_id) makes both deterministic.
c AS (
  SELECT user_id, ts, max(event_id) AS event_id
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
)
SELECT p.event_id AS purchase_id, p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
  c.event_id AS click_id,
  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    tags=("events", "asof", "join", "time-series"),
    description="As-of join: each purchase attributed to the user's most "
    "recent prior click (operators/asof.py union+window carry-forward; "
    "DuckDB ASOF LEFT JOIN oracle).",
)
def q_asof_join_click_attribution(spark, sf_dir):
    from ..operators.asof import asof_join_backward

    ev = cat(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join_backward(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id"],
        tiebreak="click_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        fmt_ts("ts", "purchase_ts"),
        "click_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_matched").cast("timestamp"))
        ).alias("gap_us"),
    )


@query(
    "q_events_json_struct",
    oracle="""
SELECT event_id,
  CAST(CAST(props AS JSON)->>'k' AS INT) AS k_parsed,
  to_json(struct_pack(k := CAST(CAST(props AS JSON)->>'k' AS INT))) AS reencoded,
  CAST(CAST(props AS JSON)->>'k' AS VARCHAR) AS k_str
FROM events
WHERE event_id % 40 = 0
""",
    tags=("events", "json", "from-json"),
    description="Schema-full JSON parsing: from_json -> typed struct "
    "field access, to_json re-encoding, json_tuple string extraction.",
)
def q_events_json_struct(spark, sf_dir):
    from pyspark.sql.types import IntegerType, StructField, StructType

    ev = cat(spark, sf_dir).events.filter(F.col("event_id") % 40 == 0)
    schema = StructType([StructField("k", IntegerType())])
    parsed = F.from_json("props", schema)
    return ev.select(
        "event_id",
        parsed["k"].alias("k_parsed"),
        F.to_json(F.struct(parsed["k"].alias("k"))).alias("reencoded"),
        F.json_tuple("props", "k").alias("k_str"),
    )


@query(
    "q_events_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.view_ts
  WHERE e.event_type = 'click' GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.click_ts
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT '1_view' AS stage, count(*) AS n_users FROM v
UNION ALL SELECT '2_click', count(*) FROM c
UNION ALL SELECT '3_purchase', count(*) FROM p
""",
    tags=("events", "funnel", "agg"),
    description="Ordered conversion funnel (view -> click -> purchase): a "
    "user advances a stage only with an event STRICTLY AFTER their "
    "previous stage's first event.  Three keyed min-aggregations chained "
    "by user_id -- each stage's table shrinks, so the joins get cheaper "
    "down the funnel; output unpivoted to (stage, n_users) via stack().",
)
def q_events_funnel(spark, sf_dir):
    ev = cat(spark, sf_dir).events.select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    f = (
        v.join(c.select("user_id", "click_ts"), "user_id", "left")
        .join(p.select("user_id", "purchase_ts"), "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_view"),
            F.sum(F.col("click_ts").isNotNull().cast("long")).alias("n_click"),
            F.sum(F.col("purchase_ts").isNotNull().cast("long")).alias("n_purchase"),
        )
    )
    return f.selectExpr(
        "stack(3, '1_view', n_view, '2_click', n_click, "
        "'3_purchase', n_purchase) AS (stage, n_users)"
    )


@query(
    "q_events_retention_cohorts",
    oracle="""
WITH f AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY 1
)
SELECT strftime(CAST(f.cohort_week AS DATE), '%Y-%m-%d') AS cohort_week,
  CAST(date_diff('day', CAST(f.cohort_week AS DATE),
    CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INTEGER) AS week_offset,
  count(DISTINCT e.user_id) AS n_active_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
""",
    tags=("events", "retention", "cohort", "agg"),
    description="Weekly retention cohorts: users bucketed by first-event "
    "ISO week, activity counted per (cohort, week offset) -- the classic "
    "retention matrix.  One keyed first-event agg broadcast back onto the "
    "event stream, then a two-key distinct-count; offsets are exact "
    "(both engines truncate weeks to Monday).",
)
def q_events_retention_cohorts(spark, sf_dir):
    ev = cat(spark, sf_dir).events.select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(firsts, "user_id")
        .select(
            F.date_format(F.col("cohort_week"), "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )


@query(
    "q_events_conversion_latency",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.view_ts
  WHERE e.event_type = 'purchase' GROUP BY 1
),
l AS (
  SELECT p.user_id,
    date_diff('second', v.view_ts, p.purchase_ts) AS latency_sec
  FROM p JOIN v USING (user_id)
)
SELECT count(*) AS n_converted,
  CAST(quantile_disc(latency_sec, 0.5) AS BIGINT) AS p50_sec,
  CAST(quantile_disc(latency_sec, 0.9) AS BIGINT) AS p90_sec,
  CAST(max(latency_sec) AS BIGINT) AS max_sec
FROM l
""",
    tags=("events", "funnel", "latency", "percentile"),
    description="Time-to-convert distribution: per user, seconds from "
    "first view to first subsequent purchase, reduced to discrete "
    "p50/p90/max.  Discrete percentiles are actual data values, so both "
    "engines agree exactly (no interpolation drift); the latency join "
    "reuses the funnel's first-event aggregations.",
)
def q_events_conversion_latency(spark, sf_dir):
    ev = cat(spark, sf_dir).events.select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    lat = p.join(v, "user_id").select(
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
        ).alias("latency_sec")
    )

    def disc(q):
        return F.expr(
            f"percentile_disc({q}) WITHIN GROUP (ORDER BY latency_sec)"
        )

    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        disc(0.5).cast("bigint").alias("p50_sec"),
        disc(0.9).cast("bigint").alias("p90_sec"),
        F.max("latency_sec").cast("bigint").alias("max_sec"),
    )


@query(
    "q_multitouch_attribution",
    oracle="""
WITH p AS (
  SELECT user_id, event_id, ts, value
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_id, event_type, ts
  FROM events WHERE event_type IN ('click', 'view')
),
pairs AS (
  SELECT p.event_id AS purchase_id, p.value, t.event_type,
    count(*) OVER (PARTITION BY p.event_id) AS n_touches
  FROM p JOIN t
    ON t.user_id = p.user_id
   AND floor(epoch(t.ts)) <= floor(epoch(p.ts))
   AND floor(epoch(t.ts)) > floor(epoch(p.ts)) - 3600
),
credits AS (
  SELECT event_type,
    CAST(floor(value / n_touches * 1000000.0 + 0.5) / 1000000.0
      AS DECIMAL(18,6)) AS credit
  FROM pairs
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_credited_touches,
  CAST(round(sum(credit), 2) AS DOUBLE) AS attributed_revenue
FROM credits GROUP BY event_type ORDER BY event_type
""",
    tags=("events", "attribution", "marketing", "range-join"),
    description=(
        "Linear multi-touch attribution: each purchase's revenue is "
        "split equally across the user's click/view touches in the "
        "preceding hour (second-truncated bounds, the session-gap "
        "convention), then attributed revenue rolls up per touch "
        "type -- the many-touch generalization of the last-touch "
        "as-of join (q_asof_join_click_attribution).  Per-credit "
        "amounts are quantized to the 1e-6 grid and accumulated as "
        "exact DECIMAL, so the split sums are order-independent "
        "cross-engine."
    ),
)
def q_multitouch_attribution(spark, sf_dir):
    """Equi-join on user_id (one co-partitioning shuffle) with the
    hour-window predicate inside the join -- the PIT-join shape, never
    a cross product; the per-purchase touch count is a window over the
    already-joined pairs partitioned by purchase id."""
    from pyspark.sql import Window

    ev = cat(spark, sf_dir).events
    es = F.unix_timestamp(F.col("ts").cast("timestamp"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        es.alias("p_es"),
        "value",
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        "event_type",
        es.alias("t_es"),
    )
    pairs = p.join(
        t,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_es") <= F.col("p_es"))
        & (F.col("t_es") > F.col("p_es") - 3600),
    ).withColumn(
        "n_touches",
        F.count(F.lit(1)).over(Window.partitionBy("purchase_id")),
    )
    credit = (
        F.floor(F.col("value") / F.col("n_touches") * F.lit(1e6) + F.lit(0.5))
        / F.lit(1e6)
    ).cast("decimal(18,6)")
    return (
        pairs.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credited_touches"),
            F.round(F.sum("credit"), 2).cast("double").alias("attributed_revenue"),
        )
        .orderBy("event_type")
    )


@query(
    "q_dedup_events_time_window",
    oracle="""
WITH b AS (
  SELECT event_type, user_id,
    CAST(floor(floor(epoch(ts)) / 300) AS BIGINT) AS win,
    event_id, ts
  FROM events
),
r AS (
  SELECT event_type,
    row_number() OVER (
      PARTITION BY user_id, event_type, win
      ORDER BY ts, event_id) AS rn
  FROM b
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM r GROUP BY event_type ORDER BY event_type
""",
    tags=("events", "dedup", "telemetry", "window"),
    description=(
        "Time-windowed telemetry dedup: within each 5-minute tumbling "
        "window, only the FIRST (ts, event_id)-ordered event per "
        "(user, type) survives -- the batch twin of streaming "
        "dropDuplicates-within-watermark, reported as kept/dropped "
        "counts per event type.  Window bounds use the second-"
        "truncation convention shared with the sessionizers."
    ),
)
def q_dedup_events_time_window(spark, sf_dir):
    """One shuffle on (user, type, window) for the ranking; the rollup
    reduces on the tiny type key.  The streaming twin
    (streaming/windows.stream_dedup) holds the same key in state with
    a watermark instead of a window column."""
    from pyspark.sql import Window

    ev = cat(spark, sf_dir).events
    b = ev.select(
        "event_type",
        "user_id",
        F.floor(
            F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(300)
        ).cast("bigint").alias("win"),
        "event_id",
        "ts",
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", "event_type", "win").orderBy(
            "ts", "event_id"
        )
    )
    r = b.withColumn("rn", rn)
    return (
        r.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum((F.col("rn") == 1).cast("int")).cast("bigint").alias("n_kept"),
            F.sum((F.col("rn") > 1).cast("int")).cast("bigint").alias("n_dropped"),
        )
        .orderBy("event_type")
    )


@query(
    "q_cohort_ltv_curve",
    oracle="""
WITH f AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY 1
),
wk AS (
  SELECT f.cohort_week,
    CAST(date_diff('day', CAST(f.cohort_week AS DATE),
      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INTEGER) AS week_offset,
    sum(CAST(e.value AS DECIMAL(18,6))) AS rev
  FROM events e JOIN f USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
),
sz AS (
  SELECT cohort_week, count(*) AS n_users FROM f GROUP BY 1
)
SELECT strftime(CAST(wk.cohort_week AS DATE), '%Y-%m-%d') AS cohort_week,
  week_offset,
  CAST(sz.n_users AS BIGINT) AS n_users,
  CAST(round(sum(rev) OVER (PARTITION BY wk.cohort_week
    ORDER BY week_offset ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE)
    AS cum_revenue,
  floor(CAST(sum(rev) OVER (PARTITION BY wk.cohort_week
    ORDER BY week_offset ROWS UNBOUNDED PRECEDING) AS DOUBLE)
    / sz.n_users * 10000.0 + 0.5) / 10000.0 AS ltv_per_user
FROM wk JOIN sz USING (cohort_week)
ORDER BY cohort_week, week_offset
""",
    tags=("events", "cohort", "ltv", "analytics", "window"),
    description=(
        "Cohort lifetime-value curve: purchase revenue accumulated per "
        "signup cohort (first-event ISO week) over weeks-since-signup, "
        "as cumulative totals and per-user LTV -- the revenue sibling "
        "of the retention matrix (q_events_retention_cohorts).  "
        "Cumulative sums stay exact DECIMAL until the final per-user "
        "division."
    ),
)
def q_cohort_ltv_curve(spark, sf_dir):
    """Same shuffle shape as retention: one first-event agg joined
    back, one (cohort, offset) rollup, then a window over the tiny
    cohort x offset grid."""
    from pyspark.sql import Window

    ev = cat(spark, sf_dir).events
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    wk = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.sum(dec("value")).alias("rev"))
    )
    sz = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("rev").over(w)
    return (
        wk.join(sz, "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
            F.round(cum, 2).cast("double").alias("cum_revenue"),
            (
                F.floor(
                    cum.cast("double") / F.col("n_users") * F.lit(1e4)
                    + F.lit(0.5)
                )
                / F.lit(1e4)
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "q_session_bounce_rate",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id,
    CASE WHEN floor(epoch(ts))
           - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)))
           > 1800
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events
),
s AS (
  SELECT user_id,
    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_no,
    ts
  FROM o
),
per AS (
  SELECT user_id, session_no, count(*) AS n_events,
    CAST(floor(floor(epoch(min(ts))) / 86400) AS BIGINT) AS day
  FROM s GROUP BY user_id, session_no
)
SELECT day,
  CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
  floor(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*) * 1000000.0 + 0.5) / 1000000.0 AS bounce_rate
FROM per GROUP BY day ORDER BY day
""",
    tags=("events", "sessionization", "bounce", "analytics"),
    description=(
        "Daily bounce rate: 30-minute-gap sessionization (the "
        "q_top_session_paths convention, second-truncated), a session "
        "is a bounce when it contains exactly one event; reported per "
        "session-start day -- the engagement KPI next to the retention "
        "matrix."
    ),
)
def q_session_bounce_rate(spark, sf_dir):
    """One (user) window shuffle for sessionization, one (user,
    session) rollup, one day rollup -- all key-partitioned."""
    from pyspark.sql import Window

    ev = cat(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    es = F.unix_timestamp(F.col("ts").cast("timestamp"))
    is_start = (
        lag_ts.isNull()
        | (es - F.unix_timestamp(lag_ts.cast("timestamp")) > 1800)
    ).cast("int")
    s = ev.withColumn("is_start", is_start).withColumn(
        "session_no",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per = s.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor(
            F.unix_timestamp(F.min("ts").cast("timestamp")) / F.lit(86400)
        ).cast("bigint").alias("day"),
    )
    bounce = (F.col("n_events") == 1).cast("int")
    return (
        per.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(bounce).cast("bigint").alias("n_bounces"),
            (
                F.floor(
                    F.sum(bounce).cast("double")
                    / F.count(F.lit(1))
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("bounce_rate"),
        )
        .orderBy("day")
    )


@query(
    "q_temporal_split_audit",
    oracle="""
WITH cut AS (
  SELECT date_trunc('day', max(ts)) - INTERVAL 7 DAY AS cutoff FROM events
),
tagged AS (
  SELECT CASE WHEN e.ts < c.cutoff THEN 'train' ELSE 'test' END AS split,
    e.ts, e.user_id
  FROM events e, cut c
),
overlap AS (
  SELECT CAST(count(*) AS BIGINT) AS overlap_users FROM (
    SELECT user_id FROM tagged GROUP BY user_id
    HAVING count(DISTINCT split) = 2
  )
)
SELECT t.split,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT t.user_id) AS BIGINT) AS n_users,
  strftime(min(t.ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
  strftime(max(t.ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
  o.overlap_users
FROM tagged t, overlap o
GROUP BY t.split, o.overlap_users
ORDER BY t.split
""",
    tags=("events", "eval", "split", "ring-c"),
    description=(
        "Temporal train/test split with a leakage audit: cutoff = "
        "last full day minus 7 days (derived from the data, so the "
        "split is reproducible without configuration), per-split "
        "event/user counts and time ranges, plus the cross-split user "
        "overlap -- the contamination surface that decides whether "
        "user-level features can be trained on the past and evaluated "
        "on the future.  The TIME-based sibling of the hash-gate "
        "q_split_train_val_test."
    ),
)
def q_temporal_split_audit(spark, sf_dir):
    """One pass tags events against the broadcast 1-row cutoff; the
    audit is two keyed aggregations (split, user) over the tagged
    relation -- the tag predicate is scan-inlined, so at 100 TB this
    is a full scan plus two shuffles on bounded keys."""
    ev = cat(spark, sf_dir).events
    cut = ev.agg(
        (F.date_trunc("day", F.max("ts")) - F.expr("INTERVAL 7 DAYS")).alias(
            "cutoff"
        )
    )
    tagged = ev.crossJoin(F.broadcast(cut)).select(
        F.when(F.col("ts") < F.col("cutoff"), "train")
        .otherwise("test")
        .alias("split"),
        "ts",
        "user_id",
    )
    overlap = (
        tagged.groupBy("user_id")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") == 2)
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap_users"))
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            fmt_ts(F.min("ts"), "first_ts"),
            fmt_ts(F.max("ts"), "last_ts"),
        )
        .crossJoin(F.broadcast(overlap))
        .orderBy("split")
    )


@query(
    "q_km_survival_first_purchase",
    oracle="""
WITH u AS (
  SELECT user_id,
    min(ts) AS t0,
    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
  FROM events GROUP BY user_id
),
horizon AS (SELECT max(ts) AS tmax FROM events),
d AS (
  SELECT
    CASE WHEN u.tp IS NOT NULL
      THEN CAST(floor((floor(epoch(u.tp)) - floor(epoch(u.t0))) / 3600) AS BIGINT)
      ELSE CAST(floor((floor(epoch(h.tmax)) - floor(epoch(u.t0))) / 3600) AS BIGINT)
    END AS dur_h,
    CASE WHEN u.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM u, horizon h
),
g AS (
  SELECT dur_h,
    CAST(sum(ev) AS BIGINT) AS d_i,
    CAST(count(*) AS BIGINT) AS leave_i
  FROM d GROUP BY dur_h
),
r AS (
  SELECT dur_h, d_i,
    CAST((SELECT count(*) FROM d) AS BIGINT)
      - CAST(coalesce(sum(leave_i) OVER (ORDER BY dur_h
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS n_risk
  FROM g
),
f AS (
  SELECT dur_h, d_i, n_risk,
    CAST(floor(ln(CAST(n_risk - d_i AS DOUBLE) / n_risk) * 1000000.0 + 0.5)
      AS BIGINT) AS qln_f
  FROM r WHERE d_i > 0 AND n_risk > d_i
)
SELECT dur_h, d_i, n_risk,
  CAST(sum(qln_f) OVER (ORDER BY dur_h) AS BIGINT) AS log_surv_q
FROM f ORDER BY dur_h
""",
    tags=("events", "stats", "survival", "ring-c"),
    description=(
        "Kaplan-Meier estimator of time to first purchase (hours from "
        "a user's first event; users without a purchase are censored "
        "at the observation horizon): per event-time at-risk counts "
        "and events are exact BIGINTs, and the survival curve is "
        "carried as the CUMULATIVE FIXED-POINT LOG "
        "(sum of floor(ln((n-d)/n)*1e6+0.5)) -- the engine-portable "
        "form of the KM product, same quantized-ln convention as the "
        "NB classifier (documented ~1e-9/term ulp risk).  S(t) = "
        "exp(log_surv_q/1e6) downstream.  Times where n_risk = d_i "
        "(the curve hits zero) are excluded from the log-domain "
        "output, as are pure-censoring times, per the standard "
        "estimator."
    ),
)
def q_km_survival_first_purchase(spark, sf_dir):
    """One shuffle to per-user first-event/first-purchase, then the
    per-duration rollup (bounded domain: hours) and two windows over
    that bounded relation -- the KM curve costs one user-keyed pass at
    any corpus size."""
    from pyspark.sql import Window

    ev = cat(spark, sf_dir).events
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "tp"
        ),
    )
    horizon = ev.agg(F.max("ts").alias("tmax"))
    sec = lambda c: F.floor(F.unix_timestamp(c).cast("double"))
    d = u.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("tp").isNotNull(),
            F.floor((sec(F.col("tp")) - sec(F.col("t0"))) / 3600),
        )
        .otherwise(F.floor((sec(F.col("tmax")) - sec(F.col("t0"))) / 3600))
        .cast("bigint")
        .alias("dur_h"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    g = d.groupBy("dur_h").agg(
        F.sum("ev").cast("bigint").alias("d_i"),
        F.count(F.lit(1)).cast("bigint").alias("leave_i"),
    )
    total = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    w_prior = Window.orderBy("dur_h").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = g.crossJoin(F.broadcast(total)).select(
        "dur_h",
        "d_i",
        (
            F.col("n_total")
            - F.coalesce(F.sum("leave_i").over(w_prior), F.lit(0))
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    f = r.filter((F.col("d_i") > 0) & (F.col("n_risk") > F.col("d_i"))).select(
        "dur_h",
        "d_i",
        "n_risk",
        F.floor(
            F.log((F.col("n_risk") - F.col("d_i")).cast("double") / F.col("n_risk"))
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("qln_f"),
    )
    w_cum = Window.orderBy("dur_h").rowsBetween(Window.unboundedPreceding, 0)
    return f.select(
        "dur_h",
        "d_i",
        "n_risk",
        F.sum("qln_f").over(w_cum).cast("bigint").alias("log_surv_q"),
    ).orderBy("dur_h")


_CF_CAP = 50  # max items per user entering the pair fan-out

# Shared model definition for the CF family: distinct (user, item)
# interactions, deterministic per-user cap, co-occurrence counts and
# the micro-unit-quantized binary cosine.  ONE string feeds both the
# ranked-similarity oracle (q_item_item_cf) and the serving oracle
# (q_user_recs_topn), and ONE Spark builder (_cf_sim) feeds both
# query functions, so the model and its serving layer cannot drift.
_CF_SIM_CTE = f"""ui AS (
  SELECT DISTINCT user_id, CAST(props->>'$.k' AS INTEGER) AS item
  FROM events
  WHERE event_type IN ('purchase', 'view')
    AND (props->>'$.k') IS NOT NULL
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
      row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
    FROM ui
  ) WHERE rn <= {_CF_CAP}
),
n AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_u FROM capped GROUP BY item
),
co AS (
  SELECT a.item AS item_a, b.item AS item_b,
    CAST(count(*) AS BIGINT) AS co_users
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY a.item, b.item
),
sim AS (
  SELECT co.item_a, co.item_b, co.co_users,
    CAST(floor(CAST(co.co_users AS DOUBLE)
        / sqrt(CAST(na.n_u AS DOUBLE) * nb.n_u) * 1000000.0 + 0.5) AS BIGINT)
      AS sim_q
  FROM co
  JOIN n na ON na.item = co.item_a
  JOIN n nb ON nb.item = co.item_b
)"""


def _cf_capped(ev):
    """Distinct (user, item) interactions with the deterministic
    per-user item cap -- the input relation of the CF model."""
    from pyspark.sql import Window

    ui = (
        ev.filter(
            F.col("event_type").isin("purchase", "view")
            & F.get_json_object("props", "$.k").isNotNull()
        )
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .distinct()
    )
    return (
        ui.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("item")
            ),
        )
        .filter(F.col("rn") <= _CF_CAP)
        .select("user_id", "item")
    )


def _cf_sim(capped):
    """Item-pair co-occurrence cosine over `capped`, quantized to
    BIGINT micro-units (sim_q).  Columns: item_a < item_b, co_users,
    sim_q.  The n_u relation is item-domain-sized and broadcasts; the
    pair fan-out is bounded at cap^2/2 per user."""
    n = capped.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_u")
    )
    a = capped.select("user_id", F.col("item").alias("item_a"))
    b = capped.select("user_id", F.col("item").alias("item_b"))
    co = (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co_users"))
    )
    return (
        co.join(
            F.broadcast(
                n.select(F.col("item").alias("item_a"), F.col("n_u").alias("na"))
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                n.select(F.col("item").alias("item_b"), F.col("n_u").alias("nb"))
            ),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "co_users",
            F.floor(
                F.col("co_users").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb"))
                * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("sim_q"),
        )
    )


@query(
    "q_item_item_cf",
    oracle=f"""
WITH {_CF_SIM_CTE}
SELECT item_a, item_b, co_users,
  CAST(sim_q AS DOUBLE) / 1000000.0 AS cosine,
  CAST(row_number() OVER (ORDER BY sim_q DESC, item_a, item_b) AS BIGINT)
    AS rank
FROM sim
QUALIFY rank <= 20
ORDER BY rank
""",
    tags=("events", "recsys", "similarity", "ring-c"),
    description=(
        "Item-item collaborative filtering: binary co-occurrence "
        "cosine between items over the users who interacted with both "
        "(co / sqrt(n_a * n_b) -- counts exact, sqrt IEEE-correctly-"
        "rounded, one portable floor-round), top-20 pairs.  The "
        "classic recsys similarity primitive, computed as the "
        "pairs-within-user fan-out with a deterministic per-user item "
        f"cap ({_CF_CAP}) so a power user cannot go quadratic -- the "
        "same bounding discipline as the contrastive-pair miner."
    ),
)
def q_item_item_cf(spark, sf_dir):
    """Shuffles: distinct (user, item), the capped rank window per
    user, one user-keyed self-join whose fan-out is <= cap^2/2 per
    user, then the (item_a, item_b) rollup -- every stage keyed and
    bounded; the n_u relation is item-domain-sized and broadcasts.
    The model build is the shared _cf_sim (one implementation with
    q_user_recs_topn's serving layer)."""
    from pyspark.sql import Window

    ev = cat(spark, sf_dir).events
    s = _cf_sim(_cf_capped(ev))
    w = Window.orderBy(F.desc("sim_q"), "item_a", "item_b")
    return (
        s.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 20)
        .select(
            "item_a",
            "item_b",
            "co_users",
            (F.col("sim_q").cast("double") / F.lit(1e6)).alias("cosine"),
            "rank",
        )
        .orderBy("rank")
    )


@query(
    "q_user_recs_topn",
    oracle=f"""
WITH {_CF_SIM_CTE},
both_dir AS (
  SELECT item_a AS owned, item_b AS cand, sim_q FROM sim
  UNION ALL
  SELECT item_b, item_a, sim_q FROM sim
),
q AS (SELECT user_id, item FROM capped WHERE user_id % 29 = 0),
scored AS (
  SELECT q.user_id, b.cand,
    CAST(sum(b.sim_q) AS BIGINT) AS score_q
  FROM q JOIN both_dir b ON b.owned = q.item
  WHERE NOT EXISTS (
    SELECT 1 FROM capped o
    WHERE o.user_id = q.user_id AND o.item = b.cand
  )
  GROUP BY q.user_id, b.cand
)
SELECT user_id, cand AS item,
  CAST(score_q AS DOUBLE) / 1000000.0 AS score,
  CAST(row_number() OVER (PARTITION BY user_id
                          ORDER BY score_q DESC, cand) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY user_id, rank
""",
    tags=("events", "recsys", "ring-c"),
    description=(
        "Top-5 item recommendations per query user (every 29th) from "
        "the item-item cosine matrix: candidate score = sum of "
        "similarities to the user's owned items, owned items excluded "
        "by anti-join.  Each cosine quantizes to BIGINT micro-units "
        "BEFORE the sum, so scores are exact integer sums in any "
        "aggregation order -- the serving-side composition over "
        "q_item_item_cf's similarity model."
    ),
)
def q_user_recs_topn(spark, sf_dir):
    """The sim build is the shared _cf_sim (q_item_item_cf's bounded
    shape -- one implementation, so the ranked-similarity query and
    this serving layer cannot drift); serving is a join on the
    owned-item key, an anti-join against owned, one (user, candidate)
    rollup and a per-user rank window.  both_dir is item-PAIR-sized
    (2x the observed co-pair table, worst-case quadratic in the item
    domain), so it is NOT broadcast-hinted: AQE broadcasts it when
    runtime stats say it fits and shuffle-joins on `owned` otherwise,
    which is the correct plan at any catalog size."""
    from pyspark.sql import Window

    ev = cat(spark, sf_dir).events
    capped = _cf_capped(ev)
    sim = _cf_sim(capped).select("item_a", "item_b", "sim_q")
    # Both orientations via explode-of-array rather than a unionAll of
    # two projections: a union's branches are separate subtrees, so
    # the whole CF build (scan -> distinct -> cap window -> self-join
    # -> rollup) would execute TWICE (measured 12.1s vs 5.4s at the
    # sf1 rehearsal); the explode doubles rows in-place on one
    # subtree.
    both_dir = sim.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("owned"),
                    F.col("item_b").alias("cand"),
                    F.col("sim_q"),
                ),
                F.struct(
                    F.col("item_b").alias("owned"),
                    F.col("item_a").alias("cand"),
                    F.col("sim_q"),
                ),
            )
        ).alias("e")
    ).select("e.owned", "e.cand", "e.sim_q")
    q = capped.filter(F.col("user_id") % 29 == 0)
    scored = (
        q.join(both_dir, q["item"] == both_dir["owned"])
        .select("user_id", "cand", "sim_q")
        .join(
            capped.select("user_id", F.col("item").alias("cand")),
            ["user_id", "cand"],
            "left_anti",
        )
        .groupBy("user_id", "cand")
        .agg(F.sum("sim_q").cast("bigint").alias("score_q"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("score_q"), "cand")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select(
            "user_id",
            F.col("cand").alias("item"),
            (F.col("score_q").cast("double") / F.lit(1e6)).alias("score"),
            "rank",
        )
        .orderBy("user_id", "rank")
    )


@query(
    "q_wilson_ctr_ranking",
    oracle="""
WITH s AS (
  SELECT CAST(props->>'$.k' AS INTEGER) AS item,
    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS pos,
    CAST(count(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IN ('purchase', 'view')
    AND (props->>'$.k') IS NOT NULL
  GROUP BY 1
  HAVING count(*) >= 5
),
w AS (
  SELECT item, pos, n,
    floor(
      ((CAST(pos AS DOUBLE) / n + 1.9208 / n
        - 1.96 * sqrt((CAST(pos AS DOUBLE) / n * (1.0 - CAST(pos AS DOUBLE) / n)
                       + 0.9604 / n) / n))
       / (1.0 + 3.8416 / n)) * 1000000.0 + 0.5) / 1000000.0 AS wilson_lb,
    floor(CAST(pos AS DOUBLE) / n * 1000000.0 + 0.5) / 1000000.0 AS ctr
  FROM s
)
SELECT item, pos, n, ctr, wilson_lb,
  CAST(row_number() OVER (ORDER BY wilson_lb DESC, item) AS BIGINT) AS rank
FROM w
QUALIFY rank <= 25
ORDER BY rank
""",
    tags=("events", "ranking", "stats", "analytics"),
    description=(
        "Rank items by the Wilson-score LOWER bound of their purchase "
        "rate (z=1.96), not the raw rate -- the standard fix for "
        "small-sample CTR ranking (an item with 2/2 must not outrank "
        "one with 90/100).  The z constants are embedded as identical "
        "decimal literals (1.96, z^2=3.8416, z^2/2=1.9208, "
        "(z/2)^2=0.9604), every other op is +,*,/,sqrt -- all "
        "IEEE-correctly-rounded, so the identical expression tree "
        "yields identical doubles in both engines before the one "
        "portable floor-round."
    ),
)
def q_wilson_ctr_ranking(spark, sf_dir):
    """One shuffle to per-item (pos, n) -- item-domain-sized -- then a
    map-only scalar expression and one rank window over that bounded
    relation."""
    from pyspark.sql import Window

    ev = cat(spark, sf_dir).events
    s = (
        ev.filter(
            F.col("event_type").isin("purchase", "view")
            & F.get_json_object("props", "$.k").isNotNull()
        )
        .groupBy(
            F.get_json_object("props", "$.k").cast("int").alias("item")
        )
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("bigint")
            .alias("pos"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .filter(F.col("n") >= 5)
    )
    p = F.col("pos").cast("double") / F.col("n")
    nn = F.col("n")
    wilson = (
        (
            p
            + F.lit(1.9208) / nn
            - F.lit(1.96)
            * F.sqrt((p * (F.lit(1.0) - p) + F.lit(0.9604) / nn) / nn)
        )
        / (F.lit(1.0) + F.lit(3.8416) / nn)
    )

    def pr6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    w = Window.orderBy(F.desc("wilson_lb"), "item")
    return (
        s.select(
            "item",
            "pos",
            "n",
            pr6(p).alias("ctr"),
            pr6(wilson).alias("wilson_lb"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 25)
        .select("item", "pos", "n", "ctr", "wilson_lb", "rank")
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# Peak concurrent sessions (interval sweep)
# --------------------------------------------------------------------------

@query(
    "q_peak_concurrent_sessions",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id,
    CASE WHEN floor(epoch(ts))
           - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)))
           > 1800
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events
),
s AS (
  SELECT user_id,
    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_no,
    CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM o
),
iv AS (
  SELECT user_id, session_no, min(sec) AS s_sec, max(sec) AS e_sec
  FROM s GROUP BY user_id, session_no
),
pts AS (
  SELECT s_sec AS sec, 1 AS delta, user_id, session_no FROM iv
  UNION ALL
  SELECT e_sec AS sec, -1 AS delta, user_id, session_no FROM iv
),
-- single global sweep: the oracle's formulation is the sequential
-- one; the Spark side proves the same fixpoint with a two-level
-- carry-in decomposition
run AS (
  SELECT CAST(floor(sec / 3600) AS BIGINT) AS h,
    sum(delta) OVER (ORDER BY sec, delta DESC, user_id, session_no
                     ROWS UNBOUNDED PRECEDING) AS conc
  FROM pts
)
SELECT h, CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM run GROUP BY h
ORDER BY peak_concurrency DESC, h
LIMIT 5
""",
    tags=("events", "sessionization", "interval", "sweep"),
    description=(
        "Peak concurrent 30-min-gap sessions per hour, top-5 hours: "
        "each session becomes a +1/-1 point pair (inclusive ends; "
        "starts sort before ends at the same second) and the maximum "
        "of the running sum inside each hour is the hour's peak "
        "concurrency -- the classic interval-sweep capacity metric."
    ),
)
def q_peak_concurrent_sessions(spark, sf_dir):
    """The oracle sweeps one global running sum; Spark decomposes it
    into a per-hour local prefix sum (window partitioned by hour --
    parallel) plus a carry-in of prior hours' delta totals (cumulative
    window over the hours-count-sized rollup).  max(carry + local
    prefix) per hour equals the global sweep's per-hour max by
    associativity of the prefix sum, so the two formally different
    formulations must agree -- and at 100 TB the Spark side never
    funnels the point stream through one partition; only the tiny
    hourly totals table is sequenced."""
    ev = cat(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    is_start = (
        lag_ts.isNull()
        | (
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.unix_timestamp(lag_ts.cast("timestamp"))
            > 1800
        )
    ).cast("int")
    s = ev.withColumn("is_start", is_start).select(
        "user_id",
        F.sum("is_start")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_no"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
    )
    iv = s.groupBy("user_id", "session_no").agg(
        F.min("sec").alias("s_sec"), F.max("sec").alias("e_sec")
    )
    pts = iv.select(
        F.explode(
            F.array(
                F.struct(F.col("s_sec").alias("sec"), F.lit(1).alias("delta")),
                F.struct(F.col("e_sec").alias("sec"), F.lit(-1).alias("delta")),
            )
        ).alias("p"),
        "user_id",
        "session_no",
    ).select(
        F.floor(F.col("p.sec") / 3600).cast("bigint").alias("h"),
        F.col("p.sec").alias("sec"),
        F.col("p.delta").alias("delta"),
        "user_id",
        "session_no",
    )
    local_w = Window.partitionBy("h").orderBy(
        "sec", F.desc("delta"), "user_id", "session_no"
    )
    local = pts.withColumn(
        "local_run",
        F.sum("delta").over(local_w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    hourly = local.groupBy("h").agg(
        F.sum("delta").alias("tot"), F.max("local_run").alias("local_peak")
    )
    carry_w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, -1)
    return (
        hourly.withColumn("carry", F.coalesce(F.sum("tot").over(carry_w), F.lit(0)))
        .select(
            "h",
            (F.col("carry") + F.col("local_peak"))
            .cast("bigint")
            .alias("peak_concurrency"),
        )
        .orderBy(F.desc("peak_concurrency"), "h")
        .limit(5)
    )


# --------------------------------------------------------------------------
# Daily activity streaks (gaps-and-islands on the day grid)
# --------------------------------------------------------------------------

@query(
    "q_user_daily_streaks",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id,
    CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day
  FROM events
),
r AS (
  SELECT user_id, day,
    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM d
),
isl AS (
  SELECT user_id, day - rn AS grp, count(*) AS len
  FROM r GROUP BY user_id, day - rn
)
SELECT user_id,
  CAST(max(len) AS BIGINT) AS longest_streak,
  CAST(count(*) AS BIGINT) AS n_streaks,
  CAST(sum(len) AS BIGINT) AS n_active_days
FROM isl GROUP BY user_id
ORDER BY user_id
""",
    tags=("events", "gaps-islands", "retention"),
    description=(
        "Per-user consecutive-active-day streaks: distinct active "
        "days, the day-minus-row-number island trick, then longest "
        "streak / streak count / total active days per user -- the "
        "retention 'streak' metric (day granularity twin of the "
        "second-granularity session islands)."
    ),
)
def q_user_daily_streaks(spark, sf_dir):
    """distinct (user, day) collapses the fact table first (one
    shuffle, output |users| x |days| max); the island window and both
    rollups all share the user_id partitioning, so AQE coalesces them
    onto one exchange.  Day ids are floored-epoch integers -- the
    portable granularity convention."""
    ev = cat(spark, sf_dir).events
    d = ev.select(
        "user_id",
        F.floor(
            F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(86400))
        )
        .cast("bigint")
        .alias("day"),
    ).distinct()
    r = d.withColumn(
        "rn", F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    )
    isl = r.groupBy("user_id", (F.col("day") - F.col("rn")).alias("grp")).agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        isl.groupBy("user_id")
        .agg(
            F.max("len").cast("bigint").alias("longest_streak"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.sum("len").cast("bigint").alias("n_active_days"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Watermark lateness audit (how late do events actually arrive?)
# --------------------------------------------------------------------------

_WM_ORACLE = """
WITH a AS (
  -- arrival order = event_id (the ingest sequence); lateness =
  -- how far behind the running max event-time an event arrives.
  SELECT CAST(max(floor(epoch(ts))) OVER (
      ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    - floor(epoch(ts)) AS BIGINT) AS late_sec
  FROM events
),
b AS (
  SELECT late_sec // 60 AS late_min, CAST(count(*) AS BIGINT) AS cnt
  FROM a GROUP BY late_min
),
n1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM b),
r AS (
  SELECT late_min, cnt,
    CAST(coalesce(sum(cnt) OVER (ORDER BY late_min
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cumb
  FROM b
),
pick AS (
  SELECT
    (SELECT min(late_min) FROM r CROSS JOIN n1
     WHERE cumb < (n + 1) // 2 AND cumb + cnt >= (n + 1) // 2) AS p50,
    (SELECT min(late_min) FROM r CROSS JOIN n1
     WHERE cumb < (95 * n + 99) // 100
       AND cumb + cnt >= (95 * n + 99) // 100) AS p95,
    (SELECT min(late_min) FROM r CROSS JOIN n1
     WHERE cumb < (99 * n + 99) // 100
       AND cumb + cnt >= (99 * n + 99) // 100) AS p99
)
SELECT n1.n AS n_events,
  pick.p50 AS p50_late_min, pick.p95 AS p95_late_min,
  pick.p99 AS p99_late_min,
  CAST(coalesce((SELECT sum(cnt) FROM b WHERE late_min >= 60), 0)
    AS BIGINT) AS n_beyond_1h,
  floor(CAST(coalesce((SELECT sum(cnt) FROM b WHERE late_min >= 60), 0)
             AS DOUBLE)
        / n1.n * 1000000.0 + 0.5) / 1000000.0 AS frac_beyond_1h
FROM n1 CROSS JOIN pick
"""


@query(
    "q_watermark_lateness_audit",
    oracle=_WM_ORACLE,
    tags=("events", "streaming-design", "lateness", "ring-b"),
    description=(
        "Watermark sizing audit: per event, lateness = running max "
        "event-time over ARRIVAL order (event_id) minus the event's "
        "own time -- exactly the quantity a Structured Streaming "
        "watermark must cover to keep an event inside its window.  "
        "Minute-resolution lateness histogram -> exact rank-selected "
        "p50/p95/p99 plus the count and fraction arriving more than "
        "an hour late: the number that tells you what "
        "withWatermark('1 hour') would actually drop."
    ),
)
def q_watermark_lateness_audit(spark, sf_dir):
    """The running max over GLOBAL arrival order is the one inherently
    sequential step; it rides the event_id ordering through the
    two-level pattern: ids are bucketed, per-bucket running maxes
    carry a broadcast prefix-max in, so no single-partition window
    ever sees raw events.  The percentile machinery is the bounded
    histogram form (lateness domain is minutes of wall clock)."""
    ev = cat(spark, sf_dir).events.select(
        "event_id",
        F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")))
        .cast("bigint")
        .alias("sec"),
    )
    # Two-level running max over arrival order (the q_nb_roc_auc
    # block-prefix convention): within-block running max + carry-in of
    # the prefix max over earlier blocks.
    blk = ev.withColumn("blk", F.expr("event_id DIV 100000"))
    wl = (
        Window.partitionBy("blk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = blk.withColumn("runmax_local", F.max("sec").over(wl))
    btot = blk.groupBy("blk").agg(F.max("sec").alias("bmax"))
    wb = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    carry = btot.select(
        "blk", F.max("bmax").over(wb).alias("carrymax")
    )
    a = loc.join(F.broadcast(carry), "blk").select(
        (
            F.greatest(
                F.col("runmax_local"),
                F.coalesce(F.col("carrymax"), F.lit(-(1 << 62))),
            )
            - F.col("sec")
        ).alias("late_sec")
    )
    b = a.groupBy(F.expr("late_sec DIV 60").alias("late_min")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
        # Bounded minute histogram with five consumer legs (count,
        # three percentile picks, beyond-1h): checkpoint once or the
        # event-scale running max re-expands under every leg (the
        # isotonic-bins / STL-days lesson).
    ).localCheckpoint(eager=True)
    n1 = b.agg(F.sum("cnt").cast("bigint").alias("n"))
    wr = Window.orderBy("late_min").rowsBetween(Window.unboundedPreceding, -1)
    r = b.withColumn(
        "cumb", F.coalesce(F.sum("cnt").over(wr), F.lit(0)).cast("bigint")
    ).crossJoin(F.broadcast(n1))

    def pick(rank_expr, alias):
        return (
            r.filter(
                (F.col("cumb") < F.floor(rank_expr))
                & (F.col("cumb") + F.col("cnt") >= F.floor(rank_expr))
            )
            .agg(F.min("late_min").alias(alias))
        )

    p50 = pick((F.col("n") + 1) / F.lit(2), "p50_late_min")
    p95 = pick((F.lit(95) * F.col("n") + 99) / F.lit(100), "p95_late_min")
    p99 = pick((F.lit(99) * F.col("n") + 99) / F.lit(100), "p99_late_min")
    beyond = b.filter(F.col("late_min") >= 60).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_beyond_1h")
    )
    return (
        n1.select(F.col("n").alias("n_events"))
        .crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p95))
        .crossJoin(F.broadcast(p99))
        .crossJoin(F.broadcast(beyond))
        .select(
            "n_events",
            "p50_late_min",
            "p95_late_min",
            "p99_late_min",
            "n_beyond_1h",
            (
                F.floor(
                    F.col("n_beyond_1h").cast("double")
                    / F.col("n_events")
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("frac_beyond_1h"),
        )
    )
