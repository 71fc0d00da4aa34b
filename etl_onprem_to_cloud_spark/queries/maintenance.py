"""Table-maintenance queries: latest-wins merge and column profiling
(operators/maintenance.py), oracle-checked like every other entry."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.maintenance import merge_upsert, profile_columns
from ._util import cat, fmt_ts
from . import query


@query(
    "q_merge_upsert_latest_events",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, ts, value, 0 AS origin
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT user_id, event_id, ts, value, 1 AS origin
  FROM events WHERE event_id % 2 = 1
)
SELECT user_id, event_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts,
  value
FROM tagged
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY ts DESC, origin DESC, event_id DESC) = 1
""",
    tags=("merge", "upsert", "maintenance"),
    description="Latest-wins keyed merge (operators/maintenance.merge_upsert): "
    "even events as base, odd as updates, one row per user at max ts.",
)
def q_merge_upsert_latest_events(spark, sf_dir):
    ev = cat(spark, sf_dir).events.select("user_id", "event_id", "ts", "value")
    base = ev.filter(F.col("event_id") % 2 == 0)
    updates = ev.filter(F.col("event_id") % 2 == 1)
    merged = merge_upsert(
        base, updates, keys=["user_id"], version_col="ts",
        tiebreakers=["event_id"],
    )
    return merged.select(
        "user_id", "event_id", fmt_ts("ts", "latest_ts"), "value"
    )


_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", count(*) AS n_rows,
  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  count(DISTINCT {c}) AS n_distinct,
  min(CAST({c} AS VARCHAR)) AS min_str,
  max(CAST({c} AS VARCHAR)) AS max_str
FROM orders"""
    for c in _ORDER_COLS
)


@query(
    "q_profile_orders_columns",
    oracle=_PROFILE_ORACLE,
    tags=("profiling", "maintenance", "agg"),
    description="ANALYZE-style one-pass column profile of orders "
    "(operators/maintenance.profile_columns): null/distinct/min/max per "
    "column in a single aggregation job.",
)
def q_profile_orders_columns(spark, sf_dir):
    return profile_columns(cat(spark, sf_dir).orders, _ORDER_COLS)


@query(
    "q_incremental_rollup_merge",
    oracle="""
SELECT event_type,
  count(*) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
  CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
    / count(value), 6) AS DOUBLE) AS avg_value
FROM events
GROUP BY event_type
""",
    tags=("maintenance", "rollup", "incremental", "agg"),
    description="Incremental rollup via mergeable partials: the 'base' "
    "half of events (even ids, standing in for a persisted daily rollup) "
    "and the 'delta' half are each reduced to (count, sum) partials, then "
    "MERGED by re-aggregation -- never recomputing the base.  avg is "
    "derived from merged partials, the reason avg itself is not the "
    "persisted state.  Oracle: the same rollup computed flat over all "
    "events, proving partial-merge == full recompute.",
)
def q_incremental_rollup_merge(spark, sf_dir):
    from ..functions.numeric import dec

    ev = cat(spark, sf_dir).events

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).alias("sum_dec"),
            F.count("value").alias("n_values"),
        )

    base = partial(ev.filter(F.col("event_id") % 2 == 0))
    delta = partial(ev.filter(F.col("event_id") % 2 == 1))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec"),
            F.sum("n_values").alias("n_values"),
        )
    )
    return merged.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.col("sum_dec"), 2).cast("double").alias("sum_value"),
        F.round(F.col("sum_dec").cast("double") / F.col("n_values"), 6)
        .cast("double")
        .alias("avg_value"),
    )


@query(
    "q_skew_salted_agg",
    oracle="""
SELECT event_type,
  count(value) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
  min(value) AS min_value,
  max(value) AS max_value
FROM events
GROUP BY event_type
""",
    tags=("skew", "agg", "scale"),
    description="Two-stage skew-safe aggregation (operators/skew.salted_agg): "
    "events carry only a handful of event_type keys -- exactly the hot-key "
    "shape -- so stage 1 aggregates by (key, salt) spreading each hot key "
    "over 8 reducers and stage 2 merges the partials.  Exact-DECIMAL sums "
    "make the two-stage result bit-equal to the flat group-by the oracle "
    "runs, proving the mitigation changes the plan, not the answer.",
)
def q_skew_salted_agg(spark, sf_dir):
    from ..functions.numeric import dec
    from ..operators.skew import salted_agg

    ev = (
        cat(spark, sf_dir).events
        .select("event_type", "value", dec("value").alias("value_dec"))
    )
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n_events": ("value", "count"),
            "sum_dec": ("value_dec", "sum"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
        salts=8,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.col("sum_dec"), 2).cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    )


@query(
    "q_skew_salted_join",
    oracle="""
WITH dim AS (
  SELECT event_type, max(value) AS max_value FROM events GROUP BY event_type
)
SELECT e.event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CASE WHEN e.value >= 0.9 * d.max_value THEN 1 ELSE 0 END) AS BIGINT)
    AS n_near_max,
  any_value(d.max_value) AS max_value
FROM events e JOIN dim d USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
""",
    tags=("skew", "join", "scale"),
    description="Skew-safe equi-join (operators/skew.salted_join): the "
    "fact side carries a handful of hot event_type keys, so it is "
    "salted and the per-type dim is replicated across the 16 salt "
    "values -- each hot key spreads over 16 reducers instead of one. "
    "The oracle is the PLAIN join, proving salting changes the plan, "
    "not the answer.",
)
def q_skew_salted_join(spark, sf_dir):
    from ..operators.skew import salted_join

    ev = cat(spark, sf_dir).events.select("event_type", "value")
    dim = ev.groupBy("event_type").agg(F.max("value").alias("max_value"))
    joined = salted_join(ev, dim, on=["event_type"], salts=16)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("value") >= 0.9 * F.col("max_value")).cast("bigint")
            ).alias("n_near_max"),
            F.any_value("max_value").alias("max_value"),
        )
        .orderBy("event_type")
    )


@query(
    "q_gdpr_purge_audit",
    oracle="""
WITH total AS (
  SELECT event_type, count(*) AS n_total FROM events GROUP BY event_type
),
kept AS (
  SELECT e.event_type, count(*) AS n_kept
  FROM events e
  WHERE NOT EXISTS (
    SELECT 1 FROM events t
    WHERE t.user_id % 101 = 0 AND t.user_id = e.user_id
  )
  GROUP BY e.event_type
)
SELECT total.event_type,
  CAST(total.n_total - COALESCE(kept.n_kept, 0) AS BIGINT) AS n_purged,
  CAST(COALESCE(kept.n_kept, 0) AS BIGINT) AS n_kept
FROM total LEFT JOIN kept ON total.event_type = kept.event_type
ORDER BY total.event_type
""",
    tags=("maintenance", "compliance", "anti-join"),
    description=(
        "Right-to-erasure purge with audit: drop every event of the "
        "tombstoned users (deterministic user_id % 101 stand-in for the "
        "deletion-request table) via a broadcast anti-join, and report "
        "per-event-type purged vs kept counts -- the audit record a "
        "compliance pipeline must emit.  The tombstone side is usually "
        "the small one, but it is derived from the corpus (distinct "
        "users/101) so the join strategy is left to the estimator/AQE "
        "rather than force-broadcast -- at test SFs the plan is the "
        "same broadcast anti-join; at 100x it degrades to a shuffled "
        "anti-join instead of a multi-GB broadcast build."
    ),
)
def q_gdpr_purge_audit(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    tombstones = ev.filter(F.col("user_id") % 101 == 0).select(
        "user_id"
    ).distinct()
    kept = ev.join(tombstones, "user_id", "left_anti")
    kept_agg = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept")
    )
    total_agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    return (
        total_agg.join(kept_agg, "event_type", "left")
        .select(
            "event_type",
            (
                F.col("n_total") - F.coalesce("n_kept", F.lit(0))
            ).alias("n_purged"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("event_type")
    )


@query(
    "q_freshness_report",
    oracle="""
WITH g AS (SELECT max(ts) AS global_max FROM events),
s AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    max(ts) AS last_ts
  FROM events GROUP BY event_type
)
SELECT s.event_type, s.n_events,
  strftime(s.last_ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
  CAST(floor(epoch(g.global_max)) - floor(epoch(s.last_ts)) AS BIGINT)
    AS staleness_sec,
  floor(epoch(g.global_max)) - floor(epoch(s.last_ts)) > 3600 AS is_stale_1h
FROM s CROSS JOIN g
ORDER BY s.event_type
""",
    tags=("maintenance", "freshness", "monitoring", "report"),
    description=(
        "Per-stream freshness report: last event time, staleness "
        "against the newest record anywhere (second-truncated), and a "
        "1-hour SLA flag per event type -- the table-health monitor a "
        "continuously-loaded warehouse publishes next to the quality "
        "report."
    ),
)
def q_freshness_report(spark, sf_dir):
    """One grouped max + a 1-row global max broadcast -- pure
    aggregation; at scale this reads only the ts/type columns (column
    pruning) and parquet row-group stats make max(ts) near-free."""
    ev = cat(spark, sf_dir).events
    g = ev.agg(F.max("ts").alias("global_max"))
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    gsec = F.unix_timestamp(F.col("global_max").cast("timestamp"))
    lsec = F.unix_timestamp(F.col("last_ts").cast("timestamp"))
    return (
        s.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n_events",
            fmt_ts("last_ts", "last_seen"),
            (gsec - lsec).cast("bigint").alias("staleness_sec"),
            ((gsec - lsec) > 3600).alias("is_stale_1h"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Migration-validation table checksums (on-prem -> cloud parity gate)
# --------------------------------------------------------------------------

# Row fingerprint: md5 over a canonical pipe-joined projection, 28-bit
# slice (7 hex chars) summed as BIGINT.  The sum is ORDER-INDEPENDENT
# (addition commutes), so any partitioning/layout of either copy
# produces the identical checksum -- exactly what a source-vs-target
# load check needs.  Exact to ~2^35 (~3.4e10) rows per table
# (sum < 2^28 * n < 2^63); beyond that, sum the slices modulo a
# 61-bit prime on both sides.
# Doubles and timestamps are canonicalized to integers FIRST (cents /
# epoch seconds) because engines disagree on shortest-roundtrip double
# printing; NULL becomes a sentinel distinct from any real value.


def _cksum_duck(table: str, cols: str) -> str:
    return (
        f"SELECT '{table}' AS table_name,"
        f" CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(sum(CAST(concat('0x', substr(md5({cols}), 1, 7)) AS BIGINT))"
        f" AS BIGINT) AS checksum"
        f" FROM {table}"
    )


_CK_ORDERS_DUCK = (
    "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),"
    " coalesce(o_orderstatus, '<null>'),"
    " CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR),"
    " CAST(CAST(floor(epoch(o_orderdate)) AS BIGINT) AS VARCHAR),"
    " coalesce(o_orderpriority, '<null>'))"
)
_CK_CUSTOMER_DUCK = (
    "concat_ws('|', CAST(c_custkey AS VARCHAR), coalesce(c_name, '<null>'),"
    " CAST(c_nationkey AS VARCHAR),"
    " CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR),"
    " coalesce(c_mktsegment, '<null>'))"
)
_CK_NATION_DUCK = (
    "concat_ws('|', CAST(n_nationkey AS VARCHAR), coalesce(n_name, '<null>'),"
    " CAST(n_regionkey AS VARCHAR))"
)


@query(
    "q_migration_checksums",
    oracle=(
        _cksum_duck("orders", _CK_ORDERS_DUCK)
        + " UNION ALL "
        + _cksum_duck("customer", _CK_CUSTOMER_DUCK)
        + " UNION ALL "
        + _cksum_duck("nation", _CK_NATION_DUCK)
        + " ORDER BY table_name"
    ),
    tags=("maintenance", "migration", "integrity", "ring-b"),
    description=(
        "Migration-validation checksums for the orders/customer/nation "
        "loads: per table, row count plus an ORDER-INDEPENDENT content "
        "checksum (sum of 28-bit md5 slices over a canonical projection "
        "-- doubles as integer cents, timestamps as epoch seconds, "
        "NULL as a sentinel), so the on-prem source and the cloud "
        "target can be compared without sorting either side.  The "
        "reconciliation gate the reference's CSV->parquet load "
        "(/root/reference/etl/load.py) ships without."
    ),
)
def q_migration_checksums(spark, sf_dir):
    """One scan + one 1-row aggregate per table, map-side combined;
    nothing shuffles but three partial-sum rows per task.  The
    checksum is layout-invariant by construction (commutative sum),
    which is the property the repartition/rerun-stability tests
    assert for the hash-gate family."""
    c = cat(spark, sf_dir)

    def ck(df, table, cols):
        canon = F.concat_ws("|", *cols)
        slice31 = F.conv(
            F.substring(F.md5(canon.cast("binary")), 1, 7), 16, 10
        ).cast("bigint")
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(slice31).cast("bigint").alias("checksum"),
        ).select(F.lit(table).alias("table_name"), "n_rows", "checksum")

    def cents(col):
        return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint").cast("string")

    def nul(col):
        return F.coalesce(F.col(col), F.lit("<null>"))

    orders = ck(
        c.orders,
        "orders",
        [
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            nul("o_orderstatus"),
            cents("o_totalprice"),
            F.floor(F.unix_timestamp(F.col("o_orderdate").cast("timestamp")))
            .cast("bigint")
            .cast("string"),
            nul("o_orderpriority"),
        ],
    )
    customer = ck(
        c.customer,
        "customer",
        [
            F.col("c_custkey").cast("string"),
            nul("c_name"),
            F.col("c_nationkey").cast("string"),
            cents("c_acctbal"),
            nul("c_mktsegment"),
        ],
    )
    nation = ck(
        c.nation,
        "nation",
        [
            F.col("n_nationkey").cast("string"),
            nul("n_name"),
            F.col("n_regionkey").cast("string"),
        ],
    )
    return orders.unionAll(customer).unionAll(nation).orderBy("table_name")


# --------------------------------------------------------------------------
# CDC snapshot diff (insert/update/delete classification between loads)
# --------------------------------------------------------------------------

# Two deterministic "snapshot versions" derived from the orders
# fixture: the OLD load misses keys with orderkey % 97 = 3 (rows later
# inserted), the NEW load misses keys with orderkey % 89 = 5 (rows
# deleted since), and every orderkey % 7 = 0 row had its total bumped
# by exactly 100 cents between loads (an update).  The diff operator
# itself is version-agnostic: full outer join on the key, compare one
# md5 row fingerprint per side (never column-by-column on wide rows),
# classify I/U/D/N.

_CDC_CANON = (
    "concat_ws('|', CAST(o_custkey AS VARCHAR),"
    " coalesce(o_orderstatus, '<null>'), CAST(cents AS VARCHAR),"
    " coalesce(o_orderpriority, '<null>'))"
)

_CDC_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents0
  FROM orders
),
old AS (
  SELECT o_orderkey, cents0 AS cents,
    md5({_CDC_CANON.replace("cents", "cents0")}) AS fp
  FROM (SELECT *, cents0 AS cents FROM base WHERE o_orderkey % 97 <> 3)
),
new AS (
  SELECT o_orderkey, cents,
    md5({_CDC_CANON}) AS fp
  FROM (
    SELECT *, cents0 + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END
      AS cents
    FROM base WHERE o_orderkey % 89 <> 5
  )
),
d AS (
  SELECT
    CASE
      WHEN o.o_orderkey IS NULL THEN 'I'
      WHEN n.o_orderkey IS NULL THEN 'D'
      WHEN o.fp <> n.fp THEN 'U'
      ELSE 'N'
    END AS action,
    coalesce(o.o_orderkey, n.o_orderkey) AS k,
    coalesce(n.cents, 0) - coalesce(o.cents, 0) AS delta
  FROM old o FULL OUTER JOIN new n ON n.o_orderkey = o.o_orderkey
)
SELECT action,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(k) AS BIGINT) AS key_checksum,
  CAST(sum(CASE WHEN action = 'U' THEN delta ELSE 0 END) AS BIGINT)
    AS cents_delta
FROM d GROUP BY action ORDER BY action
"""


@query(
    "q_snapshot_diff_cdc",
    oracle=_CDC_ORACLE,
    tags=("maintenance", "migration", "cdc", "ring-b"),
    description=(
        "CDC snapshot diff between two loads of the orders table "
        "(derived deterministic versions: late inserts, deletions, "
        "and a 100-cent price bump on every seventh key): full outer "
        "join on the key comparing ONE md5 row fingerprint per side, "
        "rows classified insert/update/delete/unchanged with per-"
        "action counts, a key checksum, and the summed update delta "
        "in cents -- the change-capture companion of the "
        "q_migration_checksums reconciliation gate (together they "
        "answer 'did the load drift' and 'exactly WHAT drifted')."
    ),
)
def q_snapshot_diff_cdc(spark, sf_dir):
    """One co-partitioned full-outer join on the key -- both sides
    shuffle once on o_orderkey and nothing else moves: the fingerprint
    collapses arbitrarily wide rows to 32 bytes BEFORE the shuffle, so
    the exchange cost is key+hash, not row width.  The per-action
    rollup is a 4-group aggregate with map-side combine."""
    base = cat(spark, sf_dir).orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents0"),
    )

    def fingerprint(df):
        canon = F.concat_ws(
            "|",
            F.col("o_custkey").cast("string"),
            F.coalesce(F.col("o_orderstatus"), F.lit("<null>")),
            F.col("cents").cast("string"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<null>")),
        )
        return df.select("o_orderkey", "cents", F.md5(canon.cast("binary")).alias("fp"))

    old = fingerprint(
        base.filter(F.col("o_orderkey") % 97 != 3).withColumn(
            "cents", F.col("cents0")
        )
    )
    new = fingerprint(
        base.filter(F.col("o_orderkey") % 89 != 5).withColumn(
            "cents",
            F.col("cents0")
            + F.when(F.col("o_orderkey") % 7 == 0, F.lit(100)).otherwise(F.lit(0)),
        )
    )
    o = old.select(
        F.col("o_orderkey").alias("ko"), F.col("cents").alias("co"),
        F.col("fp").alias("fo"),
    )
    n = new.select(
        F.col("o_orderkey").alias("kn"), F.col("cents").alias("cn"),
        F.col("fp").alias("fn"),
    )
    d = o.join(n, o.ko == n.kn, "full_outer").select(
        F.when(F.col("ko").isNull(), F.lit("I"))
        .when(F.col("kn").isNull(), F.lit("D"))
        .when(F.col("fo") != F.col("fn"), F.lit("U"))
        .otherwise(F.lit("N"))
        .alias("action"),
        F.coalesce(F.col("ko"), F.col("kn")).alias("k"),
        (F.coalesce(F.col("cn"), F.lit(0)) - F.coalesce(F.col("co"), F.lit(0))).alias(
            "delta"
        ),
    )
    return (
        d.groupBy("action")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("k").cast("bigint").alias("key_checksum"),
            F.sum(F.when(F.col("action") == "U", F.col("delta")).otherwise(0))
            .cast("bigint")
            .alias("cents_delta"),
        )
        .orderBy("action")
    )


# --------------------------------------------------------------------------
# Schema/statistics drift between two loads (per-column profile delta)
# --------------------------------------------------------------------------

# Same derived snapshot pair as q_snapshot_diff_cdc: the OLD load
# misses orderkey % 97 = 3, the NEW misses % 89 = 5 and bumps every
# seventh key's total by 100 cents.  The drift report compares
# per-column profiles (row count, null rate, mean for numerics,
# distinct count for low-cardinality strings) -- the statistical
# companion of the row-level diff: CDC says WHICH rows changed, this
# says whether the DISTRIBUTION moved enough to break consumers.

_DRIFT_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
old AS (SELECT * FROM base WHERE o_orderkey % 97 <> 3),
new AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
    cents + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END AS cents
  FROM base WHERE o_orderkey % 89 <> 5
),
po AS (
  SELECT 'cents' AS column_name,
    CAST(count(*) AS BIGINT) AS n_old,
    CAST(count(*) - count(cents) AS BIGINT) AS nulls_old,
    floor(CAST(sum(cents) AS DOUBLE) / count(cents) / 100.0
          * 1000000.0 + 0.5) / 1000000.0 AS mean_old,
    CAST(count(DISTINCT NULL) AS BIGINT) AS distinct_old
  FROM old
  UNION ALL
  SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
    CAST(count(*) - count(o_orderpriority) AS BIGINT),
    CAST(NULL AS DOUBLE),
    CAST(count(DISTINCT o_orderpriority) AS BIGINT)
  FROM old
  UNION ALL
  SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
    CAST(count(*) - count(o_orderstatus) AS BIGINT),
    CAST(NULL AS DOUBLE),
    CAST(count(DISTINCT o_orderstatus) AS BIGINT)
  FROM old
),
pn AS (
  SELECT 'cents' AS column_name,
    CAST(count(*) AS BIGINT) AS n_new,
    CAST(count(*) - count(cents) AS BIGINT) AS nulls_new,
    floor(CAST(sum(cents) AS DOUBLE) / count(cents) / 100.0
          * 1000000.0 + 0.5) / 1000000.0 AS mean_new,
    CAST(count(DISTINCT NULL) AS BIGINT) AS distinct_new
  FROM new
  UNION ALL
  SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
    CAST(count(*) - count(o_orderpriority) AS BIGINT),
    CAST(NULL AS DOUBLE),
    CAST(count(DISTINCT o_orderpriority) AS BIGINT)
  FROM new
  UNION ALL
  SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
    CAST(count(*) - count(o_orderstatus) AS BIGINT),
    CAST(NULL AS DOUBLE),
    CAST(count(DISTINCT o_orderstatus) AS BIGINT)
  FROM new
)
SELECT po.column_name, po.n_old, pn.n_new,
  po.nulls_old, pn.nulls_new,
  po.mean_old, pn.mean_new,
  po.distinct_old, pn.distinct_new,
  CAST(CASE WHEN po.distinct_old <> pn.distinct_new
    OR coalesce(abs(pn.mean_new - po.mean_old)
                / greatest(1e-12, abs(po.mean_old)) > 0.001, FALSE)
    THEN 1 ELSE 0 END AS BIGINT) AS drift_flag
FROM po JOIN pn USING (column_name)
ORDER BY column_name
"""


@query(
    "q_schema_drift_report",
    oracle=_DRIFT_ORACLE,
    tags=("maintenance", "migration", "drift", "ring-b"),
    description=(
        "Per-column profile drift between the two derived loads of "
        "the orders table: row counts, null counts, mean (numeric) "
        "and distinct count (categorical) side by side with a drift "
        "flag (cardinality change or >0.1% relative mean shift).  "
        "The distribution-level companion of q_snapshot_diff_cdc and "
        "q_migration_checksums: CDC says WHICH rows changed, the "
        "checksum says IF anything changed, this says whether the "
        "shape a consumer depends on moved."
    ),
)
def q_schema_drift_report(spark, sf_dir):
    """Two scans (one per snapshot), each a single map-side-combined
    aggregate producing all three columns' profiles at once (the
    profile_columns one-pass convention); the join/flag step runs on
    six profile rows."""
    base = cat(spark, sf_dir).orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    old = base.filter(F.col("o_orderkey") % 97 != 3)
    new = base.filter(F.col("o_orderkey") % 89 != 5).withColumn(
        "cents",
        F.col("cents")
        + F.when(F.col("o_orderkey") % 7 == 0, F.lit(100)).otherwise(F.lit(0)),
    )

    def profile(df, suffix):
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count("cents").cast("bigint").alias("nn_cents"),
            F.sum("cents").cast("bigint").alias("s_cents"),
            F.count("o_orderpriority").cast("bigint").alias("nn_pri"),
            F.count_distinct("o_orderpriority").cast("bigint").alias("d_pri"),
            F.count("o_orderstatus").cast("bigint").alias("nn_st"),
            F.count_distinct("o_orderstatus").cast("bigint").alias("d_st"),
        )
        mean = (
            F.floor(
                F.col("s_cents").cast("double")
                / F.col("nn_cents")
                / F.lit(100.0)
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        )
        rows = [
            ("cents", F.col("n") - F.col("nn_cents"), mean,
             F.lit(0).cast("bigint")),
            ("o_orderpriority", F.col("n") - F.col("nn_pri"),
             F.lit(None).cast("double"), F.col("d_pri")),
            ("o_orderstatus", F.col("n") - F.col("nn_st"),
             F.lit(None).cast("double"), F.col("d_st")),
        ]
        out = None
        for name, nulls, m, d in rows:
            piece = agg.select(
                F.lit(name).alias("column_name"),
                F.col("n").alias(f"n_{suffix}"),
                nulls.cast("bigint").alias(f"nulls_{suffix}"),
                m.alias(f"mean_{suffix}"),
                d.alias(f"distinct_{suffix}"),
            )
            out = piece if out is None else out.unionAll(piece)
        return out

    po = profile(old, "old")
    pn = profile(new, "new")
    drift = (
        F.col("distinct_old") != F.col("distinct_new")
    ) | F.coalesce(
        F.abs(F.col("mean_new") - F.col("mean_old"))
        / F.greatest(F.lit(1e-12), F.abs(F.col("mean_old")))
        > 0.001,
        F.lit(False),
    )
    return (
        po.join(pn, "column_name")
        .select(
            "column_name", "n_old", "n_new", "nulls_old", "nulls_new",
            "mean_old", "mean_new", "distinct_old", "distinct_new",
            F.when(drift, 1).otherwise(0).cast("bigint").alias("drift_flag"),
        )
        .orderBy("column_name")
    )
