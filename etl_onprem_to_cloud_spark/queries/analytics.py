"""Sequence analytics, anomaly detection, weighted sampling, and
corpus-index queries -- the behavioral-analytics surface a warehouse
feeds dashboards from (the reference delegates ALL of this ring to
Athena/QuickSight, reference README.md:184-248) plus two corpus-wide
text indexes for the Ring C story.

Numeric discipline: the anomaly z-scores are derived from EXACT bigint
sums (sum, sum of squares) with one double division at the end, rather
than built-in stddev aggregates, so both engines evaluate the identical
IEEE expression tree and the differential hash check is stable.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..functions import text as T
from ..functions.numeric import dec, portable_round
from ..operators.sampling import _MOD, duck_hash_gate, weighted_sample
from ._util import cat, duck_tokens, duck_word_ngrams, fmt_ts, ts_lit
from . import query

_TOKS = duck_tokens("text")


@query(
    "q_cumulative_new_users",
    oracle="""
WITH first_seen AS (
  SELECT user_id, min(date_trunc('day', ts)) AS first_day
  FROM events GROUP BY user_id
),
per_day AS (
  SELECT first_day, count(*) AS new_users FROM first_seen GROUP BY first_day
)
SELECT strftime(first_day, '%Y-%m-%d') AS day,
  CAST(new_users AS BIGINT) AS new_users,
  CAST(sum(new_users) OVER (ORDER BY first_day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM per_day ORDER BY first_day
""",
    tags=("events", "analytics", "growth"),
    description="Daily new-user and cumulative-user curve via FIRST "
    "TOUCH: min(day) per user then a per-day rollup + running sum -- "
    "the scale-safe form of 'cumulative distinct users' (a naive "
    "running count_distinct would re-scan all history per day).",
)
def q_cumulative_new_users(spark, sf_dir):
    """Scale shape: one shuffle on user_id (partial min), one tiny
    per-day agg, and the running sum windows over ~days rows (single
    partition is fine: cardinality = calendar days, not data)."""
    ev = cat(spark, sf_dir).events
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("first_day")
    )
    per_day = first_seen.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.orderBy("first_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_day.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        F.col("new_users").cast("bigint"),
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    ).orderBy("day")


@query(
    "q_event_type_cooccurrence",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id, event_type FROM events
),
total AS (
  SELECT count(DISTINCT user_id) AS n_total FROM events
),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_users
  FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n_users AS BIGINT) AS n_users,
  CAST(round(CAST(CAST(n_users AS DOUBLE) / n_total AS DECIMAL(18,8)), 6)
    AS DOUBLE) AS user_share
FROM p CROSS JOIN total ORDER BY type_a, type_b
""",
    tags=("events", "analytics", "market-basket"),
    description="Event-type co-occurrence (market-basket over user "
    "sessions): for every unordered type pair, how many users did "
    "both, and what share of all users.  Expressed as per-user "
    "distinct-type arrays exploded into in-row pair combinations -- "
    "NO self-join of the fact table.",
)
def q_event_type_cooccurrence(spark, sf_dir):
    """Scale shape: one user_id shuffle builds the distinct-type array
    (bounded by |event types|, here 5), pairs are generated IN-ROW by
    nested array transforms (the self-join form the oracle uses would
    co-partition fine but scans the distinct relation twice), then one
    bounded-key agg.  Total-user count rides in as a 1-row broadcast."""
    ev = cat(spark, sf_dir).events
    types = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("ts")
    )
    pairs = types.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ts"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ts"), i + 2, F.greatest(F.size("ts") - i - 1, F.lit(0))
                        ),
                        lambda y: F.struct(
                            x.alias("type_a"), y.alias("type_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.type_a", "p.type_b")
    total = ev.agg(F.count_distinct("user_id").alias("n_total"))
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .join(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            F.col("n_users").cast("bigint"),
            F.round(
                (F.col("n_users").cast("double") / F.col("n_total"))
                .cast("decimal(18,8)"),
                6,
            )
            .cast("double")
            .alias("user_share"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "q_event_type_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS next_type
  FROM events
),
t AS (
  SELECT event_type, next_type, count(*) AS n
  FROM s WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type,
  CAST(n AS BIGINT) AS n,
  round(n / sum(n) OVER (PARTITION BY event_type), 6) AS p
FROM t
ORDER BY event_type, next_type
""",
    tags=("events", "window", "markov", "analytics"),
    description=(
        "First-order event-type transition matrix: per-user lead() over "
        "(ts, event_id), global counts + row-normalized probabilities."
    ),
)
def q_event_type_transitions(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    counted = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = Window.partitionBy("event_type")
    return counted.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(total), 6).alias("p"),
    ).orderBy("event_type", "next_type")


@query(
    "q_events_hourly_anomalies",
    oracle="""
WITH h AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_ts, count(*) AS n
  FROM events
  GROUP BY user_id, date_trunc('hour', ts)
),
s AS (
  SELECT user_id,
    count(*) AS cnt,
    sum(n) AS sum_n,
    sum(n * n) AS sum_n2
  FROM h GROUP BY user_id
),
z AS (
  SELECT h.user_id, h.hour_ts, h.n,
    CAST(s.sum_n AS DOUBLE) / s.cnt AS mean_n,
    (CAST(s.sum_n2 AS DOUBLE)
      - CAST(s.sum_n AS DOUBLE) * CAST(s.sum_n AS DOUBLE) / s.cnt)
      / (s.cnt - 1) AS var_n
  FROM h JOIN s ON h.user_id = s.user_id
  WHERE s.cnt >= 2
)
SELECT user_id,
  strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
  CAST(n AS BIGINT) AS n_events,
  round((n - mean_n) / sqrt(var_n), 6) AS z_score
FROM z
WHERE var_n > 0 AND abs((n - mean_n) / sqrt(var_n)) >= 2.0
ORDER BY user_id, hour_ts
""",
    tags=("events", "anomaly", "stats", "analytics"),
    description=(
        "Hourly activity anomalies: per-user z-score of events-per-hour "
        "from exact integer sums (no stddev builtin), |z| >= 2 flagged."
    ),
)
def q_events_hourly_anomalies(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    hours = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hours.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_n2"),
    )
    mean_n = F.col("sum_n").cast("double") / F.col("cnt")
    var_n = (
        F.col("sum_n2").cast("double")
        - F.col("sum_n").cast("double") * F.col("sum_n").cast("double") / F.col("cnt")
    ) / (F.col("cnt") - 1)
    z = (F.col("n") - F.col("mean_n")) / F.sqrt(F.col("var_n"))
    return (
        hours.join(stats.filter(F.col("cnt") >= 2), "user_id")
        .withColumn("mean_n", mean_n)
        .withColumn("var_n", var_n)
        .filter((F.col("var_n") > 0) & (F.abs(z) >= 2.0))
        .select(
            "user_id",
            fmt_ts("hour_ts", "hour_ts"),
            F.col("n").alias("n_events"),
            F.round(z, 6).alias("z_score"),
        )
        .orderBy("user_id", "hour_ts")
    )


@query(
    "q_sample_weighted_by_length",
    oracle=f"""
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
  round(least(n_chars / 800.0, 1.0), 6) AS weight
FROM documents
WHERE {duck_hash_gate('CAST(doc_id AS VARCHAR)', 'wsample')}
      < CAST(least(n_chars / 800.0, 1.0) * {_MOD} AS BIGINT)
ORDER BY doc_id
""",
    tags=("sampling", "ring-c", "deterministic"),
    description=(
        "Length-weighted deterministic sampling: md5 hash-gate with a "
        "per-row threshold proportional to n_chars "
        "(operators/sampling.py weighted_sample)."
    ),
)
def q_sample_weighted_by_length(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    weight = F.least(F.col("n_chars") / 800.0, F.lit(1.0))
    return (
        weighted_sample(docs, "doc_id", weight, salt="wsample")
        .select(
            "doc_id",
            "n_chars",
            F.round(weight, 6).alias("weight"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_inverted_index_tokens",
    oracle=f"""
WITH p AS (
  SELECT DISTINCT doc_id, unnest({_TOKS}) AS token FROM documents
)
SELECT token,
  CAST(count(*) AS BIGINT) AS doc_freq,
  array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 5), ',')
    AS top_docs
FROM p
GROUP BY token
ORDER BY token
""",
    tags=("text", "index", "ring-c"),
    description=(
        "Inverted-index construction: token -> document frequency + "
        "first-5 posting list (sorted doc_ids), one shuffle on token."
    ),
)
def q_inverted_index_tokens(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    pairs = docs.select(
        "doc_id",
        F.explode(F.array_distinct(T.tokens(F.lower(F.col("text"))))).alias("token"),
    )
    return (
        pairs.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.array_sort(F.collect_list("doc_id")), 1, 5),
                    lambda x: x.cast("string"),
                ),
            ).alias("top_docs"),
        )
        .orderBy("token")
    )


@query(
    "q_top_bigrams",
    oracle=f"""
WITH t AS (
  SELECT {_TOKS} AS toks FROM documents
),
g AS (
  SELECT unnest({duck_word_ngrams('toks', 2)}) AS bigram FROM t
),
c AS (
  SELECT bigram, count(*) AS n FROM g GROUP BY bigram
)
SELECT bigram, CAST(n AS BIGINT) AS n,
  CAST(row_number() OVER (ORDER BY n DESC, bigram) AS INTEGER) AS rank
FROM c
ORDER BY n DESC, bigram
LIMIT 50
""",
    tags=("text", "ngram", "ring-c"),
    description=(
        "Corpus vocabulary: top-50 bigrams by occurrence with total-order "
        "rank (count desc, bigram asc)."
    ),
)
def q_top_bigrams(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    grams = docs.select(
        F.explode(
            T.word_ngrams_from_tokens(T.tokens(F.lower(F.col("text"))), 2)
        ).alias("bigram")
    )
    counted = grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("int"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


@query(
    "q_token_entropy_docs",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
e AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
),
tf AS (
  SELECT doc_id, tok, count(*) AS c FROM e GROUP BY doc_id, tok
),
g AS (
  SELECT doc_id, sum(c) AS n, count(*) AS n_distinct,
    sum(CAST(round(c * ln(c), 6) AS DECIMAL(18,6))) AS s
  FROM tf GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(g.n, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(g.n_distinct, 0) AS BIGINT) AS n_distinct,
  CASE WHEN coalesce(g.n, 0) > 0
    THEN round(ln(g.n) - CAST(g.s AS DOUBLE) / g.n, 6) ELSE 0.0 END AS entropy
FROM documents d LEFT JOIN g USING (doc_id)
""",
    tags=("text", "quality", "entropy", "ring-c"),
    description=(
        "Shannon token entropy per document (a perplexity-style quality "
        "signal: near-zero = degenerate repetition).  Identity "
        "H = ln(n) - sum(c*ln(c))/n needs only per-term counts; the "
        "per-term c*ln(c) terms are rounded then DECIMAL-summed so both "
        "engines accumulate exactly (see module docstring)."
    ),
)
def q_token_entropy_docs(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    tf = (
        docs.select(
            "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    g = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            F.round(F.col("c") * F.log(F.col("c")), 6).cast("decimal(18,6)")
        ).alias("s"),
    )
    return docs.select("doc_id").join(g, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("n_distinct"), F.lit(0)).cast("bigint").alias("n_distinct"),
        F.when(
            F.coalesce(F.col("n"), F.lit(0)) > 0,
            F.round(F.log("n") - F.col("s").cast("double") / F.col("n"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("entropy"),
    )


_PSI_PIVOT = "1996-01-01 00:00:00"
_PSI_BINS = 8  # least(floor(price/50000), 7) -> bins 0..7


@query(
    "q_psi_price_drift",
    oracle=f"""
WITH b AS (
  SELECT least(CAST(floor(o_totalprice / 50000) AS INT), 7) AS price_bin,
    sum(CASE WHEN o_orderdate < TIMESTAMP '{_PSI_PIVOT}' THEN 1 ELSE 0 END)
      AS n_base,
    sum(CASE WHEN o_orderdate >= TIMESTAMP '{_PSI_PIVOT}' THEN 1 ELSE 0 END)
      AS n_cur
  FROM orders GROUP BY 1
),
t AS (SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM b)
SELECT price_bin,
  CAST(n_base AS BIGINT) AS n_base,
  CAST(n_cur AS BIGINT) AS n_cur,
  round((n_base + 1) / (tb + {_PSI_BINS}), 6) AS p_base,
  round((n_cur + 1) / (tc + {_PSI_BINS}), 6) AS p_cur,
  round(((n_base + 1) / (tb + {_PSI_BINS}) - (n_cur + 1) / (tc + {_PSI_BINS}))
        * ln(((n_base + 1) / (tb + {_PSI_BINS}))
             / ((n_cur + 1) / (tc + {_PSI_BINS}))), 6) AS psi_contrib
FROM b CROSS JOIN t
""",
    tags=("drift", "monitoring", "analytics", "scale"),
    description=(
        "Population-stability-index drift monitor: order-value histogram "
        "before/after a pivot date, add-one-smoothed shares, per-bin PSI "
        "contribution (p-q)*ln(p/q).  One scan, one 8-row aggregate -- "
        "the shape of a daily data-quality gate over a 100 TB feed.  "
        "Companion of q_psi_value_drift (mining.py): that variant "
        "derives its bin edges from the data and emits the summed "
        "retrain-gate PSI via 1e-9 fixed-point contributions."
    ),
)
def q_psi_price_drift(spark, sf_dir):
    orders = cat(spark, sf_dir).orders
    pivot = ts_lit(orders, "o_orderdate", _PSI_PIVOT)
    price_bin = F.least(
        F.floor(F.col("o_totalprice") / 50000).cast("int"), F.lit(7)
    )
    b = orders.groupBy(price_bin.alias("price_bin")).agg(
        F.sum(F.when(F.col("o_orderdate") < pivot, 1).otherwise(0)).alias("n_base"),
        F.sum(F.when(F.col("o_orderdate") >= pivot, 1).otherwise(0)).alias("n_cur"),
    )
    t = b.agg(F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc"))
    p = (F.col("n_base") + 1) / (F.col("tb") + _PSI_BINS)
    q = (F.col("n_cur") + 1) / (F.col("tc") + _PSI_BINS)
    return b.join(F.broadcast(t)).select(
        "price_bin",
        F.col("n_base").cast("bigint").alias("n_base"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round(p, 6).alias("p_base"),
        F.round(q, 6).alias("p_cur"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )


@query(
    "q_winsorized_price_stats",
    oracle="""
WITH c AS (
  SELECT o_orderpriority,
    quantile_cont(o_totalprice, 0.01) AS lo,
    quantile_cont(o_totalprice, 0.99) AS hi
  FROM orders GROUP BY o_orderpriority
),
w AS (
  SELECT o.o_orderpriority, c.lo, c.hi,
    greatest(c.lo, least(c.hi, o.o_totalprice)) AS clipped,
    CASE WHEN o.o_totalprice < c.lo THEN 1 ELSE 0 END AS is_lo,
    CASE WHEN o.o_totalprice > c.hi THEN 1 ELSE 0 END AS is_hi
  FROM orders o JOIN c USING (o_orderpriority)
)
SELECT o_orderpriority,
  count(*) AS n,
  CAST(sum(is_lo) AS BIGINT) AS n_clipped_lo,
  CAST(sum(is_hi) AS BIGINT) AS n_clipped_hi,
  round(any_value(lo), 4) AS cutoff_lo,
  round(any_value(hi), 4) AS cutoff_hi,
  round(CAST(sum(CAST(round(clipped, 6) AS DECIMAL(18,6))) AS DOUBLE)
        / count(*), 4) AS winsorized_mean
FROM w GROUP BY o_orderpriority
""",
    tags=("agg", "robust-stats", "quantile", "analytics"),
    description=(
        "Winsorized (1%/99%-clipped) order-value statistics per priority: "
        "exact interpolated percentile cutoffs (bit-identical between "
        "Spark percentile and DuckDB quantile_cont -- probed, not "
        "assumed), clip counts, DECIMAL-summed robust mean.  Scale note: "
        "exact percentile materializes each group's values; the 100 TB "
        "path swaps in approx_percentile(accuracy=10000) unchanged."
    ),
)
def q_winsorized_price_stats(spark, sf_dir):
    orders = cat(spark, sf_dir).orders
    cuts = orders.groupBy("o_orderpriority").agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.01)).alias("lo"),
        F.percentile(F.col("o_totalprice"), F.lit(0.99)).alias("hi"),
    )
    w = orders.join(F.broadcast(cuts), "o_orderpriority")
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("o_totalprice")))
    return w.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_totalprice") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_lo"),
        F.sum(F.when(F.col("o_totalprice") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_hi"),
        F.round(F.any_value(F.col("lo")), 4).alias("cutoff_lo"),
        F.round(F.any_value(F.col("hi")), 4).alias("cutoff_hi"),
        F.round(
            F.sum(F.round(clipped, 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("winsorized_mean"),
    )


_RESERVOIR_K = 20


@query(
    "q_reservoir_k_per_group",
    oracle=f"""
WITH r AS (
  SELECT lang, doc_id,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY {duck_hash_gate("CAST(doc_id AS VARCHAR)", "reservoir")}, doc_id
    ) AS rn
  FROM documents
)
SELECT lang, doc_id, CAST(rn AS INT) AS rn
FROM r WHERE rn <= {_RESERVOIR_K}
""",
    tags=("sampling", "ring-c", "deterministic", "reservoir"),
    description=(
        "Deterministic fixed-k-per-stratum sample (reservoir-sampling "
        "semantics without RNG state): rank docs per language by their "
        "md5 hash-gate and keep the first k.  Content-derived order "
        "means the sample is stable under repartitioning and reruns, "
        "and adding new docs displaces members exactly as a true "
        "reservoir would.  One shuffle on the stratum key."
    ),
)
def q_reservoir_k_per_group(spark, sf_dir):
    from ..operators.sampling import hash_gate

    docs = cat(spark, sf_dir).documents
    w = Window.partitionBy("lang").orderBy(
        hash_gate(F.col("doc_id").cast("string"), "reservoir"), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _RESERVOIR_K)
    )


@query(
    "q_quantile_normalize_prices",
    oracle="""
SELECT o_orderkey, o_orderpriority,
  round(percent_rank() OVER (
    PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey), 6) AS u,
  round((o_totalprice - min(o_totalprice) OVER (PARTITION BY o_orderpriority))
        / (max(o_totalprice) OVER (PARTITION BY o_orderpriority)
           - min(o_totalprice) OVER (PARTITION BY o_orderpriority)), 6)
    AS minmax_scaled
FROM orders
""",
    tags=("window", "normalization", "ml-preprocessing", "analytics"),
    description=(
        "Feature normalization as window algebra: per-priority uniform "
        "quantile (percent_rank with a unique total order) and min-max "
        "scaling.  Both are per-group windows -- one shuffle on the "
        "group key, no global sort, no driver-side statistics."
    ),
)
def q_quantile_normalize_prices(spark, sf_dir):
    orders = cat(spark, sf_dir).orders
    wo = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wa = Window.partitionBy("o_orderpriority")
    lo = F.min("o_totalprice").over(wa)
    hi = F.max("o_totalprice").over(wa)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(wo), 6).alias("u"),
        F.round(
            (F.col("o_totalprice") - lo) / (hi - lo), 6
        ).alias("minmax_scaled"),
    )


@query(
    "q_rolling_24h_active_users",
    oracle="""
WITH hu AS (
  SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
),
hours AS (
  SELECT DISTINCT h FROM hu
),
r AS (
  SELECT hours.h, hu.user_id
  FROM hours JOIN hu
    ON hu.h BETWEEN hours.h - INTERVAL 23 HOUR AND hours.h
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users_24h
FROM r GROUP BY h ORDER BY hour
""",
    tags=("events", "window", "distinct", "analytics"),
    description=(
        "Rolling 24h distinct active users per hour (the DAU curve).  "
        "Spark has no DISTINCT window aggregate and a time-range "
        "self-join degenerates to a nested-loop, so the scale shape is "
        "contribution EXPLODE: each (hour, user) row fans out to the "
        "24 target hours it keeps the user active in, then one "
        "count_distinct groupBy -- linear in events x 24, partial-agg "
        "friendly, no range join.  The oracle uses the naive interval "
        "join (fine for DuckDB at oracle scale)."
    ),
)
def q_rolling_24h_active_users(spark, sf_dir):
    ev = cat(spark, sf_dir).events
    hu = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id"
    ).distinct()
    contrib = hu.select(
        F.explode(
            F.expr("sequence(h, h + interval 23 hours, interval 1 hour)")
        ).alias("th"),
        "user_id",
    )
    actual = hu.select(F.col("h").alias("th")).distinct()
    return (
        contrib.join(actual, "th")
        .groupBy("th")
        .agg(F.count_distinct("user_id").alias("active_users_24h"))
        .select(fmt_ts("th", "hour"), "active_users_24h")
        .orderBy("hour")
    )


@query(
    "q_laspeyres_price_index",
    oracle="""
WITH m AS (
  SELECT l_partkey, strftime(date_trunc('month', l_shipdate), '%Y-%m') AS mon,
    sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS spend,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS qty
  FROM lineitem GROUP BY 1, 2
),
p AS (
  SELECT l_partkey, mon,
    CAST(CAST(spend AS DOUBLE) / CAST(qty AS DOUBLE) AS DOUBLE) AS unit_price,
    qty
  FROM m WHERE qty > 0
),
base AS (
  SELECT l_partkey, unit_price AS p0, qty AS q0
  FROM p QUALIFY row_number() OVER (PARTITION BY l_partkey ORDER BY mon) = 1
),
idx AS (
  SELECT p.mon,
    sum(CAST(floor(p.unit_price * base.q0 * 1000000.0 + 0.5)
      / 1000000.0 AS DECIMAL(18,6))) AS cur,
    sum(CAST(floor(base.p0 * base.q0 * 1000000.0 + 0.5)
      / 1000000.0 AS DECIMAL(18,6))) AS bas,
    count(*) AS n_parts
  FROM p JOIN base USING (l_partkey)
  GROUP BY p.mon
)
SELECT mon, CAST(n_parts AS BIGINT) AS n_parts,
  floor(CAST(cur AS DOUBLE) / CAST(bas AS DOUBLE) * 100.0 * 10000.0 + 0.5)
    / 10000.0 AS laspeyres_index
FROM idx ORDER BY mon
""",
    tags=("analytics", "economics", "index", "report"),
    description=(
        "Laspeyres price index per ship month: each part's monthly "
        "unit price (exact-DECIMAL spend/qty) weighted by its BASE-"
        "month quantity, index = 100 * sum(p_t*q_0)/sum(p_0*q_0) over "
        "parts present in the month -- the classic fixed-basket "
        "inflation measure.  Products are quantized to the 1e-6 grid "
        "then DECIMAL-summed, so the basket totals are order-"
        "independent cross-engine."
    ),
)
def q_laspeyres_price_index(spark, sf_dir):
    """One (part, month) rollup, a first-month window per part, a join
    back and a month rollup -- three key-partitioned shuffles, no
    driver involvement."""
    from pyspark.sql import Window

    li = cat(spark, sf_dir).lineitem
    m = li.groupBy(
        "l_partkey",
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
            "mon"
        ),
    ).agg(
        F.sum(dec("l_extendedprice")).alias("spend"),
        F.sum(dec("l_quantity")).cast("decimal(18,6)").alias("qty"),
    )
    p = m.filter(F.col("qty") > 0).select(
        "l_partkey",
        "mon",
        (F.col("spend").cast("double") / F.col("qty").cast("double")).alias(
            "unit_price"
        ),
        "qty",
    )
    w = Window.partitionBy("l_partkey").orderBy("mon")
    base = (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey",
            F.col("unit_price").alias("p0"),
            F.col("qty").alias("q0"),
        )
    )

    def q6(col):
        return (F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast(
            "decimal(18,6)"
        )

    idx = (
        p.join(base, "l_partkey")
        .groupBy("mon")
        .agg(
            F.sum(q6(F.col("unit_price") * F.col("q0").cast("double"))).alias(
                "cur"
            ),
            F.sum(q6(F.col("p0") * F.col("q0").cast("double"))).alias("bas"),
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        )
    )
    return idx.select(
        "mon",
        "n_parts",
        (
            F.floor(
                F.col("cur").cast("double")
                / F.col("bas").cast("double")
                * F.lit(100.0)
                * F.lit(1e4)
                + F.lit(0.5)
            )
            / F.lit(1e4)
        ).alias("laspeyres_index"),
    ).orderBy("mon")


@query(
    "q_skew_profile_orders_custkey",
    oracle="""
WITH k AS (
  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
    CAST(sum(n) AS BIGINT) AS n_rows,
    CAST(max(n) AS BIGINT) AS max_rows,
    CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99_rows
  FROM k
),
top AS (
  SELECT o_custkey, n,
    row_number() OVER (ORDER BY n DESC, o_custkey) AS rnk
  FROM k
)
SELECT s.n_keys, s.n_rows, s.max_rows, s.p99_rows,
  floor(CAST(s.max_rows AS DOUBLE)
    / (CAST(s.n_rows AS DOUBLE) / s.n_keys) * 10000.0 + 0.5) / 10000.0
    AS skew_factor,
  CAST(top.o_custkey AS BIGINT) AS hottest_key
FROM s CROSS JOIN top WHERE top.rnk = 1
""",
    tags=("scale", "skew", "diagnostics", "join"),
    description=(
        "Pre-join skew profile of orders.o_custkey: key count, max and "
        "p99 rows per key, the skew factor (max / mean rows-per-key -- "
        "the number that predicts whether a shuffle join needs salting "
        "or AQE skew-split), and the hottest key.  Discrete p99 is "
        "exact on both engines (Spark percentile_approx is NOT used; "
        "the exact sorted-count form matches quantile_disc)."
    ),
)
def q_skew_profile_orders_custkey(spark, sf_dir):
    """One grouped count, then reductions over the per-VALUE table:
    the per-key table itself scales with the corpus (customers grow
    10x per decade -- the r10 suspect check refuted the old "bounded
    by distinct keys" claim), so the p99 rank runs over the
    rows-per-key VALUE domain instead (distinct counts saturate: ~25
    values at any SF), where the cumulative window really is
    bounded."""
    o = cat(spark, sf_dir).orders
    k = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    # Exact discrete p99: the smallest n whose cumulative key count
    # reaches 99% -- quantile_disc semantics, engine-portable --
    # computed over the per-distinct-n counts, never a rank over the
    # corpus-scaled per-key table.
    vn = k.groupBy("n").agg(F.count(F.lit(1)).alias("cnt"))
    wv = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
    cum = vn.withColumn("cum", F.sum("cnt").over(wv))
    s = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").cast("bigint").alias("max_rows"),
    )
    p99 = (
        cum.crossJoin(F.broadcast(s.select("n_keys")))
        .filter(F.col("cum") >= F.ceil(F.lit(0.99) * F.col("n_keys")))
        .orderBy("n")
        .limit(1)
        .select(F.col("n").cast("bigint").alias("p99_rows"))
    )
    top = (
        k.orderBy(F.desc("n"), "o_custkey")
        .limit(1)
        .select(F.col("o_custkey").cast("bigint").alias("hottest_key"))
    )
    return (
        s.crossJoin(F.broadcast(p99))
        .crossJoin(F.broadcast(top))
        .select(
            "n_keys",
            "n_rows",
            "max_rows",
            "p99_rows",
            (
                F.floor(
                    F.col("max_rows").cast("double")
                    / (
                        F.col("n_rows").cast("double") / F.col("n_keys")
                    )
                    * F.lit(1e4)
                    + F.lit(0.5)
                )
                / F.lit(1e4)
            ).alias("skew_factor"),
            "hottest_key",
        )
    )


@query(
    "q_association_rules_parts",
    oracle="""
WITH b AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM b),
n AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_i FROM b GROUP BY item
),
co AS (
  SELECT a.item AS item_a, c.item AS item_b,
    CAST(count(*) AS BIGINT) AS co_baskets
  FROM b a JOIN b c ON a.basket = c.basket AND a.item < c.item
  GROUP BY a.item, c.item
  HAVING count(*) >= 2
),
s AS (
  SELECT co.item_a, co.item_b, co.co_baskets,
    floor(CAST(co.co_baskets AS DOUBLE) / nb.n_baskets * 1000000.0 + 0.5)
      / 1000000.0 AS support,
    floor(CAST(co.co_baskets AS DOUBLE) / na.n_i * 1000000.0 + 0.5)
      / 1000000.0 AS conf_ab,
    floor(CAST(co.co_baskets AS DOUBLE) / nc.n_i * 1000000.0 + 0.5)
      / 1000000.0 AS conf_ba,
    floor(CAST(co.co_baskets AS DOUBLE) * nb.n_baskets
          / (CAST(na.n_i AS DOUBLE) * nc.n_i) * 1000000.0 + 0.5)
      / 1000000.0 AS lift
  FROM co
  JOIN n na ON na.item = co.item_a
  JOIN n nc ON nc.item = co.item_b
  CROSS JOIN nb
)
SELECT item_a, item_b, co_baskets, support, conf_ab, conf_ba, lift,
  CAST(row_number() OVER (ORDER BY lift DESC, item_a, item_b) AS BIGINT)
    AS rank
FROM s
QUALIFY rank <= 20
ORDER BY rank
""",
    tags=("analytics", "recsys", "market-basket", "ring-b"),
    description=(
        "Market-basket association rules over order baskets: pair "
        "support, both-direction confidence, and lift (co*N/(na*nb)) "
        "for part pairs co-purchased in >= 2 orders, top-20 by lift.  "
        "Every statistic is a ratio of exact BIGINTs through one "
        "portable floor-round; the pair fan-out is bounded by order "
        "width (TPC-H baskets are <= 7 lines), so the self-join is "
        "pairs-within-basket, never items x items."
    ),
)
def q_association_rules_parts(spark, sf_dir):
    """Shuffles: distinct (basket, item), the basket-keyed self-join
    (fan-out <= width^2/2 per basket), the (a, b) rollup; the item
    count table joins UNHINTED (it scales with the corpus -- the
    estimator broadcasts it while small, AQE degrades to shuffle past
    the threshold); N is a 1-row broadcast scalar."""
    from pyspark.sql import Window

    li = cat(spark, sf_dir).lineitem
    b = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    nb = b.agg(F.count_distinct("basket").cast("bigint").alias("n_baskets"))
    n = b.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("n_i"))
    x = b.select("basket", F.col("item").alias("item_a"))
    y = b.select("basket", F.col("item").alias("item_b"))
    co = (
        x.join(y, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co_baskets"))
        .filter(F.col("co_baskets") >= 2)
    )

    def pr6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    # The per-item count table scales with the corpus (items are part
    # keys: 10x per decade, r10 suspect check), so it must NOT carry a
    # broadcast hint -- the estimator/AQE still broadcasts it while it
    # measures small and degrades to a shuffle join past the threshold.
    s = (
        co.join(
            n.select(F.col("item").alias("item_a"), F.col("n_i").alias("na")),
            "item_a",
        )
        .join(
            n.select(F.col("item").alias("item_b"), F.col("n_i").alias("nbk")),
            "item_b",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "co_baskets",
            pr6(
                F.col("co_baskets").cast("double") / F.col("n_baskets")
            ).alias("support"),
            pr6(F.col("co_baskets").cast("double") / F.col("na")).alias(
                "conf_ab"
            ),
            pr6(F.col("co_baskets").cast("double") / F.col("nbk")).alias(
                "conf_ba"
            ),
            pr6(
                F.col("co_baskets").cast("double")
                * F.col("n_baskets")
                / (F.col("na").cast("double") * F.col("nbk"))
            ).alias("lift"),
        )
    )
    # Top-20 BEFORE ranking: orderBy().limit() plans
    # TakeOrderedAndProject (per-partition heaps, no global sort), and
    # the rank window then runs over 20 rows -- the r9 shape ranked the
    # corpus-scaled pair table in one task first.  The order is total
    # (lift, item_a, item_b), so limit-then-rank is value-identical.
    order = [F.desc("lift"), F.asc("item_a"), F.asc("item_b")]
    w = Window.orderBy(*order)
    return (
        s.orderBy(*order)
        .limit(20)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# Markov chain steady state of the event-type process
# --------------------------------------------------------------------------

_MARKOV_ITERS = 8
_MARKOV_SCALE = 1_000_000


def _duck_markov_sql(iters: int = _MARKOV_ITERS) -> str:
    """Generated unrolled twin of the Spark power-iteration loop below
    (the duck_pagerank_sql convention: generated text cannot drift from
    the loop; AS MATERIALIZED because DuckDB inlines plain CTEs and the
    chained iterations would expand exponentially).  All arithmetic is
    BIGINT with `//` floor division -- identical to Spark's `div` on
    the same positive operands."""
    s = _MARKOV_SCALE
    parts = [
        """seq AS (
  SELECT event_type AS cur,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS nxt
  FROM events
)""",
        "t AS MATERIALIZED (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c"
        " FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt)",
        "r AS MATERIALIZED (SELECT cur, CAST(sum(c) AS BIGINT) AS rtot"
        " FROM t GROUP BY cur)",
        "tr AS MATERIALIZED (SELECT t.cur, t.nxt, t.c, r.rtot"
        " FROM t JOIN r ON t.cur = r.cur)",
        "nn AS (SELECT count(*) AS n FROM r)",
        f"p0 AS MATERIALIZED (SELECT r.cur AS state,"
        f" CAST({s} // nn.n AS BIGINT) AS p FROM r CROSS JOIN nn)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"p{k} AS MATERIALIZED (SELECT tr.nxt AS state,"
            f" CAST(sum((p.p * tr.c) // tr.rtot) AS BIGINT) AS p"
            f" FROM p{k - 1} p JOIN tr ON tr.cur = p.state GROUP BY tr.nxt)"
        )
    parts.append("tot AS (SELECT CAST(sum(rtot) AS BIGINT) AS tot FROM r)")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT f.state AS event_type,
  f.p / {s}.0 AS stationary_p,
  CAST((r.rtot * {s}) // tot.tot AS BIGINT) / {s}.0 AS empirical_p
FROM p{iters} f
JOIN r ON r.cur = f.state
CROSS JOIN tot
ORDER BY event_type
"""
    )


@query(
    "q_markov_stationary_types",
    oracle=_duck_markov_sql(),
    tags=("events", "markov", "fixed-point", "iterative", "analytics"),
    description=(
        "Steady-state distribution of the first-order event-type "
        "Markov chain: 8 power-iteration steps over the row-"
        "normalized transition matrix, entirely in micro-unit BIGINT "
        "fixed point (each mass transfer is (p*c) // rowsum -- floor "
        "division, so both engines walk identical integer vectors), "
        "reported next to the empirical origin frequencies."
    ),
)
def q_markov_stationary_types(spark, sf_dir):
    """The only event-scale work is the lead() pair build (one shuffle
    on user_id) and the transition rollup; the chain itself is
    |types|^2 rows -- bounded by the TYPE VOCABULARY, not data volume
    -- so it is collected (guarded, <= 10k entries) and the 8 power
    iterations run as driver-side Python integer arithmetic: `//` on
    positive ints is the same floor division as the oracle's BIGINT
    `//`, so the walked vectors are identical.  A first cut kept the
    iterations as unrolled broadcast joins and the sf1 rehearsal
    flagged it SUPER-LINEAR (exponent 2.13, 232 s): every iteration's
    broadcast re-executed the whole accumulated lineage, events scan
    included.  Driver-side iteration is the Lloyd-IVF-fit convention
    (bounded collect + exact arithmetic) and removes all re-scans."""
    ev = cat(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    tr = (
        seq.groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .collect()
    )
    if len(tr) > 10_000:
        raise ValueError(
            "q_markov_stationary_types: transition matrix has "
            f"{len(tr)} entries; the bounded-collect guard assumes a "
            "small state space (<= 10k pairs)"
        )
    c = {(row["cur"], row["nxt"]): int(row["c"]) for row in tr}
    rtot: dict = {}
    for (i, _j), cij in c.items():
        rtot[i] = rtot.get(i, 0) + cij
    n = len(rtot)
    pi = {s: _MARKOV_SCALE // n for s in rtot}
    for _ in range(_MARKOV_ITERS):
        # Mirror the oracle's join semantics exactly: p{k} has a row
        # for every nxt reachable from p{k-1}'s support; states with
        # no outgoing edges leak their mass (documented, identical).
        new: dict = {}
        for (i, j), cij in c.items():
            if i in pi:
                new[j] = new.get(j, 0) + (pi[i] * cij) // rtot[i]
        pi = new
    tot = sum(rtot.values())
    rows = [
        (
            s,
            pi[s] / float(_MARKOV_SCALE),
            ((rtot[s] * _MARKOV_SCALE) // tot) / float(_MARKOV_SCALE),
        )
        for s in sorted(rtot)
        if s in pi  # the oracle's final INNER JOIN p8 x r
    ]
    return spark.createDataFrame(
        rows, "event_type string, stationary_p double, empirical_p double"
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Inter-arrival burstiness (Goh-Barabasi B index)
# --------------------------------------------------------------------------

@query(
    "q_interarrival_burstiness",
    oracle="""
WITH g AS (
  SELECT user_id,
    floor(epoch(ts))
      - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id))) AS gap
  FROM events
),
s AS (
  SELECT user_id,
    CAST(count(gap) AS BIGINT) AS n_gaps,
    CAST(sum(CAST(gap AS BIGINT)) AS BIGINT) AS sg,
    CAST(sum(CAST(gap AS BIGINT) * CAST(gap AS BIGINT)) AS BIGINT) AS sg2
  FROM g WHERE gap IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_gaps,
  floor(sg / CAST(n_gaps AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
    AS mean_gap_s,
  floor(sqrt(greatest(CAST(0.0 AS DOUBLE),
             (sg2 - sg / CAST(n_gaps AS DOUBLE) * sg)
             / CAST(n_gaps AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0
    AS std_gap_s,
  floor((sqrt(greatest(CAST(0.0 AS DOUBLE),
              (sg2 - sg / CAST(n_gaps AS DOUBLE) * sg)
              / CAST(n_gaps AS DOUBLE))) - sg / CAST(n_gaps AS DOUBLE))
        / (sqrt(greatest(CAST(0.0 AS DOUBLE),
                (sg2 - sg / CAST(n_gaps AS DOUBLE) * sg)
                / CAST(n_gaps AS DOUBLE))) + sg / CAST(n_gaps AS DOUBLE))
        * 1000000.0 + 0.5) / 1000000.0 AS burstiness
FROM s
WHERE n_gaps >= 2
ORDER BY user_id
""",
    tags=("events", "timeseries", "stats", "burstiness"),
    description=(
        "Per-user inter-arrival burstiness: gaps in floored-epoch "
        "seconds, then the Goh-Barabasi index B = (s-m)/(s+m) from "
        "exact BIGINT sufficient statistics (n, sum g, sum g^2); "
        "-1 = periodic, 0 = Poisson, ->1 = bursty.  mean/std/B use "
        "only correctly-rounded IEEE ops (div, sqrt) in the identical "
        "literal expression order, so the doubles are bit-equal "
        "cross-engine before the 1e-6 rounding."
    ),
)
def q_interarrival_burstiness(spark, sf_dir):
    """One shuffle for the lag window; the sufficient statistics
    reduce per user (partial-aggregated), so at 100 TB the post-window
    traffic is user-cardinality sized.  All data-dependent
    accumulation is exact BIGINT; doubles appear only in the final
    per-user scalar expression."""
    ev = cat(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")))
    g = ev.select(
        "user_id", (sec - F.lag(sec).over(w)).cast("bigint").alias("gap")
    ).filter(F.col("gap").isNotNull())
    s = g.groupBy("user_id").agg(
        F.count("gap").cast("bigint").alias("n_gaps"),
        F.sum("gap").cast("bigint").alias("sg"),
        F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("sg2"),
    )
    n_d = F.col("n_gaps").cast("double")
    mean = F.col("sg") / n_d
    # greatest(0, var): float cancellation on a near-constant gap
    # series can push the variance expression a hair negative, where
    # DuckDB's sqrt RAISES (Spark returns NaN) -- clamp in BOTH engines
    # with the identical op so the doubles stay bit-equal.
    var = F.greatest(
        F.lit(0.0), (F.col("sg2") - F.col("sg") / n_d * F.col("sg")) / n_d
    )
    std = F.sqrt(var)

    return (
        s.filter(F.col("n_gaps") >= 2)
        .select(
            "user_id",
            "n_gaps",
            portable_round(mean, 6).alias("mean_gap_s"),
            portable_round(std, 6).alias("std_gap_s"),
            portable_round((std - mean) / (std + mean), 6).alias("burstiness"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Mix-shift decomposition (rate vs mix vs interaction)
# --------------------------------------------------------------------------

_MIX_PIVOT = "1996-01-01 00:00:00"


@query(
    "q_mix_shift_decomposition",
    oracle=f"""
WITH s AS (
  SELECT o_orderpriority AS seg,
    CASE WHEN o_orderdate < TIMESTAMP '{_MIX_PIVOT}' THEN 0 ELSE 1 END
      AS period,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1, 2
),
t AS (
  SELECT period, CAST(sum(n) AS BIGINT) AS nt FROM s GROUP BY period
),
w AS (
  SELECT s.seg,
    max(CASE WHEN s.period = 0 THEN CAST(s.n AS DOUBLE) / t.nt END)
      AS w0,
    max(CASE WHEN s.period = 1 THEN CAST(s.n AS DOUBLE) / t.nt END)
      AS w1,
    max(CASE WHEN s.period = 0 THEN s.rev / s.n END) AS aov0,
    max(CASE WHEN s.period = 1 THEN s.rev / s.n END) AS aov1
  FROM s JOIN t ON t.period = s.period
  GROUP BY s.seg
),
q AS (
  -- every effect term quantized ONCE to the 1e-6 grid (micro-dollars
  -- of AOV) then integer-summed: no order-dependent double
  -- accumulation across segments.
  SELECT seg, w0, w1, aov0, aov1,
    CAST(floor((w1 - w0) * aov0 * 1000000.0 + 0.5) AS BIGINT) AS mix_q,
    CAST(floor(w0 * (aov1 - aov0) * 1000000.0 + 0.5) AS BIGINT) AS rate_q,
    CAST(floor((w1 - w0) * (aov1 - aov0) * 1000000.0 + 0.5) AS BIGINT)
      AS inter_q
  FROM w
),
g AS (
  SELECT CAST(sum(mix_q) AS BIGINT) AS gm, CAST(sum(rate_q) AS BIGINT) AS gr,
    CAST(sum(inter_q) AS BIGINT) AS gi
  FROM q
)
SELECT q.seg,
  floor(q.w0 * 1000000.0 + 0.5) / 1000000.0 AS share_base,
  floor(q.w1 * 1000000.0 + 0.5) / 1000000.0 AS share_cur,
  floor(q.aov0 * 100.0 + 0.5) / 100.0 AS aov_base,
  floor(q.aov1 * 100.0 + 0.5) / 100.0 AS aov_cur,
  q.mix_q / 1000000.0 AS mix_effect,
  q.rate_q / 1000000.0 AS rate_effect,
  q.inter_q / 1000000.0 AS interaction,
  g.gm / 1000000.0 AS total_mix,
  g.gr / 1000000.0 AS total_rate,
  g.gi / 1000000.0 AS total_interaction
FROM q CROSS JOIN g
ORDER BY q.seg
""",
    tags=("analytics", "bi", "decomposition", "ring-b"),
    description=(
        "Mix-shift decomposition of the average-order-value change "
        "across the 1996 pivot: per order priority, the AOV delta "
        "splits into MIX (share shift at base rates), RATE (AOV "
        "change at base shares) and the interaction residual -- the "
        "three-way bridge that explains WHY a blended KPI moved, "
        "identical to the Laspeyres index machinery one row up.  Every "
        "effect term is quantized once to micro-dollars then integer-"
        "summed, so segment totals reconcile exactly across engines."
    ),
)
def q_mix_shift_decomposition(spark, sf_dir):
    """One shuffle: the (segment, period) rollup (10 groups); the
    period totals broadcast back and everything downstream is
    segment-sized.  The decomposition never touches row data again --
    the 100 TB cost is one aggregation pass."""
    orders = cat(spark, sf_dir).orders
    pivot = ts_lit(orders, "o_orderdate", _MIX_PIVOT)
    s = orders.groupBy(
        F.col("o_orderpriority").alias("seg"),
        F.when(F.col("o_orderdate") < pivot, 0).otherwise(1).alias("period"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("rev"),
    )
    t = s.groupBy("period").agg(F.sum("n").cast("bigint").alias("nt"))
    j = s.join(F.broadcast(t), "period")
    w = j.groupBy("seg").agg(
        F.max(
            F.when(F.col("period") == 0, F.col("n").cast("double") / F.col("nt"))
        ).alias("w0"),
        F.max(
            F.when(F.col("period") == 1, F.col("n").cast("double") / F.col("nt"))
        ).alias("w1"),
        F.max(
            F.when(F.col("period") == 0, F.col("rev") / F.col("n"))
        ).alias("aov0"),
        F.max(
            F.when(F.col("period") == 1, F.col("rev") / F.col("n"))
        ).alias("aov1"),
    )

    def q6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("bigint")

    q = w.select(
        "seg",
        "w0",
        "w1",
        "aov0",
        "aov1",
        q6((F.col("w1") - F.col("w0")) * F.col("aov0")).alias("mix_q"),
        q6(F.col("w0") * (F.col("aov1") - F.col("aov0"))).alias("rate_q"),
        q6(
            (F.col("w1") - F.col("w0")) * (F.col("aov1") - F.col("aov0"))
        ).alias("inter_q"),
    )
    g = q.agg(
        F.sum("mix_q").cast("bigint").alias("gm"),
        F.sum("rate_q").cast("bigint").alias("gr"),
        F.sum("inter_q").cast("bigint").alias("gi"),
    )

    def pr6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    def pr2(c):
        return F.floor(c * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)

    return (
        q.crossJoin(F.broadcast(g))
        .select(
            "seg",
            pr6(F.col("w0")).alias("share_base"),
            pr6(F.col("w1")).alias("share_cur"),
            pr2(F.col("aov0")).alias("aov_base"),
            pr2(F.col("aov1")).alias("aov_cur"),
            (F.col("mix_q") / F.lit(1e6)).alias("mix_effect"),
            (F.col("rate_q") / F.lit(1e6)).alias("rate_effect"),
            (F.col("inter_q") / F.lit(1e6)).alias("interaction"),
            (F.col("gm") / F.lit(1e6)).alias("total_mix"),
            (F.col("gr") / F.lit(1e6)).alias("total_rate"),
            (F.col("gi") / F.lit(1e6)).alias("total_interaction"),
        )
        .orderBy("seg")
    )


# --------------------------------------------------------------------------
# Exact global percentiles without a global sort (two-level histogram)
# --------------------------------------------------------------------------

_PCT_ORACLE = """
WITH c AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
),
n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
k AS (
  SELECT n, (n + 1) // 2 AS k50, (9 * n + 9) // 10 AS k90,
    (99 * n + 99) // 100 AS k99
  FROM n1
),
r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c)
SELECT k.n AS n_rows,
  (SELECT cents FROM r WHERE rn = k.k50) / 100.0 AS p50,
  (SELECT cents FROM r WHERE rn = k.k90) / 100.0 AS p90,
  (SELECT cents FROM r WHERE rn = k.k99) / 100.0 AS p99
FROM k
"""


@query(
    "q_exact_price_percentiles",
    oracle=_PCT_ORACLE,
    tags=("analytics", "percentile", "exact", "ring-b"),
    description=(
        "EXACT p50/p90/p99 of the line-item price (rank k = "
        "ceil(p*n), integer rank arithmetic) computed WITHOUT any "
        "global sort: a $100-bucket histogram locates each target "
        "rank's bucket, then a second cents-level histogram inside "
        "only the hit buckets resolves the exact value -- both "
        "histograms are DOMAIN-bounded (~1.1k buckets; <= 10k cent "
        "values per bucket), so nothing row-scale ever sorts or "
        "single-partitions.  The exact twin of the approx-percentile "
        "family, and the pattern that makes exact quantiles viable "
        "at 100 TB."
    ),
)
def q_exact_price_percentiles(spark, sf_dir):
    """Two aggregation passes over the fact table (level-1 histogram,
    level-2 filtered histogram) + windows over domain-bounded
    relations only.  The oracle uses the plain global-sort rank
    (single-node DuckDB can afford it); the Spark side is the
    scale shape, both reaching the identical rank-k values."""
    li = cat(spark, sf_dir).lineitem
    cents = li.select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents")
    )
    # NOT checkpointed: cents is FACT-scale (one row per lineitem);
    # the two histogram passes re-scan the single pushed-down parquet
    # column instead, which is cheaper than materializing ~8B x n into
    # executor memory/disk (checkpoints are for bounded relations).
    h1 = cents.groupBy(
        F.expr("cents DIV 10000").alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    h = h1.withColumn(
        "cumb", F.coalesce(F.sum("cnt").over(wb), F.lit(0)).cast("bigint")
    )
    n1 = h1.agg(F.sum("cnt").cast("bigint").alias("n"))
    targets = n1.select(
        "n",
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("lbl"),
                    F.expr("(n + 1) DIV 2").alias("k"),
                ),
                F.struct(
                    F.lit("p90").alias("lbl"),
                    F.expr("(9 * n + 9) DIV 10").alias("k"),
                ),
                F.struct(
                    F.lit("p99").alias("lbl"),
                    F.expr("(99 * n + 99) DIV 100").alias("k"),
                ),
            )
        ).alias("t"),
    ).select("n", F.col("t.lbl").alias("lbl"), F.col("t.k").alias("k"))
    tb = h.join(
        F.broadcast(targets),
        (F.col("cumb") < F.col("k")) & (F.col("cumb") + F.col("cnt") >= F.col("k")),
    ).select("lbl", "k", "b", "cumb")
    h2 = (
        cents.join(F.broadcast(tb), F.expr("cents DIV 10000") == F.col("b"))
        .groupBy("lbl", "k", "cumb", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt2"))
    )
    w2 = (
        Window.partitionBy("lbl")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    picked = (
        h2.withColumn(
            "cum2",
            F.col("cumb")
            + F.coalesce(F.sum("cnt2").over(w2), F.lit(0)).cast("bigint"),
        )
        .filter(
            (F.col("cum2") < F.col("k"))
            & (F.col("cum2") + F.col("cnt2") >= F.col("k"))
        )
        .select("lbl", "cents")
    )
    return (
        picked.groupBy()
        .pivot("lbl", ["p50", "p90", "p99"])
        .agg(F.max("cents"))
        .crossJoin(F.broadcast(n1))
        .select(
            F.col("n").alias("n_rows"),
            (F.col("p50") / F.lit(100.0)).alias("p50"),
            (F.col("p90") / F.lit(100.0)).alias("p90"),
            (F.col("p99") / F.lit(100.0)).alias("p99"),
        )
    )


# --------------------------------------------------------------------------
# Markov removal-effect attribution (absorbing-chain channel credit)
# --------------------------------------------------------------------------

_RE_ITERS = 12
_RE_SCALE = 1_000_000
_RE_CHANNELS = ("click", "error", "signup", "view")
_RE_CONV = "purchase"

_RE_JOURNEY_CTES = f"""ev2 AS (
  SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
fp AS (
  SELECT user_id, min(rn) AS frn FROM ev2
  WHERE event_type = '{_RE_CONV}' GROUP BY user_id
),
kept AS (
  SELECT e.user_id, e.event_type, e.rn, fp.frn
  FROM ev2 e LEFT JOIN fp USING (user_id)
  WHERE fp.frn IS NULL OR e.rn < fp.frn
),
tr_raw AS (
  SELECT 'START' AS cur, event_type AS nxt FROM kept WHERE rn = 1
  UNION ALL
  SELECT 'START', 'CONV' FROM fp WHERE frn = 1
  UNION ALL
  SELECT a.event_type, b.event_type
  FROM kept a JOIN kept b ON b.user_id = a.user_id AND b.rn = a.rn + 1
  UNION ALL
  SELECT k.event_type,
    CASE WHEN k.frn IS NOT NULL THEN 'CONV' ELSE 'DROP' END
  FROM kept k JOIN (
    SELECT user_id, max(rn) AS mrn FROM kept GROUP BY user_id
  ) m ON k.user_id = m.user_id AND k.rn = m.mrn
),
t AS MATERIALIZED (
  SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c FROM tr_raw
  GROUP BY cur, nxt
),
r AS MATERIALIZED (SELECT cur, CAST(sum(c) AS BIGINT) AS rtot FROM t
  GROUP BY cur),
tr AS MATERIALIZED (SELECT t.cur, t.nxt, t.c, r.rtot
  FROM t JOIN r ON r.cur = t.cur)"""


def _duck_removal_sql(iters: int = _RE_ITERS) -> str:
    """Generated unrolled twin of the absorbing-chain loop: one value
    chain for the full graph plus one per removed channel (redirecting
    transitions INTO the channel to 0-value, the removal-effect
    convention -- row sums unchanged).  All BIGINT `//` arithmetic,
    AS MATERIALIZED stages (the duck_pagerank_sql convention)."""
    s = _RE_SCALE
    parts = [_RE_JOURNEY_CTES]

    def chain(tag: str, removed: str | None) -> None:
        dead = f" WHEN tr.nxt = '{removed}' THEN 0" if removed else ""
        parts.append(
            f"v_{tag}_0 AS (SELECT cur AS state, CAST(0 AS BIGINT) AS v"
            f" FROM r)"
        )
        for k in range(1, iters + 1):
            parts.append(
                f"v_{tag}_{k} AS MATERIALIZED ("
                f"SELECT tr.cur AS state, CAST(sum((tr.c * CASE"
                f" WHEN tr.nxt = 'CONV' THEN {s}"
                f" WHEN tr.nxt = 'DROP' THEN 0{dead}"
                f" ELSE coalesce(p.v, 0) END) // tr.rtot) AS BIGINT) AS v"
                f" FROM tr LEFT JOIN v_{tag}_{k - 1} p ON p.state = tr.nxt"
                f" GROUP BY tr.cur)"
            )

    chain("base", None)
    for ch in _RE_CHANNELS:
        chain(ch, ch)
    bx = " UNION ALL ".join(
        f"SELECT '{ch}' AS channel, v FROM v_{ch}_{iters}"
        f" WHERE state = 'START'"
        for ch in _RE_CHANNELS
    )
    parts.append(
        f"b AS (SELECT v FROM v_base_{iters} WHERE state = 'START')"
    )
    parts.append(f"bx AS ({bx})")
    parts.append(
        f"re AS (SELECT channel,"
        f" CAST(((b.v - bx.v) * {s}) // b.v AS BIGINT) AS re_q"
        f" FROM bx CROSS JOIN b)"
    )
    parts.append("sre AS (SELECT CAST(sum(re_q) AS BIGINT) AS sq FROM re)")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT re.channel, re.re_q / {s}.0 AS removal_effect,
  CAST((re.re_q * {s}) // sre.sq AS BIGINT) / {s}.0 AS attribution_share,
  b.v / {s}.0 AS base_conversion
FROM re CROSS JOIN sre CROSS JOIN b
ORDER BY re.channel"""
    )


@query(
    "q_markov_removal_attribution",
    oracle=_duck_removal_sql(),
    tags=("events", "markov", "attribution", "iterative", "ring-b"),
    description=(
        "Markov removal-effect attribution: user journeys (events "
        "before the first purchase, START-prefixed, absorbed by CONV "
        "or DROP) build a first-order chain; each channel's credit is "
        "how much the START-to-conversion probability falls when "
        "transitions into that channel are redirected to DROP -- the "
        f"data-driven multi-touch model, vs the positional heuristic "
        f"next door.  {_RE_ITERS} absorbing-chain value iterations "
        "per graph variant, micro-unit BIGINT floor arithmetic, so "
        "both engines walk identical integer vectors."
    ),
)
def q_markov_removal_attribution(spark, sf_dir):
    """Event-scale work: the per-user journey windows and ONE
    transition rollup (states are the event-type vocabulary, bounded);
    the 5 value chains (base + one per channel) iterate driver-side
    over the guarded-collect matrix -- the q_markov_stationary_types
    convention that replaced a rehearsal-flagged exponent-2.13
    broadcast unroll.  Python `//` on nonnegative ints = the oracle's
    BIGINT `//`."""
    ev = cat(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev2 = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    fp = (
        ev2.filter(F.col("event_type") == _RE_CONV)
        .groupBy("user_id")
        .agg(F.min("rn").alias("frn"))
    )
    kept = (
        ev2.join(fp, "user_id", "left")
        .filter(F.col("frn").isNull() | (F.col("rn") < F.col("frn")))
        .localCheckpoint(eager=True)
    )
    start1 = kept.filter(F.col("rn") == 1).select(
        F.lit("START").alias("cur"), F.col("event_type").alias("nxt")
    )
    start_conv = fp.filter(F.col("frn") == 1).select(
        F.lit("START").alias("cur"), F.lit("CONV").alias("nxt")
    )
    a = kept.select("user_id", F.col("rn").alias("ra"), F.col("event_type").alias("cur"))
    bnext = kept.select(
        "user_id", F.col("rn").alias("rb"), F.col("event_type").alias("nxt")
    )
    mids = a.join(
        bnext, (a.user_id == bnext.user_id) & (F.col("rb") == F.col("ra") + 1)
    ).select("cur", "nxt")
    lastk = (
        kept.join(
            kept.groupBy("user_id").agg(F.max("rn").alias("mrn")), "user_id"
        )
        .filter(F.col("rn") == F.col("mrn"))
        .select(
            F.col("event_type").alias("cur"),
            F.when(F.col("frn").isNotNull(), F.lit("CONV"))
            .otherwise(F.lit("DROP"))
            .alias("nxt"),
        )
    )
    t = (
        start1.unionAll(start_conv)
        .unionAll(mids)
        .unionAll(lastk)
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .collect()
    )
    if len(t) > 10_000:
        raise ValueError(
            "q_markov_removal_attribution: transition matrix has "
            f"{len(t)} entries; bounded-collect guard assumes <= 10k"
        )
    c = {(row["cur"], row["nxt"]): int(row["c"]) for row in t}
    states = sorted({i for i, _ in c})
    extra = {
        j for _, j in c if j not in ("CONV", "DROP") and j not in states
    } | {s for s in states if s not in ("START", *_RE_CHANNELS)}
    if extra:
        raise ValueError(
            f"q_markov_removal_attribution: unexpected states {extra}; "
            f"the generated oracle enumerates channels {_RE_CHANNELS}"
        )
    rtot = {}
    for (i, _j), cij in c.items():
        rtot[i] = rtot.get(i, 0) + cij

    def value_chain(removed):
        v = {s: 0 for s in states}
        for _ in range(_RE_ITERS):
            new = {}
            for s in states:
                acc = 0
                for (i, j), cij in c.items():
                    if i != s:
                        continue
                    if j == "CONV":
                        val = _RE_SCALE
                    elif j == "DROP" or j == removed:
                        val = 0
                    else:
                        val = v.get(j, 0)
                    acc += (cij * val) // rtot[s]
                new[s] = acc
            v = new
        return v["START"]

    b = value_chain(None)
    if b == 0:
        # The oracle's `// b.v` would emit NULL rows here; a chain
        # with zero reachable conversion mass has no attribution to
        # split, so fail loudly instead of returning NULLs.
        raise ValueError(
            "q_markov_removal_attribution: base conversion value is 0 "
            "(no conversion mass within the iteration horizon)"
        )
    res = [(ch, value_chain(ch)) for ch in _RE_CHANNELS]
    re_q = {ch: ((b - bx) * _RE_SCALE) // b for ch, bx in res}
    sq = sum(re_q.values())
    if sq == 0:
        raise ValueError(
            "q_markov_removal_attribution: all removal effects floor "
            "to 0; attribution shares are undefined"
        )
    rows = [
        (
            ch,
            re_q[ch] / float(_RE_SCALE),
            ((re_q[ch] * _RE_SCALE) // sq) / float(_RE_SCALE),
            b / float(_RE_SCALE),
        )
        for ch in sorted(_RE_CHANNELS)
    ]
    return spark.createDataFrame(
        rows,
        "channel string, removal_effect double, attribution_share double,"
        " base_conversion double",
    ).orderBy("channel")


# --------------------------------------------------------------------------
# Simpson's paradox detector (aggregate sign vs per-segment signs)
# --------------------------------------------------------------------------

_SIMPSON_ORACLE = """
WITH o AS (
  SELECT c.c_nationkey AS seg,
    CAST(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END AS BIGINT) AS grp,
    CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT)
      AS hit
  FROM orders JOIN customer c ON c.c_custkey = o_custkey
),
seg AS (
  SELECT seg,
    CAST(sum(CASE WHEN grp = 1 THEN hit ELSE 0 END) AS BIGINT) AS h1,
    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN grp = 0 THEN hit ELSE 0 END) AS BIGINT) AS h0,
    CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
  FROM o GROUP BY seg
),
g AS (
  SELECT CAST(sum(h1) AS BIGINT) AS h1, CAST(sum(n1) AS BIGINT) AS n1,
    CAST(sum(h0) AS BIGINT) AS h0, CAST(sum(n0) AS BIGINT) AS n0
  FROM seg
),
sg AS (
  -- sign of the rate difference WITHOUT division: h1*n0 - h0*n1
  -- (exact integers; n1,n0 > 0 in every populated cell or the
  -- segment is excluded).
  SELECT seg.seg,
    CASE WHEN seg.h1 * seg.n0 - seg.h0 * seg.n1 > 0 THEN 1
         WHEN seg.h1 * seg.n0 - seg.h0 * seg.n1 < 0 THEN -1
         ELSE 0 END AS seg_sign
  FROM seg WHERE seg.n1 > 0 AND seg.n0 > 0
)
SELECT
  CAST((SELECT count(*) FROM sg) AS BIGINT) AS n_segments,
  CAST((SELECT count(*) FROM sg WHERE seg_sign = 1) AS BIGINT)
    AS n_seg_positive,
  CAST((SELECT count(*) FROM sg WHERE seg_sign = -1) AS BIGINT)
    AS n_seg_negative,
  CASE WHEN g.h1 * g.n0 - g.h0 * g.n1 > 0 THEN 1
       WHEN g.h1 * g.n0 - g.h0 * g.n1 < 0 THEN -1
       ELSE 0 END AS aggregate_sign,
  floor(CAST(g.h1 AS DOUBLE) / g.n1 * 1000000.0 + 0.5) / 1000000.0
    AS rate_urgent,
  floor(CAST(g.h0 AS DOUBLE) / g.n0 * 1000000.0 + 0.5) / 1000000.0
    AS rate_other,
  CAST(CASE WHEN (g.h1 * g.n0 - g.h0 * g.n1 > 0
       AND (SELECT count(*) FROM sg WHERE seg_sign = -1)
           > (SELECT count(*) FROM sg WHERE seg_sign = 1))
    OR (g.h1 * g.n0 - g.h0 * g.n1 < 0
       AND (SELECT count(*) FROM sg WHERE seg_sign = 1)
           > (SELECT count(*) FROM sg WHERE seg_sign = -1))
    THEN 1 ELSE 0 END AS BIGINT) AS paradox_flag
FROM g
"""


@query(
    "q_simpsons_paradox_check",
    oracle=_SIMPSON_ORACLE,
    tags=("analytics", "bi", "diagnostics", "ring-b"),
    description=(
        "Simpson's-paradox detector for the urgent-vs-other "
        "fulfillment-rate comparison: the aggregate rate-difference "
        "sign next to the per-nation signs (every sign from exact "
        "integer cross-products h1*n0 - h0*n1, never a division), "
        "flagged when the majority of segments disagree with the "
        "aggregate -- the one diagnostic that stops a blended KPI "
        "from shipping a backwards conclusion."
    ),
)
def q_simpsons_paradox_check(spark, sf_dir):
    """One fact-dim join (nation key via customer, broadcastable dim
    path) + one segment rollup; the aggregate and the sign census
    derive from the ~25-row segment relation."""
    c = cat(spark, sf_dir)
    o = c.orders.join(
        c.customer.select("c_custkey", "c_nationkey"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        F.col("c_nationkey").alias("seg"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("grp"),
        F.when(F.col("o_orderstatus") == "F", 1)
        .otherwise(0)
        .cast("bigint")
        .alias("hit"),
    )
    seg = o.groupBy("seg").agg(
        F.sum(F.when(F.col("grp") == 1, F.col("hit")).otherwise(0))
        .cast("bigint")
        .alias("h1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("hit")).otherwise(0))
        .cast("bigint")
        .alias("h0"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
    ).localCheckpoint(eager=True)
    g = seg.agg(
        F.sum("h1").cast("bigint").alias("h1"),
        F.sum("n1").cast("bigint").alias("n1"),
        F.sum("h0").cast("bigint").alias("h0"),
        F.sum("n0").cast("bigint").alias("n0"),
    )
    cross = F.col("h1") * F.col("n0") - F.col("h0") * F.col("n1")
    sign = (
        F.when(cross > 0, 1).when(cross < 0, -1).otherwise(0)
    )
    sg = seg.filter((F.col("n1") > 0) & (F.col("n0") > 0)).select(
        sign.alias("seg_sign")
    )
    census = sg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum((F.col("seg_sign") == 1).cast("int"))
        .cast("bigint")
        .alias("n_seg_positive"),
        F.sum((F.col("seg_sign") == -1).cast("int"))
        .cast("bigint")
        .alias("n_seg_negative"),
    )

    def q6(col):
        return portable_round(col, 6)

    agg_sign = sign.cast("int")
    return (
        g.crossJoin(F.broadcast(census))
        .select(
            "n_segments",
            "n_seg_positive",
            "n_seg_negative",
            agg_sign.alias("aggregate_sign"),
            q6(F.col("h1").cast("double") / F.col("n1")).alias("rate_urgent"),
            q6(F.col("h0").cast("double") / F.col("n0")).alias("rate_other"),
            F.when(
                ((cross > 0) & (F.col("n_seg_negative") > F.col("n_seg_positive")))
                | ((cross < 0) & (F.col("n_seg_positive") > F.col("n_seg_negative"))),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("paradox_flag"),
        )
    )


# --------------------------------------------------------------------------
# DAU / WAU stickiness (rolling-distinct engagement ratio)
# --------------------------------------------------------------------------

_STICKY_W = 7  # trailing window, days


@query(
    "q_dau_wau_stickiness",
    oracle=f"""
WITH du AS (
  SELECT DISTINCT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS d,
    user_id
  FROM events
),
dau AS (
  SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d
),
contrib AS (
  SELECT du.d + off.o AS td, du.user_id
  FROM du CROSS JOIN (
    SELECT unnest(range(0, {_STICKY_W})) AS o
  ) off
),
wau AS (
  SELECT c.td AS d, CAST(count(DISTINCT c.user_id) AS BIGINT) AS wau
  FROM contrib c JOIN (SELECT DISTINCT d FROM du) a ON a.d = c.td
  GROUP BY c.td
)
SELECT dau.d AS day_index, dau.dau, wau.wau,
  floor(CAST(dau.dau AS DOUBLE) / wau.wau * 1000000.0 + 0.5)
    / 1000000.0 AS stickiness
FROM dau JOIN wau ON wau.d = dau.d
WHERE dau.d >= (SELECT min(d) FROM du) + {_STICKY_W - 1}
ORDER BY day_index
""",
    tags=("analytics", "engagement", "product", "ring-b"),
    description=(
        f"DAU/WAU stickiness per day: daily active users over "
        f"trailing-{_STICKY_W}-day active users, computed with the "
        "contribution-explode pattern (each (user, day) fans out to "
        f"the {_STICKY_W} windows it covers, then ONE count_distinct "
        "per day) -- never a per-day range self-join.  Warm-up days "
        "without a full trailing window are excluded.  The product "
        "engagement ratio (how much of the weekly audience shows up "
        "daily) next to the bounce/retention KPIs."
    ),
)
def q_dau_wau_stickiness(spark, sf_dir):
    f"""One distinct over the (user, day) grid, a {_STICKY_W}x map-side
    fan-out, and day-keyed distinct rollups -- the
    q_rolling_24h_active_users shape on the day grain.  Shuffle
    volume is the user-day grid, never raw events."""
    ev = cat(spark, sf_dir).events
    du = ev.select(
        F.floor(
            F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")))
            / F.lit(86400)
        )
        .cast("bigint")
        .alias("d"),
        "user_id",
    ).distinct().localCheckpoint(eager=True)
    dau = du.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    offs = F.array([F.lit(i) for i in range(_STICKY_W)])
    contrib = du.select(
        F.explode(offs).alias("o"), "d", "user_id"
    ).select((F.col("d") + F.col("o")).alias("td"), "user_id")
    actual = du.select("d").distinct().select(F.col("d").alias("td"))
    wau = (
        contrib.join(actual, "td")
        .groupBy("td")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau"))
    )
    dmin = du.agg(F.min("d").alias("dm"))
    return (
        dau.join(wau, dau.d == wau.td)
        .crossJoin(F.broadcast(dmin))
        .filter(F.col("d") >= F.col("dm") + F.lit(_STICKY_W - 1))
        .select(
            F.col("d").alias("day_index"),
            "dau",
            "wau",
            (
                F.floor(
                    F.col("dau").cast("double") / F.col("wau") * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("stickiness"),
        )
        .orderBy("day_index")
    )


# --------------------------------------------------------------------------
# Conversion latency (first view -> first purchase, exact percentiles)
# --------------------------------------------------------------------------

_CONV_ORACLE = """
WITH f AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'view'
      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS first_view,
    min(CASE WHEN event_type = 'purchase'
      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS first_buy
  FROM events GROUP BY user_id
),
lat AS (
  SELECT first_buy - first_view AS sec
  FROM f
  WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
    AND first_buy >= first_view
),
n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lat),
r AS (SELECT sec, row_number() OVER (ORDER BY sec) AS rn FROM lat)
SELECT n1.n AS n_converted,
  (SELECT sec FROM r CROSS JOIN n1 WHERE rn = (n + 1) // 2) AS p50_sec,
  (SELECT sec FROM r CROSS JOIN n1 WHERE rn = (9 * n + 9) // 10)
    AS p90_sec,
  (SELECT sec FROM r CROSS JOIN n1 WHERE rn = (99 * n + 99) // 100)
    AS p99_sec
FROM n1
"""


@query(
    "q_conversion_latency",
    oracle=_CONV_ORACLE,
    tags=("analytics", "funnel", "latency", "ring-b"),
    description=(
        "Conversion latency: per user, seconds from first view to "
        "first purchase (users whose first purchase precedes any view "
        "are excluded -- they did not convert THROUGH the funnel), "
        "reported as exact rank-selected p50/p90/p99.  The how-long "
        "companion of the funnel's how-many."
    ),
)
def q_conversion_latency(spark, sf_dir):
    """One per-user conditional-min rollup (the only data-scale
    shuffle); the latency relation scales with CONVERTED USERS, so
    the rank selections use the two-level domain-bounded histogram
    (hour buckets -> exact seconds inside the hit buckets, the
    q_exact_price_percentiles pattern) rather than a user-scale
    global window.  Every pick is an .agg() so the empty-funnel edge
    returns one row of NULLs, matching the oracle's scalar
    subqueries."""
    ev = cat(spark, sf_dir).events
    sec = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp"))).cast(
        "bigint"
    )
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", sec)).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", sec)).alias(
            "first_buy"
        ),
    )
    lat = f.filter(
        F.col("first_view").isNotNull()
        & F.col("first_buy").isNotNull()
        & (F.col("first_buy") >= F.col("first_view"))
    ).select(
        (F.col("first_buy") - F.col("first_view")).alias("sec")
    )
    # Level 1: bounded hour-bucket histogram (lateness domain, not
    # user count), checkpointed once for its four consumer legs.
    h1 = (
        lat.groupBy(F.expr("sec DIV 3600").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    h = h1.withColumn(
        "cumb", F.coalesce(F.sum("cnt").over(wb), F.lit(0)).cast("bigint")
    )
    n1 = h1.agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n"))
    targets = n1.select(
        "n",
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50_sec").alias("lbl"),
                    F.expr("(n + 1) DIV 2").alias("k"),
                ),
                F.struct(
                    F.lit("p90_sec").alias("lbl"),
                    F.expr("(9 * n + 9) DIV 10").alias("k"),
                ),
                F.struct(
                    F.lit("p99_sec").alias("lbl"),
                    F.expr("(99 * n + 99) DIV 100").alias("k"),
                ),
            )
        ).alias("t"),
    ).select(F.col("t.lbl").alias("lbl"), F.col("t.k").alias("k"))
    tb = h.join(
        F.broadcast(targets),
        (F.col("cumb") < F.col("k"))
        & (F.col("cumb") + F.col("cnt") >= F.col("k")),
    ).select("lbl", "k", "b", "cumb")
    # Level 2: exact seconds inside only the hit buckets (<= 3600
    # distinct values per bucket -- domain-bounded).
    h2 = (
        lat.join(F.broadcast(tb), F.expr("sec DIV 3600") == F.col("b"))
        .groupBy("lbl", "k", "cumb", "sec")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt2"))
    )
    w2 = (
        Window.partitionBy("lbl")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    picked = (
        h2.withColumn(
            "cum2",
            F.col("cumb")
            + F.coalesce(F.sum("cnt2").over(w2), F.lit(0)).cast("bigint"),
        )
        .filter(
            (F.col("cum2") < F.col("k"))
            & (F.col("cum2") + F.col("cnt2") >= F.col("k"))
        )
        .select("lbl", "sec")
    )
    piv = (
        picked.groupBy(F.lit(1).alias("_k"))
        .pivot("lbl", ["p50_sec", "p90_sec", "p99_sec"])
        .agg(F.max("sec"))
    )
    # LEFT join from the always-one-row count so an empty funnel
    # yields (0, NULL, NULL, NULL) like the oracle's scalar
    # subqueries, not zero rows.
    return (
        n1.withColumn("_k", F.lit(1))
        .join(F.broadcast(piv), "_k", "left")
        .select(
            F.col("n").alias("n_converted"),
            F.col("p50_sec"),
            F.col("p90_sec"),
            F.col("p99_sec"),
        )
    )
