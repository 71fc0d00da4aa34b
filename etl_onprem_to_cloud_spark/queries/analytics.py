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
from ..operators.sampling import _MOD, duck_hash_gate, weighted_sample
from ._util import cat, duck_tokens, duck_word_ngrams, fmt_ts
from . import query

_TOKS = duck_tokens("text")


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
