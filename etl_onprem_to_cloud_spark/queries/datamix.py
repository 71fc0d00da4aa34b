"""Training-data mixture queries: deterministic train/val/test split,
context-window packing, and per-source token budgets (operators/
datamix.py), each with a value-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import whitespace_token_count
from ..operators.datamix import (
    pack_into_contexts,
    split_assignment,
    truncate_to_token_budget,
)
from ..operators.sampling import duck_hash_gate
from ._util import cat, duck_tokens
from . import query

_PACK_CAPACITY = 2048
_SOURCE_BUDGET = 5000

_DUCK_NTOK = f"CAST(len({duck_tokens('text', lower=False)}) AS BIGINT)"


@query(
    "q_split_train_val_test",
    oracle=f"""
WITH b AS (
  SELECT doc_id, source,
    CAST({duck_hash_gate('CAST(doc_id AS VARCHAR)', 'split')} % 100 AS INTEGER)
      AS bucket
  FROM documents
)
SELECT doc_id, source, bucket,
  CASE WHEN bucket < 80 THEN 'train'
       WHEN bucket < 90 THEN 'val'
       ELSE 'test' END AS split
FROM b
""",
    tags=("datamix", "ring-c", "split", "sampling"),
    description="Deterministic 80/10/10 train/val/test assignment from a "
    "content hash of doc_id (operators/datamix.split_assignment): "
    "stateless per-row expression, no shuffle, assignments stable as the "
    "corpus grows -- the property that keeps eval sets uncontaminated "
    "across crawl versions.",
)
def q_split_train_val_test(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    bucket, split = split_assignment(F.col("doc_id").cast("string"))
    return docs.select(
        "doc_id", "source", bucket.alias("bucket"), split.alias("split")
    )


@query(
    "q_pack_contexts",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, {_DUCK_NTOK} AS n_tokens FROM documents
)
SELECT doc_id, source, n_tokens,
  CAST(coalesce(sum(n_tokens) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
    AS token_offset,
  CAST(floor(coalesce(sum(n_tokens) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    / {_PACK_CAPACITY}) AS BIGINT) AS bin_id
FROM t
""",
    tags=("datamix", "ring-c", "packing", "window"),
    description=f"Context-window packing: per-source exclusive running "
    f"token count -> bin_id = floor(offset / {_PACK_CAPACITY}) "
    f"(operators/datamix.pack_into_contexts).  Offset-based binning is "
    f"the parallelizable packing rule (greedy first-fit's reset is "
    f"sequential); one window shuffle keyed on source.",
)
def q_pack_contexts(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    tk = docs.select(
        "doc_id", "source", whitespace_token_count(F.col("text")).alias("n_tokens")
    )
    return pack_into_contexts(
        tk,
        capacity=_PACK_CAPACITY,
        token_col="n_tokens",
        partition_col="source",
        order_col="doc_id",
    )


@query(
    "q_token_budget_per_source",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, {_DUCK_NTOK} AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
    CAST(sum(n_tokens) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {_SOURCE_BUDGET}
""",
    tags=("datamix", "ring-c", "budget", "window"),
    description=f"Per-source token budget cap at {_SOURCE_BUDGET}: keep "
    f"each source's doc_id-ordered prefix whose inclusive running token "
    f"count fits (operators/datamix.truncate_to_token_budget) -- mixture "
    f"weighting by contribution caps, whole docs only.",
)
def q_token_budget_per_source(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    tk = docs.select(
        "doc_id", "source", whitespace_token_count(F.col("text")).alias("n_tokens")
    )
    return truncate_to_token_budget(
        tk,
        budget=_SOURCE_BUDGET,
        token_col="n_tokens",
        partition_col="source",
        order_col="doc_id",
    )


_MATCH_SALT = "distmatch"


@query(
    "q_resample_match_uniform_length",
    oracle=f"""
WITH d AS (
  SELECT doc_id, least(CAST(floor(n_chars / 100) AS INT), 5) AS bucket
  FROM documents
),
c AS (SELECT bucket, count(*) AS n_before FROM d GROUP BY bucket),
t AS (SELECT sum(n_before) AS total, count(*) AS nb FROM c),
r AS (
  SELECT c.bucket, c.n_before,
    least(1.0, (t.total / t.nb) / c.n_before) AS rate
  FROM c CROSS JOIN t
),
a AS (
  SELECT d.doc_id, d.bucket
  FROM d JOIN r USING (bucket)
  WHERE {duck_hash_gate('CAST(doc_id AS VARCHAR)', _MATCH_SALT)}
        < CAST(floor(least(r.rate, 1.0) * 2147483647) AS BIGINT)
),
n AS (SELECT bucket, count(*) AS n_after FROM a GROUP BY bucket)
SELECT r.bucket,
  CAST(r.n_before AS BIGINT) AS n_before,
  CAST(coalesce(n.n_after, 0) AS BIGINT) AS n_after,
  round(r.rate, 6) AS rate
FROM r LEFT JOIN n USING (bucket)
""",
    tags=("datamix", "ring-c", "sampling", "distribution-matching"),
    description=(
        "Importance resampling to a target length distribution: bucket "
        "docs by length, derive per-bucket acceptance rates that flatten "
        "the histogram (rate = min(1, target_share/actual_share)), "
        "accept via the deterministic md5 hash-gate "
        "(operators/sampling.weighted_sample).  Two tiny aggregates + "
        "one stateless filter -- no extra shuffle of the corpus, and "
        "rerun-stable, which is what makes mixture rebalancing safe to "
        "re-execute mid-pipeline at 100 TB."
    ),
)
def q_resample_match_uniform_length(spark, sf_dir):
    from ..operators.sampling import weighted_sample

    docs = cat(spark, sf_dir).documents
    bucket = F.least(F.floor(F.col("n_chars") / 100).cast("int"), F.lit(5))
    d = docs.select("doc_id", bucket.alias("bucket"))
    counts = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_before"))
    tot = counts.agg(
        F.sum("n_before").alias("total"), F.count(F.lit(1)).alias("nb")
    )
    rates = counts.join(F.broadcast(tot)).select(
        "bucket",
        "n_before",
        F.least(
            F.lit(1.0), (F.col("total") / F.col("nb")) / F.col("n_before")
        ).alias("rate"),
    )
    with_rate = d.join(F.broadcast(rates.select("bucket", "rate")), "bucket")
    accepted = weighted_sample(with_rate, "doc_id", F.col("rate"), salt=_MATCH_SALT)
    after = accepted.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_after"))
    return rates.join(after, "bucket", "left").select(
        "bucket",
        F.col("n_before").cast("bigint").alias("n_before"),
        F.coalesce(F.col("n_after"), F.lit(0)).cast("bigint").alias("n_after"),
        F.round(F.col("rate"), 6).alias("rate"),
    )


# --------------------------------------------------------------------------
# Neyman-optimal stratified sample allocation
# --------------------------------------------------------------------------

_NEYMAN_N = 100  # total sample budget


@query(
    "q_neyman_allocation",
    oracle=f"""
WITH s AS (
  SELECT source,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_chars) AS BIGINT) AS sx,
    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
  FROM documents GROUP BY source
),
w AS (
  -- N_h * sigma_h = sqrt(N_h * sum(x^2) - sum(x)^2): the radicand is
  -- an exact BIGINT, so ONE correctly-rounded sqrt (then a floor
  -- quantization to micro-units) is the only inexact step -- no
  -- order-dependent double accumulation anywhere.
  SELECT source, n_docs,
    CAST(floor(sqrt(CAST(greatest(n_docs * sxx - sx * sx, 0)
      AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS wq
  FROM s
),
tot AS (SELECT CAST(sum(wq) AS BIGINT) AS wtot FROM w),
alloc AS (
  SELECT w.source, w.n_docs, w.wq,
    ({_NEYMAN_N} * w.wq) // t.wtot AS floor_n,
    ({_NEYMAN_N} * w.wq) % t.wtot AS rem,
    t.wtot
  FROM w CROSS JOIN tot t
),
bumped AS (
  SELECT source, n_docs, wq, wtot,
    floor_n + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
      <= {_NEYMAN_N} - sum(floor_n) OVER () THEN 1 ELSE 0 END AS n_alloc
  FROM alloc
)
SELECT source, n_docs,
  floor(CAST(wq AS DOUBLE) / n_docs / 1000000.0 * 1000000.0 + 0.5)
    / 1000000.0 AS sigma_chars,
  CAST(n_alloc AS BIGINT) AS n_alloc,
  floor(CAST(n_alloc AS DOUBLE) / n_docs * 1000000.0 + 0.5) / 1000000.0
    AS sampling_frac
FROM bumped ORDER BY source
""",
    tags=("datamix", "sampling", "stats", "exact-integer", "ring-c"),
    description=(
        f"Neyman-optimal stratified sample allocation: split a budget "
        f"of {_NEYMAN_N} sample documents across sources proportional "
        "to N_h * sigma_h (document-length std), the minimum-variance "
        "allocation for a stratified mean estimate.  N_h*sigma_h = "
        "sqrt(N_h*sum(x^2) - sum(x)^2) keeps the radicand an exact "
        "BIGINT; weights are micro-unit quantized and the budget is "
        "settled by the same largest-remainder (Hamilton) rounding as "
        "the cent proration -- allocations sum EXACTLY to the budget.  "
        "The design step that runs before any stratified sampler."
    ),
)
def q_neyman_allocation(spark, sf_dir):
    """One shuffle (the per-source sufficient-statistics rollup, 20
    groups, map-side combined); everything downstream runs on the
    strata-sized relation.  Radicand magnitude: N_h * sum(x^2) -- with
    doc lengths ~1e4 chars this holds exactly to ~1e10 docs per
    stratum in BIGINT."""
    docs = cat(spark, sf_dir).documents
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sxx"),
    )
    w = s.select(
        "source",
        "n_docs",
        F.floor(
            F.sqrt(
                F.greatest(
                    F.col("n_docs") * F.col("sxx") - F.col("sx") * F.col("sx"),
                    F.lit(0).cast("bigint"),
                ).cast("double")
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("wq"),
    )
    tot = w.agg(F.sum("wq").cast("bigint").alias("wtot"))
    alloc = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "wq",
        F.expr(f"({_NEYMAN_N} * wq) DIV wtot").alias("floor_n"),
        F.expr(f"({_NEYMAN_N} * wq) % wtot").alias("rem"),
    )
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.desc("rem"), "source")
    w_all = Window.partitionBy()
    bumped = alloc.select(
        "source",
        "n_docs",
        "wq",
        (
            F.col("floor_n")
            + F.when(
                F.row_number().over(w_rank)
                <= F.lit(_NEYMAN_N) - F.sum("floor_n").over(w_all),
                1,
            ).otherwise(0)
        ).alias("n_alloc"),
    )
    return bumped.select(
        "source",
        "n_docs",
        (
            F.floor(
                F.col("wq").cast("double")
                / F.col("n_docs")
                / F.lit(1e6)
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("sigma_chars"),
        F.col("n_alloc").cast("bigint").alias("n_alloc"),
        (
            F.floor(
                F.col("n_alloc").cast("double") / F.col("n_docs") * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("sampling_frac"),
    ).orderBy("source")
