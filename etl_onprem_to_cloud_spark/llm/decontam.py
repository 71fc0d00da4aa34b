"""Training-data hygiene operators: benchmark decontamination and
chunk-level boilerplate statistics.

Both are standard LLM-corpus passes the reference has no analogue for
(its text handling ends at CSV-safety rewriting, reference
etl/transform.py:171-183); they complete Ring C's dedup/text family
(llm/dedup.py, functions/text.py) with the two remaining hygiene
shapes: "does a train doc leak an eval benchmark?" (n-gram overlap,
the WMDP/GPT-3-style 13-gram check scaled down to the fixture vocab)
and "which spans are boilerplate repeated across documents?"
(CCNet-style paragraph counting, with fixed token windows standing in
for paragraphs since the synthetic corpus has no line structure).

Scale shapes (100 TB):

- ``ngram_overlap_stats``: the benchmark n-gram set is the DISTINCT
  grams of the (small) eval suite -- broadcast it; the train side then
  never shuffles: explode -> broadcast-hash-join -> per-doc partial
  aggregation, one exchange on doc_id for the final agg.  If the
  benchmark outgrows the broadcast threshold, drop ``broadcast_bench``
  and the same plan becomes a shuffled hash join on the gram.
- ``chunk_boilerplate_stats``: two keyed exchanges (chunk-frequency
  aggregation, then join back) plus the final doc_id agg.  At real
  scale the join key should be a 128-bit digest of the chunk rather
  than the string (16-byte shuffle keys); here the raw string is kept
  so the DuckDB oracle is exact with zero collision caveat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import text as T


def _distinct_ngrams(text: Column, n: int) -> Column:
    return F.array_distinct(T.word_ngrams_from_tokens(T.tokens(F.lower(text)), n))


def ngram_overlap_stats(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-train-doc overlap against the benchmark's distinct n-gram
    set: (id, n_grams, n_matched, overlap_frac, contaminated).

    Docs shorter than ``n`` tokens have no grams -> n_grams = 0,
    overlap_frac = 0.0, contaminated = false (kept via explode_outer).
    """
    bench_grams = (
        bench.select(F.explode(_distinct_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1).cast("bigint"))
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    exploded = train.select(
        F.col(id_col),
        F.explode_outer(_distinct_ngrams(F.col(text_col), n)).alias("gram"),
    )
    per_doc = (
        exploded.join(bench_grams, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("bigint").alias("n_matched"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_matched",
        F.round(
            F.when(
                F.col("n_grams") > 0, F.col("n_matched") / F.col("n_grams")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("overlap_frac"),
        (F.col("n_matched") > 0).alias("contaminated"),
    )


def token_chunks(text: Column, chunk_tokens: int = 4) -> Column:
    """Non-overlapping ``chunk_tokens``-token windows of the lowered
    whitespace tokens, order-preserving, trailing partial chunk kept;
    [] for token-less docs (guarded: Spark's sequence(1,0) would yield
    a DESCENDING [1,0], unlike DuckDB's empty generate_series)."""
    toks = T.tokens(F.lower(text))
    n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk_tokens))).cast("int")
    return F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda i: F.concat_ws(
                " ", F.slice(toks, (i - 1) * chunk_tokens + 1, chunk_tokens)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def chunk_boilerplate_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Per-doc boilerplate profile: how many of its token chunks occur
    in >= ``min_docs`` DISTINCT documents corpus-wide.

    (id, n_chunks, n_boilerplate, boilerplate_frac) -- the removal
    decision (drop chunks / drop docs over a frac threshold) is left to
    the caller so one frequency pass serves both policies.
    """
    chunks = docs.select(
        F.col(id_col),
        F.explode_outer(token_chunks(F.col(text_col), chunk_tokens)).alias("chunk"),
    )
    freq = chunks.groupBy("chunk").agg(
        F.count_distinct(id_col).alias("__df")
    )
    joined = chunks.join(freq, "chunk", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.count("chunk").alias("n_chunks"),
        F.coalesce(
            F.sum((F.col("__df") >= min_docs).cast("bigint")), F.lit(0)
        )
        .cast("bigint")
        .alias("n_boilerplate"),
    )
    return per_doc.select(
        id_col,
        "n_chunks",
        "n_boilerplate",
        F.round(
            F.when(
                F.col("n_chunks") > 0, F.col("n_boilerplate") / F.col("n_chunks")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("boilerplate_frac"),
    )
