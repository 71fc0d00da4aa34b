"""Span-level corpus analysis: repeated k-token spans and collocation
scoring (PMI).

Doc-level dedup (llm/dedup.py) removes whole near-duplicate documents;
span-level analysis finds the VERBATIM multi-token runs that recur
ACROSS documents -- boilerplate headers, license blocks, templated
sentences -- the shape targeted by suffix-array dedup in "Deduplicating
Training Data Makes Language Models Better" (Lee et al., 2022).  A full
suffix array is not a DataFrame-shaped structure; the scalable
equivalent used here is the fixed-width rolling window: every k-token
span, hashed and counted corpus-wide.  One explode + one two-level
aggregation -- the same map-side-combine shape as a word count, so it
scales exactly as far as word count does.

The reference has no text surface at all (its corpus is a CSV of
catalog rows, /root/reference/etl/transform.py:27-200); this module is
Ring C scale work.

Scale notes (100 TB):
- the span explode multiplies rows by ~n_tokens; partial aggregation
  collapses them map-side before the one shuffle on the span key.  At
  extreme scale swap the span STRING for ``xxhash64(span)`` as the
  group key (collision-negligible, 8 bytes); the string key is kept
  here so the DuckDB oracle can recompute it verbatim.
- ``q_span_doc_coverage`` joins the (small, filtered) repeated-span
  set back against the positional explode; the join key is the span
  text, the candidate side is filtered BEFORE the join, and AQE picks
  broadcast when the repeated set is small enough.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..functions import text as T
from ._util import cat, duck_tokens, duck_word_ngrams
from . import query

_TOKS = duck_tokens("text")

# Span width (tokens).  5 is small enough to fire on the fixture corpus
# and large enough that cross-doc repeats are real boilerplate, not
# chance n-gram collisions.
_K = 5


@query(
    "q_repeated_spans",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
g AS (
  SELECT doc_id, unnest({duck_word_ngrams('toks', _K)}) AS span FROM t
),
c AS (
  SELECT span, count(DISTINCT doc_id) AS n_docs, count(*) AS n_total
  FROM g GROUP BY span
)
SELECT span, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_total AS BIGINT) AS n_total,
  CAST(row_number() OVER (ORDER BY n_docs DESC, n_total DESC, span)
       AS INTEGER) AS rank
FROM c
WHERE n_docs >= 2
ORDER BY n_docs DESC, n_total DESC, span
LIMIT 50
""",
    tags=("text", "dedup", "span", "ring-c"),
    description=(
        "Cross-document repeated spans: every 5-token window, counted "
        "corpus-wide (distinct docs + total occurrences); top-50 spans "
        "appearing in >=2 documents -- the boilerplate/license-block "
        "detector behind span-level dedup."
    ),
)
def q_repeated_spans(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    tk = docs.select(
        "doc_id", T.tokens(F.lower(F.col("text"))).alias("toks")
    )
    grams = tk.select(
        "doc_id",
        F.explode(T.word_ngrams_from_tokens(F.col("toks"), _K)).alias("span"),
    )
    counted = grams.groupBy("span").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_total"),
    )
    # Top-50 BEFORE ranking: the span domain grows ~10x per decade
    # (r10 suspect check), so ranking it in a global window first was
    # a single task holding every distinct span.  orderBy().limit()
    # plans TakeOrderedAndProject (per-partition heaps), and the rank
    # window then runs over 50 rows; the order is total (span breaks
    # ties), so limit-then-rank is value-identical.
    order = [F.col("n_docs").desc(), F.col("n_total").desc(), F.asc("span")]
    w = Window.orderBy(*order)
    return (
        counted.filter(F.col("n_docs") >= 2)
        .orderBy(*order)
        .limit(50)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .orderBy(*order)
    )


@query(
    "q_span_doc_coverage",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
n AS (
  SELECT doc_id, toks,
    unnest(generate_series(1, len(toks) - {_K - 1})) AS i
  FROM t WHERE len(toks) >= {_K}
),
g AS (
  SELECT doc_id, i,
    array_to_string(list_slice(toks, i, i + {_K - 1}), ' ') AS span
  FROM n
),
rep AS (
  SELECT span FROM g GROUP BY span HAVING count(DISTINCT doc_id) >= 2
),
cpos AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT g.doc_id, unnest(generate_series(g.i, g.i + {_K - 1})) AS pos
    FROM g JOIN rep USING (span)
  ) q
),
cov AS (
  SELECT doc_id, count(*) AS n_cov FROM cpos GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
  CAST(COALESCE(cov.n_cov, 0) AS BIGINT) AS n_cov,
  round(CAST(COALESCE(cov.n_cov, 0) AS DOUBLE)
        / greatest(len(t.toks), 1), 6) AS cov_frac
FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
ORDER BY t.doc_id
""",
    tags=("text", "dedup", "span", "ring-c"),
    description=(
        "Span-dedup mask: per document, the fraction of token positions "
        "covered by some 5-token span that also occurs in another "
        "document (the Lee-et-al span-removal statistic).  Positional "
        "explode -> repeated-span semi-join -> distinct covered "
        "positions per doc."
    ),
)
def q_span_doc_coverage(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    tk = docs.select(
        "doc_id", T.tokens(F.lower(F.col("text"))).alias("toks")
    )
    # Positional spans: i is 0-based from posexplode; covered token
    # positions (1-based, mirroring the oracle) are i+1 .. i+K.
    g = tk.select(
        "doc_id",
        F.posexplode(T.word_ngrams_from_tokens(F.col("toks"), _K)).alias(
            "i", "span"
        ),
    )
    rep = (
        g.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("span")
    )
    cov = (
        g.join(rep, "span")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i") + 1, F.col("i") + _K)
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_cov"))
    )
    return (
        tk.select("doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_cov", F.lit(0)).cast("bigint").alias("n_cov"),
            F.round(
                F.coalesce("n_cov", F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("cov_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_bigram_pmi",
    oracle=f"""
WITH t AS (
  SELECT {_TOKS} AS toks FROM documents
),
u AS (
  SELECT unnest(toks) AS tok FROM t
),
uc AS (
  SELECT tok, count(*) AS n FROM u GROUP BY tok
),
b AS (
  SELECT unnest({duck_word_ngrams('toks', 2)}) AS bigram FROM t
),
bc AS (
  SELECT bigram, count(*) AS n_b FROM b GROUP BY bigram
),
tot AS (
  SELECT CAST((SELECT sum(n) FROM uc) AS BIGINT) AS n_tokens,
         CAST((SELECT sum(n_b) FROM bc) AS BIGINT) AS n_bigrams
),
p AS (
  SELECT bigram, n_b,
    round(ln(CAST(n_b AS DOUBLE) * n_tokens * n_tokens
             / (CAST(n_bigrams AS DOUBLE) * u1.n * u2.n)), 6) AS pmi
  FROM bc
  CROSS JOIN tot
  JOIN uc u1 ON u1.tok = string_split(bigram, ' ')[1]
  JOIN uc u2 ON u2.tok = string_split(bigram, ' ')[2]
  WHERE n_b >= 5
)
SELECT bigram, CAST(n_b AS BIGINT) AS n_b, pmi,
  CAST(row_number() OVER (ORDER BY pmi DESC, bigram) AS INTEGER) AS rank
FROM p
ORDER BY pmi DESC, bigram
LIMIT 50
""",
    tags=("text", "collocation", "ring-c"),
    description=(
        "Collocation mining: pointwise mutual information "
        "ln(p(ab)/(p(a)p(b))) for bigrams seen >=5 times; top-50 by "
        "PMI.  Unigram/bigram counts are two word-count aggregations; "
        "the corpus totals ride in via an explicit broadcast cross "
        "join (no driver-side collect)."
    ),
)
def q_bigram_pmi(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    tk = docs.select(T.tokens(F.lower(F.col("text"))).alias("toks"))
    uc = (
        tk.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bc = (
        tk.select(
            F.explode(T.word_ngrams_from_tokens(F.col("toks"), 2)).alias(
                "bigram"
            )
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    tot = F.broadcast(
        uc.agg(F.sum("n").alias("n_tokens")).crossJoin(
            bc.agg(F.sum("n_b").alias("n_bigrams"))
        )
    )
    parts = F.split("bigram", " ")
    u1 = uc.select(F.col("tok").alias("w1"), F.col("n").alias("n_u1"))
    u2 = uc.select(F.col("tok").alias("w2"), F.col("n").alias("n_u2"))
    scored = (
        bc.filter(F.col("n_b") >= 5)
        .withColumn("w1", parts.getItem(0))
        .withColumn("w2", parts.getItem(1))
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(tot)
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    F.col("n_b").cast("double")
                    * F.col("n_tokens")
                    * F.col("n_tokens")
                    / (
                        F.col("n_bigrams").cast("double")
                        * F.col("n_u1")
                        * F.col("n_u2")
                    )
                ),
                6,
            ),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), "bigram")
    return (
        scored.select("bigram", "n_b", "pmi")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(50)
    )


@query(
    "q_bigram_lm_logprob",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
u AS (
  SELECT unnest(toks) AS tok FROM t
),
uc AS (
  SELECT tok, count(*) AS n FROM u GROUP BY tok
),
v AS (
  SELECT count(*) AS vocab FROM uc
),
b AS (
  SELECT doc_id, unnest({duck_word_ngrams('toks', 2)}) AS bigram FROM t
),
bc AS (
  SELECT bigram, count(*) AS n_b FROM b GROUP BY bigram
),
terms AS (
  SELECT b.doc_id,
    round(ln((bc.n_b + 1) / CAST(uc.n + v.vocab AS DOUBLE)), 6) AS lp
  FROM b
  JOIN bc USING (bigram)
  JOIN uc ON uc.tok = string_split(b.bigram, ' ')[1]
  CROSS JOIN v
),
agg AS (
  SELECT doc_id, count(*) AS n_bigrams,
    sum(CAST(lp AS DECIMAL(18,6))) AS s
  FROM terms GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(COALESCE(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  round(CAST(COALESCE(agg.s, 0) AS DOUBLE)
        / greatest(COALESCE(agg.n_bigrams, 0), 1), 6) AS avg_logprob
FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
ORDER BY t.doc_id
""",
    tags=("text", "quality", "language-model", "ring-c"),
    description=(
        "KenLM-style LM quality score: per-document average "
        "log-probability under an add-one-smoothed bigram model trained "
        "on the corpus itself -- ln((c(w1 w2)+1)/(c(w1)+V)) averaged "
        "over the doc's bigrams.  Low scores flag gibberish/OCR noise, "
        "anomalously high scores flag boilerplate; both tails are "
        "standard training-data filters.  Two word-count aggregations + "
        "two vocabulary joins; per-term logs are rounded then "
        "DECIMAL-summed so both engines accumulate identically."
    ),
)
def q_bigram_lm_logprob(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    tk = docs.select(
        "doc_id", T.tokens(F.lower(F.col("text"))).alias("toks")
    )
    uc = (
        tk.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = F.broadcast(uc.agg(F.count(F.lit(1)).alias("vocab")))
    b = tk.select(
        "doc_id",
        F.explode(T.word_ngrams_from_tokens(F.col("toks"), 2)).alias(
            "bigram"
        ),
    )
    bc = b.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_b"))
    terms = (
        b.join(bc, "bigram")
        .withColumn("w1", F.split("bigram", " ").getItem(0))
        .join(
            uc.select(F.col("tok").alias("w1"), F.col("n").alias("n_u")),
            "w1",
        )
        .crossJoin(vocab)
        .withColumn(
            "lp",
            F.round(
                F.log(
                    (F.col("n_b") + 1)
                    / (F.col("n_u") + F.col("vocab")).cast("double")
                ),
                6,
            ).cast("decimal(18,6)"),
        )
    )
    agg = terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("s")
    )
    return (
        tk.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            F.round(
                F.coalesce(F.col("s"), F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_bigrams", F.lit(0)), F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


_STOP_IN = "('" + "', '".join(T.STOPWORDS) + "')"


@query(
    "q_curation_blend",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, text, {_TOKS} AS toks FROM documents
),
u AS (
  SELECT unnest(toks) AS tok FROM t
),
uc AS (
  SELECT tok, count(*) AS n FROM u GROUP BY tok
),
v AS (
  SELECT count(*) AS vocab FROM uc
),
b AS (
  SELECT doc_id, unnest({duck_word_ngrams('toks', 2)}) AS bigram FROM t
),
bc AS (
  SELECT bigram, count(*) AS n_b FROM b GROUP BY bigram
),
terms AS (
  SELECT b.doc_id,
    round(ln((bc.n_b + 1) / CAST(uc.n + v.vocab AS DOUBLE)), 6) AS lp
  FROM b
  JOIN bc USING (bigram)
  JOIN uc ON uc.tok = string_split(b.bigram, ' ')[1]
  CROSS JOIN v
),
agg AS (
  SELECT doc_id, count(*) AS n_bigrams,
    sum(CAST(lp AS DECIMAL(18,6))) AS s
  FROM terms GROUP BY doc_id
),
lm AS (
  SELECT t.doc_id,
    round(CAST(COALESCE(agg.s, 0) AS DOUBLE)
          / greatest(COALESCE(agg.n_bigrams, 0), 1), 6) AS avg_logprob
  FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
),
q AS (
  SELECT doc_id, source,
    round((
      least(length(text) / 500.0, 1.0)
      + least((CASE WHEN len(toks) > 0
          THEN len(list_filter(toks, t -> t IN {_STOP_IN})) / len(toks)
          ELSE 0.0 END) * 5.0, 1.0)
      + greatest(1.0 - (CASE WHEN length(text) > 0
          THEN length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) / length(text)
          ELSE 0.0 END) * 4.0, 0.0)
    ) / 3.0, 6) AS quality_score
  FROM t
),
j AS (
  SELECT q.doc_id, q.source, q.quality_score, lm.avg_logprob,
    round((percent_rank() OVER (PARTITION BY q.source ORDER BY q.quality_score)
         + percent_rank() OVER (PARTITION BY q.source ORDER BY lm.avg_logprob))
         / 2, 6) AS blend
  FROM q JOIN lm ON q.doc_id = lm.doc_id
)
SELECT doc_id, source, quality_score, avg_logprob, blend,
  CAST(least(floor(blend * 10), 9) AS INTEGER) AS decile
FROM j
ORDER BY doc_id
""",
    tags=("text", "quality", "curation", "ring-c"),
    description=(
        "Curation scoring: heterogeneous quality signals (C4-style "
        "heuristic score + bigram-LM log-prob) percentile-normalized "
        "WITHIN each source, then blended and bucketed into deciles -- "
        "the per-source normalization is what keeps one verbose feed "
        "from dominating a global quality cut.  Two rank windows over "
        "the source partition on top of the LM pipeline."
    ),
)
def q_curation_blend(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    lm = q_bigram_lm_logprob(spark, sf_dir).select("doc_id", "avg_logprob")
    qs = docs.select(
        "doc_id",
        "source",
        T.quality_score(F.col("text")).alias("quality_score"),
    )
    w_q = Window.partitionBy("source").orderBy("quality_score")
    w_lm = Window.partitionBy("source").orderBy("avg_logprob")
    blend = F.round(
        (F.percent_rank().over(w_q) + F.percent_rank().over(w_lm)) / 2, 6
    )
    return (
        qs.join(lm, "doc_id")
        .select(
            "doc_id",
            "source",
            "quality_score",
            "avg_logprob",
            blend.alias("blend"),
        )
        .withColumn(
            "decile",
            F.least(F.floor(F.col("blend") * 10), F.lit(9)).cast("int"),
        )
        .orderBy("doc_id")
    )
