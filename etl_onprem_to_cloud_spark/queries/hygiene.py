"""Training-data hygiene queries: benchmark decontamination and
boilerplate chunk profiling over the documents table (llm/decontam.py).

The "benchmark" split is deterministic (doc_id % 97 == 0) so both
engines carve the identical eval set with no side-channel fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import decontam as DC
from ._util import cat, duck_tokens, duck_word_ngrams
from . import query

_TOKS = duck_tokens("text")


@query(
    "q_decontaminate_ngram_overlap",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
g AS (
  SELECT doc_id, list_distinct({duck_word_ngrams('toks', 4)}) AS grams FROM t
),
bench AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0
),
tr AS (
  SELECT doc_id, grams FROM g WHERE doc_id % 97 != 0
),
e AS (
  SELECT doc_id, unnest(grams) AS gram FROM tr
),
m AS (
  SELECT e.doc_id,
    count(*) AS n_grams,
    sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_matched
  FROM e LEFT JOIN bench b ON e.gram = b.gram
  GROUP BY e.doc_id
)
SELECT tr.doc_id,
  CAST(coalesce(m.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
  round(CASE WHEN coalesce(m.n_grams, 0) > 0
        THEN coalesce(m.n_matched, 0) / m.n_grams ELSE 0.0 END, 6)
    AS overlap_frac,
  coalesce(m.n_matched, 0) > 0 AS contaminated
FROM tr LEFT JOIN m ON tr.doc_id = m.doc_id
""",
    tags=("text", "dedup", "ring-c", "decontam"),
    description=(
        "Benchmark decontamination: 4-gram overlap of every train doc "
        "against the eval split's distinct n-gram set (broadcast join; "
        "llm/decontam.py ngram_overlap_stats)."
    ),
)
def q_decontaminate_ngram_overlap(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return DC.ngram_overlap_stats(train, bench, n=4)


@query(
    "q_boilerplate_chunks",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
c AS (
  SELECT doc_id,
    unnest(list_transform(
      generate_series(1, CAST(ceil(len(toks) / 4.0) AS INT)),
      i -> array_to_string(list_slice(toks, (i-1)*4 + 1, (i-1)*4 + 4), ' ')
    )) AS chunk
  FROM t
),
f AS (
  SELECT chunk, count(DISTINCT doc_id) AS df FROM c GROUP BY chunk
),
s AS (
  SELECT c.doc_id,
    count(*) AS n_chunks,
    sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS n_boiler
  FROM c JOIN f USING (chunk)
  GROUP BY c.doc_id
)
SELECT d.doc_id,
  CAST(coalesce(s.n_chunks, 0) AS BIGINT) AS n_chunks,
  CAST(coalesce(s.n_boiler, 0) AS BIGINT) AS n_boilerplate,
  round(CASE WHEN coalesce(s.n_chunks, 0) > 0
        THEN coalesce(s.n_boiler, 0) / s.n_chunks ELSE 0.0 END, 6)
    AS boilerplate_frac
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
""",
    tags=("text", "dedup", "ring-c", "boilerplate"),
    description=(
        "CCNet-style boilerplate profile: fraction of each doc's 4-token "
        "chunks appearing in >=2 distinct docs corpus-wide "
        "(llm/decontam.py chunk_boilerplate_stats)."
    ),
)
def q_boilerplate_chunks(spark, sf_dir):
    docs = cat(spark, sf_dir).documents
    return DC.chunk_boilerplate_stats(docs, chunk_tokens=4, min_docs=2)


@query(
    "q_incremental_ingest_dedup",
    oracle="""
WITH fp AS (
  SELECT doc_id,
    md5(array_to_string(
      list_filter(string_split_regex(lower(text), ' +'), t -> t != ''), ' '))
      AS fingerprint
  FROM documents
),
corpus AS (SELECT * FROM fp WHERE doc_id % 10 != 0),
incoming AS (SELECT * FROM fp WHERE doc_id % 10 = 0),
seen AS (
  SELECT fingerprint, min(doc_id) AS first_doc_id
  FROM corpus GROUP BY fingerprint
)
SELECT i.doc_id,
  s.fingerprint IS NOT NULL AS is_duplicate,
  s.first_doc_id AS duplicate_of
FROM incoming i LEFT JOIN seen s ON i.fingerprint = s.fingerprint
""",
    tags=("dedup", "ring-c", "incremental", "ingest"),
    description=(
        "Incremental-ingest dedup: classify an incoming batch against "
        "the existing corpus by content fingerprint (llm/dedup.py "
        "normalization).  The corpus side reduces to one row per "
        "fingerprint BEFORE the join, so a daily 100 TB ingest joins "
        "against a fingerprint index, never the corpus text -- the "
        "incremental counterpart of q_dedup_exact_groups."
    ),
)
def q_incremental_ingest_dedup(spark, sf_dir):
    from ..functions.text import doc_fingerprint

    docs = cat(spark, sf_dir).documents
    fp = docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    )
    corpus = fp.filter(F.col("doc_id") % 10 != 0)
    incoming = fp.filter(F.col("doc_id") % 10 == 0)
    seen = corpus.groupBy("fingerprint").agg(
        F.min("doc_id").alias("first_doc_id")
    )
    return (
        incoming.alias("i")
        .join(seen.alias("s"), "fingerprint", "left")
        .select(
            F.col("i.doc_id").alias("doc_id"),
            F.col("s.first_doc_id").isNotNull().alias("is_duplicate"),
            F.col("s.first_doc_id").alias("duplicate_of"),
        )
    )
