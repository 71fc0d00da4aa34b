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
