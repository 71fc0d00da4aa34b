"""Training-data mixture management: deterministic splits, context
packing, and per-source token budgeting.

These are the corpus-assembly steps of an LLM data pipeline that sit
AFTER cleaning/dedup: assign every doc to train/val/test, bound each
source's token contribution, and lay docs out into fixed-size context
windows.  All three are content-deterministic (no RNG, no
partition-layout dependence) so reruns, retries, and external oracles
agree row-for-row -- the same property sampling.py establishes for
subsampling.

Scale shapes:
- split: stateless per-row hash -> no shuffle at any corpus size.
- packing/budgeting: one window per source (shuffle keyed on source).
  A pathologically dominant source serializes its own window; shard
  such sources first (e.g. by hash(doc_id) % k as a sub-source) --
  the bin/budget semantics then apply per shard, which is how packing
  is parallelized in practice anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .sampling import _MOD, hash_gate


def split_assignment(
    key: Column,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "split",
) -> tuple[Column, Column]:
    """(bucket, split) columns: bucket is a uniform 0..99 content hash,
    split maps bucket ranges to train/val/test by ``weights``.  A doc's
    assignment never changes when the corpus around it grows -- the
    property that keeps eval sets stable across crawls."""
    bucket = (hash_gate(key, salt) % 100).cast("int")
    train_hi = int(weights[0] * 100)
    val_hi = train_hi + int(weights[1] * 100)
    split = (
        F.when(bucket < train_hi, "train")
        .when(bucket < val_hi, "val")
        .otherwise("test")
    )
    return bucket, split


def pack_into_contexts(
    docs: DataFrame,
    capacity: int,
    token_col: str,
    partition_col: str,
    order_col: str,
) -> DataFrame:
    """Assign each doc a context-window bin: docs are laid out in
    ``order_col`` order within ``partition_col``, and bin_id =
    floor(token_offset / capacity) where token_offset is the exclusive
    running token count.  Offset-based binning (rather than greedy
    first-fit, whose reset rule is inherently sequential) is exactly
    expressible as one window cumsum, deterministic, and what packed
    pretraining loaders do when documents may straddle boundaries.

    Adds ``token_offset`` and ``bin_id``; one shuffle on
    ``partition_col``."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("bigint")
    return docs.withColumn("token_offset", offset).withColumn(
        "bin_id", F.floor(F.col("token_offset") / capacity).cast("bigint")
    )


def truncate_to_token_budget(
    docs: DataFrame,
    budget: int,
    token_col: str,
    partition_col: str,
    order_col: str,
) -> DataFrame:
    """Keep each partition's prefix of docs (in ``order_col`` order)
    whose INCLUSIVE running token count fits the budget -- per-source
    contribution caps for mixture weighting.  A doc that would cross
    the budget is dropped entirely (no mid-doc truncation).  Adds
    ``cum_tokens``; one shuffle on ``partition_col``."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(token_col).over(w).cast("bigint")
    return docs.withColumn("cum_tokens", cum).filter(
        F.col("cum_tokens") <= budget
    )


__all__ = [
    "split_assignment",
    "pack_into_contexts",
    "truncate_to_token_budget",
    "_MOD",
]
