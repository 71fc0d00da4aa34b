"""The training-data curation pipeline as a reusable stage + an
operational facade.

``curated_docs`` is the ONE implementation of the dedup -> quality-gate
-> split pipeline: q_training_data_pipeline reports its rollup (and is
value-oracled, driver-green), while :func:`run_curation_pipeline`
WRITES its output -- the kept corpus as split-partitioned parquet plus
the per-(split, source) manifest -- the way
``pipeline.run_netflix_pipeline`` operationalizes the reference's ETL.
One code path means the oracle-checked query and the operational sinks
cannot drift.

Scale notes: one scan feeds every stage; the repetition predicate runs
as an exploded aggregation (generate-once + partial agg + keep-join)
because a pushdown-inlined in-row filter re-evaluates the gram
construction per array element (measured 17s vs ~1s at sf0.1 -- see
q_training_data_pipeline's docstring); the split write is
``partitionBy("split")`` so downstream readers partition-prune to
their fold.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T
from ..operators.datamix import split_assignment
from . import dedup as D


@dataclass
class CurationResult:
    kept: DataFrame
    manifest: DataFrame
    rows_in: int
    rows_kept: int


def curated_docs(docs: DataFrame) -> DataFrame:
    """exact dedup -> C4/Gopher quality gate -> deterministic split.

    Returns the kept docs as (doc_id, source, text, n_tok, split).
    Thresholds are the q_text_quality_gate constants; the split is the
    same md5 hash gate as q_split_train_val_test.
    """
    from ..queries.textops import (
        _GATE_MAX_DUP_2GRAM,
        _GATE_MAX_PUNCT,
        _GATE_MIN_STOPWORD,
        _GATE_MIN_TOKENS,
    )

    deduped = D.exact_dedup(docs)
    base = deduped.select(
        "doc_id",
        "source",
        "text",
        T.tokens(F.lower(F.col("text"))).alias("__tk"),
    )
    n_tok = F.size("__tk")
    cheap = base.filter(
        (n_tok >= _GATE_MIN_TOKENS)
        & (T.punct_ratio(F.col("text")) <= _GATE_MAX_PUNCT)
        & (T.stopword_ratio(F.col("text")) >= _GATE_MIN_STOPWORD)
    ).select("doc_id", "source", "text", n_tok.alias("n_tok"), "__tk")
    grams = cheap.select(
        "doc_id",
        F.explode_outer(T.word_ngrams_from_tokens(F.col("__tk"), 2)).alias(
            "g"
        ),
    ).filter(F.col("g").isNotNull())
    not_repetitive = (
        grams.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.count_distinct("g").alias("n_d"),
        )
        .filter(
            F.lit(1.0) - F.col("n_d") / F.col("n_g") <= _GATE_MAX_DUP_2GRAM
        )
        .select("doc_id")
    )
    kept = cheap.select("doc_id", "source", "text", "n_tok").join(
        not_repetitive, "doc_id"
    )
    _bucket, split = split_assignment(F.col("doc_id").cast("string"))
    return kept.withColumn("split", split)


def curation_manifest(curated: DataFrame) -> DataFrame:
    """Per-(split, source) doc and token counts over :func:`curated_docs`
    output -- the rollup q_training_data_pipeline oracle-checks."""
    return (
        curated.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .orderBy("split", "source")
    )


def run_curation_pipeline(
    docs: DataFrame,
    corpus_out: str | None = None,
    manifest_out: str | None = None,
) -> CurationResult:
    """Operational entry point: curate ``docs`` and write the results.

    ``corpus_out``: kept docs as parquet partitioned by ``split`` --
    downstream training/eval readers partition-prune to their fold.
    ``manifest_out``: the (split, source) manifest as parquet.
    Either sink may be None (report-only / corpus-only runs).

    ``CurationResult.kept``: when ``corpus_out`` was written, this is
    the written corpus read back (already materialized -- consuming
    it costs a parquet scan, not a curation re-run).  With no
    ``corpus_out`` there is nothing durable to read back, so ``kept``
    is the lazy curation DataFrame and RECOMPUTES the DAG on first
    action -- pass ``corpus_out`` if you intend to consume the rows.
    """
    # The curation DAG (exploded 2-gram aggregation + joins) is the
    # dominant cost; without the persist it would recompute for the
    # corpus write, the manifest write, and the count.  One pass
    # materializes it; rows_kept folds out of the manifest for free.
    curated = curated_docs(docs).persist()
    try:
        manifest = curation_manifest(curated)
        if corpus_out:
            curated.write.mode("overwrite").partitionBy("split").parquet(
                corpus_out
            )
        manifest_rows = manifest.collect()
        if manifest_out:
            manifest.write.mode("overwrite").parquet(manifest_out)
        # Return the manifest re-materialized from its collected rows
        # (it is a per-(split, source) rollup -- tiny by construction)
        # so callers can show()/join it after the unpersist below
        # without re-running the curation DAG.  `kept` likewise must
        # survive the unpersist: prefer the corpus just written (a
        # parquet scan, still split-partition-prunable) over the lazy
        # DAG, which would silently replay dedup + gate + split on
        # the caller's first action.
        kept = (
            docs.sparkSession.read.parquet(corpus_out)
            if corpus_out
            else curated
        )
        return CurationResult(
            kept=kept,
            manifest=docs.sparkSession.createDataFrame(
                manifest_rows, manifest.schema
            ),
            rows_in=docs.count(),
            rows_kept=sum(r["n_docs"] for r in manifest_rows),
        )
    finally:
        curated.unpersist()
