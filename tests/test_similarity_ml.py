"""Quality checks for the stock pyspark.ml LSH variants: seeded hash
families have no SQL oracle, so they are judged by recall against the
engine's exact implementations (brute-force cosine / exact n-gram
Jaccard) instead of by value-hash.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_onprem_to_cloud_spark.llm.similarity_ml import HAS_ML
from etl_onprem_to_cloud_spark.queries import QUERIES

pytestmark = pytest.mark.skipif(not HAS_ML, reason="pyspark.ml unavailable")


def test_brp_ann_recall_vs_brute_force(spark, sf_dir):
    """BRP-LSH with an unbounded radius still requires a bucket
    collision, so recall@10 < 1 is possible; with 3 hash tables on the
    clustered fixture it should stay high."""
    exact = QUERIES["q_ann_brute_force_topk"].fn(spark, sf_dir).collect()
    approx = QUERIES["q_ml_brp_ann_topk"].fn(spark, sf_dir).collect()

    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)

    assert set(got) == set(truth), "every query vector must get neighbors"
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    recall = hits / total
    assert recall >= 0.5, f"BRP recall@10 too low: {recall:.2f}"


def test_minhash_lsh_pairs_overlap_exact_jaccard(spark, sf_dir, tmp_path):
    """MinHashLSH pairs (Jaccard distance <= 0.5) should largely agree
    with the exact n-gram Jaccard near-dup pairs (similarity >= 0.5).

    De-flaked (VERDICT r4 item 7): instead of skipping when the SF's
    organic corpus happens to contain no exact near-dup pair, the test
    PINS one -- two appended documents that differ by a single trailing
    token -- so the exact set is provably non-empty at every SF and the
    recall assertion always runs."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    base = (
        "the quick brown fox jumps over the lazy dog while the engine "
        "deduplicates large corpora with banded minhash signatures and "
        "exact ngram jaccard verification at every scale factor"
    )
    extra = spark.createDataFrame(
        [
            (max_id + 1, base, "en", "pinned", len(base)),
            (max_id + 2, base + " always", "en", "pinned", len(base) + 7),
        ],
        schema=docs.schema,
    )
    pinned_dir = str(tmp_path / "pinned_sf")
    docs.unionByName(extra).write.parquet(f"{pinned_dir}/documents.parquet")

    exact_df = QUERIES["q_dedup_ngram_jaccard"].fn(spark, pinned_dir)
    exact = {(r.id_a, r.id_b) for r in exact_df.collect()}
    approx_df = QUERIES["q_ml_minhash_lsh_pairs"].fn(spark, pinned_dir)
    approx = {(r.id_a, r.id_b) for r in approx_df.collect()}

    pinned = (max_id + 1, max_id + 2)
    assert pinned in exact, "pinned near-dup pair must clear the exact gate"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"MinHashLSH recall vs exact Jaccard: {recall:.2f}"


def test_brp_output_shape(spark, sf_dir):
    df = QUERIES["q_ml_brp_ann_topk"].fn(spark, sf_dir)
    assert df.columns == ["query_id", "neighbor_id", "eucl_dist", "rank"]
    rows = df.collect()
    per_query = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_query.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (
            f"ranks for query {q} not dense from 1"
        )
        assert len(ranks) <= 10


def test_ivf_kmeans_recall_vs_brute_force(spark, sf_dir):
    """The seeded MLlib KMeans quantizer path (no longer the registered
    query, which uses the oracle-checkable deterministic Lloyd
    quantizer) must still recover most of the exact top-10."""
    from etl_onprem_to_cloud_spark.llm.similarity import ivf_top_k
    from etl_onprem_to_cloud_spark.sources.io import read_parquet

    exact = QUERIES["q_ann_brute_force_topk"].fn(spark, sf_dir).collect()
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    approx = ivf_top_k(
        emb, [0, 1, 2, 3, 4], k=10, nprobe=3, quantizer="kmeans"
    ).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert total > 0
    recall = hits / total
    assert recall >= 0.6, f"KMeans-IVF recall@10 too low: {recall:.2f}"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF probing 3 of the coarse cells must recover most of the exact
    top-10 on the clustered fixture (label = generating cluster)."""
    exact = QUERIES["q_ann_brute_force_topk"].fn(spark, sf_dir).collect()
    approx = QUERIES["q_ann_ivf_topk"].fn(spark, sf_dir).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert total > 0
    recall = hits / total
    assert recall >= 0.6, f"IVF recall@10 too low: {recall:.2f}"


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    """The r02 oracle contract: the query itself emits exact DISCRETE
    percentiles plus flags asserting the sketch lands within 5% of them;
    here we check the flags hold and the discrete percentiles track the
    interpolated ones from the exact query."""
    rows = {r.o_orderstatus: r
            for r in QUERIES["q_approx_percentiles_orders"].fn(spark, sf_dir).collect()}
    exact = {r.o_orderstatus: (r.p50, r.p90, r.p99)
             for r in QUERIES["q_percentiles_orders"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(exact)
    for status, r in rows.items():
        assert r.p50_ok and r.p90_ok and r.p99_ok, (status, r)
        for d, e in zip((r.p50_exact, r.p90_exact, r.p99_exact), exact[status]):
            # disc vs cont differ by at most one data gap
            assert abs(d - e) / max(e, 1.0) < 0.01, (status, d, e)


def test_prefix_jaccard_equals_naive(spark, sf_dir):
    """Prefix filtering is an exact optimization: identical pair set."""
    from etl_onprem_to_cloud_spark.llm import dedup as D
    from etl_onprem_to_cloud_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    naive = sorted(tuple(r) for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect())
    pref = sorted(
        tuple(r) for r in D.ngram_jaccard_pairs_prefix(docs, threshold=0.5).collect()
    )
    assert naive == pref and len(naive) > 0


def test_srp_pairs_subset_of_exact_and_deterministic(spark, sf_dir):
    """SRP-LSH pairs must be a SUBSET of the exact cosine-threshold
    pairs (the verify step guarantees precision 1.0; only recall is
    approximate), non-empty on the clustered fixture, and identical
    across reruns (deterministic md5 hyperplanes, no RNG)."""
    from etl_onprem_to_cloud_spark.llm.similarity import (
        embedding_near_dup_pairs,
        srp_near_dup_pairs,
    )
    from etl_onprem_to_cloud_spark.queries._util import cat

    emb = cat(spark, sf_dir).embeddings
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            emb, threshold=0.4, block_col=None
        ).collect()
    }
    runs = [
        {
            (r.id_a, r.id_b)
            for r in srp_near_dup_pairs(emb, dim=64, threshold=0.4).collect()
        }
        for _ in range(2)
    ]
    assert runs[0] == runs[1], "SRP buckets must be rerun-stable"
    assert runs[0], "clustered fixture must yield some SRP pairs"
    assert runs[0] <= exact, "verify step must keep precision exact"


def test_brute_force_pandas_engine_matches_expr_twin(spark, sf_dir):
    """Differential: the Arrow-batched numpy cosine and the codegen HOF
    cosine must rank and score identically (round-6 hides the
    summation-order ulp, as with the SRP verify step)."""
    from etl_onprem_to_cloud_spark.llm.similarity import brute_force_top_k
    from etl_onprem_to_cloud_spark.queries._util import cat

    emb = cat(spark, sf_dir).embeddings
    qids = list(range(8))
    pandas_out = sorted(
        tuple(r) for r in brute_force_top_k(emb, qids, k=10, engine="pandas").collect()
    )
    expr_out = sorted(
        tuple(r) for r in brute_force_top_k(emb, qids, k=10, engine="expr").collect()
    )
    assert pandas_out == expr_out and len(pandas_out) == 80


def test_srp_pandas_projection_matches_expr_twin(spark, sf_dir):
    """Differential: the vectorized numpy-matmul projection and the
    pure-codegen higher-order-function projection must produce the
    IDENTICAL (id_a, id_b, cosine) output -- summation order inside one
    dot product is the only float difference, and no fixture dot sits
    within 1e-13 of the sign boundary."""
    from etl_onprem_to_cloud_spark.llm.similarity import srp_near_dup_pairs
    from etl_onprem_to_cloud_spark.queries._util import cat

    emb = cat(spark, sf_dir).embeddings
    pandas_out = sorted(
        tuple(r)
        for r in srp_near_dup_pairs(emb, dim=64, projection="pandas").collect()
    )
    expr_out = sorted(
        tuple(r)
        for r in srp_near_dup_pairs(emb, dim=64, projection="expr").collect()
    )
    assert pandas_out == expr_out and len(pandas_out) > 0


def test_lloyd_driver_fit_matches_distributed_twin(spark, sf_dir):
    """Differential: the numpy driver-side Lloyd fit (cumsum folds,
    int64 'decimal' sums) must reproduce the distributed DataFrame loop
    BIT-identically -- assignments and centroid doubles both."""
    from etl_onprem_to_cloud_spark.llm.similarity import lloyd_cells
    from etl_onprem_to_cloud_spark.queries._util import cat

    emb = cat(spark, sf_dir).embeddings
    a_asgn, a_cents = lloyd_cells(emb, num_cells=7, n_iter=3, fit="driver")
    b_asgn, b_cents = lloyd_cells(
        emb, num_cells=7, n_iter=3, fit="distributed"
    )
    pa = sorted((r["vec_id"], r["__cell"]) for r in a_asgn.collect())
    pb = sorted((r["vec_id"], r["__cell"]) for r in b_asgn.collect())
    assert pa == pb and len(pa) > 0
    ca = sorted((r["cell"], tuple(r["centroid"])) for r in a_cents.collect())
    cb = sorted((r["cell"], tuple(r["centroid"])) for r in b_cents.collect())
    assert ca == cb


def test_bounded_fit_rows_over_cap_contract(spark, sf_dir):
    """Over the cap, _bounded_fit_rows returns EXACTLY fit_max_rows
    rows (the hash-gate margin doubles on binomial undershoot, so the
    contract holds even for tiny test caps), a subset of the corpus,
    and never floods the driver with the full corpus."""
    from etl_onprem_to_cloud_spark.llm.similarity import _bounded_fit_rows
    from etl_onprem_to_cloud_spark.queries._util import cat

    emb = cat(spark, sf_dir).embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    n = emb.count()
    assert n > 10
    rows = _bounded_fit_rows(emb, 10, "test-fit")
    assert len(rows) == 10
    all_ids = {r["id"] for r in emb.select("id").collect()}
    assert {i for i, _ in rows} <= all_ids
    # ids are distinct (a sample, not a multiset artifact)
    assert len({i for i, _ in rows}) == 10


def test_bounded_fit_rows_deterministic_under_repartition(spark, sf_dir):
    """The over-cap subsample is content-hash-gated, so physical
    layout (partition count, row order) must not change the fit set."""
    from etl_onprem_to_cloud_spark.llm.similarity import _bounded_fit_rows
    from etl_onprem_to_cloud_spark.queries._util import cat

    emb = cat(spark, sf_dir).embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    a = _bounded_fit_rows(emb, 17, "test-fit")
    b = _bounded_fit_rows(emb.repartition(7), 17, "test-fit")
    c = _bounded_fit_rows(emb.repartition(1).orderBy(F.desc("id")), 17, "test-fit")
    assert a == b == c


def test_bounded_fit_rows_below_cap_is_full_corpus(spark, sf_dir):
    """Below the cap the fit set is the whole corpus -- the legacy
    behavior, byte-identical, so driver-SF oracles are untouched."""
    from etl_onprem_to_cloud_spark.llm.similarity import _bounded_fit_rows
    from etl_onprem_to_cloud_spark.queries._util import cat

    emb = cat(spark, sf_dir).embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    n = emb.count()
    rows = _bounded_fit_rows(emb, n + 100, "test-fit")
    assert sorted(i for i, _ in rows) == sorted(
        r["id"] for r in emb.select("id").collect()
    )


def test_lloyd_over_cap_fit_runs_and_assigns_all(spark, sf_dir):
    """lloyd_cells with an over-cap corpus fits on the bounded
    subsample (no raise -- the r6 contract change) and still assigns
    EVERY corpus vector map-only; centroids come from the sample."""
    from etl_onprem_to_cloud_spark.llm.similarity import lloyd_cells
    from etl_onprem_to_cloud_spark.queries._util import cat

    emb = cat(spark, sf_dir).embeddings
    n = emb.count()
    assigned, cents = lloyd_cells(emb, num_cells=4, n_iter=1, fit_max_rows=10)
    rows = assigned.collect()
    assert len(rows) == n  # assignment is corpus-wide regardless of fit cap
    cells = {r["cell"] for r in cents.collect()}
    assert cells and all(r["__cell"] in cells for r in rows)


def test_pq_adc_recall_vs_brute_force(spark, sf_dir):
    """PQ/ADC with 4 subspaces x 8 centroids is a coarse quantization
    of a 64-dim space (ADC-only recall@10 is ~0.2-0.3 here); the
    registered query's exact rerank of the top-50 ADC shortlist must
    recover most of the exact top-10."""
    exact = QUERIES["q_ann_brute_force_topk"].fn(spark, sf_dir).collect()
    approx = QUERIES["q_ann_pq_adc_topk"].fn(spark, sf_dir).collect()

    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)

    assert set(got) == set(truth), "every query vector must get neighbors"
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    recall = hits / total
    assert recall >= 0.5, f"PQ/ADC+rerank recall@10 too low: {recall:.2f}"


def test_ivfpq_recall_vs_brute_force(spark, sf_dir):
    """IVFPQ compounds two approximations (3-of-8 probed cells + PQ'd
    residuals), partially undone by the exact rerank of the top-50 ADC
    shortlist; recall@10 must stay well above the random rate."""
    exact = QUERIES["q_ann_brute_force_topk"].fn(spark, sf_dir).collect()
    approx = QUERIES["q_ann_ivfpq_topk"].fn(spark, sf_dir).collect()

    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)

    assert set(got) == set(truth), "every query vector must get neighbors"
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    recall = hits / total
    assert recall >= 0.3, f"IVFPQ recall@10 too low: {recall:.2f}"


def test_adaptive_features_warn_at_hashingtf_cap(caplog):
    """VERDICT r7 item 5: past ~2.7M docs the adaptive HashingTF rule
    saturates at 2^30 (JVM Int) and the twin's candidate volume slowly
    re-inflates; the caller must get a runtime signal naming the
    native q_dedup_minhash_lsh production path.  Pure-helper test: the
    rule depends only on n_docs, so the cap regime is exercisable
    without a 2.7M-doc corpus."""
    import logging

    from etl_onprem_to_cloud_spark.llm.similarity_ml import (
        _HASHINGTF_MAX_FEATURES,
        _adaptive_num_features,
    )

    with caplog.at_level(logging.WARNING,
                         logger="etl_onprem_to_cloud_spark.llm.similarity_ml"):
        nf = _adaptive_num_features(5_000_000, 1 << 18)
    assert nf == _HASHINGTF_MAX_FEATURES
    assert len(caplog.records) == 1
    msg = caplog.records[0].getMessage()
    assert "q_dedup_minhash_lsh" in msg and "2^30" in msg


def test_adaptive_features_silent_below_cap(caplog):
    """Below the saturation point the rule must stay quiet: the warning
    is a regime signal, not ambient noise.  Covers both the no-raise
    regime (driver SFs, <= 655 docs: value bit-identical to the passed
    num_features) and the raised-but-uncapped regime."""
    import logging

    from etl_onprem_to_cloud_spark.llm.similarity_ml import (
        _adaptive_num_features,
    )

    with caplog.at_level(logging.WARNING,
                         logger="etl_onprem_to_cloud_spark.llm.similarity_ml"):
        assert _adaptive_num_features(500, 1 << 18) == 1 << 18
        assert _adaptive_num_features(5_000, 1 << 18) == 1 << 21
    assert caplog.records == []


def test_ann_query_ids_must_be_unique(spark, sf_dir):
    """The ANN family's `.limit(len(query_ids))` bounds are value
    no-ops ONLY for a duplicate-free id list (ADVICE r9): a duplicate
    must raise loudly, never silently drop nondeterministic rows."""
    import pytest as _pytest

    from etl_onprem_to_cloud_spark.llm.similarity import brute_force_top_k
    from etl_onprem_to_cloud_spark.sources.io import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    with _pytest.raises(ValueError, match="duplicate-free"):
        brute_force_top_k(emb, [0, 1, 1], k=3)


def test_embeddings_id_col_is_unique(spark, sf_dir):
    """The table side of the same precondition: vec_id is the
    embeddings fixture's key, so the IN-list filter yields at most
    len(query_ids) rows and every ANN limit stays a value no-op."""
    from pyspark.sql import functions as F

    from etl_onprem_to_cloud_spark.sources.io import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    dup = (
        emb.groupBy("vec_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0


def test_ml_minhash_dispatches_native_past_feature_cap(spark, sf_dir, monkeypatch):
    """VERDICT r9 item 5: past the HashingTF 2^30 boundary the verified
    MLlib twin dispatches to the native md5 banding (3 rows/band at
    flagship gate strength; 1-row bands OOM'd the r10 sf100 verify on
    candidate volume).  Differential: with the boundary forced low,
    the dispatched output must equal the MLlib path's verified output
    row-for-row -- the exact-Jaccard verify makes both gates emit the
    same pair set."""
    from etl_onprem_to_cloud_spark.llm import similarity_ml as SM
    from etl_onprem_to_cloud_spark.sources.io import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")

    kwargs = dict(
        num_hash_tables=8,
        jaccard_distance_threshold=0.5,
        verify_jaccard_sim=0.8,
    )
    want = sorted(
        map(tuple, SM.ml_minhash_near_dup_pairs(docs, **kwargs).collect())
    )
    monkeypatch.setattr(SM, "_HASHINGTF_MAX_FEATURES", 1)  # force dispatch
    got_df = SM.ml_minhash_near_dup_pairs(docs, **kwargs)
    # the dispatched plan is the native banding: no MLlib UDF stages
    from etl_onprem_to_cloud_spark.plans import has_python_udf

    got = sorted(map(tuple, got_df.collect()))
    assert got == want
    assert not has_python_udf(got_df)
