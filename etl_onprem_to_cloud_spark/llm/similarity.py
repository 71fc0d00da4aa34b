"""Similarity search over embedding columns (Ring C).

- :func:`brute_force_top_k` -- exact cosine top-k: broadcast the (small)
  query set against the corpus, fold the dot product in codegen, rank
  with a per-query window.  This is the correctness baseline; cost is
  O(|queries| * |corpus| * dim) spread across executors, which is the
  right tool whenever |queries| is bounded (batch retrieval, eval sets).
- :func:`ivf_top_k` -- IVF-style approximate search: corpus vectors are
  assigned to coarse cells (here the fixture's ``label`` plays the role
  of an offline k-means cell id; computing fresh cells is a one-line
  KMeans fit); per query only the ``nprobe`` nearest cell centroids are
  searched.  At 100 TB this turns a full scan into a
  ``nprobe/num_cells`` partial scan, and cell assignment is the shuffle
  key, so each probe touches a bounded partition set.
- :func:`embedding_near_dup_pairs` -- cosine-threshold pair mining
  blocked on a partition column (semantic near-dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import cosine_similarity


def brute_force_top_k(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query id.  Returns
    (query_id, neighbor_id, cosine, rank) excluding self-matches.

    Scale shape: the query side is a broadcast nested-loop of a few
    rows; the corpus side streams through codegen -- no shuffle until
    the final per-query top-k (bounded at |queries| * k rows).
    """
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        corpus.join(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("q_vec"), F.col("n_vec")), 6
            ).cast("double").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _centroids(embeddings: DataFrame, cell_col: str, vec_col: str) -> DataFrame:
    """Per-cell mean vector via posexplode + dim-wise avg + re-assembly.
    One shuffle keyed on (cell, dim); output is num_cells tiny rows."""
    dims = embeddings.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(vec_col).alias("dim", "val"),
    )
    per_dim = dims.groupBy("cell", "dim").agg(F.avg("val").alias("avg_val"))
    return (
        per_dim.groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "avg_val"))
            ).alias("pairs")
        )
        .select(
            "cell",
            F.transform(F.col("pairs"), lambda p: p["avg_val"]).alias("centroid"),
        )
    )


def kmeans_cells(
    embeddings: DataFrame,
    num_cells: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Coarse quantizer: seeded KMeans cell assignment (the IVF 'train'
    step).  Returns the input plus a ``__cell`` column.  Deterministic
    for a fixed seed; at 100 TB fit on a sample
    (``df.sample(...)``) and only transform the full corpus."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.withColumn(
        "__features",
        array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double"))),
    )
    model = KMeans(
        k=num_cells, seed=seed, featuresCol="__features", predictionCol="__cell"
    ).fit(feats)
    return model.transform(feats).drop("__features")


def ivf_top_k(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    num_cells: int = 10,
) -> DataFrame:
    """IVF approximate top-k: search only the ``nprobe`` cells whose
    centroids are most cosine-similar to each query.  Returns
    (query_id, neighbor_id, cosine, rank).

    ``cell_col=None`` (default) trains a seeded KMeans quantizer so the
    cells follow the corpus geometry; pass a column name to reuse an
    existing offline partition instead (only sound if that partition
    actually clusters the vector space -- an arbitrary category column
    caps recall at roughly nprobe/num_cells).
    """
    if cell_col is None:
        embeddings = kmeans_cells(
            embeddings, num_cells=num_cells, id_col=id_col, vec_col=vec_col
        )
        cell_col = "__cell"
    cents = _centroids(embeddings, cell_col, vec_col)
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # Rank cells per query by centroid similarity (tiny cross join).
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("c_sim").desc(), F.col("cell")
    )
    probes = (
        queries.join(F.broadcast(cents))
        .withColumn(
            "c_sim", cosine_similarity(F.col("q_vec"), F.col("centroid"))
        )
        .withColumn("c_rank", F.row_number().over(probe_w))
        .filter(F.col("c_rank") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("q_vec"), F.col("n_vec")), 6
            ).cast("double").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold).  ``block_col`` bounds the self-join (IVF-cell blocking);
    pass None for the exact quadratic variant on small corpora."""
    e = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        *( [F.col(block_col)] if block_col else [] ),
    )
    a, b = e.alias("a"), e.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
            ).cast("double").alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
