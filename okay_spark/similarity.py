"""Similarity search over embedding columns (array<float>).

Two tiers:

- :func:`brute_force_topk` — exact cosine against one query vector; a single
  projection + ``ORDER BY LIMIT k`` (Spark runs TakeOrderedAndProject: each
  partition keeps its local top-k, the driver merges k*partitions rows — no
  full sort, no shuffle of the table).
- :func:`lsh_knn_join` — the scale path for many-query / all-pairs k-NN:
  random-hyperplane LSH buckets (deterministic, hash-derived planes shared
  with :mod:`okay_spark.dedup`) with multiprobe, exact cosine re-rank inside
  buckets, per-query top-k via window. Shuffle is bucket-local, never
  all-pairs.

Dot products are pure Column expressions (``zip_with`` + ``aggregate``); for
very high dimensions a vectorized Arrow kernel could replace them, but at the
128-dim fixtures the JVM expression path wins (no Python worker round-trip).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import cosine, hyperplane_bucket


def cosine_to_query(vec_col: Column | str, query: list[float]) -> Column:
    """Cosine similarity of each row's vector against one constant query."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    q = F.lit([float(x) for x in query]).cast("array<double>")
    return cosine(v.cast("array<double>"), q)


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine for a single query vector."""
    scored = df.select(
        F.col(id_col), cosine_to_query(vec_col, query).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def threshold_neighbors(
    df: DataFrame,
    query: list[float],
    *,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All vectors with cosine >= threshold against one query (exact scan)."""
    scored = df.select(F.col(id_col), cosine_to_query(vec_col, query).alias("score"))
    return scored.filter(F.col("score") >= threshold)


def lsh_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    dim: int,
    k: int = 10,
    planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate k-NN join: for each query row, top-k corpus rows by cosine
    among LSH-bucket candidates. Returns (query_id, neighbor_id, score, rank).
    """
    qb = hyperplane_bucket(F.col(vec_col).cast("array<double>"), dim, planes=planes)
    cb = hyperplane_bucket(F.col(vec_col).cast("array<double>"), dim, planes=planes)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), qb.alias("_bkt"))
    if multiprobe:
        probes = F.array(F.col("_bkt"), *[F.col("_bkt").bitwiseXOR(F.lit(1 << p)) for p in range(planes)])
        q = q.select("query_id", "_qv", F.explode(probes).alias("_probe"))
    else:
        q = q.select("query_id", "_qv", F.col("_bkt").alias("_probe"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), cb.alias("_probe"))

    scored = (
        q.join(c, on="_probe")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")).alias("score"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
