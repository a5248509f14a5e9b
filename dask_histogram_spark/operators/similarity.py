"""Similarity search over embedding columns (array<float>).

* :func:`brute_force_topk` — exact cosine top-k; the baseline.  Query
  side is broadcast (small), data side streams — no shuffle of the big
  table at all; per-row math is built-in ``zip_with``/``aggregate``
  expressions (JVM, codegen).
* :func:`ivf_topk` — the scale path: IVF-style bucketing.  Vectors are
  assigned to their nearest centroid once (narrow map); a query probes
  only the ``nprobe`` nearest centroid buckets, turning top-k from a
  full scan into a pruned equi-join on centroid id.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["brute_force_topk", "ivf_topk", "embedding_norms", "cosine_expr"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns (double math)."""
    ad = F.transform(a, lambda v: v.cast("double"))
    bd = F.transform(b, lambda v: v.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def embedding_norms(df: DataFrame, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """(id, l2_norm, dim) — cheap sanity/statistics operator."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(
        F.col(id_col),
        F.round(_norm(v), 6).alias("l2_norm"),
        F.size(F.col(vec_col)).alias("dim"),
    )


def brute_force_topk(df: DataFrame, queries: DataFrame, k: int = 5,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     q_vec_col: str | None = None,
                     q_id_col: str | None = None) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` is broadcast — the big side never shuffles; ranking is a
    per-query window over the (small) candidate scores.  Ties broken by
    neighbor id on the ROUNDED similarity so results are deterministic
    and reproducible against an oracle.
    Output: (query_id, neighbor_id, cos_sim, rank).
    """
    q_vec_col = q_vec_col or vec_col
    q_id_col = q_id_col or id_col
    q = F.broadcast(
        queries.select(
            F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("__qv")
        )
    )
    scored = (
        df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"))
        .join(q, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("__qv"), F.col("__v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_topk(df: DataFrame, queries: DataFrame, centroids: np.ndarray,
             k: int = 5, nprobe: int = 2, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k via IVF bucketing.

    ``centroids`` is a (C, dim) numpy array (e.g. from a driver-side
    k-means over a sample).  Index build = one narrow pass assigning
    each vector to its nearest centroid; search joins queries (each
    expanded to its ``nprobe`` nearest centroids) to bucketed vectors on
    centroid id — the scan is pruned to ~nprobe/C of the data, and the
    bucket assignment is reusable across queries (write it bucketed/
    partitioned by ``cid`` in a real deployment).
    Output: (query_id, neighbor_id, cos_sim, rank).
    """
    C = centroids.shape[0]
    cent_rows = [(int(i), [float(x) for x in centroids[i]]) for i in range(C)]
    cent_df = F.broadcast(
        df.sparkSession.createDataFrame(cent_rows, "cid INT, cvec ARRAY<DOUBLE>")
    )

    def nearest(vec: Column, n: int) -> DataFrame:
        """struct array of n nearest centroid ids for a vector column."""
        return F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct((-cosine_expr(vec, F.col("cvec"))).alias("d"),
                             F.col("cid"))
                )
            ),
            1, n,
        )

    # index: nearest centroid per vector (argmin over broadcast centroids)
    assigned = (
        df.crossJoin(cent_df)
        .groupBy(id_col, vec_col)
        .agg(
            F.min_by("cid", -cosine_expr(F.col(vec_col), F.col("cvec"))).alias("cid")
        )
    )
    # queries expand to nprobe buckets
    q_assigned = (
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv"))
        .crossJoin(cent_df)
        .groupBy("query_id", "__qv")
        .agg(nearest(F.col("__qv"), nprobe).alias("probes"))
        .select("query_id", "__qv", F.explode("probes.cid").alias("cid"))
    )
    scored = (
        assigned.join(F.broadcast(q_assigned), on="cid")
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_expr(F.col("__qv"), F.col(vec_col)), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
