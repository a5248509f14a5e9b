"""Scale ladder for the embedding near-dup pipeline (hyperplane-LSH
pairs -> connected components): deterministic synthetic vectors with
10% planted near-duplicates, steady-state walls per point.

Vectors are generated DISTRIBUTED and deterministically: component j of
vector i = a unit-scaled integer hash of (i, j) (xxhash64 -> [-1, 1]),
so any cluster layout generates the identical table.  Near-dups copy a
base vector and nudge ONE component by 1e-3 — cosine ~1, same LSH
bucket with high probability.

Usage: python scripts/blowup_embedding.py [n_vecs ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dask_histogram_spark.operators import (  # noqa: E402
    dedup_clusters,
    embedding_near_dup_pairs,
    release_clusters_checkpoint,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

DIM = 64


def synth_vectors(spark: SparkSession, n: int,
                  dup_rate: float = 0.10) -> DataFrame:
    n_dup = int(n * dup_rate)
    n_base = n - n_dup
    comp = F.array(*[
        (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j)), F.lit(2001)) - 1000)
        .cast("float") / 1000.0
        for j in range(DIM)
    ])
    base = spark.range(n_base).select(
        F.col("id").alias("vec_id")).select("vec_id",
                                            comp.alias("embedding"))
    dups = base.filter(F.col("vec_id") < n_dup).select(
        (F.col("vec_id") + n_base).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, DIM - 1),
            F.array((F.element_at("embedding", DIM) + F.lit(0.001))
                    .cast("float")),
        ).alias("embedding"),
    )
    return base.unionByName(dups).repartition(64)


def main() -> None:
    points = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("blowup-emb", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for n in points:
        vecs = synth_vectors(spark, n).persist()
        vecs.count()
        for tag in ("warm", "steady"):
            t0 = time.perf_counter()
            pairs = embedding_near_dup_pairs(vecs, threshold=0.99,
                                             planes=16)
            clusters = dedup_clusters(pairs, id_a="id_a", id_b="id_b")
            n_nodes = clusters.count()
            wall = time.perf_counter() - t0
            release_clusters_checkpoint(clusters)
            print(f"{n} vecs [{tag}]: {wall:.2f}s clustered={n_nodes} "
                  f"({n / wall / 1000:.1f}k vecs/s)")
        vecs.unpersist()


if __name__ == "__main__":
    main()
