"""IVF recall ladder on a CLUSTERED corpus (round-11 VERDICT #4).

The 10M decade ladder (blowup_embedding_10m.py) reports recall@10 on
an ISOTROPIC random corpus — the documented worst case for IVF (true
top-10 sit at cosine ~0.5 with hair-thin margins, scattered over many
buckets), so its 0.22-0.51 floor values say nothing about production
corpora, where real embedding models emit CLUSTERED vectors (topical /
lingual modes).  This ladder measures the curve where those corpora
live: a mixture-of-Gaussians corpus (G well-separated component
centers, per-vector Gaussian-ish noise), recall@10 vs brute-force
ground truth swept over nprobe, at the auto_ivf_params sqrt-rule C and
at fixed comparison widths.

Corpus (closed-form, no driver data): vector i belongs to component
g = xxhash64(i) mod G; component j of its embedding is
center(g, j) + sigma * noise(i, j), with center and noise components
uniform in [-1, 1] from independent xxhash64 streams.  sigma=0.35
gives within-component cosine ~0.93 and cross-component ~0.0 —
"topic cluster" geometry.  Queries are FRESH samples of the same
mixture (new noise, ids offset far above the corpus), so a query's
true neighbors concentrate in its component's buckets — the regime
IVF is built for.

Usage: python scripts/blowup_ivf_clustered.py [n_vecs ...]
Defaults to 100_000 and 1_000_000.  Output: one table row per
(n, nprobe) — recall@10, probe wall — plus the sqrt-rule C and the
per-point fit/build walls.  BASELINE.md records the table.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dask_histogram_spark.operators import (  # noqa: E402
    brute_force_topk,
    build_ivf_index,
    fit_centroids,
    ivf_topk_indexed,
)
from dask_histogram_spark.operators.similarity import auto_ivf_params  # noqa: E402
from dask_histogram_spark.session import get_spark  # noqa: E402

DIM = 64
G = 200          # mixture components
SIGMA = 0.35     # noise scale vs unit-range center components
N_QUERIES = 32
K = 10
NPROBES = (1, 2, 4, 8, 16, 32)


def _unit(col: "F.Column", seed_col: "F.Column") -> "F.Column":
    """xxhash64 -> uniform [-1, 1] float (the decade ladders'
    deterministic component generator)."""
    return ((F.pmod(F.xxhash64(col, seed_col), F.lit(2001)) - 1000)
            .cast("float") / 1000.0)


def mixture(spark: SparkSession, n: int, id_offset: int = 0,
            noise_stream: int = 0) -> DataFrame:
    """n mixture vectors with ids [id_offset, id_offset+n): component
    g = xxhash64(id) mod G; embedding[j] = center(g,j) + SIGMA *
    noise(id, j, noise_stream).  ``noise_stream`` decorrelates query
    noise from corpus noise for the same component."""
    ids = spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id"))
    g = F.pmod(F.xxhash64(F.col("vec_id") - id_offset
                          if noise_stream else F.col("vec_id")),
               F.lit(G))
    comp = F.array(*[
        (_unit(g, F.lit(1_000_000 + j))
         + F.lit(SIGMA) * _unit(F.col("vec_id"),
                                F.lit(2_000_000 * (1 + noise_stream) + j))
         ).cast("float")
        for j in range(DIM)
    ])
    return ids.select("vec_id", comp.alias("embedding")).repartition(64)


def point(spark: SparkSession, n: int, workdir: str) -> None:
    vecs = mixture(spark, n).persist()
    vecs.count()

    c_auto, _ = auto_ivf_params(n, nprobe=8)
    t0 = time.perf_counter()
    # 4x oversample of the 100k row cap: a fixed large fraction at
    # 10M+ would sample millions of vectors only for the limit to
    # discard them (measured: the 0.5 fraction's sample-collect ran
    # minutes at 10M before the fit even started)
    cents = fit_centroids(vecs, n_centroids=c_auto,
                          sample_fraction=min(0.5, 400_000 / n),
                          iterations=10)
    t_fit = time.perf_counter() - t0

    path = os.path.join(workdir, f"ivfc_{n}")
    t0 = time.perf_counter()
    build_ivf_index(vecs, cents, path)
    t_build = time.perf_counter() - t0

    # queries: same mixture, fresh noise stream, ids far above corpus
    qs = mixture(spark, N_QUERIES, id_offset=10 * n,
                 noise_stream=1).persist()
    qs.count()
    truth = (brute_force_topk(vecs, qs, k=K, method="arrow")
             .select("query_id", "neighbor_id").persist())
    denom = truth.count()

    print(f"n={n:>10,}  sqrt-rule C={c_auto}  fit {t_fit:6.1f}s  "
          f"build {t_build:6.1f}s", flush=True)
    for nprobe in NPROBES:
        if nprobe > c_auto:
            break
        t0 = time.perf_counter()
        got = ivf_topk_indexed(path, qs, k=K, nprobe=nprobe)
        hit = (got.select("query_id", "neighbor_id")
               .join(truth, ["query_id", "neighbor_id"]).count())
        wall = time.perf_counter() - t0
        print(f"    nprobe={nprobe:>3}: recall@{K} "
              f"{hit / denom:.3f}  probe{N_QUERIES} {wall:5.1f}s",
              flush=True)
    truth.unpersist()
    qs.unpersist()
    vecs.unpersist()


def main() -> None:
    points = [int(x) for x in sys.argv[1:]] or [100_000, 1_000_000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dhs-ivfc", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="dhs_ivfc_")
    try:
        for n in points:
            point(spark, n, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
