"""Embedding-pillar DECADE ladder to 10M vectors (round-10 VERDICT
#6): the two embedding legs whose ladders stopped at 1M —

1. the NEAR-DUP PIPELINE (embedding_near_dup_pairs ->
   dedup_clusters), run under ``planes="auto"`` so the signature
   width/repetitions self-size per point (the fixed-width saturation
   wall is the round-7 multi-probe finding; auto is its fix), with
   EXACT planted accounting: 10% of vectors are one-component nudges
   of a base vector (cosine ~1), so clustered nodes must be
   2 x n_dup minus the reported recall misses and NOTHING below the
   planted id range may ever cluster;
2. the IVF pillar at index scale (fit_centroids -> build_ivf_index
   -> ivf_topk_indexed): build wall, index bytes, probe wall over a
   128-query batch, and TWO recall gates — planted recall@1 (each
   query is a nudge of a known vector, whose id must come back at
   rank 1) and recall@10 vs brute_force_topk ground truth on a
   16-query subset.

(The third embedding leg — the persisted incremental signature probe
— already carries a 10M planes="auto" point from round 7:
BASELINE.md "Round-7 multi-probe at 10M", planes=19/reps=8, recall
vs the exact collision model at every level.)

Shuffle-scratch is sampled (du over the session's spark-local dirs)
after each phase, the round-10 LM-ladder practice.

Usage: python scripts/blowup_embedding_10m.py [n_vecs ...]
Defaults to 1M and 10M.  Run from /root/repo; set
SPARK_DRIVER_MEMORY for the 10M point.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dask_histogram_spark.operators import (  # noqa: E402
    brute_force_topk,
    build_ivf_index,
    dedup_clusters,
    embedding_near_dup_pairs,
    fit_centroids,
    ivf_topk_indexed,
    release_clusters_checkpoint,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

DIM = 64
DUP_RATE = 0.10
N_QUERIES = 128
BRUTE_QUERIES = 16
K = 10


def scratch_gib() -> float:
    """du -s over this session's spark scratch dirs (blockmgr +
    shuffle), the LM-ladder practice: end-of-phase footprint, not a
    true peak, but it catches an order-of-magnitude wall."""
    total = 0
    for d in glob.glob("/tmp/spark-*") + glob.glob("/tmp/blockmgr-*"):
        try:
            out = subprocess.run(["du", "-sk", d], capture_output=True,
                                 text=True, timeout=120)
            total += int(out.stdout.split()[0])
        except Exception:
            pass
    return total / 2 ** 20


def synth_vectors(spark: SparkSession, n: int,
                  dup_rate: float = DUP_RATE) -> DataFrame:
    """blowup_embedding.py's deterministic corpus: component j of
    vector i = unit-scaled xxhash64(i, j); dups nudge ONE component
    by 1e-3 (cosine ~1) at ids >= n_base."""
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


def near_dup_point(spark: SparkSession, n: int) -> None:
    n_dup = int(n * DUP_RATE)
    n_base = n - n_dup
    vecs = synth_vectors(spark, n).persist()
    vecs.count()
    # 10M+: single rep — the job is ~an hour of real work under the
    # auto-resolved 8-table config, so JVM warmup is noise and a
    # steady rep doubles the ladder's wall for nothing
    # 10M+: auto WIDTH but explicit repetitions=2 (the "storage
    # budget" guidance in auto_hyperplane_params' docstring).  The
    # in-query self-join shuffles band rows WITH their denormalized
    # 64-float vectors on both sides: 2 x n x reps x ~300 B, so the
    # auto-resolved 8 tables at 10M need ~48 GB of exchange + SMJ
    # sort spill and overflowed this container's ~80 GB scratch
    # (measured on this ladder — df hit 97%).  reps=2 fits (~12 GB)
    # and holds recall ~1 for the planted cosine~1 pairs (per-table
    # collision p^19 ~ 0.42 applies at the DESIGN cosine 0.99, not at
    # ~1 where p ~ 1); the production form at full recall targets is
    # the persisted signature table + incremental probe, whose 10M
    # auto point (planes=19, reps=8) is the round-7 BASELINE table.
    reps = None if n < 10_000_000 else 2
    for tag in (("warm", "steady") if n < 10_000_000 else ("cold",)):
        t0 = time.perf_counter()
        pairs = embedding_near_dup_pairs(vecs, threshold=0.99,
                                         planes="auto",
                                         repetitions=reps)
        clusters = dedup_clusters(pairs, id_a="id_a", id_b="id_b")
        # exactness: a cluster member below n_dup is a planted pair's
        # base (fine); one in [n_dup, n_base) is a FALSE MERGE of two
        # unrelated vectors — the contract violation
        agg = clusters.agg(
            F.count(F.lit(1)).alias("nodes"),
            F.sum(((F.col("doc_id") >= n_dup)
                   & (F.col("doc_id") < n_base)).cast("long"))
            .alias("false_nodes")).first()
        wall = time.perf_counter() - t0
        release_clusters_checkpoint(clusters)
        if agg["false_nodes"]:
            raise AssertionError(
                f"{agg['false_nodes']} unplanted vectors clustered")
        missed = 2 * n_dup - agg["nodes"]
        print(f"near-dup {n:>10,} [{tag}]: {wall:7.1f}s  "
              f"nodes={agg['nodes']:,} (recall "
              f"{1 - missed / (2 * n_dup):.6f}, {missed} missed)  "
              f"scratch={scratch_gib():.1f}GiB", flush=True)
    vecs.unpersist()


def ivf_point(spark: SparkSession, n: int, workdir: str) -> None:
    n_dup = int(n * DUP_RATE)
    n_base = n - n_dup
    vecs = synth_vectors(spark, n).persist()
    vecs.count()
    n_cent = 256 if n <= 1_000_000 else 1024

    t0 = time.perf_counter()
    cents = fit_centroids(vecs, n_centroids=n_cent, sample_fraction=0.1,
                          iterations=10)
    t_fit = time.perf_counter() - t0

    path = os.path.join(workdir, f"ivf_{n}")
    t0 = time.perf_counter()
    build_ivf_index(vecs, cents, path)
    t_build = time.perf_counter() - t0
    size_gib = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path) for f in fs) / 2 ** 30

    # planted queries: nudge a SECOND component of 128 known base
    # vectors (ids spread across the corpus) -> true NN is the source.
    # Query ids are offset by 2n: the searchers exclude query_id ==
    # neighbor_id (self-match), so a query reusing its source's id
    # would exclude its own ground truth.
    step = max(n_base // N_QUERIES, 1)
    q_off = 2 * n
    qs = (synth_vectors(spark, n).where(
        (F.col("vec_id") < n_base) & (F.col("vec_id") % step == 0))
        .limit(N_QUERIES)
        .select((F.col("vec_id") + q_off).alias("vec_id"),
                F.concat(
                    F.array((F.element_at("embedding", 1) + F.lit(0.0005))
                            .cast("float")),
                    F.slice("embedding", 2, DIM - 1)).alias("embedding"))
        .persist())
    nq = qs.count()

    t0 = time.perf_counter()
    got = ivf_topk_indexed(path, qs, k=K, nprobe=8).persist()
    top1 = (got.where(F.col("rank") == 1)
            .where(F.col("neighbor_id") == F.col("query_id") - q_off)
            .count())
    t_probe = time.perf_counter() - t0

    # recall@10 vs exact ground truth on a subset, swept over nprobe:
    # the corpus is ISOTROPIC random, the hardest case for IVF (a
    # query's true top-10 sit at cosine ~0.5 with hair-thin margins,
    # scattered over many buckets), so recall@10 here is the curve's
    # FLOOR and the planted-recall@1 column is the near-dup-retrieval
    # gate; recall must climb with nprobe toward 1 at nprobe=C
    sub = qs.limit(BRUTE_QUERIES)
    truth = brute_force_topk(vecs, sub, k=K, method="arrow") \
        .select("query_id", "neighbor_id").persist()
    denom = truth.count()
    recalls = []
    for nprobe in (2, 8, 32):
        g = (got if nprobe == 8
             else ivf_topk_indexed(path, sub, k=K, nprobe=nprobe))
        hit = (g.select("query_id", "neighbor_id")
               .join(truth, ["query_id", "neighbor_id"]).count())
        recalls.append(f"@np{nprobe} {hit / denom:.3f}")
    truth.unpersist()
    got.unpersist()
    qs.unpersist()
    vecs.unpersist()
    print(f"ivf      {n:>10,}: fit({n_cent}c) {t_fit:6.1f}s  "
          f"build {t_build:6.1f}s ({size_gib:.2f}GiB)  "
          f"probe128@nprobe8 {t_probe:5.1f}s  "
          f"planted-recall@1 {top1}/{nq}  "
          f"recall@{K} [{', '.join(recalls)}]  "
          f"scratch={scratch_gib():.1f}GiB", flush=True)


def persisted_point(spark: SparkSession, n: int, workdir: str) -> None:
    """The PRODUCTION near-dup configuration at decade scale (round-11
    VERDICT #5): the full-recall planes="auto" tables live on the
    PERSISTED path (write once, probe batches) — the in-query
    self-join's scratch preflight sends users here at 10M+.  Build
    the signature table over the base corpus (auto width AND auto
    repetitions, design_cos at the dup threshold), probe a planted
    dup batch + a fresh control batch, record build/probe walls,
    table rows, scratch, recall and false positives."""
    from dask_histogram_spark.operators import (
        embedding_dedup_incremental,
        write_embedding_signature_table,
    )

    n_dup = int(n * DUP_RATE)
    n_base = n - n_dup
    vecs = synth_vectors(spark, n).persist()
    vecs.count()
    base = vecs.where(F.col("vec_id") < n_base)
    table = f"emb_sig_persist_{n}"
    t0 = time.perf_counter()
    write_embedding_signature_table(
        base, table, planes="auto", design_cos=0.99,
        path=os.path.join(workdir, table))
    t_build = time.perf_counter() - t0
    rows = spark.table(table).count()
    p = spark.table(f"{table}__params").first()
    print(f"persisted {n:>10,}: build {t_build:7.1f}s  "
          f"table {rows:,} rows (planes={p.planes}, reps="
          f"{p.repetitions})  scratch={scratch_gib():.1f}GiB",
          flush=True)

    # probe batch: 100k planted dups (their base twin is seen at
    # cosine ~1 -> n_matched >= 1 is a hit) + 100k FRESH vectors (ids
    # >= 3n, new hash stream -> isotropic, no cosine-0.99 neighbor
    # exists -> any match is a false positive)
    probe_n = min(100_000, n_dup)
    dups = vecs.where(F.col("vec_id") >= n_base).limit(probe_n)
    fresh = synth_vectors(spark, probe_n, dup_rate=0.0).select(
        (F.col("vec_id") + 3 * n).alias("vec_id"),
        F.reverse("embedding").alias("embedding"))
    t0 = time.perf_counter()
    got = embedding_dedup_incremental(
        dups.unionByName(fresh), table, threshold=0.99).persist()
    hits = got.where((F.col("vec_id") >= n_base)
                     & (F.col("vec_id") < 2 * n)
                     & (F.col("n_matched_seen") >= 1)).count()
    fps = got.where((F.col("vec_id") >= 3 * n)
                    & (F.col("n_matched_seen") >= 1)).count()
    t_probe = time.perf_counter() - t0
    got.unpersist()
    vecs.unpersist()
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}__params")
    print(f"persisted {n:>10,}: probe {2 * probe_n:,} "
          f"{t_probe:6.1f}s  planted-recall {hits}/{probe_n} "
          f"({hits / probe_n:.6f})  false-pos {fps}  "
          f"scratch={scratch_gib():.1f}GiB", flush=True)


def main() -> None:
    points = [int(x) for x in sys.argv[1:]] or [1_000_000, 10_000_000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dhs-emb10m", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    workdir = tempfile.mkdtemp(prefix="dhs_emb10m_")
    try:
        for n in points:
            if os.environ.get("DHS_PERSISTED_ONLY"):
                persisted_point(spark, n, workdir)
                continue
            # ivf first: the cheap decade point lands even if the
            # (hour-scale at 10M) near-dup chain is cut short
            if not os.environ.get("DHS_NEAR_ONLY"):
                ivf_point(spark, n, workdir)
            near_dup_point(spark, n)
    finally:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
