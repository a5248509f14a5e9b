"""lm_score scale ladder (round-9 VERDICT #4: extend to 100M docs and
cover the PRODUCTION shapes): synthetic corpora at increasing sizes
through three configurations —

* ``self``    — self-scored, min_count=1 (the gated text_quality leg);
* ``pruned``  — min_count=3 (CCNet-style tail collapse: the model
  drops singleton/doubleton bigrams, the head is the broadcastable
  scoring table);
* ``ref``     — reference-corpus mode (model trained on the even-id
  HALF, every doc scored against it — odd docs genuinely hit unseen
  transitions), min_count=2: the production quality-filter shape the
  round-10 gate also carries.

Corpus protocol (the round-9 ladder's): 12 words/doc from a 50k-token
vocabulary, word = xxhash64(doc_id, pos) mod vocab — fully
distributed, deterministic, no driver-side data.  Exact accounting
each point: every doc has exactly 11 bigrams (asserted), and
``self`` must report zero unseen transitions.

``est_bigrams`` (round-10) sizes the model aggregate's own shuffle —
at 100M docs the reference stream carries 1.1e9 bigram occurrences
(~0.9e9 distinct types against the 2.5e9 pair space), exactly the
reduce-side hash-map regime the span capstone OOM'd on before
operator-level sizing.

Usage: python scripts/blowup_lm.py [n_docs ...]   (default 1M 10M)
Set SPARK_DRIVER_MEMORY=96g for the 100M point.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from dask_histogram_spark.operators import lm_score  # noqa: E402
from dask_histogram_spark.session import get_spark  # noqa: E402

VOCAB = 50_000
WORDS = 12


def synth(spark: SparkSession, n_docs: int):
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit("w"),
                            F.pmod(F.xxhash64(F.col("id"), F.lit(i)),
                                   F.lit(VOCAB)))
                   for i in range(WORDS)]).alias("text"),
    ).repartition(64)


def run_point(spark: SparkSession, n_docs: int) -> None:
    # >= 50M: DON'T persist — the corpus is a closed-form projection
    # of range() (regeneration is ~free) and its disk-spilled blocks
    # compete with the mode shuffles for the ~73 GiB scratch
    big = n_docs >= 50_000_000
    corpus = synth(spark, n_docs)
    if not big:
        corpus = corpus.persist()
        corpus.count()
    est = (WORDS - 1) * n_docs
    rows = []
    # >= 50M docs: the string-keyed model aggregate + scoring join
    # shuffle ~11n bigram STRING pairs and exhausted this container's
    # ~77 GiB shuffle scratch at 100M (round-10 finding) — the scale
    # path is hashed_model=True (64-bit token-hash keys, ~3x less
    # shuffle; differentially tested equal to strings at test scale).
    # The 10M point runs BOTH, as the continuity datum.
    hashed = n_docs >= 50_000_000
    modes = ["self", "pruned", "ref"]
    if n_docs == 10_000_000:
        modes.append("self_hashed")
    for mode in modes:
        base = mode.replace("_hashed", "")
        kw = {"min_count": {"self": 1, "pruned": 3, "ref": 2}[base],
              "est_bigrams": est,
              "hashed_model": hashed or mode.endswith("_hashed")}
        if base == "ref":
            kw["ref_df"] = corpus.where(F.col("doc_id") % 2 == 0)
        t0 = time.perf_counter()
        agg = lm_score(corpus, **kw).agg(
            F.sum("n_bigrams").alias("nb"),
            F.sum("n_unseen_bigrams").alias("nu"),
            F.min("avg_lp10").alias("lo"),
            F.max("avg_lp10").alias("hi")).first()
        wall = time.perf_counter() - t0
        if agg["nb"] != (WORDS - 1) * n_docs:
            raise AssertionError(
                f"{mode}: bigram total {agg['nb']} != 11 x {n_docs}")
        if base == "self" and agg["nu"] != 0:
            raise AssertionError(f"self-scored unseen: {agg['nu']}")
        rows.append((mode, wall, agg["nu"], agg["lo"], agg["hi"]))
        if big:
            # drop the previous mode's shuffle files before the next
            # one starts: local-mode shuffle data is reclaimed by the
            # ContextCleaner only on GC, and two modes' shuffles
            # together overflow the scratch disk
            import gc as _gc

            _gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(5)
    if not big:
        corpus.unpersist()
    tag = " [hashed_model]" if hashed else ""
    print(f"{n_docs:>11,} docs ({est / 1e6:.0f}M bigrams){tag}  " +
          "  ".join(f"{m} {w:6.1f}s (unseen {u:,})"
                    for m, w, u, _, _ in rows),
          flush=True)


def main() -> None:
    points = [int(x) for x in sys.argv[1:]] or [1_000_000, 10_000_000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dhs-lm", cpus=cpus,
                      extra_conf={"spark.io.compression.codec": "zstd"})
    spark.sparkContext.setLogLevel("ERROR")
    for n in points:
        run_point(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()
