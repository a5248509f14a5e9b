"""Scale-blowup protocol for the BPE trainer (BASELINE.md "BPE
blowup" table).  Two claims to measure, not assert:

1. iterations are CORPUS-size-independent: the same vocabulary at 1M
   and 10M docs gives the same word table, so total train wall moves
   only by the one word_freq_table scan;
2. the distributed path's per-round cost tracks the WORD-table size,
   and merges_per_round batching divides the round count.

Corpus: deterministic distributed generation (xxhash64 of (doc_id,
position) picks a base word from a 5k synthetic vocabulary; a per-
occurrence morphological suffix multiplies distinct words by
``variants``) — no RNG state, no driver-side data.

Usage: python scripts/blowup_bpe.py [n_docs ...]   (default 1M 10M)
Env knobs: BPE_BASES (x8 suffixes = distinct words; 125000 -> a
1M-word vocabulary), BPE_MERGES, BPE_BATCH (merges_per_round for the
batched leg), BPE_SKIP_SERIAL=1 (skip the 1-merge-per-round
distributed leg when rounds x job-floor would dominate the run).
Write output to a /tmp log when running long points in the background.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from dask_histogram_spark.operators import train_bpe, word_freq_table  # noqa: E402
from dask_histogram_spark.session import get_spark  # noqa: E402

WORDS_PER_DOC = 16
BASES = int(os.environ.get("BPE_BASES", "5000"))
VARIANTS = 8
SUFFIXES = ["", "s", "ed", "ing", "er", "est", "ly", "ness"]
NUM_MERGES = int(os.environ.get("BPE_MERGES", "64"))
MERGES_PER_ROUND = int(os.environ.get("BPE_BATCH", "16"))
SKIP_SERIAL = os.environ.get("BPE_SKIP_SERIAL", "") == "1"


def synth_corpus(spark: SparkSession, n_docs: int) -> DataFrame:
    """16 pseudo-words per doc: base = hash(doc,pos) % 5000 spelled in
    base-26 letters, suffix = hash % VARIANTS — ~40k distinct words."""
    d = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    word = None
    suffix_case = None
    for i, s in enumerate(SUFFIXES[:VARIANTS]):
        branch = (F.col("v") % VARIANTS == i, F.lit(s))
        suffix_case = (F.when(*branch) if suffix_case is None
                       else suffix_case.when(*branch))
    # enough base-26 letters to spell any base id (3 at the default
    # 5000 bases; 4 from 17577 up — BPE_BASES=125000 gives 1M words)
    n_letters = 3
    while 26 ** n_letters < BASES:
        n_letters += 1
    letters = [
        F.char(F.lit(97)
               + (F.col("b") / (26 ** (n_letters - 1 - j))).cast("int") % 26)
        for j in range(n_letters)
    ]
    word = F.concat(*letters, suffix_case)
    return (
        d.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)))
            .alias("pos"),
        )
        .withColumn("h", F.xxhash64("doc_id", "pos"))
        .withColumn("b", F.pmod(F.col("h"), F.lit(BASES)))
        .withColumn("v", F.pmod(F.shiftright("h", 17), F.lit(VARIANTS)))
        .withColumn("w", word)
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
    )


def run_point(spark: SparkSession, n_docs: int) -> None:
    df = synth_corpus(spark, n_docs)

    t0 = time.perf_counter()
    n_words = word_freq_table(df).count()
    t_scan = time.perf_counter() - t0

    t0 = time.perf_counter()
    local = train_bpe(df, NUM_MERGES, small_vocab_words=10**9)
    t_local = time.perf_counter() - t0

    if SKIP_SERIAL:
        t_dist, dist = float("nan"), None  # 1-merge rounds too slow
    else:
        t0 = time.perf_counter()
        dist = train_bpe(df, NUM_MERGES, small_vocab_words=0)
        t_dist = time.perf_counter() - t0

    t0 = time.perf_counter()
    batched = train_bpe(df, NUM_MERGES, small_vocab_words=0,
                        merges_per_round=MERGES_PER_ROUND)
    t_batch = time.perf_counter() - t0

    agree = len(set(batched) & set(local)) / max(len(set(batched)), 1)
    eq = "skipped" if dist is None else str(dist == local)
    print(
        f"n_docs={n_docs:>10,}  distinct_words={n_words:,}  "
        f"scan={t_scan:5.1f}s  local({NUM_MERGES}m)={t_local:5.1f}s  "
        f"dist={t_dist:6.1f}s  batch{MERGES_PER_ROUND}={t_batch:5.1f}s  "
        f"dist==local={eq}  batch_set_agree={agree:.2f}",
        flush=True,
    )


def main() -> None:
    points = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("blowup_bpe", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    print(f"vocab: {BASES} bases x {VARIANTS} suffixes, "
          f"{WORDS_PER_DOC} words/doc, {NUM_MERGES} merges")
    for n in points:
        run_point(spark, n)


if __name__ == "__main__":
    main()
