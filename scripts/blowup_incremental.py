"""Incremental near-dup dedup ladder (BASELINE.md round-6/7): a seen
corpus of N synthetic docs persisted once as the bucketed banded
signature table (write_signature_table), then a fixed 10k-doc nightly
batch gated through dedup_incremental_lsh.  The numbers that matter at
scale:

* build wall — paid once per corpus refresh (the pre-paid shuffle);
* batch wall — the recurring nightly cost, which should track BATCH
  size, not seen size (the seen side is read co-located, pruned to
  the batch's band buckets by the join);
* recall vs similarity — the batch plants MUTATED re-crawls (word-level
  edits at several levels, giving true char-5-gram Jaccard from ~0.95
  down to ~0.4) alongside exact re-crawls and fresh docs.  For every
  level the script measures the TRUE shingle Jaccard of each planted
  doc (jaccard_verify_pairs, the same k=5 the signatures hash) and
  compares observed recall against the exact theory prediction
  P(candidate AND sig_matches >= gate) under the Binomial model of
  per-component MinHash agreement — so the ladder validates the
  statistics of the fixed permutation, not just the plumbing.

Usage: python scripts/blowup_incremental.py [n_seen ...]
Defaults to 100k / 1M.  Run from /root/repo.
"""

from __future__ import annotations

import os
import sys
import time
from math import comb

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (package import)
sys.path.insert(0, _HERE)  # scripts/ (synth_corpus import)

from pyspark.sql import functions as F  # noqa: E402

from blowup_pipeline import synth_corpus  # noqa: E402
from dask_histogram_spark.operators import (  # noqa: E402
    dedup_incremental_lsh,
    jaccard_verify_pairs,
    write_signature_table,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

BATCH = 10_000
VOCAB = 5000
WORDS = 16
BANDS = 8
NUM_PERM = 32
# (m words replaced, id offset): m=0 is the exact re-crawl control
LEVELS = [(0, 10_000_000), (1, 11_000_000), (2, 12_000_000),
          (3, 13_000_000), (5, 14_000_000)]
GROUP = (BATCH // 2) // len(LEVELS)
FRESH_OFF = 20_000_000


def mutated_recrawl(spark, n: int, m_changed: int, offset: int,
                    hash_base: int):
    """Re-crawls of seen docs 0..n-1 with the LAST ``m_changed`` of
    the 16 words replaced by fresh vocab draws — the unchanged words
    reproduce synth_corpus's per-(doc_id, position) hash formula
    exactly, so the pair (doc, mutated doc) has a controlled
    char-shingle overlap."""
    cols = []
    for i in range(WORDS):
        if i < WORDS - m_changed:
            h = F.xxhash64(F.col("base_id"), F.lit(i))
        else:
            # different hash input -> an independent vocab draw.
            # hash_base must land OUTSIDE every generated id range
            # (seen docs are 0..n_seen, fresh FRESH_OFF+): an
            # in-range base would make the replaced words reproduce
            # seen doc (base_id+hash_base)'s words in-position,
            # giving each planted doc a second, theory-unmodeled
            # partner (observed as a few-per-thousand recall
            # inflation under the 10/32 gate at 1M seen before the
            # fix) — so it is DERIVED from n_seen by the caller, not
            # a fixed constant a big-enough ladder would outgrow.
            h = F.xxhash64(F.col("base_id") + hash_base + m_changed,
                           F.lit(i))
        cols.append(F.concat(F.lit("w"), F.pmod(h, F.lit(VOCAB))))
    return spark.range(n).select(F.col("id").alias("base_id")).select(
        (F.col("base_id") + offset).alias("doc_id"),
        F.concat_ws(" ", *cols).alias("text"),
        F.col("base_id"),
    )


def predicted_pass(J: float, bands: int = BANDS,
                   r: int = NUM_PERM // BANDS, gate: int = 24) -> float:
    """Exact P(shares >= 1 band AND total agreements >= gate) when
    each of the num_perm signature components independently agrees
    with probability J (the MinHash estimator property).  Per-band
    agreement-count pmf convolved across bands, with the no-full-band
    sub-measure subtracted — no Monte Carlo."""
    pmf = np.array([comb(r, c) * J**c * (1 - J) ** (r - c)
                    for c in range(r + 1)])
    nofull = pmf.copy()
    nofull[r] = 0.0

    def conv_pow(p: np.ndarray, k: int) -> np.ndarray:
        out = np.array([1.0])
        for _ in range(k):
            out = np.convolve(out, p)
        return out

    tot = conv_pow(pmf, bands)
    nf = conv_pow(nofull, bands)
    return float(tot[gate:].sum() - nf[gate:].sum())


def run_point(spark, n_seen: int, workdir: str) -> None:
    seen = synth_corpus(spark, n_seen, dup_rate=0.0)
    tbl = f"dhs_inc_ladder_{n_seen}"
    t0 = time.perf_counter()
    write_signature_table(seen, tbl, num_perm=NUM_PERM, bands=BANDS,
                          max_bucket=64, n_buckets=64,
                          path=os.path.join(workdir, tbl))
    build = time.perf_counter() - t0
    try:
        hash_base = max(n_seen, FRESH_OFF + BATCH) + 1_000_000
        planted = [mutated_recrawl(spark, GROUP, m, off, hash_base)
                   for m, off in LEVELS]
        fresh = synth_corpus(spark, BATCH // 2, dup_rate=0.0,
                             id_offset=FRESH_OFF)
        batch = planted[0].drop("base_id")
        for p in planted[1:]:
            batch = batch.unionByName(p.drop("base_id"))
        batch = batch.unionByName(fresh)

        # true char-5-gram Jaccard of every planted (new, base) pair —
        # measured on the SAME shingle definition the signatures hash
        pair_rows = []
        docs = seen.where(F.col("doc_id") < GROUP)
        for p in planted:
            docs = docs.unionByName(p.drop("base_id"))
            pair_rows.append(p.select(
                F.col("doc_id").alias("id_a"),
                F.col("base_id").alias("id_b")))
        pairs = pair_rows[0]
        for pr in pair_rows[1:]:
            pairs = pairs.unionByName(pr)
        jac = {r.id_a: r.jaccard
               for r in jaccard_verify_pairs(pairs, docs, k=5,
                                             threshold=0.0).collect()}

        for gate in (24, 10):
            t0 = time.perf_counter()
            out = dedup_incremental_lsh(batch, tbl, min_sig_matches=gate)
            rows = out.collect()
            wall = time.perf_counter() - t0
            matched = {r.doc_id for r in rows if r.n_matched_seen > 0}
            fresh_ids = {FRESH_OFF + i for i in range(BATCH // 2)}
            fp = len(matched & fresh_ids)
            print(f"n_seen={n_seen:>9,}  build={build:6.1f}s  "
                  f"gate={gate}/{NUM_PERM}  batch({BATCH//1000}k)="
                  f"{wall:6.2f}s  false_pos={fp}")
            for (m, off) in LEVELS:
                ids = [off + i for i in range(GROUP)]
                obs = sum(1 for i in ids if i in matched) / GROUP
                js = [jac.get(i, 1.0) for i in ids]
                pred = float(np.mean([predicted_pass(j, gate=gate)
                                      for j in js]))
                print(f"    m={m}  mean_J={np.mean(js):.3f}  "
                      f"recall={obs:.4f}  predicted={pred:.4f}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__params")


def main() -> None:
    import shutil
    import tempfile

    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("dhs-inc-blowup", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="dhs_inc_ladder_")
    try:
        for n in sizes:
            run_point(spark, n, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
