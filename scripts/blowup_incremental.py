"""Incremental near-dup dedup ladder (BASELINE.md round-6): a seen
corpus of N synthetic docs persisted once as the bucketed banded
signature table (write_signature_table), then a fixed 10k-doc nightly
batch (half exact re-crawls of seen docs, half fresh) gated through
dedup_incremental_lsh.  The numbers that matter at scale:

* build wall — paid once per corpus refresh (the pre-paid shuffle);
* batch wall — the recurring nightly cost, which should track BATCH
  size, not seen size (the seen side is read co-located, pruned to
  the batch's band buckets by the join);
* recall — every planted re-crawl must report n_matched_seen >= 1
  and every fresh doc 0 (exact re-crawls share all bands, so LSH
  recall is 1 by construction — this checks the wiring, not theory).

Usage: python scripts/blowup_incremental.py [n_seen ...]
Defaults to 100k / 1M.  Run from /root/repo.
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (package import)
sys.path.insert(0, _HERE)  # scripts/ (synth_corpus import)

from pyspark.sql import functions as F  # noqa: E402

from blowup_pipeline import synth_corpus  # noqa: E402
from dask_histogram_spark.operators import (  # noqa: E402
    dedup_incremental_lsh,
    write_signature_table,
)
from dask_histogram_spark.session import get_spark  # noqa: E402

BATCH = 10_000


def run_point(spark, n_seen: int, workdir: str) -> None:
    seen = synth_corpus(spark, n_seen, dup_rate=0.0)
    tbl = f"dhs_inc_ladder_{n_seen}"
    t0 = time.perf_counter()
    write_signature_table(seen, tbl, num_perm=32, bands=8,
                          max_bucket=64, n_buckets=64,
                          path=os.path.join(workdir, tbl))
    build = time.perf_counter() - t0
    try:
        # nightly batch: BATCH/2 exact re-crawls of seen ids (same text,
        # shifted id) + BATCH/2 genuinely fresh docs (disjoint id space
        # BEFORE generation, so disjoint text)
        recrawl = synth_corpus(spark, BATCH // 2, dup_rate=0.0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        fresh = synth_corpus(spark, BATCH // 2, dup_rate=0.0,
                             id_offset=20_000_000)
        batch = recrawl.unionByName(fresh)
        t0 = time.perf_counter()
        out = dedup_incremental_lsh(batch, tbl, min_sig_matches=24)
        rows = out.collect()
        wall = time.perf_counter() - t0
        matched = {r.doc_id for r in rows if r.n_matched_seen > 0}
        recrawl_ids = {10_000_000 + i for i in range(BATCH // 2)}
        fresh_ids = {20_000_000 + i for i in range(BATCH // 2)}
        recall = len(matched & recrawl_ids) / (BATCH // 2)
        false_pos = len(matched & fresh_ids)
        print(
            f"n_seen={n_seen:>9,}  build={build:6.1f}s  "
            f"batch({BATCH//1000}k)={wall:6.2f}s  "
            f"recall={recall:.4f}  false_pos={false_pos}"
        )
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
