"""Streaming-probe ladder (BASELINE.md round-7): a RESTARTED stream
against a persisted 1M-item corpus, for BOTH modalities — the scale
companion of the per-document equality tests
(tests/test_streaming.py::test_streaming_probe_matches_incremental_lsh
and ::test_streaming_embedding_probe_matches_incremental).

Scenario: the corpus's signature table exists (write once, the
pre-paid shuffle); a stream restarts with EMPTY in-memory bucket
anchors and replays a 10k batch (half exact re-ingests of seen
content, half fresh).  The probe leg must (a) pair every re-ingest
with its stored twin and admit every fresh item — compared against
the batch incremental operator's counts item-for-item — and (b) cost
per micro-batch what the batch path costs, independent of seen size
(the stream-static join reads the seen side bucketed, no exchange).

Usage: python scripts/blowup_stream_probe.py [n_seen ...]
Defaults to 100k / 1M.  Run from /root/repo.
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F  # noqa: E402

from blowup_emb_incremental import synth_vectors  # noqa: E402
from blowup_pipeline import synth_corpus  # noqa: E402
from dask_histogram_spark.operators import (  # noqa: E402
    dedup_incremental_lsh,
    embedding_dedup_incremental,
    write_embedding_signature_table,
    write_signature_table,
)
from dask_histogram_spark.session import get_spark  # noqa: E402
from dask_histogram_spark.streaming import (  # noqa: E402
    streaming_embedding_candidates,
    streaming_minhash_candidates,
)

BATCH = 10_000
RECRAWL_OFF = 10_000_000
FRESH_OFF = 20_000_000
THRESHOLD = 0.97


def _batch_tables(spark, n_seen: int, modality: str):
    """(seen, new) where new = BATCH/2 exact re-ingests of seen items
    0..BATCH/2 (ids shifted by RECRAWL_OFF) + BATCH/2 fresh items."""
    if modality == "text":
        seen = synth_corpus(spark, n_seen, dup_rate=0.0)
        re_ = synth_corpus(spark, BATCH // 2, dup_rate=0.0).select(
            (F.col("doc_id") + RECRAWL_OFF).alias("doc_id"), "text")
        fresh = synth_corpus(spark, BATCH // 2, dup_rate=0.0,
                             id_offset=FRESH_OFF)
        return seen, re_.unionByName(fresh)
    seen = synth_vectors(spark, n_seen)
    re_ = synth_vectors(spark, BATCH // 2).select(
        (F.col("vec_id") + RECRAWL_OFF).alias("vec_id"), "embedding")
    fresh = synth_vectors(spark, BATCH // 2, id_offset=FRESH_OFF)
    return seen, re_.unionByName(fresh)


def run_point(spark, n_seen: int, modality: str, workdir: str) -> None:
    seen, new = _batch_tables(spark, n_seen, modality)
    tbl = f"dhs_sprobe_{modality}_{n_seen}"
    id_col = "doc_id" if modality == "text" else "vec_id"
    t0 = time.perf_counter()
    if modality == "text":
        write_signature_table(seen, tbl, num_perm=32, bands=8,
                              max_bucket=64, n_buckets=64,
                              path=os.path.join(workdir, tbl))
    else:
        write_embedding_signature_table(
            seen, tbl, planes=16, repetitions=2, max_bucket=256,
            n_buckets=64, path=os.path.join(workdir, tbl))
    build = time.perf_counter() - t0
    try:
        stream_dir = os.path.join(workdir, f"stream_{modality}_{n_seen}")
        new.repartition(8).write.mode("overwrite").parquet(stream_dir)
        stream = spark.readStream.schema(new.schema).option(
            "maxFilesPerTrigger", 2).parquet(stream_dir)
        if modality == "text":
            cand = streaming_minhash_candidates(stream, seen_table=tbl)
        else:
            cand = streaming_embedding_candidates(
                stream, seen_table=tbl, threshold=THRESHOLD)
        qname = f"sprobe_{modality}_{n_seen}"
        t0 = time.perf_counter()
        q = (cand.writeStream.outputMode("append").format("memory")
             .queryName(qname).trigger(availableNow=True).start())
        finished = q.awaitTermination(600)
        wall = time.perf_counter() - t0
        if not finished or q.exception() is not None:
            # a timed-out or dead stream would otherwise surface as a
            # clamped wall + bogus mismatch counts
            raise RuntimeError(
                f"stream did not finish cleanly: finished={finished} "
                f"exception={q.exception()}")
        rows = spark.sql(f"SELECT * FROM {qname}").collect()
        got: dict[int, set[int]] = {}
        for r in rows:
            if r.id_a < RECRAWL_OFF:  # probe hit: anchor is a SEEN id
                got.setdefault(r.id_b, set()).add(r.id_a)
        if modality == "text":
            batch = dedup_incremental_lsh(new, tbl)
        else:
            batch = embedding_dedup_incremental(new, tbl,
                                                threshold=THRESHOLD)
        # recall/fp come from the STREAM's probe pairs (`got`), not the
        # batch operator's counts — a stream-side drop/dup must move
        # the headline metrics, not only the mismatch column
        mism = 0
        re_matched = fresh_flagged = 0
        for r in batch.collect():
            n = len(got.get(r[id_col], set()))
            if n != r.n_matched_seen:
                mism += 1
            if r[id_col] >= FRESH_OFF:
                fresh_flagged += int(n > 0)
            else:
                re_matched += int(n > 0)
        print(f"{modality:9s} n_seen={n_seen:>9,}  build={build:6.1f}s  "
              f"stream({BATCH // 1000}k)={wall:6.2f}s  "
              f"({BATCH / wall:,.0f} items/s)  "
              f"recall={re_matched / (BATCH // 2):.4f}  "
              f"fp={fresh_flagged}  stream_vs_batch_mismatches={mism}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__params")


def main() -> None:
    import shutil
    import tempfile

    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("dhs-stream-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="dhs_sprobe_")
    try:
        for n in sizes:
            for modality in ("text", "embedding"):
                run_point(spark, n, modality, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
