"""Streaming-histogram throughput ladder (BASELINE.md "streaming
throughput" row): the sf0.1 events table replicated to N rows, written
as a 32-file parquet directory, replayed through windowed_histogram as
a REAL Structured Streaming query (availableNow file stream, 8 files
per micro-batch -> 4 incremental state updates, update mode, noop
sink), wall-clocked end to end.

The state store is the scale story: the grouping key is (window,
bin), so state rows are bounded by n_windows x (nbins + flow) — a
constant of the spec and the time span, INDEPENDENT of event volume
(30 days of 6h windows x 12 occupied bins ~ 1.4k rows).  The script
prints the actual state rows from the query's progress metrics.

Usage: python scripts/blowup_streaming.py [n_events ...]
Defaults to 1M / 10M / 30M.  Run from /root/repo.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_histogram_spark.session import get_spark, load_tables  # noqa: E402
from dask_histogram_spark.spec import HistogramSpec, Regular  # noqa: E402
from dask_histogram_spark.streaming import windowed_histogram  # noqa: E402

SPEC = HistogramSpec(axes=(Regular(10, 0.0, 100.0),))
BASE = 100_000  # sf0.1 events rows


def run_point(spark, ev, n_events: int) -> None:
    k = max(1, n_events // BASE)
    d = tempfile.mkdtemp(prefix="dhs_stream_blowup_")
    try:
        # replicate each event k times (value jittered so rows are not
        # byte-identical); generation+write is NOT in the timed region
        blown = ev.select("ts", "value").withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
        ).select("ts", (F.col("value") + F.col("__r") * 1e-9).alias("value"))
        blown.repartition(32).write.mode("overwrite").parquet(d)
        n = k * BASE

        stream = spark.readStream.schema(
            "ts timestamp, value double"
        ).option("maxFilesPerTrigger", 8).parquet(d)
        out = windowed_histogram(stream, "ts", ["value"], SPEC,
                                 window="6 hours", watermark="60 days")
        t0 = time.perf_counter()
        q = (
            out.writeStream.outputMode("update").format("noop")
            .trigger(availableNow=True).start()
        )
        if not q.awaitTermination(1800):
            q.stop()
            raise RuntimeError("streaming replay timed out")
        wall = time.perf_counter() - t0
        prog = q.lastProgress or {}
        state_rows = sum(
            so.get("numRowsTotal", 0)
            for so in prog.get("stateOperators", [])
        )
        n_batches = len(q.recentProgress)
        print(
            f"n_events={n:>9,}  wall={wall:7.2f}s  "
            f"throughput={n / wall / 1e6:6.2f}M ev/s  "
            f"micro_batches>={n_batches}  state_rows={state_rows}"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [
        1_000_000, 10_000_000, 30_000_000]
    spark = get_spark("dhs-stream-blowup", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_tables(spark, "/root/testdata/sf0.1")["events"]
    for n in sizes:
        run_point(spark, ev, n)
    spark.stop()


if __name__ == "__main__":
    main()
