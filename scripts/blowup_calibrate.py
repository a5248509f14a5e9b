"""calibrate_nprobe BASELINE point at clustered 1M (round-12 VERDICT
#3 "done" criterion): on the same mixture-of-Gaussians corpus as the
round-12 recall ladder (scripts/blowup_ivf_clustered.py — G=200
components, sigma=0.35, dim=64), the helper must pick the nprobe the
hand-run ladder found (recall 1.000 landed at np=16 at 1M under the
sqrt-rule C=2828) and its reported recall must hold on an independent
query draw.

Usage: python scripts/blowup_calibrate.py [n] [target]
Defaults: 1,000,000 at target_recall=0.95.  Prints the chosen
(nprobe, recall), the ladder-protocol verification recall on a FRESH
query stream at that nprobe, and walls.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blowup_ivf_clustered import K, mixture  # noqa: E402

from dask_histogram_spark.operators import (  # noqa: E402
    auto_ivf_params,
    brute_force_topk,
    build_ivf_index,
    calibrate_nprobe,
    fit_centroids,
    ivf_topk_indexed,
)
from dask_histogram_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    target = float(sys.argv[2]) if len(sys.argv) > 2 else 0.95
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dhs-calib", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    vecs = mixture(spark, n).persist()
    vecs.count()
    c_auto, _ = auto_ivf_params(n, nprobe=8)
    t0 = time.perf_counter()
    cents = fit_centroids(vecs, n_centroids=c_auto,
                          sample_fraction="auto", iterations=10)
    t_fit = time.perf_counter() - t0

    path = os.path.join(tempfile.mkdtemp(prefix="dhs_calib_"),
                        f"ivf_{n}")
    t0 = time.perf_counter()
    build_ivf_index(vecs, cents, path)
    t_build = time.perf_counter() - t0

    # calibration queries: fresh mixture draw, decorrelated noise
    qs = mixture(spark, 256, id_offset=10 * n, noise_stream=1).persist()
    qs.count()
    t0 = time.perf_counter()
    nprobe, recall = calibrate_nprobe(
        vecs, qs, index_path=path, k=K, target_recall=target,
        max_queries=64, bf_method="arrow")
    t_cal = time.perf_counter() - t0
    print(f"n={n:,} C={c_auto}  fit {t_fit:.1f}s  build {t_build:.1f}s  "
          f"calibrate {t_cal:.1f}s -> nprobe={nprobe} "
          f"recall={recall:.3f} (target {target})", flush=True)

    # hold-out verification: a SECOND independent query draw at the
    # chosen nprobe, ladder protocol (brute-force truth + join count)
    qv = mixture(spark, 64, id_offset=20 * n, noise_stream=2).persist()
    qv.count()
    truth = (brute_force_topk(vecs, qv, k=K, method="arrow")
             .select("query_id", "neighbor_id").persist())
    denom = truth.count()
    got = ivf_topk_indexed(path, qv, k=K, nprobe=nprobe)
    hit = (got.select("query_id", "neighbor_id")
           .join(truth, ["query_id", "neighbor_id"]).count())
    print(f"hold-out recall@{K} at nprobe={nprobe}: {hit / denom:.3f} "
          f"({hit}/{denom})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
