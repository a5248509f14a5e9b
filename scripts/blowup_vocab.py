"""token_vocabulary widened-path blowup (round-12 ADVICE fix
evidence): measure WHAT CROSSES THE EXCHANGE under the three possible
over-width plans on a type-heavy synthetic corpus.

The round-11 ADVICE finding: the safety knob's original shape —
``repartition(need, "token")`` BELOW the groupBy — satisfies the
aggregate's required distribution, so Catalyst plans NO map-side
partial aggregation and the widened exchange hauls every raw token
occurrence.  The round-12 fix pre-aggregates per Arrow batch
(pinned ``_tokenize_texts``) so the exchange carries
(token, partial_count) rows.  This script runs all three plans on the
same corpus and reports wall + shuffle-write bytes (from the Spark
status API, diffed per run):

1. default      — explode -> groupBy at session width (the
                  partial-agg baseline; what small corpora run);
2. old-widened  — the ADVICE anti-pattern, reconstructed inline;
3. new-widened  — token_vocabulary(est_types=..., width forced).

Corpus: n_docs x ~40 tokens, token = 'w' || (xxhash64(doc, pos) mod
n_types) — type count tunable independently of occurrences.

Usage: python scripts/blowup_vocab.py [n_docs [n_types]]
Defaults 2_000_000 docs x 5_000_000 types (~80M occurrences).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from dask_histogram_spark.operators import token_vocabulary  # noqa: E402
from dask_histogram_spark.operators import sizing  # noqa: E402
from dask_histogram_spark.session import get_spark  # noqa: E402

TOKENS_PER_DOC = 40


def shuffle_write_bytes(spark: SparkSession) -> int:
    """Sum of shuffle-write bytes over all completed stages (status
    API) — diffed around a run it isolates that run's exchanges."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=30) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def synth(spark: SparkSession, n_docs: int, n_types: int,
          zipf: bool = False):
    """``zipf=False``: uniform type draw — the adversarial
    mostly-distinct shape where NO plan's partial aggregation can
    compress (per-batch distinct ~ occurrences).  ``zipf=True``:
    log-uniform type ids (Zipf-1-ish head) — the natural-language
    shape where the head dominates occurrences and per-batch
    pre-aggregation compresses the exchange."""
    def tok(j: int):
        h = F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(1_000_000))
        if zipf:
            t = F.floor(F.pow(F.lit(float(n_types)),
                              h / F.lit(1_000_000.0))).cast("long")
        else:
            t = F.pmod(F.xxhash64(F.col("id"), F.lit(j)),
                       F.lit(n_types))
        return F.concat(F.lit("w"), t.cast("string"))

    words = F.array(*[tok(j) for j in range(TOKENS_PER_DOC)])
    return (spark.range(n_docs)
            .select(F.col("id").alias("doc_id"),
                    F.array_join(words, " ").alias("text"))
            .repartition(64))


def run(name, df_builder, spark):
    t0 = time.perf_counter()
    sw0 = shuffle_write_bytes(spark)
    out = df_builder()
    n = out.count()
    wall = time.perf_counter() - t0
    sw = shuffle_write_bytes(spark) - sw0
    print(f"{name:12s} wall {wall:7.1f}s  shuffle-write "
          f"{sw / 2**30:7.2f} GiB  vocab rows {n:,}", flush=True)
    return n


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--zipf"]
    zipf = "--zipf" in sys.argv
    n_docs = int(args[0]) if args else 2_000_000
    n_types = int(args[1]) if len(args) > 1 else 5_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # the library default disables the UI; this harness needs the
    # status API for per-run shuffle-write accounting
    spark = get_spark("dhs-vocab", cpus=cpus,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth(spark, n_docs, n_types, zipf=zipf).persist()
    corpus.count()
    width = 4 * sizing.current_shuffle_partitions(spark)
    print(f"{n_docs:,} docs x {TOKENS_PER_DOC} tokens, {n_types:,} "
          f"type space ({'zipf' if zipf else 'uniform'}); "
          f"forced width {width}", flush=True)

    counts = []
    counts.append(run("default", lambda: token_vocabulary(
        corpus, min_count=2), spark))

    def old_widened():
        # the round-11 ADVICE anti-pattern, verbatim shape
        toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        src = (corpus.select(F.explode(toks).alias("token"))
               .where(F.col("token") != "")
               .repartition(width, "token"))
        return (src.groupBy("token").agg(F.count(F.lit(1)).alias("count"))
                .where(F.col("count") >= 2))

    counts.append(run("old-widened", old_widened, spark))

    from unittest.mock import patch

    def new_widened():
        with patch.object(sizing, "agg_partitions", return_value=width):
            return token_vocabulary(corpus, min_count=2, est_types=10**12)

    counts.append(run("new-widened", new_widened, spark))
    assert len(set(counts)) == 1, f"plan results diverge: {counts}"
    print("all three plans agree on the vocabulary row count", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
