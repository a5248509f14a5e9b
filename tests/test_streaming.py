"""Structured-Streaming tests: file source + availableNow trigger for
deterministic micro-batch execution."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import dask_histogram_spark as dhs
from dask_histogram_spark.session import load_tables
from dask_histogram_spark.streaming import (
    streaming_dedup_exact,
    windowed_histogram,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """Write the events table as several parquet files -> a replayable
    file stream."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_tables(spark, "/root/testdata/sf0.001", names=("events",))["events"]
    ev.repartition(4).write.mode("overwrite").parquet(d)
    return d, ev.schema, ev.count()


def _run_stream(df, name):
    q = (
        df.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_windowed_histogram_matches_batch(spark, events_stream_dir):
    d, schema, total = events_stream_dir
    spec = dhs.HistogramSpec(axes=(dhs.Regular(10, 0, 100),),
                             storage=dhs.Storage.DOUBLE)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    # watermark wider than the 30-day data span: unordered file replay
    # must not drop anything (a tight watermark correctly drops late
    # rows — covered by observation, not asserted here)
    out = windowed_histogram(stream, "ts", ["value"], spec,
                             window="1 day", watermark="60 days")
    assert out.isStreaming
    _run_stream(out, "swh")
    got = spark.sql(
        "SELECT window_start, bin_0, max(value) AS value FROM swh "
        "GROUP BY window_start, bin_0"
    ).toPandas()
    # batch reference on the same data
    batch_df = spark.read.schema(schema).parquet(d)
    exp = windowed_histogram(batch_df, "ts", ["value"], spec,
                             window="1 day").toPandas()
    got_g = got.groupby(["window_start", "bin_0"]).value.sum().sort_index()
    exp_g = exp.groupby(["window_start", "bin_0"]).value.sum().sort_index()
    # update-mode memory sink keeps the latest value per key per batch;
    # max over batches == final accumulated count
    assert got_g.index.equals(exp_g.index)
    np.testing.assert_allclose(got_g.to_numpy(), exp_g.to_numpy())
    assert got_g.sum() == total


def test_streaming_dedup_exact(spark, tmp_path):
    """Duplicates across micro-batches are dropped by grouped state."""
    d = str(tmp_path / "docs_stream")
    docs = load_tables(spark, "/root/testdata/sf0.001",
                       names=("documents",))["documents"]
    n = docs.count()
    dup = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    # several files -> several micro-batches with maxFilesPerTrigger=1
    dup.repartition(6).write.mode("overwrite").parquet(d)
    schema = dup.schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    out = streaming_dedup_exact(stream)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sdedup").collect()
    # exactly one winner per distinct text, across batches
    assert len(rows) == n
    assert len({r.content_hash for r in rows}) == n


def test_streaming_minhash_candidates(spark, tmp_path):
    """Exact duplicates across micro-batches surface as LSH candidate
    pairs against the bucket anchor, with one long of state per
    bucket."""
    from dask_histogram_spark.streaming import streaming_minhash_candidates

    d = str(tmp_path / "mh_stream")
    docs = load_tables(spark, "/root/testdata/sf0.001",
                       names=("documents",))["documents"]
    n = docs.count()
    dup = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    dup.repartition(6).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(dup.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    out = streaming_minhash_candidates(stream, num_perm=32, bands=8)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("smh")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM smh").collect()
    # identical texts share every band bucket, so each duplicated doc
    # must be linked to its twin through some anchor (possibly a third
    # identical doc that arrived first)
    linked = {}
    for r in rows:
        linked.setdefault(r.id_a, set()).add(r.id_b)
    hit = 0
    for i in range(n):
        j = i + 100000
        if any(
            (i in grp or i == a) and (j in grp or j == a)
            for a, grp in linked.items()
        ):
            hit += 1
    assert hit == n


def test_streaming_minhash_matches_batch_twin(spark, tmp_path):
    """Recall/precision of the streaming LSH detector vs the batch twin
    on the SAME corpus (exact dups + perturbed near-dups):

    * precision: every streaming pair shares a band bucket, so the
      streaming pair set is a subset of the batch candidate set
      (unordered compare — a late-arriving smaller id can sit on the
      id_b side of its bucket anchor);
    * recall: each bucket's members form a star around its anchor, so
      the streaming pair graph connects both endpoints of EVERY batch
      candidate pair (component-level recall = 1, deterministically).
    """
    from dask_histogram_spark.operators.dedup import minhash_lsh_candidates
    from dask_histogram_spark.streaming import streaming_minhash_candidates

    docs = load_tables(spark, "/root/testdata/sf0.001",
                       names=("documents",))["documents"]
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            # near-dup: tiny suffix keeps most shingles shared
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    params = dict(num_perm=32, bands=8)

    batch_pairs = {
        frozenset((r.id_a, r.id_b))
        for r in minhash_lsh_candidates(corpus, **params).collect()
    }
    assert batch_pairs  # the corpus must actually produce candidates

    d = str(tmp_path / "mh_twin_stream")
    corpus.repartition(6).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(corpus.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    q = (
        streaming_minhash_candidates(stream, **params)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("smh_twin")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_pairs = {
        frozenset((r.id_a, r.id_b))
        for r in spark.sql("SELECT id_a, id_b FROM smh_twin").collect()
    }

    # precision: no streaming pair outside the batch candidate set
    assert stream_pairs <= batch_pairs

    # component-level recall: union-find over streaming pairs
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in stream_pairs:
        a, b = tuple(p)
        parent[find(a)] = find(b)
    missed = [p for p in batch_pairs if find(min(p)) != find(max(p))]
    assert not missed, f"streaming graph misses {len(missed)} batch pairs"


def test_streaming_simhash_matches_batch_twin(spark, tmp_path):
    """SimHash twin of the minhash streaming test: streaming chunk
    anchors emit a subset of the batch candidate bucket relation, and
    the streaming pair graph connects both endpoints of every verified
    batch candidate pair."""
    from dask_histogram_spark.operators.dedup import simhash_candidates
    from dask_histogram_spark.streaming import streaming_simhash_candidates

    docs = load_tables(spark, "/root/testdata/sf0.001",
                       names=("documents",))["documents"]
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    batch_pairs = {
        frozenset((r.id_a, r.id_b))
        for r in simhash_candidates(corpus, max_hamming=3).collect()
    }
    assert batch_pairs

    d = str(tmp_path / "sh_twin_stream")
    corpus.repartition(6).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(corpus.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    q = (
        streaming_simhash_candidates(stream, max_hamming=3)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssh_twin")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_pairs = {
        frozenset((r.id_a, r.id_b))
        for r in spark.sql("SELECT id_a, id_b FROM ssh_twin").collect()
    }

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in stream_pairs:
        a, b = tuple(p)
        parent[find(a)] = find(b)
    # batch pairs are Hamming-verified; streaming pairs are candidates
    # (pre-verification), so recall is component-level, not pair-level
    missed = [p for p in batch_pairs if find(min(p)) != find(max(p))]
    assert not missed, f"streaming graph misses {len(missed)} batch pairs"


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    """The dedup state store must survive a query restart: documents
    already claimed in run 1 may NOT re-emit winners when their
    duplicates arrive in run 2 (same checkpoint)."""
    import glob
    import shutil

    src = str(tmp_path / "restart_src")
    out = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "restart_ckpt")
    docs = load_tables(spark, "/root/testdata/sf0.001",
                       names=("documents",))["documents"]
    n = docs.count()
    base = docs.select("doc_id", "text")
    stage = str(tmp_path / "stage1")
    base.repartition(3).write.mode("overwrite").parquet(stage)

    def run_once():
        stream = spark.readStream.schema(base.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            streaming_dedup_exact(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: the originals
    import os

    os.makedirs(src)
    for f in glob.glob(stage + "/part-*"):
        shutil.copy(f, src)
    run_once()
    first = spark.read.parquet(out).count()
    assert first == n

    # run 2 (restarted query, same checkpoint): pure duplicates arrive
    stage2 = str(tmp_path / "stage2")
    base.select((F.col("doc_id") + 100000).alias("doc_id"), "text") \
        .repartition(3).write.mode("overwrite").parquet(stage2)
    for f in glob.glob(stage2 + "/part-*"):
        shutil.copy(f, src)
    run_once()
    final = spark.read.parquet(out)
    # no duplicate winners: state recovered, every text still has ONE row
    assert final.count() == n
    assert final.select("content_hash").distinct().count() == n


def test_streaming_contamination_check_matches_batch(spark, tmp_path):
    """contamination_check is a stateless narrow map (broadcast gram
    set + one pandas_udf projection), so the SAME operator runs
    unchanged on a streaming DataFrame: file-replay over micro-batches
    must emit exactly the batch rows."""
    from dask_histogram_spark.operators import contamination_check

    d = str(tmp_path / "contam_stream")
    docs = load_tables(spark, "/root/testdata/sf0.001",
                       names=("documents",))["documents"]
    train = docs.where(F.pmod(F.col("doc_id"), F.lit(97)) != 0) \
                .select("doc_id", "text")
    bench = docs.where(F.pmod(F.col("doc_id"), F.lit(97)) == 0) \
                .select("doc_id", "text")
    expected = {(r.doc_id, r.n_grams, r.n_hits, r.contaminated)
                for r in contamination_check(train, bench).collect()}

    train.repartition(5).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(train.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    out = contamination_check(stream, bench)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("scontam")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.doc_id, r.n_grams, r.n_hits, r.contaminated)
           for r in spark.sql("SELECT * FROM scontam").collect()}
    assert got == expected


def test_streaming_histogram_state_survives_restart(spark, tmp_path):
    """Windowed-histogram aggregation state must survive a query
    restart: run 1 fills from half the event files, run 2 (same
    checkpoint) streams the other half — the rows run 2 emits are
    UPDATES carrying the accumulated per-(window, bin) counts, so for
    every key run 2 touches the final value must equal a batch fill
    over ALL events.  A state reset between runs would emit
    run-2-only partial counts."""
    import glob
    import os
    import shutil

    import dask_histogram_spark as dhs
    from dask_histogram_spark.streaming import windowed_histogram

    events = load_tables(spark, "/root/testdata/sf0.001",
                         names=("events",))["events"]
    spec = dhs.HistogramSpec(axes=(dhs.Regular(10, 0, 100),),
                             storage=dhs.Storage.DOUBLE)
    stage = str(tmp_path / "stage")
    events.repartition(6).write.mode("overwrite").parquet(stage)
    parts = sorted(glob.glob(stage + "/part-*"))
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = events.schema

    sink1 = str(tmp_path / "sink1")
    sink2 = str(tmp_path / "sink2")

    def run_once(sink):
        # memory sinks cannot recover from a checkpoint; foreachBatch
        # is the fault-tolerant update-mode sink (batch-id replay)
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            windowed_histogram(stream, "ts", ["value"], spec,
                               window="1 day", watermark="60 days")
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, bid:
                          df.write.mode("append").parquet(sink))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    for f in parts[:3]:
        shutil.copy(f, src)
    run_once(sink1)
    for f in parts[3:]:
        shutil.copy(f, src)
    run_once(sink2)
    # counts are monotone under unit weights, so the max update per key
    # in run 2 is its final accumulated cross-run count
    got = (spark.read.parquet(sink2)
           .groupBy("window_start", "bin_0")
           .agg(F.max("value").alias("value"))
           .toPandas().set_index(["window_start", "bin_0"])
           .value.sort_index())
    batch = (windowed_histogram(events, "ts", ["value"], spec,
                                window="1 day")
             .toPandas().set_index(["window_start", "bin_0"])
             .value.sort_index())
    joined = got.to_frame("got").join(batch.to_frame("exp"), how="inner")
    # random file split: essentially every window has data in both
    # runs, so run-2 updates must include run-1 state
    assert len(joined) >= 0.5 * len(batch)
    np.testing.assert_allclose(joined.got.to_numpy(),
                               joined.exp.to_numpy())


def test_streaming_embedding_requires_dim_without_table(spark):
    """A pure in-stream run cannot sample the stream for the vector
    dimension — it must be given, loudly."""
    import pytest

    from dask_histogram_spark.streaming import (
        streaming_embedding_candidates)

    stream = spark.readStream.format("rate").load().select(
        F.col("value").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"))
    with pytest.raises(ValueError, match="dim="):
        streaming_embedding_candidates(stream)


def test_streaming_embedding_probe_matches_incremental(spark, tmp_path):
    """streaming_embedding_candidates(seen_table=...) must agree with
    the batch cross-run gate: for every streamed vector, the distinct
    SEEN ids it pairs with through the persisted-table probe equal
    embedding_dedup_incremental's n_matched_seen count at the same
    threshold — the embedding twin of the text stream-probe equality
    below, completing the streaming x cross-run unification for both
    modalities."""
    from dask_histogram_spark.operators import (
        embedding_dedup_incremental, write_embedding_signature_table)
    from dask_histogram_spark.streaming import (
        streaming_embedding_candidates)

    emb = load_tables(spark, "/root/testdata/sf0.001",
                      names=("embeddings",))["embeddings"]
    seen = emb.select("vec_id", "embedding")
    write_embedding_signature_table(seen, "esig_stream_probe_t",
                                    planes=8, n_buckets=8,
                                    path=str(tmp_path / "esigs"))
    try:
        # exact re-ingests (must match) + negated vectors (cosine -1:
        # can never pass the threshold), ids disjoint from seen
        new = seen.select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        ).unionByName(seen.select(
            (F.col("vec_id") + 2_000_000).alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
        ))
        d = str(tmp_path / "eprobe_stream")
        new.repartition(5).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(new.schema).option(
            "maxFilesPerTrigger", 2).parquet(d)
        out = streaming_embedding_candidates(
            stream, seen_table="esig_stream_probe_t", threshold=0.99)
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName("eprobe").trigger(availableNow=True).start())
        q.awaitTermination(180)
        rows = spark.sql("SELECT * FROM eprobe").collect()
        got = {}
        for r in rows:
            if r.id_a < 1_000_000:  # probe hits anchor on a SEEN id
                got.setdefault(r.id_b, set()).add(r.id_a)
        batch = {r.vec_id: r.n_matched_seen
                 for r in embedding_dedup_incremental(
                     new, "esig_stream_probe_t", threshold=0.99)
                 .collect()}
        assert batch, "batch gate returned nothing"
        for vec_id, n in batch.items():
            assert len(got.get(vec_id, set())) == n, (
                vec_id, n, got.get(vec_id))
        # scenario sanity: every exact re-ingest matched, no negated did
        assert all(n >= 1 for v, n in batch.items() if v < 2_000_000)
        assert all(n == 0 for v, n in batch.items() if v >= 2_000_000)
    finally:
        spark.sql("DROP TABLE IF EXISTS esig_stream_probe_t")
        spark.sql("DROP TABLE IF EXISTS esig_stream_probe_t__params")


def test_streaming_embedding_multiprobe_matches_batch(spark, tmp_path):
    """probes=1 on the streaming probe leg must agree per-vector with
    the batch gate at probes=1 (same banding pass, base rows only to
    the stateful detector), and a probed pure in-stream run raises:
    multi-probe is a query-side lever against a persisted corpus."""
    import numpy as np
    import pytest

    from dask_histogram_spark.operators import (
        embedding_dedup_incremental, write_embedding_signature_table)
    from dask_histogram_spark.streaming import (
        streaming_embedding_candidates)

    planes = dim = 4
    H = np.random.default_rng(23).standard_normal((planes, dim))
    Hinv = np.linalg.inv(H)
    v_seen = Hinv @ np.array([2.0, 2.0, 2.0, 0.02])
    v_new = Hinv @ np.array([2.0, 2.0, 2.0, -0.02])  # one-bit miss
    seen = spark.createDataFrame(
        [(0, v_seen.tolist()), (1, (-v_seen).tolist())],
        "vec_id long, embedding array<float>")
    write_embedding_signature_table(seen, "esig_mprobe_t", planes=planes,
                                    seed=23, repetitions=1, n_buckets=4,
                                    path=str(tmp_path / "mpsigs"))
    try:
        new = spark.createDataFrame(
            [(1_000_000, v_new.tolist()), (1_000_001, v_seen.tolist())],
            "vec_id long, embedding array<float>")
        d = str(tmp_path / "mprobe_stream")
        new.repartition(2).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(new.schema).parquet(d)
        out = streaming_embedding_candidates(
            stream, seen_table="esig_mprobe_t", threshold=0.99, probes=1)
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName("emprobe").trigger(availableNow=True).start())
        assert q.awaitTermination(180), "stream did not finish in 180s"
        got = {}
        for r in spark.sql("SELECT * FROM emprobe").collect():
            if r.id_a < 1_000_000:
                got.setdefault(r.id_b, set()).add(r.id_a)
        batch = {r.vec_id: r.n_matched_seen
                 for r in embedding_dedup_incremental(
                     new, "esig_mprobe_t", threshold=0.99,
                     probes=1).collect()}
        assert batch[1_000_000] == 1  # the single-bit miss, recovered
        for vec_id, n in batch.items():
            assert len(got.get(vec_id, set())) == n, (vec_id, n)
        with pytest.raises(ValueError, match="probes > 0 requires"):
            streaming_embedding_candidates(stream, dim=dim, probes=1)
    finally:
        spark.sql("DROP TABLE IF EXISTS esig_mprobe_t")
        spark.sql("DROP TABLE IF EXISTS esig_mprobe_t__params")


def test_streaming_probe_matches_incremental_lsh(spark, tmp_path):
    """streaming_minhash_candidates(seen_table=...) must agree with the
    batch cross-run gate: for every streamed document, the distinct
    SEEN ids it pairs with through the persisted-table probe equal
    dedup_incremental_lsh's n_matched_seen count under the same gate —
    so a restarted stream (whose in-memory bucket anchors are gone)
    still refuses documents the corpus already holds."""
    from dask_histogram_spark.operators import (
        dedup_incremental_lsh, write_signature_table)
    from dask_histogram_spark.streaming import streaming_minhash_candidates

    docs = load_tables(spark, "/root/testdata/sf0.001",
                       names=("documents",))["documents"]
    seen = docs.select("doc_id", "text")
    write_signature_table(seen, "sig_stream_probe_t", num_perm=32,
                          bands=8, n_buckets=8,
                          path=str(tmp_path / "sigs"))
    try:
        # batch: exact re-crawls (must match) + reversed-id fresh-ish
        # revisions (suffix edit keeps J high -> also matchable), ids
        # disjoint from the seen range
        new = seen.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        ).unionByName(seen.select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" entirely new tail of words "
                                          "to dilute the shingles"))
            .alias("text"),
        ))
        d = str(tmp_path / "probe_stream")
        new.repartition(5).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(new.schema).option(
            "maxFilesPerTrigger", 2).parquet(d)
        out = streaming_minhash_candidates(stream,
                                           seen_table="sig_stream_probe_t")
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName("sprobe").trigger(availableNow=True).start())
        q.awaitTermination(180)
        rows = spark.sql("SELECT * FROM sprobe").collect()
        # probe hits are the pairs whose anchor is a SEEN id
        got = {}
        for r in rows:
            if r.id_a < 1_000_000:
                got.setdefault(r.id_b, set()).add(r.id_a)
        batch = {r.doc_id: r.n_matched_seen
                 for r in dedup_incremental_lsh(new, "sig_stream_probe_t")
                 .collect()}
        assert batch, "batch gate returned nothing"
        for doc_id, n in batch.items():
            assert len(got.get(doc_id, set())) == n, (
                doc_id, n, got.get(doc_id))
        # sanity on the scenario itself: every exact re-crawl matched
        assert all(n >= 1 for d_, n in batch.items() if d_ < 2_000_000)
    finally:
        spark.sql("DROP TABLE IF EXISTS sig_stream_probe_t")
        spark.sql("DROP TABLE IF EXISTS sig_stream_probe_t__params")
