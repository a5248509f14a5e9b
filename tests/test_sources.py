from __future__ import annotations

import numpy as np
import pytest

import dask_histogram_spark as dhs
from dask_histogram_spark.sources import load_histogram, read_table, save_histogram


def test_save_load_roundtrip(spark, gauss1d, tmp_path):
    df, pdf = gauss1d
    h = dhs.histogram(df, "x", bins=10, range=(-3, 3), weights="w")
    p = str(tmp_path / "hist")
    save_histogram(h, p)
    h2 = load_histogram(spark, p)
    np.testing.assert_allclose(h2.values(flow=True), h.values(flow=True))
    np.testing.assert_allclose(h2.variances(flow=True), h.variances(flow=True))
    assert h2.spec.axes == h.spec.axes
    assert h2.spec.storage is h.spec.storage


def test_saved_partials_collapse(spark, gauss1d, tmp_path):
    """Partials persisted from separate runs can be unioned + collapsed —
    the distributed analog of to_delayed round-trips (core.py:845-853)."""
    df, pdf = gauss1d
    spec = dhs.HistogramSpec(axes=(dhs.Regular(10, -3, 3),),
                             storage=dhs.Storage.WEIGHT)
    half1 = df.where("x < 0")
    half2 = df.where("x >= 0")
    p1, p2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    save_histogram(dhs.AggHistogram(dhs.fill(half1, ["x"], spec, weight="w"), spec), p1)
    save_histogram(dhs.AggHistogram(dhs.fill(half2, ["x"], spec, weight="w"), spec), p2)
    a = load_histogram(spark, p1)
    b = load_histogram(spark, p2)
    merged = dhs.AggHistogram(
        dhs.collapse(a.df.unionByName(b.df), spec), spec
    )
    full = dhs.histogram(df, "x", bins=10, range=(-3, 3), weights="w")
    np.testing.assert_allclose(
        merged.values(flow=True), full.values(flow=True)
    )


def test_read_table_parquet_nanos(spark):
    df = read_table(spark, "/root/testdata/sf0.001/events.parquet")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_read_table_csv(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,x\n2,y\n")
    df = read_table(spark, p)
    assert df.count() == 2
    assert set(df.columns) == {"a", "b"}


def test_save_load_preserves_sample_shift(spark, gauss1d, tmp_path):
    """A reloaded shifted-moment histogram must reconstruct the SAME
    means (mean = K + sum/count; losing K silently corrupts values)."""
    df, pdf = gauss1d
    h = dhs.histogramdd(df, ["x"], bins=5, range=((-3, 3),), sample="s",
                        sample_shift=5.0, storage=dhs.Storage.MEAN)
    p = str(tmp_path / "hist_shift")
    save_histogram(h, p)
    h2 = load_histogram(spark, p)
    assert h2.spec.sample_shift == 5.0
    np.testing.assert_allclose(h2.values(flow=True), h.values(flow=True))
    np.testing.assert_allclose(h2.variances(flow=True),
                               h.variances(flow=True))


def test_read_table_nanos_exact_microseconds(spark):
    """Timestamp restore is exact at microsecond precision regardless of
    the parquet unit (ns testdata read as long, or us read as NTZ):
    every ts must equal pyarrow's value floored to micros."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    path = "/root/testdata/sf0.001/events.parquet"
    df = read_table(spark, path)
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r[0] for r in df.select(F.unix_micros("ts")).collect())
    col = pq.read_table(path, columns=["ts"])["ts"]
    unit = col.type.unit
    ints = col.cast(pa.int64()).to_numpy()
    scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[unit]
    exp = ints // 1000 if unit == "ns" else ints * scale
    assert got == sorted(exp.tolist())


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed identically on the join key must sort-merge
    join with ZERO shuffle exchanges — the pre-paid-shuffle co-location
    pattern write_bucketed exists for."""
    from dask_histogram_spark.sources import write_bucketed

    docs = read_table(spark, "/root/testdata/sf0.001/documents.parquet")
    write_bucketed(docs.select("doc_id", "text"), "b_docs", "doc_id", 4,
                   sort_cols="doc_id", path=str(tmp_path / "b_docs"))
    write_bucketed(docs.select("doc_id", "lang"), "b_meta", "doc_id", 4,
                   sort_cols="doc_id", path=str(tmp_path / "b_meta"))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale the planner would broadcast instead (also fine);
        # disable it to surface the co-located sort-merge path the
        # helper exists for at 100 TB, where neither side broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_docs").join(spark.table("b_meta"), "doc_id")
        assert joined.count() == docs.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:800]
        assert "Exchange" not in plan, plan[:800]
        assert "Bucketed: true" in plan, plan[:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_meta")


def test_negative_nanos_floor_to_microsecond(spark, tmp_path):
    """Pre-1970 nanosecond timestamps must FLOOR to microseconds
    (truncation toward zero would shift them forward by 1 us)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    path = str(tmp_path / "neg_nanos.parquet")
    ts = pa.array([-1500, 1500, -1000, -999], type=pa.timestamp("ns"))
    pq.write_table(pa.table({"ts": ts}), path)
    df = read_table(spark, path)
    got = sorted(r[0] for r in df.select(F.unix_micros("ts")).collect())
    assert got == sorted([-2, 1, -1, -1])


def test_write_training_shards_balanced_stable_manifest(spark, tmp_path):
    """The corpus sink: shards are hash-balanced, membership is a pure
    function of the id (a rewritten corpus keeps every doc in the same
    shard), each shard reads as one directory, and the manifest's
    counts reconcile."""
    from pyspark.sql import functions as F

    from dask_histogram_spark.sources import (
        read_shard_manifest,
        write_training_shards,
    )

    df = spark.range(10_000).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.concat(F.lit("doc "), F.col("doc_id")))
    path = str(tmp_path / "shards")
    man = write_training_shards(df, path, n_shards=8)
    assert man["total_rows"] == 10_000
    counts = [man["rows_per_shard"][str(i)] for i in range(8)]
    assert sum(counts) == 10_000
    assert min(counts) > 10_000 / 8 * 0.8  # hash balance
    assert read_shard_manifest(path) == man
    # one shard reads as one directory; ids in it satisfy the
    # documented assignment
    shard0 = spark.read.parquet(path + "/shard=0")
    ids = [r.doc_id for r in shard0.collect()]
    assign = {r.doc_id: r.s for r in df.select(
        "doc_id",
        F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int").alias("s"))
        .collect()}
    assert ids and all(assign[i] == 0 for i in ids)
    # stability: a filtered rewrite keeps survivors in the SAME shard
    path2 = str(tmp_path / "shards2")
    man2 = write_training_shards(df.where(F.col("doc_id") % 3 == 0),
                                 path2, n_shards=8)
    surv0 = {r.doc_id for r in
             spark.read.parquet(path2 + "/shard=0").collect()}
    assert surv0 == {i for i in ids if i % 3 == 0}
    assert man2["total_rows"] == 3334
    # mode='error' refuses to clobber
    import pytest as _pytest

    with _pytest.raises(Exception):
        write_training_shards(df, path, n_shards=8)
    # append with a DIFFERENT modulus would orphan directories and
    # break stable membership — loud error
    with _pytest.raises(ValueError, match="n_shards"):
        write_training_shards(df, path, n_shards=4, mode="append")
    # a pre-existing 'shard' column must not be silently overwritten
    with _pytest.raises(ValueError, match="shard"):
        write_training_shards(df.withColumn("shard", F.lit(99)),
                              str(tmp_path / "x"), n_shards=2)
    # a fully-filtered corpus still writes a coherent zero manifest
    empty = write_training_shards(df.where(F.col("doc_id") < 0),
                                  str(tmp_path / "empty"), n_shards=3)
    assert empty["total_rows"] == 0
    assert list(empty["rows_per_shard"].values()) == [0, 0, 0]
    # append onto a directory whose manifest was lost: refuse — the
    # prior modulus is unknowable
    import os as _os

    _os.remove(path + "/_manifest.json")
    with _pytest.raises(ValueError, match="_manifest"):
        write_training_shards(df, path, n_shards=8, mode="append")


def test_jsonl_shards_roundtrip(spark, tmp_path):
    """fmt='json' shard sink -> read_jsonl_corpus round-trip: same
    rows, same stable hash membership as parquet, manifest counts from
    the (documented) line re-scan."""
    from pyspark.sql import functions as F

    from dask_histogram_spark.sources import (
        read_jsonl_corpus,
        read_shard_manifest,
        write_training_shards,
    )

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"))
    p = str(tmp_path / "jshards")
    man = write_training_shards(df, p, n_shards=4, fmt="json")
    assert man["format"] == "json" and man["total_rows"] == 200
    assert read_shard_manifest(p)["format"] == "json"
    back = read_jsonl_corpus(
        spark, p + "/shard=0", schema="doc_id long, text string")
    rows = back.collect()
    assert all(r["_corrupt_record"] is None for r in rows)
    assert len(rows) == man["rows_per_shard"]["0"]
    # membership is the same pure function of the id as parquet shards
    expect = {r["doc_id"] for r in df.select("doc_id").where(
        F.pmod(F.xxhash64("doc_id"), F.lit(4)) == 0).collect()}
    assert {r["doc_id"] for r in rows} == expect
    # gzip compression actually applied
    import glob
    assert glob.glob(p + "/shard=0/*.gz")
    # append with a different format refuses
    with pytest.raises(ValueError, match="mix file formats"):
        write_training_shards(df, p, n_shards=4, mode="append")


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    from dask_histogram_spark.sources import read_jsonl_corpus

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good line"}\n'
        'this is not json at all\n'
        '{"doc_id": "not a long", "text": "type drift"}\n'
        '{"doc_id": 3, "text": "another good one"}\n')
    df = read_jsonl_corpus(spark, str(p),
                           schema="doc_id long, text string")
    rows = df.collect()
    assert len(rows) == 4
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 2  # the non-JSON line and the type drift
    assert any("not json" in r["_corrupt_record"] for r in bad)
    good = {r["doc_id"] for r in rows if r["_corrupt_record"] is None}
    assert good == {1, 3}
    # inferred-schema path still quarantines the raw-garbage line
    df2 = read_jsonl_corpus(spark, str(p))
    bad2 = [r for r in df2.collect() if r["_corrupt_record"] is not None]
    assert len(bad2) >= 1


def test_jsonl_corrupt_only_query_works(spark, tmp_path):
    """The query the built-in JSON reader rejects (referencing only
    the corrupt column) must work here — that is WHY the reader is
    text + from_json."""
    from pyspark.sql import functions as F

    from dask_histogram_spark.sources import read_jsonl_corpus

    p = tmp_path / "c.jsonl"
    # blank-line forms: empty, tab-only, space-only — all must drop
    # (rlike '\\S', not space-only trim; round-8 ADVICE found '\t'
    # lines surfacing as spurious corrupt records)
    p.write_text('{"doc_id": 1, "text": "ok"}\nbroken\n\n\t\n   \n')
    df = read_jsonl_corpus(spark, str(p),
                           schema="doc_id long, text string")
    assert df.where(F.col("_corrupt_record").isNotNull()).count() == 1
    assert df.count() == 2  # blank/whitespace-only lines: not documents


def test_jsonl_custom_corrupt_col_inferred_schema(spark, tmp_path):
    """Inferred schema + custom corrupt_col must not leak the session
    default '_corrupt_record' as a spurious always-null column."""
    from pyspark.sql import functions as F

    from dask_histogram_spark.sources import read_jsonl_corpus

    p = tmp_path / "c.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nbroken\n')
    df = read_jsonl_corpus(spark, str(p), corrupt_col="bad")
    assert "bad" in df.columns
    assert "_corrupt_record" not in df.columns
    assert df.where(F.col("bad").isNotNull()).count() == 1


def test_shard_shuffle_seed_orders_within_shard(spark, tmp_path):
    """shuffle_seed randomizes within-shard ORDER without touching
    membership; different seeds give different orders, same seed is
    deterministic; no extra exchange beyond the shard repartition."""
    from pyspark.sql import functions as F

    from dask_histogram_spark.sources import write_training_shards

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id")).alias("text")).coalesce(1)

    def shard0_order(path, seed):
        write_training_shards(df, path, n_shards=2, shuffle_seed=seed)
        part = spark.read.parquet(path + "/shard=0")
        return [r["doc_id"] for r in part.collect()]

    a = shard0_order(str(tmp_path / "a"), seed=7)
    b = shard0_order(str(tmp_path / "b"), seed=7)
    c = shard0_order(str(tmp_path / "c"), seed=11)
    assert a == b                      # deterministic
    assert a != c                      # seed changes the order
    assert sorted(a) == sorted(c)      # membership unchanged
    assert a != sorted(a)              # actually decorrelated from id

    # string ids shuffle too (the order hash is type-agnostic
    # xxhash64, not the samplers' long-only _gold_hash)
    sdf = df.select(F.concat(F.lit("u"), F.col("doc_id"))
                    .alias("doc_id"), "text")
    from dask_histogram_spark.sources import write_training_shards

    write_training_shards(sdf, str(tmp_path / "s"), n_shards=2,
                          shuffle_seed=7)
    got = [r["doc_id"] for r in
           spark.read.parquet(str(tmp_path / "s") + "/shard=0").collect()]
    assert got and got != sorted(got)
