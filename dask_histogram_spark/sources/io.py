"""Sources & sinks.

The reference has no scans or sinks of its own (SURVEY.md §2.3 —
it consumes pre-built collections and converts results driver-side);
under Spark, sources are DataFrames from any reader.  This module adds
the two pieces a production engine does need:

* :func:`read_table` — format-dispatching reader (parquet/csv/json/orc)
  with the testdata's nanos-timestamp handling built in.
* :func:`save_histogram` / :func:`load_histogram` — persist an
  AggHistogram as sparse parquet + a JSON spec sidecar.  The sparse
  form is the scale-safe serialization: nbins rows, partitionable,
  re-aggregatable (saved partials from different runs can be unioned
  and ``collapse``-d — the distributed analog of the reference's
  ``to_delayed`` escape hatch, core.py:845-853).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..result import AggHistogram
from ..spec import (
    Boolean,
    HistogramSpec,
    IntCategory,
    Integer,
    Regular,
    Storage,
    StrCategory,
    Variable,
)

__all__ = ["read_table", "read_jsonl_corpus", "save_histogram",
           "load_histogram", "write_bucketed", "write_training_shards",
           "read_shard_manifest"]


def read_table(spark: SparkSession, path: str, fmt: str | None = None,
               **options) -> DataFrame:
    """Read a table of any supported format into a DataFrame.

    Format inferred from the extension when not given.  Parquet files
    with nanosecond timestamps are handled (see session.load_tables).
    """
    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = {"pq": "parquet"}.get(ext, ext) or "parquet"
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if fmt == "parquet":
        # nanosAsLong is set once at session construction (get_spark);
        # readers must not flip global legacy confs mid-session.  The
        # dtype branch in _normalize_timestamps handles both the
        # nanos-as-long and the TIMESTAMP_NTZ-native worlds.
        from ..session import _normalize_timestamps

        return _normalize_timestamps(reader.parquet(path), path)
    return reader.format(fmt).load(path)


def read_jsonl_corpus(spark: SparkSession, path: str,
                      schema: str | None = None,
                      corrupt_col: str = "_corrupt_record") -> DataFrame:
    """Read a JSON-Lines corpus (the LLM-data interchange format —
    one document object per line, optionally ``.gz``) with corrupt
    lines QUARANTINED instead of silently dropped or job-fatal.

    ``schema`` is a DDL string for the GOOD columns (e.g.
    ``"doc_id long, text string, source string"``); when None the
    schema is inferred (one extra pass — fine for exploration, pass a
    schema in pipelines so a drifted field shows up as a corrupt row,
    not a silent type widening).  The returned frame carries every
    input line: parseable lines with ``corrupt_col`` NULL, and
    malformed lines with their raw text preserved there for triage
    (``df.where(F.col(corrupt_col).isNotNull())``).

    Built as TEXT scan + ``from_json`` rather than ``spark.read.json``
    with ``columnNameOfCorruptRecord``: the JSON reader treats its
    corrupt column as internal and REJECTS the most natural queries
    over it ("queries that reference only the internal corrupt record
    column are not allowed" — e.g. ``df.where(corrupt.isNotNull())
    .count()``).  Parsing line-text through ``from_json`` yields the
    corrupt column as an ordinary field with no such restriction, at
    identical scan cost (JSONL is a line format either way).  Blank
    lines (empty or all-whitespace, tabs included — ``rlike '\\S'``,
    not space-only Spark ``trim``; round-8 ADVICE) are not documents
    and are dropped.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if schema is None:
        inferred = spark.read.json(path).schema  # extra pass, doc'd
        # inference names ITS corrupt field by the session default,
        # which differs from a custom corrupt_col — drop both or the
        # output grows a spurious always-null default-named column
        session_cc = spark.conf.get(
            "spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
        fields = [f for f in inferred.fields
                  if f.name not in (corrupt_col, session_cc)]
        struct = T.StructType(fields)
    else:
        struct = T.StructType.fromDDL(schema)
    full = T.StructType(list(struct) + [
        T.StructField(corrupt_col, T.StringType())])
    raw = spark.read.text(path).where(F.col("value").rlike(r"\S"))
    parsed = raw.select(F.from_json(
        F.col("value"), full,
        {"mode": "PERMISSIVE",
         "columnNameOfCorruptRecord": corrupt_col}).alias("__j"))
    return parsed.select("__j.*")


# ---------------------------------------------------------------------------
# histogram persistence
# ---------------------------------------------------------------------------

def _axis_to_json(ax) -> dict:
    if isinstance(ax, Regular):
        return {"kind": "regular", "n": ax.n, "lo": ax.lo, "hi": ax.hi}
    if isinstance(ax, Variable):
        return {"kind": "variable", "edges": list(ax.edge_list)}
    if isinstance(ax, Integer):
        return {"kind": "integer", "lo": ax.lo, "hi": ax.hi}
    if isinstance(ax, Boolean):
        return {"kind": "boolean"}
    if isinstance(ax, IntCategory):
        return {"kind": "intcat", "categories": list(ax.categories),
                "growth": ax.growth}
    if isinstance(ax, StrCategory):
        return {"kind": "strcat", "categories": list(ax.categories),
                "growth": ax.growth}
    raise TypeError(type(ax).__name__)


def _axis_from_json(d: dict):
    k = d["kind"]
    if k == "regular":
        return Regular(d["n"], d["lo"], d["hi"])
    if k == "variable":
        return Variable(d["edges"])
    if k == "integer":
        return Integer(d["lo"], d["hi"])
    if k == "boolean":
        return Boolean()
    if k == "intcat":
        return IntCategory(d["categories"], growth=d["growth"])
    if k == "strcat":
        return StrCategory(d["categories"], growth=d["growth"])
    raise ValueError(k)


def save_histogram(h: AggHistogram, path: str, mode: str = "error") -> None:
    """Write the sparse result to ``path`` (parquet dir) and the spec to
    ``path/_histogram_spec.json``."""
    h.df.write.mode(mode).parquet(path)
    spec = {
        "axes": [_axis_to_json(ax) for ax in h.spec.axes],
        "storage": h.spec.storage.value,
        "metadata": h.spec.metadata,
        # without K a reloaded shifted-moment histogram would silently
        # reconstruct wrong means (mean = K + sum/count)
        "sample_shift": h.spec.sample_shift,
    }
    with open(os.path.join(path, "_histogram_spec.json"), "w") as f:
        json.dump(spec, f)


def load_histogram(spark: SparkSession, path: str) -> AggHistogram:
    """Reload a saved histogram as a lazy AggHistogram."""
    with open(os.path.join(path, "_histogram_spec.json")) as f:
        d = json.load(f)
    spec = HistogramSpec(
        axes=tuple(_axis_from_json(a) for a in d["axes"]),
        storage=Storage(d["storage"]),
        metadata=d.get("metadata"),
        sample_shift=d.get("sample_shift", 0.0),
    )
    return AggHistogram(spark.read.parquet(path), spec)


def write_bucketed(df: DataFrame, table: str, bucket_cols, n_buckets: int,
                   sort_cols=None, mode: str = "overwrite",
                   path: str | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) by join keys.

    The 100 TB co-location pattern: two tables bucketed the same way
    on the same keys join WITHOUT an exchange (Spark's bucketed
    sort-merge join) — pre-paying the shuffle once at write time
    instead of on every join.  Dedup/similarity pipelines write their
    banded or id-keyed intermediates this way (see
    operators/dedup.py minhash notes).
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          id_col: str = "doc_id",
                          mode: str = "error",
                          fmt: str = "parquet",
                          compression: str | None = None,
                          shuffle_seed: int | None = None) -> dict:
    """The corpus SINK: write ``df`` as ``n_shards`` balanced parquet
    shards plus a JSON manifest — the handoff format a training run's
    data loader consumes (stable shard membership lets a loader
    checkpoint/resume by shard, and lets distinct workers own distinct
    shards with no coordination).

    Shard assignment is ``pmod(xxhash64(id), n_shards)`` — a pure
    function of the id, so a rewritten corpus puts every surviving doc
    in the SAME shard (append-only consumers resync cheaply), and
    balance follows from hash uniformity rather than input order.
    The write repartitions ON the shard id (one exchange — this is
    the one operator whose JOB is to move data) and writes
    ``partitionBy`` shard directories so a loader can read one shard
    as one parquet directory.

    Returns (and persists as ``_manifest.json``) per-shard row counts
    read back from the written files' parquet FOOTERS grouped on the
    partition column — a metadata-only pass, no data pages re-read.

    ``fmt='json'`` writes JSON-Lines shard directories instead (the
    cross-framework interchange format; ``compression`` defaults to
    gzip there, and :func:`read_jsonl_corpus` reads one shard back).
    JSONL has no footer metadata, so the manifest counts re-read the
    written lines — a real (documented) scan the parquet format does
    not pay; parquet remains the loader-facing default.

    ``shuffle_seed`` additionally randomizes the WITHIN-shard row
    order (training loaders want documents decorrelated from crawl /
    pipeline order): rows sort by ``xxhash64(id, seed)`` — any id
    type, the same function as the shard assignment — INSIDE the
    existing shard repartition, so the global shuffle costs one
    sortWithinPartitions on data that was already moving, no extra
    exchange.  The id itself tie-breaks the (already ~impossible
    64-bit) hash collisions, so the written order is bit-deterministic
    per seed on any rerun; different seeds give independent orders;
    membership is unaffected.
    """
    import pyspark.sql.functions as F

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format: {fmt!r}")
    if fmt == "json" and compression is None:
        compression = "gzip"
    if "shard" in df.columns:
        raise ValueError(
            "input already carries a 'shard' column — rename it; the "
            "sink writes its assignment there and would silently "
            "overwrite the data")
    if mode == "append" and os.path.isdir(path):
        # refuse to append without a readable manifest: a crash that
        # lost it leaves the prior modulus unknowable, and appending
        # with a different one silently breaks stable membership
        try:
            prior = read_shard_manifest(path)
        except FileNotFoundError:
            raise ValueError(
                f"{path} exists but has no _manifest.json — cannot "
                "verify the prior n_shards; rebuild with "
                "mode='overwrite'")
        if prior.get("n_shards") != int(n_shards):
            raise ValueError(
                f"appending with n_shards={n_shards} to a corpus "
                f"sharded {prior.get('n_shards')} ways would break "
                "the stable-membership contract (different pmod "
                "modulus) and orphan existing shard directories")
        if prior.get("format", "parquet") != fmt:
            raise ValueError(
                f"appending {fmt} shards to a corpus written as "
                f"{prior.get('format', 'parquet')} would mix file "
                "formats inside the shard directories")
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
        .cast("int"))
    moved = sharded.repartition(n_shards, "shard")
    if shuffle_seed is not None:
        # sort key leads with the partition column: partitionBy writes
        # REQUIRE ordering by their columns and plan their own Sort
        # when unsatisfied — which would eliminate a bare __ord sort
        # (Sort-over-Sort) and silently undo the shuffle.  Leading
        # with 'shard' satisfies the writer's requirement so THIS sort
        # is the only one.  xxhash64 (not the samplers' long-only
        # _gold_hash) accepts any id type, and the trailing id column
        # tie-breaks hash collisions so reruns are byte-identical.
        moved = (moved.withColumn(
            "__ord", F.xxhash64(F.col(id_col),
                                F.lit(int(shuffle_seed))))
            .sortWithinPartitions("shard", "__ord", id_col)
            .drop("__ord"))
    writer = moved.write.mode(mode).partitionBy("shard")
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.format(fmt).save(path)
    # counts from the written files: for parquet one metadata-only
    # footer scan grouped on the partition column (no data pages
    # read); for jsonl a real line scan (documented in the docstring).
    # The explicit schema keeps the read alive for a fully-filtered
    # (0-row) corpus, where inference finds no file to probe
    spark = df.sparkSession
    counts = {
        int(r["shard"]): int(r["n"])
        for r in spark.read.schema(sharded.schema).format(fmt).load(path)
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manifest = {
        "n_shards": int(n_shards),
        "id_col": id_col,
        "assignment": "pmod(xxhash64(id), n_shards)",
        "format": fmt,
        "rows_per_shard": {str(k): counts.get(k, 0)
                           for k in range(n_shards)},
        "total_rows": int(sum(counts.values())),
    }
    # tmp-then-rename: a crash mid-write must not leave a truncated
    # manifest beside committed shard data (same rule as save_bpe)
    mpath = os.path.join(path, "_manifest.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(mpath + ".tmp", mpath)
    return manifest


def read_shard_manifest(path: str) -> dict:
    """Load the ``_manifest.json`` written by
    :func:`write_training_shards`."""
    with open(os.path.join(path, "_manifest.json")) as f:
        return json.load(f)
