"""SparkSession helper tuned for this engine.

Defaults chosen for aggregation-heavy plans that must survive a 100x
scale-up: AQE on (runtime coalescing + skew-join splitting), a
shuffle-partition count sized to the local harness (on a real cluster
AQE re-coalesces it), and Arrow enabled for the few Pandas-UDF paths
(similarity/multimodal operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "load_tables"]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def get_spark(app: str = "dask-histogram-spark", cpus: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """``extra_conf``: static session confs a harness needs set at
    build time (e.g. the 100M LM ladder's
    ``spark.io.compression.codec=zstd`` — shuffle scratch on this
    container is ~73 GiB and zstd compresses hash-key shuffles ~1.5-2x
    tighter than the lz4 default).  Applied LAST so caller-supplied
    values win over the library defaults below (a harness overriding
    e.g. ``spark.driver.memory`` or the shuffle-partition count must
    not be silently reverted — round-10 ADVICE)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        # CollectLimit scales up serially (1 -> 4 -> 16 ... partitions
        # per wave, spark.sql.limit.scaleUpFactor): the library's
        # capped driver collects (span dup sets, bounded pair sets)
        # are sized to SUCCEED, so the waves always escalate to a full
        # scan — pure serialized latency (round-15: 1.48 s -> 1.12 s
        # for the sf0.1 span dup-set collect).  Start the first wave
        # at the session's width; a genuinely over-cap input pays at
        # most one cluster-wide wave before the cap raises.
        .config("spark.sql.limit.initialNumPartitions", str(max(cpus, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet TIMESTAMP(NANOS) is read as long under this conf (we
        # convert back in _normalize_timestamps); TIMESTAMP(MICROS,
        # isAdjustedToUTC=false) is read as TIMESTAMP_NTZ — also
        # normalized there.  Pin the session zone so NTZ -> TIMESTAMP is
        # a deterministic wall-clock identity that matches DuckDB's
        # naive-timestamp reading of the same files.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # Spark 4's DataFrame-debugging call-site capture wraps EVERY
        # PySpark Column/DataFrame API call in ~3 extra py4j round
        # trips (conf.get + PySparkCurrentOrigin.set/clear) — measured
        # ~0.7 ms per driver API call, which multiplies into seconds
        # of pure plan-construction wall on expression-heavy operators
        # (round-15: contamination_near_dup's band explode alone spent
        # 2.2 s/build in py4j socket reads).  Debug-only feature;
        # plans, results and error TYPES are unchanged — errors just
        # lose the enriched call-site line.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns] (Spark reads them as long
    under ``nanosAsLong``; we restore proper TimestampType)."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns")
        ]
    except Exception:
        return []


def _normalize_timestamps(df, path: str):
    """Give every timestamp-ish column ONE downstream type: TimestampType.

    Branches on the OBSERVED Spark dtype, not on any conf, because the
    same parquet file lands differently across Spark versions/testdata
    revisions:

    * parquet TIMESTAMP(NANOS) + ``nanosAsLong`` -> ``bigint`` of nanos:
      integer-floor to microseconds and rebuild the timestamp.  Integer
      arithmetic, not ``/``: double division loses ulp at 2024-epoch
      nanos (~1.7e18) and floors to the wrong microsecond on ~12% of
      rows; pmod-then-div gives FLOOR semantics on longs so pre-1970
      (negative) nanos also map correctly (``div`` alone truncates
      toward zero).
    * parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) ->
      ``timestamp_ntz``: cast to TIMESTAMP.  With the session zone
      pinned to UTC (get_spark) this is a wall-clock identity and
      matches DuckDB's naive reading, and downstream window()/
      unix_timestamp()/cast-to-long all behave uniformly.
    """
    from pyspark.sql import functions as F

    nanos_cols = set(_nanos_timestamp_cols(path))
    for c, t in df.dtypes:
        if t == "bigint" and c in nanos_cols:
            df = df.withColumn(
                c,
                F.timestamp_micros(
                    F.expr(f"(`{c}` - pmod(`{c}`, 1000)) div 1000")
                ),
            )
        elif t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict:
    """Read the driver's parquet tables and register temp views.

    Timestamp columns are normalized to TimestampType at microsecond
    precision (see _normalize_timestamps) so date/window functions work
    and results line up with SQL oracles.
    """
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = _normalize_timestamps(spark.read.parquet(path), path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
