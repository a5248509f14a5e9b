"""LEG-SPLIT paired timing for the three >2x fused-leg rows
(round-13 VERDICT #1): embedding_dedup_pipeline, dedup_exact_stats,
pipeline_prepare_corpus.

The full-row paired table (scripts/time_oracles.py) showed these three
data-dominated rows above the 2x gate since r11, with the standing
explanation "each engine row runs strictly more gated work than its
flat oracle" — prose, not a number.  This script pairs EACH LEG of
each row against its OWN oracle twin under the same pinned protocol
(one session, warmup, strict E-O alternation, median-of-REPS), so
either every leg lands <= ~2x of its twin (proving the row-level
excess is the union of more work, not a slow plan) or the slow leg is
named.

Leg twins reuse the queries module's own oracle part-helpers
(_span_ctes / _line_ctes / _pipe_sql / _near_dup_lsh_oracle /
_hyperplane_sig_parts), so each leg oracle is textually the
corresponding PART of the committed row oracle — no re-derivation.

The pipeline row's 'sink' leg has no DuckDB twin (a real parquet
write/read-back/verify); it is paired against the row oracle (the
prepare twin + literal sink_ok) and ALSO reported as the engine-side
delta vs the 'prepare' leg — the named structural cost.

Usage: python scripts/pair_legs.py [sf_dir] [row ...]
Env: SPARK_GRAFT_PAIR_REPS (default 5), SPARK_GRAFT_CPUS (default 32).
Prints ONE JSON line and a markdown table on stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import dask_histogram_spark.queries as q  # noqa: E402
from dask_histogram_spark.queries import get_tables  # noqa: E402
from dask_histogram_spark.session import get_spark  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
REPS = int(os.environ.get("SPARK_GRAFT_PAIR_REPS", "5"))


# ---------------------------------------------------------------------------
# dedup_exact_stats legs
# ---------------------------------------------------------------------------

def e_doc(spark, sf_dir):
    from dask_histogram_spark.operators import dedup_exact, exact_dup_stats

    corpus = q._dup_corpus(spark, sf_dir)
    kept = dedup_exact(corpus, exact=True)
    return kept.crossJoin(F.broadcast(exact_dup_stats(corpus)))


O_DOC = f"""
SELECT k.doc_id, k.n_copies, s.n_distinct, s.n_dup_groups, s.n_removable
FROM (SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies FROM {q._DUP_SQL}
      GROUP BY text) k
CROSS JOIN
     (SELECT COUNT(*) AS n_distinct,
             CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_groups,
             CAST(SUM(n - 1) AS BIGINT) AS n_removable FROM
      (SELECT COUNT(*) AS n FROM {q._DUP_SQL} GROUP BY text)) s
"""


def e_span(spark, sf_dir):
    from dask_histogram_spark.operators import remove_duplicate_spans

    d = get_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    planted = d.withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" " + q._SPAN_BOILER)))
        .otherwise(F.col("text")))
    return remove_duplicate_spans(
        planted, n=q._SPAN_N, min_df=q._SPAN_MIN_DF, policy="keep_first",
        plan="auto", with_stats=True,
    ).select(
        "doc_id", "n_windows", "n_dup_windows", "n_removable_windows",
        "dup_fraction",
        F.col("n_removed_words").cast("long").alias("n_removed_words"),
        F.md5("clean_text").alias("clean_md5"),
    )


O_SPAN = f"""WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' {q._SPAN_BOILER}'
              ELSE text END AS text
  FROM documents
), {q._span_ctes('planted')}
SELECT st.doc_id, st.n_windows, st.n_dup_windows, st.n_removable_windows,
       st.dup_fraction, c.n_removed_words, md5(c.clean_text) AS clean_md5
FROM span_stats st JOIN clean c ON c.doc_id = st.doc_id
"""


def e_line(spark, sf_dir):
    from dask_histogram_spark.operators import remove_duplicate_spans

    d = get_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    lplanted = d.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit("\n" + q._LINE_FOOTER)))
        .otherwise(F.col("text")))
    return remove_duplicate_spans(
        lplanted, n=1, min_df=q._SPAN_MIN_DF, policy="keep_first",
        granularity="line",
    ).select(
        "doc_id",
        F.col("n_removed_words").cast("long").alias("line_n_removed"),
        F.md5("clean_text").alias("line_clean_md5"),
    )


O_LINE = f"""WITH lplanted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || chr(10) || '{q._LINE_FOOTER}'
              ELSE text END AS text
  FROM documents
), {q._line_ctes('lplanted')}
SELECT doc_id, n_removed AS line_n_removed,
       md5(clean_text) AS line_clean_md5
FROM lclean
"""


# ---------------------------------------------------------------------------
# pipeline_prepare_corpus legs
# ---------------------------------------------------------------------------

def e_prepare(spark, sf_dir):
    from dask_histogram_spark.operators.pipeline import (
        prepare_training_corpus,
    )

    return prepare_training_corpus(q._dup_corpus(spark, sf_dir))


O_PREPARE = q._pipe_sql(table=q._DUP_SQL)


def e_sink(spark, sf_dir):
    # the FULL row: prepare + (session-cached) shard write + read-back
    # + per-doc verify join.  No DuckDB twin exists for a real sink;
    # paired against the row oracle AND reported as delta vs 'prepare'.
    return q._q_pipeline(spark, sf_dir)


# the COMMITTED row oracle, by reference — re-deriving it here would
# let the leg twin drift from the gate if the row oracle ever changes
# (round-14 review)
O_SINK = q.ORACLES["pipeline_prepare_corpus"]


# ---------------------------------------------------------------------------
# embedding_dedup_pipeline legs
# ---------------------------------------------------------------------------

def e_cluster(spark, sf_dir):
    from dask_histogram_spark.operators import (
        dedup_clusters,
        embedding_near_dup_pairs,
    )

    emb = get_tables(spark, sf_dir)["embeddings"]
    pairs = embedding_near_dup_pairs(emb, threshold=0.3, planes=8)
    return dedup_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"),
        F.col("cluster_id").alias("n"))


O_CLUSTER = f"""
WITH RECURSIVE pr AS ({q._near_dup_lsh_oracle()}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pr
  UNION SELECT id_b AS a, id_a AS b FROM pr
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS vec_id, LEAST(a, MIN(b)) AS n FROM reach GROUP BY a
"""


def _emb_oracle_parts() -> dict[str, str]:
    harrs, sig, dots = q._hyperplane_sig_parts(planes=8, dim=64, seed=23)
    absd = (f"list_transform({dots}, "
            "x -> coalesce(abs(x), 'infinity'::DOUBLE))")
    base = f"""
Hn AS (SELECT {harrs}),
nw AS (
  SELECT vec_id + 1000000000000 AS vec_id,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 2000000000000 AS vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> -x) AS v
  FROM embeddings
),
seen AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {sig} AS sig
         FROM embeddings, Hn),
bok AS (SELECT sig FROM seen GROUP BY sig HAVING COUNT(*) <= 64),
sk AS (SELECT s.vec_id, s.v, s.sig FROM seen s JOIN bok USING (sig))"""
    inc = f"""WITH {base},
nb AS (SELECT vec_id, v, {sig} AS sig FROM nw, Hn),
m AS (
  SELECT nb.vec_id, COUNT(*) AS n
  FROM nb JOIN sk ON nb.sig = sk.sig
  WHERE ROUND(list_cosine_similarity(nb.v, sk.v), 6) >= 0.3
  GROUP BY nb.vec_id
)
SELECT nw.vec_id, COALESCE(m.n, 0) AS n FROM nw LEFT JOIN m USING (vec_id)
"""
    prb = f"""WITH {base},
nbp AS (
  SELECT vec_id, v, sig,
         substr(sig, 1, fi - 1)
         || (CASE WHEN substr(sig, fi, 1) = '1' THEN '0' ELSE '1' END)
         || substr(sig, fi + 1) AS psig
  FROM (SELECT vec_id, v, {sig} AS sig,
               list_position({absd}, list_min({absd})) AS fi
        FROM nw, Hn)
),
nbu AS (
  SELECT vec_id, v, UNNEST([sig, psig]) AS sig FROM nbp
),
mp AS (
  SELECT nbu.vec_id, COUNT(DISTINCT sk.vec_id) AS n
  FROM nbu JOIN sk ON nbu.sig = sk.sig
  WHERE ROUND(list_cosine_similarity(nbu.v, sk.v), 6) >= 0.3
  GROUP BY nbu.vec_id
)
SELECT nw.vec_id, COALESCE(mp.n, 0) AS n FROM nw LEFT JOIN mp USING (vec_id)
"""
    return {"incremental": inc, "probe": prb, "stream": inc}


def e_incremental(spark, sf_dir):
    from dask_histogram_spark.operators import embedding_dedup_incremental

    _, emb_tbl, new = q._emb_gate_inputs(spark, sf_dir)
    return embedding_dedup_incremental(new, emb_tbl, threshold=0.3).select(
        "vec_id", F.col("n_matched_seen").alias("n"))


def e_probe(spark, sf_dir):
    from dask_histogram_spark.operators import embedding_dedup_incremental

    _, emb_tbl, new = q._emb_gate_inputs(spark, sf_dir)
    return embedding_dedup_incremental(new, emb_tbl, threshold=0.3,
                                       probes=1).select(
        "vec_id", F.col("n_matched_seen").alias("n"))


def e_stream(spark, sf_dir):
    _, emb_tbl, new = q._emb_gate_inputs(spark, sf_dir)
    return q._embedding_stream_leg(spark, new, emb_tbl).select("vec_id", "n")


_EMB_O = _emb_oracle_parts()

LEGS: dict[str, list[tuple]] = {
    "dedup_exact_stats": [
        ("doc", e_doc, O_DOC),
        ("span", e_span, O_SPAN),
        ("line", e_line, O_LINE),
    ],
    "pipeline_prepare_corpus": [
        ("prepare", e_prepare, O_PREPARE),
        ("sink", e_sink, O_SINK),
    ],
    "embedding_dedup_pipeline": [
        ("cluster", e_cluster, O_CLUSTER),
        ("incremental", e_incremental, _EMB_O["incremental"]),
        ("probe", e_probe, _EMB_O["probe"]),
        ("stream", e_stream, _EMB_O["stream"]),
    ],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rows = sys.argv[2:] or list(LEGS)

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{path}')")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dhs-pair-legs", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tables = get_tables(spark, sf_dir)
    for name in ("documents", "embeddings"):
        tables[name] = tables[name].cache()
        tables[name].count()

    out: dict[str, dict] = {}
    for row in rows:
        out[row] = {}
        for leg, fn, sql in LEGS[row]:
            fn(spark, sf_dir).collect()     # warm (codegen, session
            con.execute(sql).fetchall()     # tables/sidecars) + oracle
            es, os_ = [], []
            for _ in range(REPS):           # strict E-O alternation
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                es.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                os_.append(time.perf_counter() - t0)
            e, o = statistics.median(es), statistics.median(os_)
            out[row][leg] = {
                "engine": round(e, 4), "oracle": round(o, 4),
                "ratio": round(e / o, 2) if o else None,
                "engine_reps": [round(x, 4) for x in es],
                "oracle_reps": [round(x, 4) for x in os_],
            }
            print(f"{row}/{leg}: engine {e:.3f}s oracle {o:.3f}s "
                  f"ratio {e / o:.2f}x", file=sys.stderr)

    print("\n| row / leg | engine (s) | oracle (s) | ratio |",
          file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for row, legs in out.items():
        for leg, p in legs.items():
            print(f"| {row} / {leg} | {p['engine']:.2f} | "
                  f"{p['oracle']:.2f} | {p['ratio']:.2f}x |",
                  file=sys.stderr)
    # the sink leg's structural delta (engine-only cost the oracle
    # cannot run: parquet read-back + verify join over a real sink)
    pp = out.get("pipeline_prepare_corpus", {})
    if {"prepare", "sink"} <= set(pp):
        d = pp["sink"]["engine"] - pp["prepare"]["engine"]
        print(f"sink structural delta (engine sink - engine prepare): "
              f"{d:.3f}s", file=sys.stderr)

    print(json.dumps({"leg_paired": out, "sf_dir": sf_dir,
                      "reps": REPS, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
