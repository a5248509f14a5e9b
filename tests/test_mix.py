"""mix_corpora / mix_plan — deterministic weighted corpus mixture."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_histogram_spark.operators import hash_sample, mix_corpora, mix_plan


def _src(spark, name, n_docs, tokens_each, start=0):
    return spark.createDataFrame(
        [(start + i, name, tokens_each) for i in range(n_docs)],
        "doc_id long, origin string, n_tokens long")


def test_mix_plan_arithmetic():
    plan = mix_plan({"web": 6_000, "code": 3_000, "books": 3_000},
                    {"web": 0.6, "code": 0.3, "books": 0.1})
    # binding source: web (6000/0.6 = 10000 <= code 10000, books 30000)
    assert plan["web"]["rate"] == 1.0
    assert plan["code"]["rate"] == pytest.approx(1.0)
    assert plan["books"]["rate"] == pytest.approx(1000 / 3000)
    assert plan["web"]["target_tokens"] == pytest.approx(6000)
    # explicit smaller budget scales every rate down proportionally
    half = mix_plan({"web": 6_000, "code": 3_000, "books": 3_000},
                    {"web": 0.6, "code": 0.3, "books": 0.1},
                    total_tokens=5_000)
    assert half["web"]["rate"] == pytest.approx(0.5)
    assert half["books"]["rate"] == pytest.approx(500 / 3000)


def test_mix_plan_rejects_infeasible_and_bad_args():
    with pytest.raises(ValueError, match="max feasible"):
        mix_plan({"a": 100, "b": 100}, {"a": 0.5, "b": 0.5},
                 total_tokens=1_000)
    with pytest.raises(ValueError, match="sources"):
        mix_plan({"a": 100}, {"a": 0.5, "b": 0.5})
    with pytest.raises(ValueError, match="weight"):
        mix_plan({"a": 100}, {"a": 0.0})
    with pytest.raises(ValueError, match="no tokens"):
        mix_plan({"a": 0}, {"a": 1.0})


def test_mix_corpora_hits_proportions_and_is_deterministic(spark):
    srcs = {
        "web": _src(spark, "web", 4000, 10),            # 40k tokens
        "code": _src(spark, "code", 1000, 20, 10_000),  # 20k tokens
        "books": _src(spark, "books", 500, 30, 20_000), # 15k tokens
    }
    w = {"web": 0.5, "code": 0.3, "books": 0.2}
    mixed = mix_corpora(srcs, w, seed=7)
    got = {r["mix_source"]: r["tok"] for r in
           mixed.groupBy("mix_source").agg(F.sum("n_tokens").alias("tok"))
           .collect()}
    total = sum(got.values())
    # binding source: code (20k/0.3 ~ 66.7k) -> total ~ 66.7k capped
    # by availability; proportions within doc-sampling noise
    for s, target in w.items():
        assert got[s] / total == pytest.approx(target, rel=0.12), (s, got)
    assert got["code"] == 20_000  # rate-1.0 source kept wholesale
    # determinism incl. under repartition
    again = mix_corpora(
        {k: v.repartition(7) for k, v in srcs.items()}, w, seed=7)
    assert sorted(r.doc_id for r in mixed.collect()) == \
        sorted(r.doc_id for r in again.collect())


def test_mix_corpora_equals_per_source_hash_sample(spark):
    from dask_histogram_spark.operators.pipeline import _mix_seed

    srcs = {"a": _src(spark, "a", 1000, 10),
            "b": _src(spark, "b", 1000, 10, 5_000)}
    mixed = mix_corpora(srcs, {"a": 0.25, "b": 0.75}, seed=3)
    plan = mix_plan({"a": 10_000, "b": 10_000}, {"a": 0.25, "b": 0.75})
    for name in srcs:
        want = sorted(r.doc_id for r in
                      hash_sample(srcs[name], plan[name]["rate"],
                                  seed=_mix_seed(3, name)).collect())
        got = sorted(r.doc_id for r in
                     mixed.where(F.col("mix_source") == name).collect())
        assert got == want, name


def test_mix_corpora_overlapping_ids_not_nested(spark):
    # independently-curated corpora share id space 0..N; with a shared
    # seed the lower-rate source's kept ids would be a strict SUBSET
    # of the higher-rate source's — per-source seeding breaks that
    srcs = {"big": _src(spark, "big", 2000, 10),
            "small": _src(spark, "small", 2000, 10)}  # same ids 0..1999
    # explicit budget keeps BOTH rates fractional (0.4 / 0.1) — at the
    # default budget the binding source keeps everything and nesting
    # would be trivially true regardless of seeding
    mixed = mix_corpora(srcs, {"big": 0.8, "small": 0.2}, seed=5,
                        total_tokens=10_000)
    kept = {
        name: {r.doc_id for r in
               mixed.where(F.col("mix_source") == name).collect()}
        for name in srcs
    }
    assert not kept["small"] <= kept["big"], "kept sets are nested"


def test_mix_plan_snaps_binding_rate_and_rejects_nonpositive_budget():
    # float-division epsilon must not leave the binding source at
    # 0.999...; and a non-positive budget is a loud error
    plan = mix_plan({"a": 7_565_091, "b": 2_808_328},
                    {"a": 0.6, "b": 0.3})
    assert max(p["rate"] for p in plan.values()) == 1.0
    with pytest.raises(ValueError, match="total_tokens"):
        mix_plan({"a": 100}, {"a": 1.0}, total_tokens=0)


def test_mix_corpora_drops_null_ids_uniformly(spark):
    # NULL-id rows must vanish from BOTH the totals (no rate skew) and
    # the output of every source — including a rate-1.0 binding source
    # whose pass-through branch skips the hash predicate
    rows_a = [(i, "a", 10) for i in range(100)] + [(None, "a", 1000)]
    rows_b = [(1000 + i, "b", 10) for i in range(100)]
    a = spark.createDataFrame(rows_a, "doc_id long, origin string, n_tokens long")
    b = spark.createDataFrame(rows_b, "doc_id long, origin string, n_tokens long")
    mixed = mix_corpora({"a": a, "b": b}, {"a": 0.5, "b": 0.5}, seed=3)
    assert None not in {r.doc_id for r in mixed.collect()}
    got = {r["mix_source"]: r["tok"] for r in
           mixed.groupBy("mix_source").agg(F.sum("n_tokens").alias("tok"))
           .collect()}
    # equal non-null mass + equal weights: both sources bind at 1.0
    # and keep all 100 non-null docs; the 1000-token NULL row did not
    # inflate a's total (which would have downsampled b)
    assert got == {"a": 1000, "b": 1000}


def test_mix_corpora_refuses_source_col_collision(spark):
    a = _src(spark, "a", 10, 5).withColumn("mix_source", F.lit("old"))
    b = _src(spark, "b", 10, 5, 100).withColumn("mix_source", F.lit("old"))
    with pytest.raises(ValueError, match="source_col"):
        mix_corpora({"a": a, "b": b}, {"a": 0.5, "b": 0.5})
    with pytest.raises(ValueError, match="sources"):
        mix_corpora({"a": a}, {"typo": 1.0})


def test_mix_corpora_plan_has_no_shuffle(spark):
    # the mixture is per-source narrow filters + union: after the
    # eager token-total aggregates, the returned plan must carry NO
    # hashpartitioning exchange (the 100 TB posture: mixing is free)
    srcs = {"a": _src(spark, "a", 500, 10),
            "b": _src(spark, "b", 500, 10, 5_000)}
    mixed = mix_corpora(srcs, {"a": 0.5, "b": 0.5}, seed=3,
                        total_tokens=4_000)
    mixed.collect()
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange hashpartitioning" not in plan, plan


def test_mix_corpora_common_columns_and_missing_required(spark):
    a = _src(spark, "a", 10, 5)
    b = _src(spark, "b", 10, 5, 100).withColumn("extra", F.lit(1))
    mixed = mix_corpora({"a": a, "b": b}, {"a": 0.5, "b": 0.5})
    assert mixed.columns == ["doc_id", "origin", "n_tokens", "mix_source"]
    with pytest.raises(ValueError, match="must share"):
        mix_corpora({"a": a.drop("n_tokens"), "b": b.drop("n_tokens")},
                    {"a": 0.5, "b": 0.5})
