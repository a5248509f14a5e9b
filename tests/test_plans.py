"""Physical-plan audit over the whole driver-contract registry.

The 100 TB posture is enforced here, not just claimed: every registered
query's plan is checked for scale anti-patterns — unexpected cartesian
products, missing parquet column pruning on the histogram family, and
missing partial aggregation before the exchange.
"""

from __future__ import annotations

import pytest

from dask_histogram_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Queries with a *deliberate* O(n^2) or broadcast-NLJ stage, with why:
CARTESIAN_ALLOWED = {
    "embedding_near_dup",   # union's exact half exists for oracle checks only
    "similarity_topk",      # broadcast NLJ: queries side is broadcast-tiny
    "dedup_exact_stats",    # cross join against a broadcast 1-ROW stats agg
    "minhash_lsh_stats",    # 1-row pair count x 1-row bucket stats assembly
}


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in QUERIES.items():
        if name == "windowed_histogram":
            continue  # streaming-shaped plan, audited in test_streaming
        out[name] = _executed_plan(fn(spark, SF_DIR))
    return out


def test_no_unexpected_cartesian_products(plans):
    bad = []
    for name, plan in plans.items():
        if name in CARTESIAN_ALLOWED:
            continue
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            bad.append(name)
    assert not bad, f"unexpected cartesian/NLJ in: {bad}"


def test_histogram_scans_are_column_pruned(plans):
    """Every lineitem histogram scan must read only the filled columns
    (ReadSchema pushdown) — never the full 11-column row."""
    for name in ("hist1d_double", "hist1d_weight", "hist2d", "hist3d",
                 "hist_mean", "hist_filtered", "hist_int_bool_axes",
                 "hist_project"):
        plan = plans[name]
        assert "ReadSchema" in plan
        # merged rows (hist_int_bool_axes) scan lineitem more than once —
        # EVERY scan must be pruned, not just the first
        for schema_line in (l for l in plan.splitlines() if "ReadSchema" in l):
            assert "l_orderkey" not in schema_line, f"{name}: scan not pruned"
            assert "l_shipdate" not in schema_line, f"{name}: scan not pruned"


def test_filter_reaches_the_scan(plans):
    """hist_filtered's predicate must be pushed into the parquet scan."""
    plan = plans["hist_filtered"]
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "l_returnflag" in pushed[0], plan[:500]


def test_ivf_assignment_is_a_narrow_map(plans):
    """IVF bucket assignment must not shuffle vectors: nearest-centroid
    is an argmin over a broadcast centroid literal, so the only shuffle
    Exchange in the whole plan is the final per-query ranking window
    (keyed on query_id, not on any embedding column)."""
    plan = plans["similarity_ivf_topk"]
    assert "CartesianProduct" not in plan
    shuffles = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(shuffles) <= 1, shuffles
    for line in shuffles:
        assert "query_id" in line, line
        assert "embedding" not in line, line


def test_pipeline_dedup_shuffles_hash_key_not_text(plans):
    """prepare_training_corpus must key its one shuffle on
    xxhash64(text), never on the document text itself, with the quality
    gates applied map-side (Filter below the Exchange)."""
    plan = plans["pipeline_prepare_corpus"]
    shuffles = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert shuffles, plan[:500]
    for line in shuffles:
        assert "text" not in line, line
    first_exchange = plan.find("Exchange hashpartitioning")
    assert "Filter" in plan[first_exchange:], "gates not pushed before shuffle"


def test_histograms_partial_aggregate_before_exchange(plans):
    """The fill must run its partial hash-agg map-side: the plan order is
    HashAggregate (partial) -> Exchange -> HashAggregate (final), so the
    shuffle carries <= nbins rows per partition."""
    for name in ("hist1d_double", "hist2d", "hist_strcat"):
        plan = plans[name]
        first_agg = plan.find("HashAggregate")
        first_exchange = plan.find("Exchange")
        assert first_agg != -1 and first_exchange != -1
        # plan string prints top-down: final agg, exchange, partial agg —
        # partial agg must exist BELOW the exchange
        assert "HashAggregate" in plan[first_exchange:], name
