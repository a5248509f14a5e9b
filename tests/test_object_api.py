"""Object-API tests mirroring the reference's hardest cases
(tests/test_boost.py:114-154 — 5D growable categories, 25 staged
fills) plus the staged-fill/arithmetic contracts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import dask_histogram_spark as dhs


@pytest.fixture(scope="module")
def catfills(spark):
    """FIXTURES.md F3: 25 fills, each tagged with a constant category."""
    rng = np.random.default_rng(3)
    frames = []
    for i in range(25):
        n = 200
        frames.append(
            pd.DataFrame(
                {
                    "cat": f"testcat{i + 1}",
                    "icat": i + 1,
                    "c0": rng.normal(0, 1, n),
                    "c1": rng.normal(0, 1, n),
                    "c2": rng.normal(0, 1, n),
                    "w": rng.uniform(0.5, 0.75, n),
                }
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(pdf).repartition(8), pdf


def test_5d_growable_categories_25_fills(spark, catfills):
    """The reference's 5D growth case: StrCategory + IntCategory +
    3 Regular axes, one staged fill per category value."""
    df, pdf = catfills
    h = dhs.Histogram(
        dhs.StrCategory(growth=True),
        dhs.IntCategory(growth=True),
        dhs.Regular(8, -3.5, 3.5),
        dhs.Regular(7, -3.3, 3.3),
        dhs.Regular(9, -3.2, 3.2),
        storage=dhs.Storage.WEIGHT,
    )
    for i in range(25):
        sub = df.where(F.col("icat") == i + 1)
        h.fill(sub, "cat", "icat", "c0", "c1", "c2", weight="w")
    assert len(h.staged_fills()) == 25
    agg = h.compute()
    # 25 categories discovered on both category axes
    assert agg.categories(0) == [f"testcat{i+1}" for i in range(25)] or \
        sorted(agg.categories(0)) == sorted(f"testcat{i+1}" for i in range(25))
    assert sorted(agg.categories(1)) == list(range(1, 26))
    # per-category totals match the eager oracle
    vals = agg.values(flow=False)
    assert vals.shape == (25, 25, 8, 7, 9)
    cats = agg.categories(0)
    icats = agg.categories(1)
    for i in [0, 7, 24]:
        cname = f"testcat{i+1}"
        ci = cats.index(cname)
        ii = icats.index(i + 1)
        sub = pdf[pdf.icat == i + 1]
        inr = (
            sub.c0.between(-3.5, 3.5 - 1e-12)
            & sub.c1.between(-3.3, 3.3 - 1e-12)
            & sub.c2.between(-3.2, 3.2 - 1e-12)
        )
        assert vals[ci, ii].sum() == pytest.approx(sub.w[inr].sum())
        # off-diagonal (category mismatch) is empty
        assert vals[ci, (ii + 1) % 25].sum() == 0.0


def test_staged_fill_invalidation_and_repr(spark, gauss1d):
    df, _ = gauss1d
    h = dhs.Histogram(dhs.Regular(10, -3, 3))
    assert "staged" not in repr(h)
    h.fill(df, "x")
    assert "has staged fills" in repr(h)
    a1 = h.to_agg()
    h.fill(df, "x")
    a2 = h.to_agg()
    assert a1 is not a2  # cache invalidated (reference boost.py:309-310)
    assert a2.values().sum() == pytest.approx(2 * a1.values().sum())


def test_multifill_equivalence_single_pass(spark, gauss1d):
    """unioned multifill == sum of separate fills (reference core.py:978-1005)."""
    df, pdf = gauss1d
    spec = dhs.HistogramSpec(axes=(dhs.Regular(12, -3, 3),),
                             storage=dhs.Storage.WEIGHT)
    multi = dhs.AggHistogram(
        dhs.fill_multi(
            [dhs.FillSpec(df, ("x",), "w"), dhs.FillSpec(df, ("x",), 2.0)],
            spec,
        ),
        spec,
    )
    single_w = dhs.AggHistogram(dhs.fill(df, ["x"], spec, weight="w"), spec)
    single_2 = dhs.AggHistogram(dhs.fill(df, ["x"], spec, weight=2.0), spec)
    np.testing.assert_allclose(
        multi.values(flow=True),
        single_w.values(flow=True) + single_2.values(flow=True),
    )


def test_array_operand_arithmetic(spark, gauss1d):
    """FIXTURES.md F5: histogram (op) dense numpy array of length nbins."""
    df, _ = gauss1d
    h = dhs.histogram(df, "x", bins=10, range=(-3, 3), weights="w")
    arr = np.arange(10, dtype=np.float64)
    base = h.values(flow=False)
    added = (h + arr).values(flow=False)
    np.testing.assert_allclose(added, base + arr)
    scaled = (h * arr).values(flow=False)
    np.testing.assert_allclose(scaled, base * arr)
    divided = (h / (arr + 1)).values(flow=False)
    np.testing.assert_allclose(divided, base / (arr + 1))


def test_scalar_swap_operands(spark, gauss1d):
    df, _ = gauss1d
    h = dhs.histogram(df, "x", bins=10, range=(-3, 3))
    np.testing.assert_allclose((2 * h).values(), (h * 2).values())
    np.testing.assert_allclose(
        (1000.0 - h).values(), 1000.0 - h.values()
    )


def test_lazy_add_raises(spark, gauss1d):
    df, _ = gauss1d
    h1 = dhs.Histogram(dhs.Regular(5, 0, 1)).fill(df, "x")
    h2 = dhs.Histogram(dhs.Regular(5, 0, 1)).fill(df, "x")
    with pytest.raises(TypeError, match="lazy"):
        h1 + h2


def test_mismatched_axes_arithmetic_raises(spark, gauss1d):
    df, _ = gauss1d
    h1 = dhs.histogram(df, "x", bins=10, range=(-3, 3))
    h2 = dhs.histogram(df, "x", bins=12, range=(-3, 3))
    with pytest.raises(ValueError, match="identical axes"):
        h1 + h2


def test_pinned_categories_overflow_slot(spark):
    """Out-of-set values on a growth=False category axis land in ONE
    overflow slot (boost semantics), visible under flow=True and hidden
    under flow=False."""
    pdf = pd.DataFrame({"c": ["a", "b", "c", "a", "zzz"], "x": [1.0] * 5})
    from pyspark.sql import SparkSession

    df = SparkSession.getActiveSession().createDataFrame(pdf)
    h = dhs.Histogram(
        dhs.StrCategory(["a", "b"], growth=False),
        dhs.Regular(2, 0, 2),
    ).fill(df, "c", "x")
    vals = h.values()
    assert vals.shape == (2, 2)
    # flow=False view: only pinned categories
    assert vals.sum() == 3.0
    valsf = h.values(flow=True)
    # (2 cats + overflow, 2 bins + under/overflow)
    assert valsf.shape == (3, 4)
    assert valsf[2].sum() == 2.0          # 'c' and 'zzz' route to overflow
    assert valsf[2, 2] == 2.0             # x=1.0 -> bin 1 (+1 flow offset)
    assert valsf.sum() == 5.0             # nothing dropped


def test_object_return_entry_points(spark, gauss1d):
    """histogram/histogram2d/histogramdd(histogram=Histogram) return
    the STAGED object, uncomputed — reference boost.py:652-656,
    exercised by reference tests/test_boost.py:227-246."""
    df, pdf = gauss1d
    h = dhs.histogram(df, "x", bins=10, range=(-3, 3),
                      histogram=dhs.Histogram)
    assert isinstance(h, dhs.Histogram)
    assert h.staged_fills()          # fill queued...
    assert h._agg is None            # ...but nothing built yet
    assert "has staged fills" in repr(h)
    # computed counts equal the array-style path
    arr = dhs.histogram(df, "x", bins=10, range=(-3, 3))
    np.testing.assert_allclose(h.counts(flow=True), arr.counts(flow=True))

    # weights + storage pass through (reference test_boost.py:252-286)
    hw = dhs.histogramdd(df, ["x"], bins=12, range=((-3, 3),),
                         weights="w", histogram=dhs.Histogram,
                         storage=dhs.Storage.WEIGHT)
    aw = dhs.histogram(df, "x", bins=12, range=(-3, 3), weights="w")
    np.testing.assert_allclose(hw.variances(flow=True), aw.variances(flow=True))

    h2 = dhs.histogram2d(df, "x", "w", bins=(5, 4),
                         range=((-3, 3), (0.4, 0.8)),
                         histogram=dhs.Histogram)
    assert isinstance(h2, dhs.Histogram) and h2.ndim == 2

    # density with object output is rejected (reference boost.py:622-626)
    with pytest.raises(KeyError, match="density"):
        dhs.histogram(df, "x", bins=10, range=(-3, 3), density=True,
                      histogram=dhs.Histogram)
    # any other `histogram` value keeps the array-style return
    agg = dhs.histogram(df, "x", bins=10, range=(-3, 3), histogram=object)
    assert isinstance(agg, dhs.AggHistogram)


def test_project_marginalizes(spark, gauss_nd):
    df, pdf = gauss_nd
    h = dhs.histogramdd(df, ["c0", "c1"], bins=(8, 7),
                        range=((-3.5, 3.5), (-3.3, 3.3)), weights="w")
    full = h.values(flow=True)
    p0 = h.project(0)
    p1 = h.project(1)
    np.testing.assert_allclose(p0.values(flow=True), full.sum(axis=1))
    np.testing.assert_allclose(p1.values(flow=True), full.sum(axis=0))
    # variance (sumw2) marginalizes additively too
    np.testing.assert_allclose(
        p0.variances(flow=True), h.variances(flow=True).sum(axis=1)
    )
    # axis-order swap
    swapped = h.project(1, 0)
    np.testing.assert_allclose(swapped.values(flow=True), full.T)
    with pytest.raises(ValueError, match="out of range"):
        h.project(5)
    with pytest.raises(ValueError, match="duplicate"):
        h.project(0, 0)


def test_integer_and_boolean_axes(spark):
    import pandas as pd
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    pdf = pd.DataFrame({
        "i": [-1, 0, 1, 2, 3, 7, 9, 10, 3],
        "b": [True, False, True, True, False, False, True, True, None],
    })
    df = s.createDataFrame(pdf)
    hi = dhs.Histogram(dhs.Integer(0, 10)).fill(df, "i")
    got = hi.counts(flow=True)
    # underflow: -1; overflow: 10; i=3 twice
    assert got[0] == 1 and got[-1] == 1
    assert got[1 + 3] == 2 and got.sum() == len(pdf)
    hb = dhs.Histogram(dhs.Boolean()).fill(df, "b")
    vb = hb.counts(flow=False)
    assert vb.shape == (2,)
    # None -> False bucket under cast-to-boolean otherwise(0) semantics
    assert vb[1] == 5 and vb.sum() == len(pdf)


def test_object_api_project_and_density_passthrough(spark, gauss1d):
    df, pdf = gauss1d
    h = dhs.Histogram(dhs.Regular(6, -3, 3), dhs.Regular(4, 0.4, 0.8))
    h.fill(df, "x", "w")
    p0 = h.project(0)
    np.testing.assert_allclose(p0.values(flow=True),
                               h.values(flow=True).sum(axis=1))
    dens, _ = dhs.Histogram(dhs.Regular(6, -3, 3)).fill(df, "x").to_numpy(
        dd=False, density=True)
    exp, _ = np.histogram(pdf.x[(pdf.x >= -3) & (pdf.x < 3)],
                          bins=6, range=(-3, 3), density=True)
    np.testing.assert_allclose(dens, exp)
