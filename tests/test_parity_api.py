"""Reference top-level-API parity: a user of the reference can port
code with the same spellings (reference __init__.py exports:
AggHistogram, PartitionedHistogram, factory, partitioned_factory,
axis, storage, histogram*, __version__)."""

from __future__ import annotations

import numpy as np

import dask_histogram_spark as dhs


def test_axis_and_storage_namespaces(spark, gauss1d):
    df, pdf = gauss1d
    h = dhs.Histogram(
        dhs.axis.Regular(10, -3, 3),
        storage=dhs.storage.Weight(),
    ).fill(df, "x", weight="w")
    assert h.spec.storage is dhs.Storage.WEIGHT  # shim coerced
    assert h.variances() is not None
    assert repr(dhs.storage.Weight()) == "Weight()"
    assert dhs.storage.Weight() == dhs.storage.Weight()
    assert dhs.__version__


def test_factory_and_partitioned_factory(spark, gauss1d):
    df, pdf = gauss1d
    spec = dhs.HistogramSpec(axes=(dhs.Regular(10, -3, 3),),
                             storage=dhs.storage.Weight())
    h = dhs.factory(df, ["x"], spec, weights="w")
    assert isinstance(h, dhs.AggHistogram)
    ph = dhs.partitioned_factory(df, ["x"], spec, weights="w")
    assert isinstance(ph, dhs.PartitionedHistogram)
    assert "part_id" in ph.to_sparse().columns
    merged = ph.collapse(split_every=4)  # parity no-op knob
    np.testing.assert_allclose(merged.values(flow=True),
                               h.values(flow=True))
    kp = dhs.factory(df, ["x"], spec, weights="w", keep_partitioned=True)
    assert isinstance(kp, dhs.PartitionedHistogram)


def test_factory_accepts_histref_tuple_and_pickles(spark, gauss1d):
    """Reference ``factory`` accepts a picklable (axes, storage,
    metadata) histref tuple (reference core.py:66-72; pickle contract
    tests/test_boost.py:559-571)."""
    import pickle

    df, pdf = gauss1d
    histref = ((dhs.axis.Regular(10, -3, 3),), dhs.storage.Weight(),
               {"tag": 1})
    h = dhs.factory(df, ["x"], histref, weights="w")
    assert isinstance(h, dhs.AggHistogram)
    assert h.spec.metadata == {"tag": 1}
    assert h.spec.storage is dhs.Storage.WEIGHT
    # the tuple round-trips through pickle and builds the same result
    h2 = dhs.factory(df, ["x"], pickle.loads(pickle.dumps(histref)),
                     weights="w")
    np.testing.assert_allclose(h.values(flow=True), h2.values(flow=True))
    # 2-tuple (no metadata) also accepted
    h3 = dhs.factory(df, ["x"], ((dhs.axis.Regular(10, -3, 3),),
                                 dhs.storage.Weight()), weights="w")
    np.testing.assert_allclose(h.values(flow=True), h3.values(flow=True))


def test_empty_histogram_computes_to_zeros(spark):
    """Reference parity: an UNFILLED histogram computes to the all-zero
    result (reference boost.py:85-102, tests/test_boost.py:13-26)."""
    h = dhs.Histogram(dhs.axis.Regular(5, 0.0, 1.0),
                      storage=dhs.storage.Weight())
    vals = h.values(flow=True)
    assert vals.shape == (7,)
    assert (vals == 0).all()
    assert h.sum(flow=True) == 0.0
    assert (h.variances(flow=True) == 0).all()
    counts, edges = h.to_numpy(flow=False)
    assert counts.shape == (5,)
    assert (counts == 0).all()
    np.testing.assert_allclose(edges[0], np.linspace(0, 1, 6))
    # empty MEAN storage: zero counts, zero means
    hm = dhs.Histogram(dhs.axis.Regular(3, 0.0, 1.0),
                       storage=dhs.storage.Mean())
    assert (hm.counts(flow=True) == 0).all()
    assert (hm.values(flow=True) == 0).all()
    # filling after an empty compute invalidates the cached empty plan
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"x": [0.5, 0.5]}))
    h.fill(df, "x", weight=2.0)
    assert h.sum(flow=True) == 4.0
