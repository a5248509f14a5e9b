"""``axis`` namespace alias — reference parity.

The reference re-exports ``boost_histogram.axis`` as
``dask_histogram.axis`` (reference ``__init__.py:14-17``) so user code
writes ``dh.axis.Regular(10, -3, 3)``.  This module provides the same
spelling over this engine's axis dataclasses (spec.py).
"""

from __future__ import annotations

from .spec import (  # noqa: F401
    Boolean,
    IntCategory,
    Integer,
    Regular,
    StrCategory,
    Variable,
)

__all__ = ["Regular", "Variable", "Integer", "Boolean", "IntCategory",
           "StrCategory"]
