"""Declared UDF surface (SURVEY.md section 2b, row 'UDF surface').

The engine's position: UDFs are the SLOW PATH.  Every hot-path operator
is built-in-expression only (see plans/checks.has_python_udf, enforced
in tests/test_plans.py).  These implementations exist because the
capability itself is part of the declared surface -- users of the
reference system could register Python logic (its transform pipeline
ships the row-at-a-time ``get_europe_country`` UDF,
reference etl/transform.py:73-89) -- and because each one is the
differential twin of a native expression, so the test suite can prove
the native rewrites semantically exact:

- :func:`europe_country_python_udf` -- faithful U1 semantics as
  ``@udf`` (pickled row round-trip; breaks WholeStageCodegen).
- :func:`cosine_pandas_udf` -- Arrow-vectorized ``@pandas_udf`` over
  embedding arrays (numpy batch math; ~10-100x faster than @udf, still
  slower than the pure-expression functions/vectors.py path it mirrors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from ..transforms.netflix import EUROPE_COUNTRIES_STD


@F.udf(StringType())
def europe_country_python_udf(country_str):
    """Row-at-a-time U1 parity (reference etl/transform.py:73-83):
    split on ',', strip quotes/whitespace, return the standardized name
    of the FIRST part present in the Europe map, else None."""
    if not country_str:
        return None
    for part in str(country_str).split(","):
        cleaned = part.replace('"', "").strip()
        if cleaned in EUROPE_COUNTRIES_STD:
            return EUROPE_COUNTRIES_STD[cleaned]
    return None


@F.pandas_udf(DoubleType())
def cosine_pandas_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine similarity between two array<float> columns.

    Arrow delivers each batch as Series-of-ndarray; stacking into one
    2-D matrix turns the whole batch into three BLAS reductions.
    Differential twin of functions/vectors.cosine_similarity.
    """
    # float64 accumulation, matching the native path's cast-to-double
    # (float32 norms are off by ~1e-7, enough to fail exactness checks).
    ma = np.stack(a.to_numpy()).astype(np.float64)
    mb = np.stack(b.to_numpy()).astype(np.float64)
    dots = np.einsum("ij,ij->i", ma, mb)
    norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(norms > 0, dots / norms, np.nan)
    return pd.Series(out)
