"""Vector column functions over ``array<float>`` embedding columns.

Pure built-in higher-order functions: ``zip_with`` + ``aggregate``
(sequential left-to-right over the array) computed in DOUBLE.  The
sequential order makes the dot product bit-deterministic and identical
to any engine that folds the list left-to-right -- which is what lets
the brute-force similarity queries hash-match an external oracle.

At scale: these run inside codegen over Tungsten arrays; a 64-dim dot
product is ~64 fused multiply-adds per row, no Python involved.  For
larger fan-out (k-NN joins) see llm/similarity.py which pairs these with
broadcast + block pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|); NULL when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
