"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partition layout: the same call
over the same data returns different rows if the file splits change,
which poisons reproducibility at 100 TB (and makes an exact oracle
impossible).  Hash-gate sampling decides membership from row CONTENT:
md5(salt|key) -> 60-bit int -> keep iff below rate * modulus.  Stable
under repartitioning, resumable, stratifiable, and bit-reproducible in
any engine with md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MOD = (1 << 31) - 1


def hash_gate(key: Column, salt: str = "sample") -> Column:
    """Uniform [0, 2^31-1) integer derived from md5(salt|key)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt), key).cast("binary")), 1, 15),
            16,
            10,
        ).cast("bigint")
        % _MOD
    )


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by content hash of ``key_col``."""
    return df.filter(hash_gate(F.col(key_col).cast("string"), salt) < int(rate * _MOD))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum hash-gate sampling (e.g. upsample rare languages,
    downsample boilerplate sources).  One scan, no shuffle."""
    thresh: Column = F.lit(int(default_rate * _MOD))
    for value, rate in rates.items():
        thresh = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * _MOD))
        ).otherwise(thresh)
    return df.filter(hash_gate(F.col(key_col).cast("string"), salt) < thresh)


def weighted_sample(
    df: DataFrame, key_col: str, weight: Column, salt: str = "wsample"
) -> DataFrame:
    """Per-row weighted hash-gate: keep iff gate < clamp(weight,0,1) *
    modulus -- e.g. length-proportional document sampling.  Same
    stability properties as deterministic_sample; one scan, no
    shuffle, rerun- and repartition-stable."""
    thresh = (F.least(weight, F.lit(1.0)) * _MOD).cast("bigint")
    return df.filter(hash_gate(F.col(key_col).cast("string"), salt) < thresh)


def duck_hash_gate(key_expr: str, salt: str = "sample") -> str:
    """DuckDB twin of hash_gate for oracle SQL."""
    return (
        f"(CAST(concat('0x', substr(md5('{salt}' || '|' || {key_expr}), 1, 15)) "
        f"AS BIGINT) % {_MOD})"
    )
