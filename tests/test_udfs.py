"""The declared UDF surface is the differential twin of the native
expressions: these tests prove the native rewrites exact (U1 parity)
and the pandas UDF consistent with the pure-expression vector math."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_onprem_to_cloud_spark.functions.udfs import (
    cosine_pandas_udf,
    europe_country_python_udf,
)
from etl_onprem_to_cloud_spark.functions.vectors import cosine_similarity
from etl_onprem_to_cloud_spark.transforms.netflix import europe_country

U1_CASES = [
    "United Kingdom",
    "England",  # alias -> United Kingdom
    '"France", Italy',  # quotes + multi -> France (first match wins)
    "United States, Spain",  # first listed is non-EU -> Spain
    "United States",  # no EU country -> NULL
    "  Germany  ",  # outer whitespace
    ",,,",  # only empties -> NULL
    "",  # empty -> NULL
    None,  # NULL -> NULL
    "Narnia, Sweden, France",  # unknown then two matches -> Sweden
]


def test_native_europe_country_matches_python_udf(spark):
    df = spark.createDataFrame([(c,) for c in U1_CASES], ["country"])
    out = df.select(
        europe_country(F.col("country")).alias("native"),
        europe_country_python_udf(F.col("country")).alias("via_udf"),
    ).collect()
    for i, r in enumerate(out):
        assert r.native == r.via_udf, f"case {U1_CASES[i]!r}: {r.native} != {r.via_udf}"


def test_pandas_udf_cosine_matches_expression(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    a = emb.select(
        F.col("vec_id"), F.col("embedding").alias("a")
    )
    pairs = a.crossJoin(
        emb.selectExpr("embedding AS b").limit(3)
    )
    out = pairs.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("native"),
        cosine_pandas_udf(F.col("a"), F.col("b")).alias("vectorized"),
    ).collect()
    assert len(out) == 150
    for r in out:
        assert r.native == pytest.approx(r.vectorized, abs=1e-9) or (
            math.isnan(r.native) and math.isnan(r.vectorized)
        )
