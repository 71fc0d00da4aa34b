"""Oracle type lint: kill the HUGEINT hash-fail class permanently.

Rounds 2 and 3 each lost their only red driver row to the same defect:
a DuckDB oracle whose final projection left an aggregate uncast
(``sum(...)`` types as HUGEINT, ``avg``/decimal arithmetic as DECIMAL),
while the Spark twin emits bigint/double.  Values were identical, but
the driver hashes STRINGIFIED values and DuckDB's HUGEINT/DECIMAL
stringify through a different path than Python ints/floats -- so
rows/schema match and the value hash doesn't (q12 in r02,
q_profile_orders_columns in r03).

This test runs every oracle's final projection through DuckDB at
sf0.001 (types only -- cheap) and the Spark twin's analyzed schema
(lazy -- no job), then asserts the numeric type *kind* matches:

- DuckDB HUGEINT/INT128 anywhere is an outright failure (Spark has no
  int128; the convention is CAST(... AS BIGINT)).
- DuckDB DECIMAL where the Spark column is double/float/int/bigint is
  a failure (the convention is CAST(round(...) AS DOUBLE) after exact
  DECIMAL accumulation).  DECIMAL-vs-DECIMAL would be fine, but no
  registered query returns DecimalType, so this arm is future-proofing.

Both historical bugs are caught by the HUGEINT arm (verified by
reverting the casts locally).
"""

from __future__ import annotations

import duckdb
import pytest

from etl_onprem_to_cloud_spark.queries import QUERIES
from etl_onprem_to_cloud_spark.schemas import FIXTURE_TABLES

ORACLE_QUERIES = [n for n, s in QUERIES.items() if s.oracle is not None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _spark_kind(dtype) -> str:
    from pyspark.sql import types as T

    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return "float"
    if isinstance(dtype, T.DecimalType):
        return "decimal"
    return "other"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_projection_types(name, spark, sf_dir, duck):
    spec = QUERIES[name]

    # DuckDB: prepared-plan types only, no execution of the full query.
    rel = duck.sql(spec.oracle)
    duck_types = dict(zip(rel.columns, (str(t).upper() for t in rel.types)))

    # Spark: analyzed schema only -- building the DataFrame is lazy.
    schema = spec.fn(spark, sf_dir).schema
    spark_kinds = {f.name: _spark_kind(f.dataType) for f in schema.fields}

    for col, dt in duck_types.items():
        assert "HUGEINT" not in dt and "INT128" not in dt, (
            f"{name}.{col}: oracle projects {dt}; the driver stringifies "
            f"HUGEINT through a float path and the value hash diverges -- "
            f"wrap the aggregate in CAST(... AS BIGINT) (the q12 / "
            f"q_profile_orders_columns bug class)"
        )
        if dt.startswith("DECIMAL") and spark_kinds.get(col) in ("int", "float"):
            pytest.fail(
                f"{name}.{col}: oracle projects {dt} but the Spark twin "
                f"emits {spark_kinds[col]}; cast the oracle expression "
                f"(CAST(round(...) AS DOUBLE) / CAST(... AS BIGINT))"
            )
