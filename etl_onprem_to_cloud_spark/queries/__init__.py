"""Named query registry -- the engine's declared capability surface.

Every entry couples a Spark implementation (a callable ``(spark,
sf_dir) -> DataFrame``) with, where SQL-expressible, an equivalent ANSI
SQL oracle string the DuckDB harness runs over the same parquet tables.
Output columns are aliased identically on both sides; aggregate values
use exact DECIMAL accumulation + rounding so the two engines are
bit-comparable (see functions/numeric.py); timestamps are emitted as
formatted strings; every ranked/limited output carries a total order.

Entries without an oracle (``oracle=None``) are the genuinely
non-SQL-expressible or approximate ops (stateful streaming, IVF probes,
seeded LSH) -- the driver records a weaker rows-only check for those.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    description: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    description: str = "",
):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn, oracle, tags, description)
        return fn

    return deco


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_queries() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }


# Import for registration side effects (order = registry order).
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import maintenance  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import vectorops  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "query", "spark_queries", "oracle_queries"]
