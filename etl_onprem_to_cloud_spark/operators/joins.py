"""Join strategies (Ring B -- the surface the reference delegates to
Athena SQL, reference README.md:184-199).

Scale rules encoded here:
- Dimension tables (region/nation/supplier, and part up to ~GB) are
  always broadcast: an explicit ``F.broadcast`` hint removes any
  dependence on size estimation, so a fact-dim join never shuffles the
  100 TB fact side.
- Fact-fact joins (orders |x| lineitem) shuffle on the join key; AQE
  handles skew splitting.  For repeated co-located joins, bucket both
  facts on the key at write time (sources.write_parquet + bucketBy in a
  warehouse) to eliminate the exchange entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Fact-to-dimension equi-join with a forced broadcast of the dim."""
    return fact.join(F.broadcast(dim), on, how)


def star_join(fact: DataFrame, dims: list[tuple[DataFrame, object]]) -> DataFrame:
    """Chain of broadcast joins against a fact table (star schema).
    Catalyst collapses these into one stage over the fact scan."""
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on)
    return out
