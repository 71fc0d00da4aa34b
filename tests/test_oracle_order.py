"""Oracle order-determinism lint (VERDICT r4 item 3): kill the
next cross-engine hash-fail class -- results that depend on INPUT ROW
ORDER -- before it costs a driver row.

The driver compares Spark vs DuckDB with rows sorted, so a plain
ORDER BY whose key has ties is harmless.  What is NOT harmless:

- ``ORDER BY <non-total key> LIMIT k`` (incl. QUALIFY / row_number
  filters): ties at the cut mean the *set* of returned rows depends on
  which tied row the engine saw first -- Spark and DuckDB scan in
  different orders, so the sorted-row hash diverges.
- order-sensitive aggregates without an inner ORDER BY (DuckDB
  ``list(x)``, ``string_agg(x, ',')``, ``first(x)``/``arbitrary``):
  the aggregated VALUE itself depends on input order.

Both reduce to one empirical property: the oracle's (sorted) result
must be IDENTICAL when the input tables are re-read in a scrambled
row order.  This test runs every oracle twice at sf0.001 -- once over
plain views, once over views whose rows are deterministically
shuffled by ``hash(row_number)`` -- and asserts equality.  A static
companion lint checks the cheap syntactic invariant (LIMIT implies
ORDER BY).

DuckDB-only (no Spark jobs), so the whole 292-oracle sweep costs
seconds; the Spark side's own tie-discipline is covered by
tests/test_oracle_parity.py's cross-engine comparison.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from etl_onprem_to_cloud_spark.queries import QUERIES
from etl_onprem_to_cloud_spark.schemas import FIXTURE_TABLES

ORACLE_QUERIES = [n for n, s in QUERIES.items() if s.oracle is not None]


@pytest.fixture(
    scope="module",
    # Ties (the thing that flips under a scrambled scan) get denser
    # with data, so sweep the driver's sf0.01 too -- DuckDB-only, cheap.
    params=["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
    ids=["sf0.001", "sf0.01"],
)
def duck_pair(request):
    """One connection with plain views, one with row-order-scrambled
    views (deterministic: ORDER BY hash(row_number))."""
    plain = duckdb.connect()
    shuffled = duckdb.connect()
    for t in FIXTURE_TABLES:
        src = f"read_parquet('{request.param}/{t}.parquet')"
        plain.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        shuffled.execute(
            f"CREATE VIEW {t} AS SELECT * EXCLUDE (__rn) FROM ("
            f"  SELECT *, row_number() OVER () AS __rn FROM {src}"
            f") ORDER BY hash(__rn)"
        )
    yield plain, shuffled
    plain.close()
    shuffled.close()


def _normalized(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(str(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(rows)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_insensitive_to_input_row_order(name, duck_pair):
    plain, shuffled = duck_pair
    sql = QUERIES[name].oracle
    a = _normalized(plain, sql)
    b = _normalized(shuffled, sql)
    assert a == b, (
        f"{name}: oracle result depends on input row order "
        f"({sum(1 for x, y in zip(a, b) if x != y)} differing sorted rows "
        f"of {len(a)}) -- a LIMIT/top-k without a total ORDER BY, or an "
        f"order-sensitive aggregate (list/string_agg/first) without an "
        f"inner ORDER BY.  Spark scans in a different order than DuckDB, "
        f"so this WILL hash-mismatch at the driver."
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_limit_has_order_by(name):
    """Static companion: any LIMIT in the oracle implies at least one
    ORDER BY somewhere before it (necessary, not sufficient -- the
    empirical test above is the real gate)."""
    sql = QUERIES[name].oracle.upper()
    for m in re.finditer(r"\bLIMIT\s+\d", sql):
        assert "ORDER BY" in sql[: m.start()], (
            f"{name}: LIMIT without a preceding ORDER BY -- the selected "
            f"row set is engine-dependent"
        )
