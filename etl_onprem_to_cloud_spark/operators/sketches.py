"""Mergeable frequency/membership sketches: count-min and Bloom.

Two sketch families the HLL rollup (queries/relational2.py
q_hll_sketch_rollup) doesn't cover:

1. **Count-min sketch** -- a d x w counter matrix answering "how often
   does key x occur?" with one-sided error (estimate >= truth, over by
   at most ~N/w with high probability).  Built with ONE shuffle that
   reduces the input to at most d*w cells, the sketch is mergeable
   (cell-wise sum), so a 100 TB pipeline persists per-partition/day
   sketches and unions them without re-reading base data -- the same
   incremental pattern as the HLL rollup, but for frequencies (heavy
   hitters, frequency capping) instead of distinct counts.

2. **Bloom filter semi-join reduction** -- the runtime-filter pattern:
   build a compact bitset of the small side's join keys, broadcast it,
   and drop big-side rows that cannot match BEFORE the shuffle join.
   False positives are removed by the join itself, so the final result
   is exactly the plain join (which is what the DuckDB oracle checks);
   the filter only cuts shuffled bytes.  Spark's own runtime row-level
   filtering does this JVM-side when it can; this operator makes the
   pattern explicit and tunable (spark.sql's ``bloom_filter_agg`` /
   ``might_contain`` are not exposed as public functions in PySpark).

All hashing is md5-based (no seeded RNG), so every number either sketch
produces is bit-reproducible in any engine with md5 -- the count-min
estimates themselves are DuckDB-oracle-checkable, not just bounded.

Reference parity note: the reference delegates all aggregation to
Athena (README.md:184-199) and has no sketch surface; this module is
part of the Ring C / 100 TB extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bit_mask(pos: Column) -> Column:
    """``1L << pos`` with a *column* shift amount (the Python
    ``F.shiftleft`` wrapper only takes a literal int)."""
    return F.call_function("shiftleft", F.lit(1).cast("bigint"), pos.cast("int"))


def _h60(col: Column) -> Column:
    """60-bit non-negative integer view of md5(col) (same idiom as
    llm/dedup.py: 15 hex chars < 2^60, so never negative).

    DuckDB twin: ``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast(
        "bigint"
    )


def _cell_idx(key: Column, depth: int, width: int) -> Column:
    """Row ``depth``'s counter index for ``key``: md5(depth|key) % width."""
    return _h60(F.concat_ws("|", F.lit(str(depth)), key)) % width


def cms_build(
    df: DataFrame, key: Column, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build a count-min sketch: DataFrame of (d, idx, cnt) cells.

    Each input row increments one counter per hash row; the groupBy
    reduces everything to <= depth*width cells with map-side partial
    aggregation, so the shuffle carries at most depth*width rows per
    task regardless of input size.  Merging two sketches is
    ``union.groupBy(d, idx).sum(cnt)`` -- associative and commutative.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell_idx(key, d, width).alias("idx"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy("c.d", "c.idx").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    keys_df: DataFrame,
    cells: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 256,
    estimate_col: str = "cms_estimate",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys_df``.

    The estimate is min over hash rows of the addressed counter --
    always >= the true count.  ``cells`` is tiny (<= depth*width rows)
    and is broadcast, so this adds no shuffle to ``keys_df``.

    Contract: output has exactly one row per INPUT ROW of ``keys_df``
    (duplicates preserved via an internal row id, so a caller never
    silently loses rows); ``keys_df`` may use any column names EXCEPT
    the ``__cms_``-prefixed internals reserved here -- the sketch's
    (d, idx, cnt) columns are renamed to ``__cms_*`` before the join so
    a keys_df that itself has d/idx/cnt columns stays unambiguous.
    """
    reserved = {"__cms_row", "__cms_probe", "__cms_d", "__cms_idx", "__cms_cnt"}
    clash = reserved.intersection(keys_df.columns)
    if clash:
        raise ValueError(f"keys_df uses reserved column names: {sorted(clash)}")
    sk = cells.select(
        F.col("d").alias("__cms_d"),
        F.col("idx").alias("__cms_idx"),
        F.col("cnt").alias("__cms_cnt"),
    )
    probes = keys_df.withColumn(
        "__cms_row", F.monotonically_increasing_id()
    ).withColumn(
        "__cms_probe",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell_idx(key, d, width).alias("idx"),
                    )
                    for d in range(depth)
                ]
            )
        ),
    )
    joined = probes.join(
        F.broadcast(sk),
        (probes["__cms_probe.d"] == sk["__cms_d"])
        & (probes["__cms_probe.idx"] == sk["__cms_idx"]),
        "left",
    )
    group_cols = [c for c in keys_df.columns]
    return (
        joined.groupBy("__cms_row", *group_cols)
        # a missing cell means no key ever hashed there -> count 0
        .agg(F.min(F.coalesce(F.col("__cms_cnt"), F.lit(0))).alias(estimate_col))
        .drop("__cms_row")
    )


# --- Bloom filter ----------------------------------------------------------

_WORD_BITS = 64


def bloom_build(
    df: DataFrame, key: Column, num_bits: int = 1 << 13, num_hashes: int = 3
) -> list[int]:
    """Aggregate the distinct hash bits of ``key`` into a dense bitset.

    Per key, ``num_hashes`` md5-derived positions are set; per-partition
    partial ``bit_or`` aggregation reduces the shuffle to at most
    ``num_bits/64`` (word, bits) rows, which are collected and densified
    driver-side -- the one bounded collect IS the broadcast step (128
    longs at the default size), mirroring how Spark ships its own
    runtime filters to executors.
    """
    if num_bits % _WORD_BITS:
        raise ValueError(f"num_bits must be a multiple of {_WORD_BITS}")
    pos = [
        _h60(F.concat_ws("|", F.lit(f"bloom{i}"), key)) % num_bits
        for i in range(num_hashes)
    ]
    words = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.floor(p / _WORD_BITS).cast("int").alias("word"),
                            _bit_mask(p % _WORD_BITS).alias("mask"),
                        )
                        for p in pos
                    ]
                )
            ).alias("b")
        )
        .groupBy("b.word")
        .agg(F.bit_or("b.mask").alias("bits"))
        .collect()
    )
    dense = [0] * (num_bits // _WORD_BITS)
    for row in words:
        dense[row["word"]] = row["bits"]
    return dense


def bloom_might_contain(
    key: Column, bitset: list[int], num_hashes: int = 3
) -> Column:
    """Membership test column: true iff every hash position's bit is set.

    The bitset is embedded as an array literal (128 longs by default),
    evaluated inside whole-stage codegen -- no Python, no shuffle, and
    the predicate sits directly on the scan so the join's shuffle only
    sees surviving rows.
    """
    num_bits = len(bitset) * _WORD_BITS
    arr = F.array(*[F.lit(w).cast("bigint") for w in bitset])
    cond = F.lit(True)
    for i in range(num_hashes):
        p = _h60(F.concat_ws("|", F.lit(f"bloom{i}"), key)) % num_bits
        mask = _bit_mask(p % _WORD_BITS)
        word = F.element_at(arr, F.floor(p / _WORD_BITS).cast("int") + 1)
        cond = cond & (word.bitwiseAND(mask) == mask)
    return cond


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_bits: int = 1 << 13,
    num_hashes: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` with a Bloom pre-filter on the big side.

    Exactly equivalent to ``big.join(small, on, how)`` for inner/semi
    joins (false positives die in the join); the filter exists purely to
    shrink the shuffled big side.  Only inner and left_semi are allowed:
    an outer join would need the dropped rows back.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom_semi_join supports inner/left_semi, got {how!r}")
    bitset = bloom_build(small, F.col(small_key).cast("string"), num_bits, num_hashes)
    pruned = big.filter(
        bloom_might_contain(F.col(big_key).cast("string"), bitset, num_hashes)
    )
    return pruned.join(small, pruned[big_key] == small[small_key], how)
