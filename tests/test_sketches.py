"""Unit tests for operators/sketches.py (count-min, Bloom) and
operators/layout.py (Morton code, Z-order write)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from etl_onprem_to_cloud_spark.operators import layout as LY
from etl_onprem_to_cloud_spark.operators import sketches as SK


def _freq_df(spark, pairs):
    # pairs: (key, multiplicity)
    rows = [(k,) for k, m in pairs for _ in range(m)]
    return spark.createDataFrame(rows, "k string")


class TestCountMin:
    def test_estimate_never_underestimates(self, spark):
        pairs = [(f"k{i}", (i % 7) + 1) for i in range(50)]
        df = _freq_df(spark, pairs)
        cells = SK.cms_build(df, F.col("k"), depth=4, width=32)
        keys = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
        est = SK.cms_estimate(keys, cells, F.col("k"), depth=4, width=32)
        rows = est.collect()
        assert len(rows) == 50
        assert all(r["cms_estimate"] >= r["exact"] for r in rows)

    def test_sketch_is_mergeable(self, spark):
        pairs = [(f"k{i}", (i % 5) + 1) for i in range(40)]
        df = _freq_df(spark, pairs)
        half_a = df.filter(F.crc32(F.col("k")) % 2 == 0)
        half_b = df.filter(F.crc32(F.col("k")) % 2 == 1)
        merged = (
            SK.cms_build(half_a, F.col("k"))
            .unionAll(SK.cms_build(half_b, F.col("k")))
            .groupBy("d", "idx")
            .agg(F.sum("cnt").alias("cnt"))
        )
        whole = SK.cms_build(df, F.col("k"))
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_cell_count_bounded(self, spark):
        df = _freq_df(spark, [(f"k{i}", 3) for i in range(200)])
        cells = SK.cms_build(df, F.col("k"), depth=4, width=16)
        assert cells.count() <= 4 * 16


class TestBloom:
    def test_no_false_negatives(self, spark):
        members = spark.createDataFrame([(f"m{i}",) for i in range(100)], "k string")
        bits = SK.bloom_build(members, F.col("k"), num_bits=1 << 10, num_hashes=3)
        kept = members.filter(SK.bloom_might_contain(F.col("k"), bits, 3))
        assert kept.count() == 100

    def test_filters_most_non_members(self, spark):
        members = spark.createDataFrame([(f"m{i}",) for i in range(50)], "k string")
        others = spark.createDataFrame([(f"x{i}",) for i in range(500)], "k string")
        bits = SK.bloom_build(members, F.col("k"), num_bits=1 << 13, num_hashes=3)
        fp = others.filter(SK.bloom_might_contain(F.col("k"), bits, 3)).count()
        # 50 keys in 8192 bits -> fill ~1.8%, fp rate ~(0.018)^3 ~ 1e-5
        assert fp < 10

    def test_semi_join_equals_plain_join(self, spark):
        big = spark.createDataFrame(
            [(i % 30, f"v{i}") for i in range(300)], "bk int, payload string"
        )
        small = spark.createDataFrame([(i, f"s{i}") for i in range(0, 30, 3)], "sk int, name string")
        got = SK.bloom_semi_join(big, small, "bk", "sk").select("bk", "payload", "name")
        want = big.join(small, big["bk"] == small["sk"]).select("bk", "payload", "name")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_rejects_outer_join(self, spark):
        df = spark.createDataFrame([(1,)], "k int")
        with pytest.raises(ValueError, match="inner/left_semi"):
            SK.bloom_semi_join(df, df, "k", "k", how="full")

    def test_rejects_bad_width(self, spark):
        df = spark.createDataFrame([(1,)], "k int")
        with pytest.raises(ValueError, match="multiple"):
            SK.bloom_build(df, F.col("k"), num_bits=100)


def _morton_ref(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


class TestZOrder:
    def test_morton_matches_reference(self, spark):
        cases = [(0, 0), (3, 5), (255, 0), (0, 255), (255, 255), (170, 85)]
        df = spark.createDataFrame(cases, "x int, y int")
        got = df.select(
            "x", "y", LY.morton_code(F.col("x"), F.col("y"), 8).alias("z")
        ).collect()
        for r in got:
            assert r["z"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])

    def test_morton_sql_matches_python_generator(self, spark):
        # the SQL string and the Column generator must never drift
        df = spark.createDataFrame([(i * 7 % 256, i * 13 % 256) for i in range(64)], "x int, y int")
        df.createOrReplaceTempView("mz")
        got = spark.sql(f"SELECT {LY.morton_sql('x', 'y', 8)} AS z FROM mz").collect()
        want = df.select(LY.morton_code(F.col("x"), F.col("y"), 8).alias("z")).collect()
        assert [r["z"] for r in got] == [r["z"] for r in want]

    def test_zorder_write_clusters_both_dims(self, spark, tmp_path):
        # a grid of points; after z-order layout each file's x and y
        # spans must be far below the global span on average
        pts = [(i % 64, (i * 31) % 64, i) for i in range(4096)]
        df = spark.createDataFrame(pts, "px int, py int, rid int")
        out = str(tmp_path / "zorder")
        LY.zorder_write(df, "px", "py", out, num_files=16, bits=6)
        back = spark.read.parquet(out)
        assert back.count() == 4096
        spans = (
            back.withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(
                (F.max("px") - F.min("px")).alias("sx"),
                (F.max("py") - F.min("py")).alias("sy"),
            )
            .agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay"))
            .first()
        )
        assert len(glob.glob(f"{out}/part-*")) > 1
        # global span is 63 in both dims; z-order files must be tighter
        # in BOTH (a single-column sort would leave the other at ~63)
        assert spans["ax"] < 40 and spans["ay"] < 40


def test_stats_manifest_and_pruned_read_skip_files(spark, sf_dir, tmp_path):
    """Data skipping: a Z-ordered layout + per-file min/max manifest
    lets a range read skip most files while returning exactly the
    full-scan filter result."""
    from pyspark.sql import functions as F

    from etl_onprem_to_cloud_spark.operators.layout import (
        pruned_read,
        stats_manifest,
    )
    from etl_onprem_to_cloud_spark.sources.io import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "zev")
    # Range-cluster on the skip column so each file's [min, max] is a
    # tight slice (the single-column layout; zorder_write is the
    # two-column generalization).
    (
        ev.repartitionByRange(8, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.parquet(path)
    )

    manifest = stats_manifest(spark, path, ["user_id"])
    assert manifest.count() >= 2  # multiple files to prune across

    lo, hi = 10, 40
    pruned, files_read, files_total = pruned_read(
        spark, path, "user_id", lo, hi, manifest=manifest
    )
    expected = ev.filter((ev.user_id >= lo) & (ev.user_id <= hi))
    got = sorted(r.event_id for r in pruned.collect())
    want = sorted(r.event_id for r in expected.collect())
    assert got == want and len(got) > 0
    assert files_read < files_total, "range read should skip files"

    # a range outside the data touches zero files
    empty, n_read, _tot = pruned_read(spark, path, "user_id", 10**12, 10**12 + 1)
    assert n_read == 0 and empty.count() == 0
