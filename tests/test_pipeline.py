"""End-to-end pipeline test: CSV in -> clean Parquet + CSV out -> report,
including the latest-file extract semantics (reference etl/extract.py:10-17)
and partitioned output the reference lacks."""

from __future__ import annotations

import csv
import os
import re

import pytest

from etl_onprem_to_cloud_spark.pipeline import run_netflix_pipeline

HEADER = [
    "show_id", "type", "title", "director", "cast", "country", "date_added",
    "release_year", "rating", "duration", "listed_in", "description",
]

OLD_ROWS = [
    ["old1", "TV Show", "Old Show", "", "", "France", "", "2001", "TV-G",
     "1 Season", "Drama", "stale file, must be ignored"],
]

NEW_ROWS = [
    ["n1", "TV Show", "Comma, Title", "", "", "Spain", "", "2020", "TV-MA",
     "1 Season", "Crime TV Shows", "desc with, comma"],
    ["n2", "TV Show", "Brit", "", "", "Scotland", "", "2019x", "TV-G",
     "1 Season", "Kids' TV", "x"],
    ["n3", "Movie", "Skip Me", "", "", "Spain", "", "2018", "PG", "90 min",
     "Drama", "x"],
    ["n4", "TV Show", "No Country", "", "", "Brazil", "", "2017", "R",
     "1 Season", "Reality TV", "x"],
]


def _write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(rows)


@pytest.fixture()
def input_dir(tmp_path):
    d = tmp_path / "input"
    d.mkdir()
    _write_csv(d / "netflix_2001.csv", OLD_ROWS)
    _write_csv(d / "netflix_2020.csv", NEW_ROWS)
    (d / "notes.txt").write_text("not a csv")
    return str(d)


def test_pipeline_end_to_end(spark, input_dir, tmp_path):
    pq = str(tmp_path / "out_parquet")
    cs = str(tmp_path / "out_csv")
    res = run_netflix_pipeline(
        spark, input_dir, parquet_out=pq, csv_out=cs, partition_by=["country"]
    )

    # extract: lexicographic-latest csv wins, txt ignored
    assert res.input_path.endswith("netflix_2020.csv")
    assert res.rows_in == 4
    assert res.rows_out == 2  # n3 is a Movie, n4 non-EU

    out = {r["show_id"]: r.asDict() for r in res.clean.collect()}
    assert out["n1"]["title"] == "Comma - Title"
    assert out["n2"]["country"] == "United Kingdom"
    assert out["n2"]["release_year"] == 2019

    # parquet sink is hive-partitioned by country
    dirs = {d for d in os.listdir(pq) if d.startswith("country=")}
    assert dirs == {"country=Spain", "country=United Kingdom"}
    assert spark.read.parquet(pq).count() == 2

    # CSV sink round-trips embedded commas via quoting (the reference
    # mangled titles instead, etl/transform.py:176-177)
    back = spark.read.option("header", "true").csv(cs)
    assert back.count() == 2
    assert {r["show_id"] for r in back.collect()} == {"n1", "n2"}

    # report aggregation matches clean rows
    rep = {(r["genre_group"], r["country"]): r["n_titles"] for r in res.report.collect()}
    assert rep[("Crime", "Spain")] == 1
    assert rep[("Kids", "United Kingdom")] == 1


def test_pipeline_empty_dir(spark, tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        run_netflix_pipeline(spark, str(empty))


def test_curation_pipeline_writes_partitioned_corpus(spark, sf_dir, tmp_path):
    """Operational facade: the curated corpus lands as split-partitioned
    parquet (readers partition-prune to their fold), the manifest
    matches the oracle-checked q_training_data_pipeline rollup, and the
    written rows reconcile with the returned counts."""
    from etl_onprem_to_cloud_spark.llm.curate import run_curation_pipeline
    from etl_onprem_to_cloud_spark.queries import QUERIES
    from etl_onprem_to_cloud_spark.sources.io import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    corpus_out = str(tmp_path / "corpus")
    manifest_out = str(tmp_path / "manifest")
    res = run_curation_pipeline(docs, corpus_out, manifest_out)
    assert res.rows_in == docs.count()
    assert 0 < res.rows_kept <= res.rows_in

    back = spark.read.parquet(corpus_out)
    assert back.count() == res.rows_kept
    assert set(r["split"] for r in back.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }
    # partition pruning: the corpus must be laid out as split=... dirs
    # (the physical precondition for pruning) AND a split filter's
    # executed plan must carry the partition filter -- no count-based
    # escape hatch, so dropping partitionBy("split") fails this test.
    assert (tmp_path / "corpus" / "split=train").exists()
    pruned = back.filter(back["split"] == "train")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # renders as `PartitionFilters: [isnotnull(split#N), (split#N = train)]`
    assert re.search(r"PartitionFilters: \[[^\]]*= train", plan), plan

    # manifest == the driver-green query rollup, value for value
    want = sorted(
        tuple(r)
        for r in QUERIES["q_training_data_pipeline"].fn(spark, sf_dir).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(manifest_out).collect())
    assert got == want
