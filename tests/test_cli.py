"""CLI surface (`python -m etl_onprem_to_cloud_spark`): list/run."""

from __future__ import annotations

from etl_onprem_to_cloud_spark.__main__ import main


def test_list_prints_registry(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out
    assert "[oracle]" in out


def test_list_tag_filter(capsys):
    assert main(["list", "--tag", "dedup"]) == 0
    out = capsys.readouterr().out
    assert "q_dedup_minhash_lsh" in out
    assert "q01_pricing_summary" not in out


def test_run_unknown_query_exits_2(capsys):
    assert main(["run", "no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_run_executes_and_keeps_shared_session(spark, sf_dir, capsys):
    # `spark` is the suite's shared session: main() must reuse it via
    # getOrCreate AND must not stop it on exit.
    assert main(["run", "q01_pricing_summary", "--sf-dir", sf_dir,
                 "--limit", "3", "--explain"]) == 0
    out = capsys.readouterr().out
    assert "l_returnflag" in out
    # still alive for the rest of the suite
    assert spark.range(1).count() == 1


def test_curate_writes_corpus_and_manifest(spark, sf_dir, tmp_path, capsys):
    out_dir = str(tmp_path / "cur")
    assert main(["curate", "--sf-dir", sf_dir, "--out", out_dir]) == 0
    printed = capsys.readouterr().out
    assert "kept" in printed
    back = spark.read.parquet(f"{out_dir}/corpus")
    assert back.count() > 0 and "split" in back.columns
    assert spark.read.parquet(f"{out_dir}/manifest").count() > 0
    assert spark.range(1).count() == 1  # shared session survives
