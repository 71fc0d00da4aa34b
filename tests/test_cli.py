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
