"""CLI `query` subcommand: list, CSV head, parquet write."""
import pandas as pd
import pytest

from grandine_ray import cli

SF = "/root/testdata/sf0.001"


def test_query_list(capsys):
    cli.cmd_query([])
    names = capsys.readouterr().out.split()
    assert "stopword_stats" in names and "tile_counts" in names
    assert names == sorted(names)


def test_query_unknown_exits():
    with pytest.raises(SystemExit):
        cli.cmd_query(["definitely_not_a_query"])


def test_query_head_csv(ray_session, capsys):
    cli.cmd_query(["stopword_stats", "-sf-dir", SF])
    out = capsys.readouterr().out
    assert out.splitlines()[0] == "lang,n_docs,n_tokens,n_stop"
    assert len(out.splitlines()) == 6  # header + 5 langs


def test_query_parquet_out(ray_session, tmp_path):
    out = str(tmp_path / "vh")
    cli.cmd_query(["value_histogram", "-sf-dir", SF, "-out", out])
    df = pd.read_parquet(out)
    assert set(df.columns) == {"event_type", "bin", "n"}
    assert df.n.sum() == 1000  # every sf0.001 event lands in one bin
