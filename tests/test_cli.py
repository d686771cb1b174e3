"""CLI parity smoke (ref changesetmd.py:202-263): create → bulk load →
query the store, all through the argparse entry point."""

from __future__ import annotations

import os

from changesetmd_spark.cli import main
from tests.test_ingest import FIXTURE


def test_cli_create_load(spark, tmp_path, capsys):
    store_dir = str(tmp_path / "store")
    assert main(["-s", store_dir, "-c", "-f", FIXTURE]) == 0
    out = capsys.readouterr().out
    assert "created" in out and "loaded 4" in out
    assert os.path.exists(os.path.join(store_dir, "changesets"))

    assert main(["-s", store_dir, "-t"]) == 0
    assert not os.path.exists(os.path.join(store_dir, "changesets"))


def test_cli_query_runner(spark, capsys):
    """-q runs any registered query against --sf-dir; --list-queries
    enumerates the driver-contract surface (user-facing parity: the whole
    queries() registry is reachable from the shell, not just Python)."""
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    assert main(["--list-queries"]) == 0
    names = capsys.readouterr().out.split()
    assert "q_distinct_counts" in names and len(names) >= 100
    assert main(["-q", "q_distinct_counts", "--sf-dir", sf]) == 0
    out = capsys.readouterr().out
    assert "event_type" in out or "n" in out  # show() table rendered
    assert main(["-q", "no_such_query"]) == 2
    # -q combined with store operations must error loudly, not silently
    # skip the store work (code-review r7)
    import pytest

    with pytest.raises(SystemExit):
        main(["-s", "/tmp/nowhere", "-c", "-q", "q_distinct_counts"])
