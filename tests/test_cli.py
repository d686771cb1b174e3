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
