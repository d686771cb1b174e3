"""Command-line parity with the reference's changesetmd.py CLI
(ref changesetmd.py:202-263): create/truncate the store, bulk-load a dump,
run incremental replication — argument names kept recognizable so a user of
``python changesetmd.py -d db -c -f dump.osm.bz2`` can switch to
``python -m changesetmd_spark.cli -s /data/store -c -f dump.osm.bz2``.

The ``-d/-u/-p`` Postgres connection flags become ``-s`` (store root path);
``-g`` (geometry column) is unnecessary — bbox algebra works off the
coordinate columns directly (SURVEY §2.2 P8).
"""

from __future__ import annotations

import argparse
import sys
import tempfile

from .session import get_spark
from .sinks.store import ChangesetStore
from .sources.replication import parse_state_yaml, urllib_fetcher


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="changesetmd_spark",
        description="PySpark-native changeset analytics engine",
    )
    p.add_argument("-s", "--store", required=True, help="store root directory")
    p.add_argument(
        "-c", "--create", action="store_true", help="initialize the store (ref -c)"
    )
    p.add_argument(
        "-t", "--truncate", action="store_true", help="drop data + reset state (ref -t)"
    )
    p.add_argument(
        "-f", "--file", help="bulk-load a changeset XML dump (.xml/.gz/.bz2) (ref -f)"
    )
    p.add_argument(
        "-r",
        "--replicate",
        action="store_true",
        help="incremental replication catch-up (ref -r)",
    )
    p.add_argument(
        "--base-url",
        default=None,
        help="replication server base URL (default: planet.openstreetmap.org)",
    )
    p.add_argument(
        "--start-sequence",
        type=int,
        default=0,
        help="watermark recorded after a bulk load",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(app_name="changesetmd-spark-cli")
    store = ChangesetStore(spark, args.store)

    if args.truncate:
        store.truncate()
        print("truncated")
    if args.create:
        store.create()
        print("created")
    if args.file:
        n = store.bulk_load(args.file, start_sequence=args.start_sequence)
        print(f"loaded {n:,} changesets")
    if args.replicate:
        import urllib.request

        from .sources.replication import BASE_REPL_URL

        base = args.base_url or BASE_REPL_URL
        with urllib.request.urlopen(base + "state.yaml") as r:
            server = parse_state_yaml(r.read().decode())
        staging = tempfile.mkdtemp(prefix="changesetmd-repl-")
        applied = store.replicate(
            server.sequence,
            urllib_fetcher(staging, base),
            server_timestamp=server.last_run,
        )
        print(f"applied {applied} diffs; now at sequence {store.state()['last_sequence']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
