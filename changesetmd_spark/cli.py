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
    p.add_argument(
        "-s",
        "--store",
        help="store root directory (required for -c/-t/-f/-r)",
    )
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
    p.add_argument(
        "-q",
        "--query",
        help="run a registered analytics query by name (see --list-queries)",
    )
    p.add_argument(
        "--sf-dir",
        default=None,
        help="table directory for -q (default: $SPARK_GRAFT_SF_DIR or "
        "/root/testdata/sf0.1)",
    )
    p.add_argument(
        "--limit", type=int, default=20, help="rows to print for -q"
    )
    p.add_argument(
        "--list-queries",
        action="store_true",
        help="list every registered query name and exit",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)

    if (args.query or args.list_queries) and (
        args.create or args.truncate or args.file or args.replicate
    ):
        parser.error(
            "-q/--list-queries cannot be combined with the store "
            "operations (-c/-t/-f/-r); run them as separate invocations"
        )

    if args.list_queries:
        from . import registry

        for name in registry.queries():
            print(name)
        return 0

    if args.query:
        import os

        from . import registry

        qs = registry.queries()
        if args.query not in qs:
            print(
                f"unknown query {args.query!r}; --list-queries shows all",
                file=sys.stderr,
            )
            return 2
        sf_dir = args.sf_dir or os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        spark = get_spark(app_name="changesetmd-spark-cli")
        qs[args.query](spark, sf_dir).show(args.limit, truncate=False)
        return 0

    if not args.store:
        parser.error("-s/--store is required for -c/-t/-f/-r")
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
