"""Replication + upsert tests (SURVEY.md §5.3): sequence-path arithmetic,
state.yaml parsing, catch-up planning, and the T4 idempotence / T5
open→closed lifecycle properties of the upsert sink."""

from __future__ import annotations

import gzip

import pytest

from changesetmd_spark.sinks import ChangesetStore, latest_per_key
from changesetmd_spark.sources.replication import (
    BASE_REPL_URL,
    parse_state_yaml,
    plan_catchup,
    replication_url,
    sequence_path,
)

# ---------------------------------------------------------------------------
# pure functions
# ---------------------------------------------------------------------------


def test_sequence_path_arithmetic():
    # same div/mod/zero-pad as ref changesetmd.py:128-131
    assert sequence_path(0) == "000/000/000.osm.gz"
    assert sequence_path(1) == "000/000/001.osm.gz"
    assert sequence_path(1_234) == "000/001/234.osm.gz"
    assert sequence_path(2_345_678) == "002/345/678.osm.gz"
    assert sequence_path(999_999_999) == "999/999/999.osm.gz"
    assert replication_url(42) == BASE_REPL_URL + "000/000/042.osm.gz"
    with pytest.raises(ValueError):
        sequence_path(-1)


def test_parse_state_yaml():
    st = parse_state_yaml("---\nlast_run: 2024-05-01 12:34:56.789 +00:00\nsequence: 6103451\n")
    assert st.sequence == 6103451
    assert st.last_run == "2024-05-01 12:34:56.789 +00:00"
    with pytest.raises(ValueError):
        parse_state_yaml("nonsense")


def test_plan_catchup():
    assert list(plan_catchup(10, 13)) == [11, 12, 13]
    assert list(plan_catchup(13, 13)) == []
    with pytest.raises(ValueError):  # uninitialized watermark, ref :156-158
        plan_catchup(-1, 5)


# ---------------------------------------------------------------------------
# end-to-end store lifecycle over local fixture diffs
# ---------------------------------------------------------------------------


def _diff_xml(changesets: list[str]) -> bytes:
    body = "\n".join(changesets)
    return f'<?xml version="1.0" encoding="UTF-8"?>\n<osm>\n{body}\n</osm>\n'.encode()


def _cs(cid: int, open_: bool, num_changes: int, user: str = "u") -> str:
    closed = '' if open_ else f'closed_at="2024-05-01T0{cid % 10}:30:00Z" '
    return (
        f'<changeset id="{cid}" created_at="2024-05-01T0{cid % 10}:00:00Z" {closed}'
        f'open="{str(open_).lower()}" user="{user}" uid="1" num_changes="{num_changes}"/>'
    )


@pytest.fixture()
def fixture_fetcher(tmp_path):
    """Local stand-in for the HTTP fetcher: sequence → .osm.gz on disk.

    seq 101: changeset 7 opens (1 change), changeset 8 closed.
    seq 102: changeset 7 closes (5 changes) — same id reappears (T5).
    seq 103: changeset 9 closed.
    """
    diffs = {
        101: _diff_xml([_cs(7, True, 1), _cs(8, False, 2)]),
        102: _diff_xml([_cs(7, False, 5)]),
        103: _diff_xml([_cs(9, False, 3, user="v")]),
    }

    def fetch(seq: int) -> str:
        p = tmp_path / f"{seq}.osm.gz"
        if not p.exists():
            p.write_bytes(gzip.compress(diffs[seq]))
        return str(p)

    return fetch


def _state_rows(store):
    return sorted(
        (r.id, r.open, r.num_changes, r.sequence)
        for r in store.changesets().collect()
    )


def test_replication_lifecycle_and_idempotence(spark, tmp_path, fixture_fetcher):
    store = ChangesetStore(spark, str(tmp_path / "store"))
    store.create()
    assert store.state() == {"last_sequence": -1, "last_timestamp": None}

    # bootstrapping from an uninitialized watermark must refuse (ref :156-158)
    with pytest.raises(ValueError):
        store.replicate(103, fixture_fetcher)

    store._write_state(100, None)  # bootstrap watermark
    applied = store.replicate(103, fixture_fetcher, server_timestamp="2024-05-01T04:00:00Z")
    assert applied == 3
    assert store.state()["last_sequence"] == 103

    rows = _state_rows(store)
    # changeset 7 evolved open→closed across diffs: latest (seq 102) wins
    assert rows == [
        (7, False, 5, 102),
        (8, False, 2, 101),
        (9, False, 3, 103),
    ]

    # T4 idempotence: replaying the same diffs bit-identically preserves state
    store._write_state(100, None)
    assert store.replicate(103, fixture_fetcher) == 3
    assert _state_rows(store) == rows

    # replaying only a STALE diff must also be safe (ref README.md:59) —
    # note the reference (and we) apply it last-write-wins by arrival, so
    # replay of seq 101 alone resurrects the open version of 7; applying
    # 102 again converges.  This matches reference semantics exactly:
    # delete+insert per id with no sequence comparison.
    store._write_state(101, None)
    store.replicate(103, fixture_fetcher)
    assert _state_rows(store) == rows


def test_latest_per_key_window(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 12, "b"), (2, 11, "c")], "id long, sequence long, v string"
    )
    got = sorted((r.id, r.sequence, r.v) for r in latest_per_key(df).collect())
    assert got == [(1, 12, "b"), (2, 11, "c")]


def test_latest_per_key_tiebreak_deterministic(spark):
    """An id appearing twice within ONE diff (same sequence) must resolve
    deterministically to the more evolved row — the reference's sequential
    delete+insert keeps the later (closed) occurrence."""
    import datetime as dt

    rows = [
        (7, 101, None, 1),                                   # open version
        (7, 101, dt.datetime(2024, 5, 1, 1, 30), 5),         # closed version
    ]
    df = spark.createDataFrame(
        rows, "id long, sequence long, closed_at timestamp_ntz, num_changes int"
    )
    for _ in range(3):  # stable across repeated evaluation
        got = latest_per_key(df).collect()
        assert len(got) == 1
        assert got[0].num_changes == 5 and got[0].closed_at is not None


def test_bulk_load_then_replicate_prunes_partitions(
    spark, tmp_path, fixture_fetcher
):
    """The reference's core workflow (-f bulk load, then -r replication,
    ref §3.1→§3.2) as one flow: the MERGE must accept the partitioned layout
    bulk_load wrote (round-1 bug: AnalysisException on the created_date
    column), keep the table partitioned, and rewrite ONLY partitions touched
    by the batch — the bulk-loaded 2014 partition's files stay byte-identical
    (the delete+insert touches only affected rows, ref changesetmd.py:71-76).
    """
    import os

    from tests.test_ingest import FIXTURE

    store = ChangesetStore(spark, str(tmp_path / "store"))
    store.create()
    assert store.bulk_load(FIXTURE, start_sequence=100) == 4

    def part_files(name):
        d = os.path.join(store.table_dir, name)
        return {
            f: (os.stat(os.path.join(d, f)).st_mtime_ns, os.stat(os.path.join(d, f)).st_ino)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        }

    before = part_files("created_date=2014-03-01")
    assert before, "bulk load must produce the 2014 partition"

    # diffs are all dated 2024-05-01 → only that partition may be (re)written
    assert store.replicate(103, fixture_fetcher) == 3
    assert part_files("created_date=2014-03-01") == before

    parts = sorted(
        d for d in os.listdir(store.table_dir) if d.startswith("created_date=")
    )
    assert parts == ["created_date=2014-03-01", "created_date=2024-05-01"]

    rows = _state_rows(store)
    assert [r[0] for r in rows if r[0] in (7, 8, 9)] == [7, 8, 9]
    assert len(rows) == 7  # 4 bulk + 3 replicated

    # MERGE an update to an EXISTING 2024 key: 2014 partition still untouched
    assert store.state()["last_sequence"] == 103
    store._write_state(101, None)
    store.replicate(102, fixture_fetcher)
    assert part_files("created_date=2014-03-01") == before
    assert len(_state_rows(store)) == 7


def test_bulk_load_partitioned_by_date(spark, tmp_path):
    import os

    from tests.test_ingest import FIXTURE

    store = ChangesetStore(spark, str(tmp_path / "store"))
    store.create()
    n = store.bulk_load(FIXTURE, start_sequence=0)
    assert n == 4
    # physical layout: partitioned by created_date (SURVEY §4.2 created_idx replacement)
    parts = [d for d in os.listdir(store.table_dir) if d.startswith("created_date=")]
    assert parts == ["created_date=2014-03-01"]
    assert store.state()["last_sequence"] == 0


# ---------------------------------------------------------------------------
# concurrency guard + crash recovery (ref changesetmd.py:140-143 lock parity)
# ---------------------------------------------------------------------------


def _mini_batch(spark, ids, seq=100, day=1):
    import datetime as dt

    rows = [(i, seq, dt.datetime(2024, 5, day, 12, 0), f"v{seq}") for i in ids]
    return spark.createDataFrame(
        rows, "id long, sequence long, created_at timestamp_ntz, v string"
    )


def _table_rows(spark, path):
    df = spark.read.parquet(path)
    return sorted((r.id, r.sequence, r.v) for r in df.collect())


def test_concurrent_upsert_fails_fast(spark, tmp_path):
    """A second upsert against a locked target must bail immediately, like
    the reference's NOWAIT exclusive lock (ref changesetmd.py:140-143)."""
    import os

    import pytest

    from changesetmd_spark.sinks import ConcurrentUpsertError, upsert_parquet
    from changesetmd_spark.sinks.upsert import _lock_path

    target = str(tmp_path / "tbl")
    upsert_parquet(spark, target, _mini_batch(spark, [1, 2]))

    # simulate a live concurrent holder: our own (alive) pid in the lock
    lock = _lock_path(target)
    with open(lock, "w") as fh:
        fh.write(str(os.getpid()))
    with pytest.raises(ConcurrentUpsertError):
        upsert_parquet(spark, target, _mini_batch(spark, [3], seq=101))
    os.unlink(lock)

    # a stale lock (dead pid) is stolen and the upsert proceeds
    with open(lock, "w") as fh:
        fh.write("999999999")
    upsert_parquet(spark, target, _mini_batch(spark, [3], seq=101))
    assert not os.path.exists(lock)
    assert [i for i, _, _ in _table_rows(spark, target)] == [1, 2, 3]


def test_recovery_restores_partition_moved_to_backup(spark, tmp_path):
    """Crash window: a partition was moved out to the sibling .bak- root but
    its replacement never landed.  The next upsert must restore it — no rows
    lost — before applying its own batch."""
    import os

    from changesetmd_spark.sinks import upsert_parquet

    target = str(tmp_path / "tbl")
    upsert_parquet(spark, target, _mini_batch(spark, [1, 2], day=1))
    upsert_parquet(spark, target, _mini_batch(spark, [10], day=2))

    # simulate the crash: day-2 partition sits in a .bak- root, gone from table
    bak = target + ".bak-deadbeef"
    os.makedirs(bak)
    os.rename(
        os.path.join(target, "created_date=2024-05-02"),
        os.path.join(bak, "created_date=2024-05-02"),
    )
    # plus an orphan staging dir from the dead run
    os.makedirs(target + ".staging-deadbeef")

    upsert_parquet(spark, target, _mini_batch(spark, [1], seq=105, day=1))
    rows = _table_rows(spark, target)
    assert rows == [(1, 105, "v105"), (2, 100, "v100"), (10, 100, "v100")]
    assert not os.path.exists(bak)
    assert not os.path.exists(target + ".staging-deadbeef")


def test_recovery_restores_whole_table_from_old_sibling(spark, tmp_path):
    """Crash window in the whole-dir swap: target renamed away, staging never
    moved in.  The next upsert must rename the .old- backup back instead of
    treating the table as empty (which would silently drop all history)."""
    import os

    from changesetmd_spark.sinks import upsert_parquet

    target = str(tmp_path / "tbl")
    upsert_parquet(spark, target, _mini_batch(spark, [1, 2]))
    os.rename(target, target + ".old-deadbeef")

    upsert_parquet(spark, target, _mini_batch(spark, [3], seq=101))
    assert [i for i, _, _ in _table_rows(spark, target)] == [1, 2, 3]
    assert not os.path.exists(target + ".old-deadbeef")


def test_recovery_sweeps_legacy_backup_inside_target(spark, tmp_path):
    """Pre-round-3 layout staged '<partition>.old-<uuid>' INSIDE target_dir;
    leftovers must be restored (partition missing) or dropped (present), so
    partition discovery never parses them as data."""
    import os

    from changesetmd_spark.sinks import upsert_parquet

    target = str(tmp_path / "tbl")
    upsert_parquet(spark, target, _mini_batch(spark, [1], day=1))
    upsert_parquet(spark, target, _mini_batch(spark, [10], day=2))

    p1 = os.path.join(target, "created_date=2024-05-01")
    p2 = os.path.join(target, "created_date=2024-05-02")
    os.rename(p2, p2 + ".old-feedface")          # partition missing → restore
    os.makedirs(p1 + ".old-feedface")            # partition present → drop

    upsert_parquet(spark, target, _mini_batch(spark, [2], seq=101, day=1))
    rows = _table_rows(spark, target)
    assert rows == [(1, 100, "v100"), (2, 101, "v101"), (10, 100, "v100")]
    assert not any(".old-" in d for d in os.listdir(target))


def test_replication_over_http_fixture_server(spark, tmp_path):
    """S3/S4 end-to-end through a REAL HTTP hop: a stdlib http.server serves
    state.yaml plus three .osm.gz diffs in the production NNN/NNN/NNN layout;
    the production urllib_fetcher downloads them and ChangesetStore.replicate
    applies the catch-up — watermark advance + idempotent re-run included.
    (The live planet.openstreetmap.org endpoint is unreachable from the
    sandbox; this proves the same code path against a local origin.)"""
    import functools
    import gzip as _gzip
    import http.server
    import threading
    import urllib.request

    from changesetmd_spark.sources.replication import (
        parse_state_yaml as _parse,
        sequence_path as _seq_path,
        urllib_fetcher,
    )

    diffs = {
        101: _diff_xml([_cs(7, True, 1), _cs(8, False, 2)]),
        102: _diff_xml([_cs(7, False, 5)]),
        103: _diff_xml([_cs(9, False, 3, user="v")]),
    }
    docroot = tmp_path / "www"
    for seq, payload in diffs.items():
        p = docroot / _seq_path(seq)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(_gzip.compress(payload))
    (docroot / "state.yaml").write_text(
        "---\nlast_run: 2024-05-01 04:00:00.000000 +00:00\nsequence: 103\n"
    )

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(docroot)
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}/"
        # S4: remote state discovery over HTTP
        with urllib.request.urlopen(base + "state.yaml") as resp:
            state = _parse(resp.read().decode())
        assert state.sequence == 103

        staging = tmp_path / "staging"
        staging.mkdir()
        fetch = urllib_fetcher(str(staging), base_url=base)
        store = ChangesetStore(spark, str(tmp_path / "store"))
        store.create()
        store._write_state(100, None)
        applied = store.replicate(
            state.sequence, fetch, server_timestamp=state.last_run
        )
        assert applied == 3
        assert store.state()["last_sequence"] == 103
        rows = _state_rows(store)
        assert rows == [(7, False, 5, 102), (8, False, 2, 101), (9, False, 3, 103)]

        # T4 idempotence over the same HTTP origin (staged files reused,
        # but the fetcher path is exercised for presence-checking again)
        store._write_state(100, None)
        assert store.replicate(103, fetch) == 3
        assert _state_rows(store) == rows
    finally:
        srv.shutdown()


def test_long_poll_daemon_lifecycle(spark, tmp_path, fixture_fetcher):
    """Long-poll daemon (VERDICT r11 #8): server advances, pauses (caught-up
    cycles), throws transient faults (bounded backoff retries), then
    advances again — the watermark advances exactly once per sequence and
    every diff is fetched exactly once across the whole lifetime."""
    from changesetmd_spark.sinks.store import ChangesetStore
    from changesetmd_spark.sources.replication import (
        ServerState,
        long_poll_replication,
    )

    store = ChangesetStore(spark, str(tmp_path / "poll_store"))
    store.create()
    store._write_state(100, None)

    fetch_counts: dict[int, int] = {}

    def counting_fetcher(seq: int) -> str:
        fetch_counts[seq] = fetch_counts.get(seq, 0) + 1
        return fixture_fetcher(seq)

    # per-cycle server behavior: int = head sequence, "err" = transient fault
    phases = iter([102, 102, "err", "err", 103])

    def state_reader() -> ServerState:
        p = next(phases)
        if p == "err":
            raise ConnectionError("simulated upstream pause")
        return ServerState(sequence=p, last_run="2024-05-01T04:00:00Z")

    sleeps: list[float] = []
    stats = long_poll_replication(
        store,
        state_reader,
        counting_fetcher,
        poll_interval=60.0,
        backoff_base=1.0,
        backoff_cap=16.0,
        sleep_fn=sleeps.append,
        stop_after_cycles=3,
    )

    # cycle 1: catch up 101-102; cycle 2: caught up (server paused at 102);
    # cycle 3: two transient faults retried with exponential backoff, then
    # catch up 103
    assert stats == {
        "cycles": 3,
        "applied": 3,
        "caught_up_cycles": 1,
        "retries": 2,
    }
    assert store.state()["last_sequence"] == 103
    # exactly-once per sequence across the whole daemon lifetime
    assert fetch_counts == {101: 1, 102: 1, 103: 1}
    # sleep trace: poll sleeps between cycles (60) and the in-cycle
    # exponential backoff for the two faults (1, then 2)
    assert sleeps == [60.0, 60.0, 1.0, 2.0]

    # a retry budget exhausted by a dead upstream must raise, not spin
    import pytest as _pytest

    def dead_reader() -> ServerState:
        raise ConnectionError("down")

    with _pytest.raises(ConnectionError):
        long_poll_replication(
            store,
            dead_reader,
            counting_fetcher,
            max_retries=2,
            sleep_fn=sleeps.append,
            stop_after_cycles=1,
        )
