"""Changeset replication source (SURVEY.md §2.1 S3-S4, §2.8 F2, §3.2).

The reference's minutely-replication client (ref changesetmd.py:127-195)
computes a 3-level path from a sequence number, HTTP-fetches
``NNN/NNN/NNN.osm.gz`` from planet.openstreetmap.org, and applies each file
transactionally.  Here the *path arithmetic and catch-up planning* are pure
driver-side functions (deliberately tiny and network-free, so they are fully
testable offline); the fetch itself is an injectable callable so tests — and
air-gapped runs — substitute local fixture files.

The fetched batch is then read as ONE distributed DataFrame
(:func:`read_replication_batch`) and applied with the idempotent
last-write-wins upsert in ``changesetmd_spark.sinks.upsert`` — the Spark
shape of the reference's per-sequence delete+insert loop (ref
changesetmd.py:179-186; idempotence contract ref README.md:59).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .xml_source import normalize_changesets, read_changeset_xml

# ref changesetmd.py:29
BASE_REPL_URL = "https://planet.openstreetmap.org/replication/changesets/"


def sequence_path(sequence_number: int) -> str:
    """F2: sequence → ``NNN/NNN/NNN.osm.gz`` relative path.

    Same integer div/mod + zero-pad-to-3 arithmetic as
    ref changesetmd.py:128-131 (``seq/10^6``, ``(seq/10^3)%1000``,
    ``seq%1000``)."""
    if sequence_number < 0:
        raise ValueError(f"negative sequence {sequence_number}")
    top = sequence_number // 1_000_000
    sub = (sequence_number // 1_000) % 1_000
    file_n = sequence_number % 1_000
    return f"{top:03d}/{sub:03d}/{file_n:03d}.osm.gz"


def replication_url(sequence_number: int, base_url: str = BASE_REPL_URL) -> str:
    return base_url + sequence_path(sequence_number)


@dataclass(frozen=True)
class ServerState:
    """Parsed ``state.yaml`` head-of-stream marker (ref changesetmd.py:167-171)."""

    sequence: int
    last_run: str | None


def parse_state_yaml(text: str) -> ServerState:
    """S4: parse the replication server's ``state.yaml``.

    The file is two flat ``key: value`` lines (``sequence``, ``last_run``);
    parsed with a regex rather than a YAML library so the engine has zero
    optional dependencies (the reference imports yaml at ref
    changesetmd.py:16-21 behind the same kind of guard)."""
    m = re.search(r"^sequence:\s*(\d+)\s*$", text, re.MULTILINE)
    if not m:
        raise ValueError(f"no 'sequence:' line in state.yaml: {text!r}")
    run = re.search(r"^last_run:\s*(.+?)\s*$", text, re.MULTILINE)
    return ServerState(sequence=int(m.group(1)), last_run=run.group(1) if run else None)


def plan_catchup(last_local_sequence: int, server_sequence: int) -> range:
    """T1: the catch-up range ``(last_local, server]`` — the loop bounds of
    ref changesetmd.py:179-186.  Empty when already caught up; refuses to run
    from an uninitialized watermark exactly like ref changesetmd.py:156-158."""
    if last_local_sequence < 0:
        raise ValueError(
            "replication watermark uninitialized; bootstrap with a bulk load "
            "and an explicit starting sequence first"
        )
    return range(last_local_sequence + 1, server_sequence + 1)


# Fetcher signature: sequence -> local file path containing that diff
# (already .osm.gz; Spark's codec layer gunzips on read).
Fetcher = Callable[[int], str]


def urllib_fetcher(staging_dir: str, base_url: str = BASE_REPL_URL) -> Fetcher:
    """Production fetcher: HTTP GET each diff into ``staging_dir``.

    Network use is isolated here; everything downstream works on local paths
    so tests substitute a fixture-writing fetcher."""
    import os
    import urllib.request

    def fetch(seq: int) -> str:
        dest = os.path.join(staging_dir, f"{seq:09d}.osm.gz")
        if not os.path.exists(dest):
            # Download to a temp path and rename into place only on success,
            # so the existence check above always implies a COMPLETE file —
            # a crash mid-download must not leave a truncated .osm.gz that
            # every later run silently reuses.
            tmp = f"{dest}.part-{os.getpid()}"
            try:
                urllib.request.urlretrieve(replication_url(seq, base_url), tmp)
                os.rename(tmp, dest)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        return dest

    return fetch


def read_replication_batch(
    spark: SparkSession,
    sequences: Iterable[int],
    fetcher: Fetcher,
) -> DataFrame:
    """Fetch a sequence range (driver-side, cheap: minutely diffs are small)
    and parse ALL of them as one distributed read — replacing the reference's
    fetch→parse→apply-one-file-at-a-time loop with a single batch whose
    ``sequence`` column preserves replay order for last-write-wins dedup
    (a changeset reappears across diffs as it evolves open→closed, T5)."""
    seqs = list(sequences)
    if not seqs:
        raise ValueError("empty sequence batch")
    parts = []
    for seq in seqs:
        path = fetcher(seq)
        parts.append(
            normalize_changesets(read_changeset_xml(spark, path)).withColumn(
                "sequence", F.lit(seq).cast("long")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# -- long-poll daemon mode (T1 continuous; VERDICT r11 #8) -------------------
#
# The reference runs its catch-up loop under cron/--daemon forever
# (ref changesetmd.py:179-195): wake, read state.yaml, apply the missing
# diffs, sleep a minute.  ``long_poll_replication`` is that loop as a
# driver-side daemon over ChangesetStore.replicate: every component with a
# side effect (server state read, diff fetch, sleep) is injectable, so the
# lifecycle — including server pauses and transient fetch failures — is
# fully testable offline, and the production wiring is one line
# (``urllib_state_reader`` + ``urllib_fetcher``).


def urllib_state_reader(base_url: str = BASE_REPL_URL) -> Callable[[], ServerState]:
    """Production head-of-stream reader: GET ``state.yaml`` and parse it
    (ref changesetmd.py:167-171)."""
    import urllib.request

    def read_state() -> ServerState:
        with urllib.request.urlopen(base_url + "state.yaml") as resp:
            return parse_state_yaml(resp.read().decode())

    return read_state


def long_poll_replication(
    store,
    state_reader: Callable[[], ServerState],
    fetcher: Fetcher,
    poll_interval: float = 60.0,
    max_retries: int = 5,
    backoff_base: float = 1.0,
    backoff_cap: float = 60.0,
    sleep_fn: Callable[[float], None] | None = None,
    stop_after_cycles: int | None = None,
) -> dict:
    """Continuous catch-up daemon: poll the server's head-of-stream marker,
    apply every missing diff through ``store.replicate`` (idempotent LWW
    MERGE; watermark persisted per batch so a crash resumes, never
    re-advances), sleep ``poll_interval``, repeat — the reference's
    cron-driven loop (ref changesetmd.py:179-186) with the mutex subsumed
    by single-daemon ownership of the store (T3).

    Transient state-read failures retry in-cycle with exponential backoff
    (``backoff_base·2^attempt`` capped at ``backoff_cap``); a cycle that
    exhausts ``max_retries`` raises — a dead upstream should page, not
    spin.  A caught-up cycle (server sequence ≤ watermark) applies nothing
    and the watermark does not move, so each sequence is fetched and
    applied exactly once across the daemon's lifetime (pinned by the
    lifecycle pytest).  ``stop_after_cycles`` bounds the loop for tests
    and drain-then-exit deployments; None = run forever (daemon parity).

    Returns counters: cycles run, diffs applied, caught-up cycles,
    transient retries survived."""
    import time as _time

    sleep = sleep_fn if sleep_fn is not None else _time.sleep
    stats = {"cycles": 0, "applied": 0, "caught_up_cycles": 0, "retries": 0}
    while stop_after_cycles is None or stats["cycles"] < stop_after_cycles:
        state = None
        for attempt in range(max_retries + 1):
            try:
                state = state_reader()
                break
            except Exception:  # noqa: BLE001 — transient upstream faults
                stats["retries"] += 1
                if attempt == max_retries:
                    raise
                sleep(min(backoff_cap, backoff_base * (2**attempt)))
        assert state is not None
        if state.sequence > store.state()["last_sequence"]:
            stats["applied"] += store.replicate(
                state.sequence, fetcher, server_timestamp=state.last_run
            )
        else:
            stats["caught_up_cycles"] += 1
        stats["cycles"] += 1
        if stop_after_cycles is None or stats["cycles"] < stop_after_cycles:
            sleep(poll_interval)
    return stats
