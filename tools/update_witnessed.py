#!/usr/bin/env python3
"""Regenerate registry.WITNESSED_ROUNDS / WITNESSED_FINGERPRINTS from the
driver's CORRECTNESS files.

The query ordering rule (least-recently-externally-verified first, with
changed-since-witness code re-entering the window immediately) is driven
entirely by these ledgers, so the per-round maintenance is mechanical:
after a new ``CORRECTNESS_r{N}.json`` lands, run

    PYTHONPATH=. python tools/update_witnessed.py        # rewrites registry.py
    PYTHONPATH=. python tools/update_witnessed.py --check  # verify only

Rounds: a row counts as witnessed when its strongest applicable check
passed: ``hash_match is True`` for oracled rows, and a clean run (``err ==
'no_oracle'`` with a recorded row count) for oracle-less rows — the rows
check is the strongest external evidence those queries can ever get.  A
row whose HASH comparison failed is never witnessed, even when its row
count matched (CORRECTNESS_r01 has five such rows — counting them would
deprioritize re-checking exactly the queries that regressed).  Ledger keys
are restricted to currently registered queries so renames don't leave
ghosts (the registry test asserts that too).

Fingerprints (VERDICT r8 #3): each witness stamp records the
implementation the driver actually ran.  The regen refreshes a query's
fingerprint to the CURRENT source ONLY when its rounds tuple changed in
this regen (a new witness just landed, so current code is what was run)
or when the query has no stamp yet (first registration — current code is
what the next witness will run).  Otherwise the old stamp is carried
forward verbatim, so code edited AFTER its last witness keeps a
mismatching stamp and sorts to the head of the gate window.  Carrying
stamps forward also means a deliberately poisoned stamp (marking known
reworked-but-unwitnessed code, as done for the r8 two-phase rework) can
only PROMOTE a query into the window — never hide one.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY = os.path.join(REPO, "changesetmd_spark", "registry.py")

_ROUNDS_RE = re.compile(
    r"(WITNESSED_ROUNDS: dict\[str, tuple\[int, \.\.\.\]\] = \{\n)(.*?)(\n\})",
    re.DOTALL,
)
_FPS_RE = re.compile(
    r"(WITNESSED_FINGERPRINTS: dict\[str, str\] = \{\n)(.*?)(\n\})",
    re.DOTALL,
)


def gather_rounds() -> dict[str, list[int]]:
    from changesetmd_spark import registry

    names = set(registry.queries())
    witnessed: dict[str, list[int]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for q, v in json.load(open(f)).items():
            if q not in names:
                continue
            if v.get("err") == "no_oracle":
                ok = v.get("spark_rows") is not None and v["spark_rows"] >= 0
            else:
                ok = v.get("err") is None and v.get("hash_match") is True
            if ok and rnd not in witnessed.setdefault(q, []):
                witnessed[q].append(rnd)
    return {q: sorted(rs) for q, rs in witnessed.items()}


def compute_fingerprints(rounds: dict[str, list[int]]) -> dict[str, str]:
    from changesetmd_spark import registry

    names = list(registry.queries())
    old_rounds = registry.WITNESSED_ROUNDS
    old_fps = registry.WITNESSED_FINGERPRINTS
    fps: dict[str, str] = {}
    for q in names:
        rounds_changed = tuple(rounds.get(q, ())) != tuple(old_rounds.get(q, ()))
        if q not in old_fps or rounds_changed:
            fps[q] = registry._fingerprint(q)
        else:
            fps[q] = old_fps[q]
    return fps


def render_rounds(witnessed: dict[str, list[int]]) -> str:
    lines = []
    for q in sorted(witnessed):
        rs = witnessed[q]
        body = ", ".join(str(r) for r in rs) + ("," if len(rs) == 1 else "")
        lines.append(f'    "{q}": ({body}),')
    return "\n".join(lines)


def render_fps(fps: dict[str, str]) -> str:
    return "\n".join(f'    "{q}": "{fps[q]}",' for q in sorted(fps))


def main() -> int:
    check = "--check" in sys.argv
    src = open(REGISTRY).read()
    mr = _ROUNDS_RE.search(src)
    mf = _FPS_RE.search(src)
    if not mr or not mf:
        print(
            "WITNESSED_ROUNDS / WITNESSED_FINGERPRINTS block not found",
            file=sys.stderr,
        )
        return 1
    rounds = gather_rounds()
    fps = compute_fingerprints(rounds)
    new_rounds_body = render_rounds(rounds)
    new_fps_body = render_fps(fps)
    if mr.group(2) == new_rounds_body and mf.group(2) == new_fps_body:
        print("ledger up to date")
        return 0
    if check:
        # Driver-cycle awareness (VERDICT r14 #4): the driver writes
        # CORRECTNESS_r{N}.json AFTER the round's close commit, so at every
        # round start the committed ledger trails the newest file by
        # exactly that window.  That staleness is benign by construction —
        # pass with a note when the ENTIRE delta is "round N appended"
        # (plus the fingerprint refreshes those appends imply); anything
        # else (dropped rounds, hand edits, fp drift on untouched queries)
        # still fails.
        from changesetmd_spark import registry

        old_rounds = registry.WITNESSED_ROUNDS
        old_fps = registry.WITNESSED_FINGERPRINTS
        newest = max(
            (
                int(re.search(r"_r(\d+)\.json$", f).group(1))
                for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
            ),
            default=None,
        )
        delta = {
            q
            for q in set(rounds) | set(old_rounds)
            if tuple(rounds.get(q, ())) != tuple(old_rounds.get(q, ()))
        }
        fps_delta = {
            q
            for q in set(fps) | set(old_fps)
            if fps.get(q) != old_fps.get(q)
        }
        benign = (
            newest is not None
            and bool(delta)
            and fps_delta <= delta
            and all(
                newest in rounds.get(q, ())
                and tuple(r for r in rounds.get(q, ()) if r != newest)
                == tuple(old_rounds.get(q, ()))
                for q in delta
            )
        )
        if benign:
            print(
                f"ledger trails the newest driver window only (r{newest}, "
                f"{len(delta)} queries) — benign by the driver cycle; "
                "run without --check to fold it in"
            )
            return 0
        print("ledger STALE — run without --check to rewrite", file=sys.stderr)
        return 1
    # replace the later block first so the earlier match spans stay valid
    blocks = sorted(
        [(mr, new_rounds_body), (mf, new_fps_body)],
        key=lambda t: t[0].start(2),
        reverse=True,
    )
    for m, body in blocks:
        src = src[: m.start(2)] + body + src[m.end(2) :]
    open(REGISTRY, "w").write(src)
    print(
        f"rewrote WITNESSED_ROUNDS ({len(rounds)} queries) and "
        f"WITNESSED_FINGERPRINTS ({len(fps)} stamps)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
