#!/usr/bin/env python3
"""Regenerate registry.WITNESSED_ROUNDS from the driver's CORRECTNESS files.

The query ordering rule (least-recently-externally-verified first) is driven
entirely by this ledger, so the per-round maintenance is mechanical: after a
new ``CORRECTNESS_r{N}.json`` lands, run

    PYTHONPATH=. python tools/update_witnessed.py        # rewrites registry.py
    PYTHONPATH=. python tools/update_witnessed.py --check  # verify only

A row counts as witnessed when its strongest applicable check passed:
``hash_match is True`` for oracled rows, and a clean run (``err ==
'no_oracle'`` with a recorded row count) for oracle-less rows — the rows
check is the strongest external evidence those queries can ever get.  A
row whose HASH comparison failed is never witnessed, even when its row
count matched (CORRECTNESS_r01 has five such rows — counting them would
deprioritize re-checking exactly the queries that regressed).  Ledger keys
are restricted to currently registered queries so renames don't leave
ghosts (the registry test asserts that too).
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

_BLOCK_RE = re.compile(
    r"(WITNESSED_ROUNDS: dict\[str, tuple\[int, \.\.\.\]\] = \{\n)(.*?)(\n\})",
    re.DOTALL,
)


def gather() -> dict[str, list[int]]:
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


def render(witnessed: dict[str, list[int]]) -> str:
    lines = []
    for q in sorted(witnessed):
        rs = witnessed[q]
        body = ", ".join(str(r) for r in rs) + ("," if len(rs) == 1 else "")
        lines.append(f'    "{q}": ({body}),')
    return "\n".join(lines)


def main() -> int:
    check = "--check" in sys.argv
    src = open(REGISTRY).read()
    m = _BLOCK_RE.search(src)
    if not m:
        print("WITNESSED_ROUNDS block not found in registry.py", file=sys.stderr)
        return 1
    witnessed = gather()
    new_body = render(witnessed)
    if m.group(2) == new_body:
        print("ledger up to date")
        return 0
    if check:
        print("ledger STALE — run without --check to rewrite", file=sys.stderr)
        return 1
    open(REGISTRY, "w").write(
        src[: m.start(2)] + new_body + src[m.end(2) :]
    )
    print(f"rewrote WITNESSED_ROUNDS ({len(witnessed)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
