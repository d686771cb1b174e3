#!/usr/bin/env python3
"""Dump the PLANS.md evidence block for one registered query:

    PYTHONPATH=. python tools/gen_plan.py q_minhash_lsh_candidates [sf_dir]

Prints the physical-plan tree (formatted explain, node tree + scan details)
plus the summary line (broadcast / shuffle count / pushed filters) in the
format PLANS.md uses, so plan sections are regenerated, not hand-edited.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from changesetmd_spark import get_spark, registry  # noqa: E402
from changesetmd_spark.plans import (  # noqa: E402
    explain_str,
    has_broadcast_join,
    pushed_filters,
    shuffle_count,
)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="gen-plan")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry.queries()[name](spark, sf_dir)

    full = explain_str(df)
    # tree section = everything before the first node-detail block
    tree = full.split("\n\n(1)")[0].rstrip()
    scans = []
    for m in re.finditer(r"(PushedFilters: \[[^\]]*\]|ReadSchema: [^\n]*)", full):
        if m.group(1) not in scans:
            scans.append(m.group(1))

    print(f"## {name}\n")
    print(
        f"- broadcast join: {has_broadcast_join(df)}; "
        f"shuffles: {shuffle_count(df)}; "
        f"pushed filters: {len(pushed_filters(df))}\n"
    )
    print("```")
    print(tree)
    print()
    print("scan details:")
    for s in scans:
        print(s)
    print("```")


if __name__ == "__main__":
    main()
