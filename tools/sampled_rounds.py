#!/usr/bin/env python3
"""Regenerate SAMPLED_ROUNDS.json — the max-round-sampled map.

For every registered query name: the highest round whose
CORRECTNESS_r{N}.json contains it (0 = never driver-sampled). This is
the bookkeeping the r12+ reconfirm windows are built from (CLAUDE.md
rotation schedule): once the never-sampled pool is empty, each window
takes the 50 STALEST names — sort by max_round ascending, tie-break by
registration order — so driver signal stays fresh mechanically.

Run from the repo root after each round's CORRECTNESS file lands:
    python tools/sampled_rounds.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_map() -> dict:
    from hive_task_spark import registry

    registry.load_all()
    names = list(registry.QUERIES)

    max_round: dict[str, int] = {n: 0 for n in names}
    rounds = sorted(glob.glob("CORRECTNESS_r*.json"))
    for path in rounds:
        rnd = int(re.search(r"r(\d+)", path).group(1))
        for name in json.load(open(path)):
            if name in max_round:
                max_round[name] = max(max_round[name], rnd)

    # Tie-break by TRUE registration order (registry.REGISTRATION_ORDER,
    # immune to _apply_window's AUDIT_WINDOW-first reorder of QUERIES) —
    # ADVICE r9: names.index over the post-load_all ordering put the
    # current window first, which is not the documented reconfirm rule.
    reg_index = {n: i for i, n in enumerate(registry.REGISTRATION_ORDER)}
    stalest = sorted(names, key=lambda n: (max_round[n], reg_index[n]))
    never = [n for n in names if max_round[n] == 0]
    return {
        "generated_from": rounds,
        "registered": len(names),
        "never_sampled": len(never),
        "next_reconfirm_window_50": stalest[:50],
        "max_round": max_round,
    }


if __name__ == "__main__":
    out = build_map()
    with open("SAMPLED_ROUNDS.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(
        f"SAMPLED_ROUNDS.json: {out['registered']} registered, "
        f"{out['never_sampled']} never-sampled; stalest name: "
        f"{out['next_reconfirm_window_50'][0]}"
    )
