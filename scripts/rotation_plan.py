"""Rotation planner: compute, from the CORRECTNESS_r*.json artifacts
and the CURRENT queries() order, which registry entries are DUE in the
next driver window and how much slack remains — the mechanical form of
the window-boundary comment in ``__spark_entry__.queries()``.

The invariant it plans for (tests/test_oracle_parity.py::
test_registry_rotation_invariant): every query must have a fully-green
driver row within the last B = ceil(len(registry)/50) CORRECTNESS
files. A query whose newest green row is exactly B-1 rounds old is
still legal today but MUST lead the next window.

Prints one JSON line:
  {"registry": N, "budget": B, "next_round": r,
   "due_next_window": [...], "free_slots": k,
   "latest_green_round": {query: r or null}}

Run it at the START of a round before touching the registry order.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys

sys.path.insert(0, "/root/repo")


def latest_green(root: str) -> tuple[dict[str, int], list[int]]:
    # sort by ROUND NUMBER, not lexicographically (r100 < r11 as a
    # string), and take the max green round per query so file order
    # can never regress an entry (r15 review finding)
    latest: dict[str, int] = {}
    rounds: list[int] = []
    paths = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    for path in paths:
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rounds.append(rnd)
        with open(path) as fh:
            for k, v in json.load(fh).items():
                if (
                    isinstance(v, dict)
                    and v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match")
                    and not v.get("err")
                ):
                    latest[k] = max(latest.get(k, 0), rnd)
    return latest, rounds


def main() -> None:
    import __spark_entry__ as entry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest, rounds = latest_green(root)
    names = list(entry.queries())
    budget = math.ceil(len(names) / 50)
    next_round = (rounds[-1] if rounds else 0) + 1
    # a query is DUE in next_round's window if, after next_round lands,
    # its newest green row would fall outside the last-B files —
    # i.e. latest_green <= next_round - B — or it has never been green
    horizon = next_round - budget
    due = [n for n in names if latest.get(n, -(10**9)) <= horizon]
    print(
        json.dumps(
            {
                "registry": len(names),
                "budget_rounds": budget,
                "next_round": next_round,
                "due_next_window": due,
                "n_due": len(due),
                "free_slots": max(0, 50 - len(due)),
                "never_green": [n for n in names if n not in latest],
                "latest_green_round": {n: latest.get(n) for n in names},
            }
        )
    )


if __name__ == "__main__":
    main()
