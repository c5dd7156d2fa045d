"""Mimic the driver's correctness gate: every ``queries()`` entry must
match its DuckDB ``oracle_sql()`` twin exactly (row count, column names,
values) at a small scale factor.

Exactness is intentional — the engine rounds/decimal-casts on both
sides so the comparison needs no epsilon (see __spark_entry__ notes).
Run at sf0.001 by default for speed; set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 for the driver-scale check.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

# slow tier (r17): excluded from the driver's default fast run -- see pytest.ini
pytestmark = pytest.mark.slow

import __spark_entry__ as entrymod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


QUERIES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        got = entrymod.queries()[name](spark, sf_dir)
        assert got.count() >= 0  # rows-only check, like the driver
        return
    got = normalize(entrymod.queries()[name](spark, sf_dir).toPandas())
    want = normalize(duck.sql(oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # The driver hashes STRINGIFIED values, so an integer column on one
    # side and a float on the other (32 vs 32.0) hash-mismatches even
    # when assert_frame_equal(check_dtype=False) calls them equal —
    # exactly how the r5 seq_packing HUGEINT oracle bug slipped through
    # 269 local tests (round-5 verdict item 3). Fail loudly on any
    # integer-vs-float kind divergence.
    for col in got.columns:
        gk, wk = got[col].dtype.kind, want[col].dtype.kind
        assert not (
            (gk in "iu" and wk == "f") or (gk == "f" and wk in "iu")
        ), (
            f"{name}.{col}: integer-vs-float dtype divergence "
            f"(spark {got[col].dtype} vs oracle {want[col].dtype}) — "
            "values would hash-mismatch at the driver"
        )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["url", "rank"]


def test_every_query_has_oracle_or_documented_gap():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs)


def _driver_green_history(root):
    """Shared loader for the rotation/capacity tests: CORRECTNESS files
    sorted by ROUND NUMBER (lexicographic breaks at r100), and the
    newest fully-green round per query (rows+schema+hash, no err)."""
    import glob
    import json
    import os
    import re

    paths = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    latest: dict[str, int] = {}
    rounds: list[int] = []
    greens: list[set[str]] = []
    for path in paths:
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rounds.append(rnd)
        green = set()
        with open(path) as fh:
            for k, v in json.load(fh).items():
                if (
                    isinstance(v, dict)
                    and v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match")
                    and not v.get("err")
                ):
                    green.add(k)
                    latest[k] = max(latest.get(k, 0), rnd)
        greens.append(green)
    return paths, rounds, greens, latest


def test_registry_rotation_invariant():
    """The grading driver checks only the FIRST 50 queries() entries
    per round, so the registry order IS the rotation policy. Freshness
    budget (round-9 policy, r8 verdict item 2a): every query must have
    a driver-green row within the last B = ceil(len(registry)/50)
    rounds. The check: every query BELOW the window is fully green
    (rows+schema+hash, no err) in one of the last B driver CORRECTNESS
    files — i.e. its newest green row is at most B-1 rounds old, so
    the budget survives the CURRENT round's landing. Red only when the
    budget is TRULY blown (r8 verdict item 3, round-9 refinement: the
    earlier last-(B-1) form fired the moment a driver round landed on
    a legally-deferred cohort — red at every judge pass, the exact
    conflation item 3 flagged). A query whose newest green row is
    exactly B-1 rounds old passes here but MUST lead the next window;
    the window-boundary comment in queries() carries that rotation
    plan, and this test goes red one round later if the plan is
    dropped. Skips on a fresh clone."""
    import math
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files, _rounds, greens, _latest = _driver_green_history(root)
    if not files:
        pytest.skip("no driver correctness artifacts")
    qs = list(entrymod.queries())
    budget = math.ceil(len(qs) / 50)
    recent_green = set().union(*greens[-budget:])
    window, below = set(qs[:50]), qs[50:]
    checked = [os.path.basename(p) for p in files[-budget:]]
    stale = [q for q in below if q not in recent_green]
    assert not stale, (
        f"queries below the 50-entry driver window lack a fully-green "
        f"row in the last {budget} driver files {checked} — the "
        f"{budget}-round freshness budget is blown for: {stale} — "
        "rotate them into the window NOW"
    )
    uncovered = set(qs) - window - recent_green
    assert not uncovered, f"neither windowed nor recently green: {uncovered}"


def test_registry_capacity_policy():
    """REGISTRY CAPACITY POLICY (round-15 decision, README §Registry
    capacity): capacity is a cadence constraint, not a hard total —
    the budget B = ceil(N/50) steps automatically past each 50·k
    boundary, but every future window must stay feasible. The two hard
    rules this pins:

    1. COHORT BOUND — no more than 50 entries may share a latest-green
       round: a cohort certified together comes due together, and a
       >50 cohort can never re-certify inside one 50-entry window (the
       budget would be mathematically blown when it ages out).
    2. WINDOW FEASIBILITY — the NEXT round's due list fits in 50
       (mirrors scripts/rotation_plan.py: due = newest green row at or
       below next_round - B, or never green).

    Skips on a fresh clone (no driver artifacts)."""
    import math
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files, rounds, _greens, latest = _driver_green_history(root)
    if not files:
        pytest.skip("no driver correctness artifacts")
    qs = list(entrymod.queries())
    budget = math.ceil(len(qs) / 50)
    cohorts: dict[int | None, int] = {}
    for q in qs:
        cohorts[latest.get(q)] = cohorts.get(latest.get(q), 0) + 1
    oversize = {r: n for r, n in cohorts.items() if r is not None and n > 50}
    assert not oversize, (
        f"green-round cohort(s) exceed the 50-entry window and can "
        f"never re-certify in one round: {oversize} — split the next "
        "registration/re-cert batch (README §Registry capacity rule 1)"
    )
    next_round = max(rounds) + 1
    horizon = next_round - budget
    due = [q for q in qs if latest.get(q, -(10**9)) <= horizon]
    assert len(due) <= 50, (
        f"{len(due)} entries come due in round {next_round} but the "
        f"driver window holds 50 — the rotation is infeasible: {due} "
        "(README §Registry capacity rule 2)"
    )
    # 3. PINCH POINT (r16 endgame decision) — at exactly N = 50k the
    # steady-state re-cert load is N/ceil(N/50) = 50: the window is
    # fully consumed by rotation every round, with zero slots for new
    # or changed entries. Land one more (or one fewer) registration.
    assert len(qs) % 50 != 0, (
        f"registry sits AT the {len(qs)} pinch point — every future "
        "window is 100% rotation (README §Registry capacity rule 6)"
    )
