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


def test_rotation_policy_window_invariant():
    """The registry ORDER is the driver-window rotation policy (the
    driver checks the first 50 entries): everything BELOW the window
    must have been FULLY green (rows+schema+hash) within the last TWO
    driver CORRECTNESS files — with >50 registered queries a single
    file can never cover the registry, so the policy alternates
    cohorts and this guard enforces that nothing stale or unchecked
    ever hides past the boundary for two consecutive rounds. Skips
    when no driver artifact exists (fresh clone)."""
    import glob
    import json
    import os

    files = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")))
    if not files:
        pytest.skip("no driver correctness artifacts")
    recent_green = set()
    for path in files[-2:]:
        with open(path) as fh:
            for k, v in json.load(fh).items():
                if (
                    v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match")
                    and not v.get("err")
                ):
                    recent_green.add(k)
    below = list(entrymod.queries())[50:]
    stale = [q for q in below if q not in recent_green]
    assert not stale, (
        f"queries below the 50-entry driver window were NOT green in "
        f"the last two driver files {[os.path.basename(p) for p in files[-2:]]}: "
        f"{stale} — rotate them forward"
    )


def test_registry_rotation_invariant():
    """The grading driver checks only the FIRST 50 queries() entries
    per round, so every registry query must be green within the last
    two rounds: (window this round) ∪ (green last round) must cover
    the registry, and everything below the boundary must have a green
    row in the LATEST correctness file. Guards the rotation policy
    mechanically (round-6/7 verdicts each audited this by hand)."""
    import glob
    import json
    import os

    import __spark_entry__ as entrymod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:
        import pytest

        pytest.skip("no driver correctness files yet")
    latest = json.load(open(files[-1]))
    green = {
        k
        for k, v in latest.items()
        if isinstance(v, dict)
        and v.get("rows_match")
        and v.get("schema_match")
        and not v.get("err")
    }
    qs = list(entrymod.queries())
    window, below = set(qs[:50]), qs[50:]
    stale_below = [k for k in below if k not in green]
    assert not stale_below, (
        f"queries below the 50-slot window lack a green row in "
        f"{os.path.basename(files[-1])} (they will exceed the 2-round "
        f"freshness budget): {stale_below} — rotate them into the window"
    )
    uncovered = set(qs) - window - green
    assert not uncovered, f"neither windowed nor recently green: {uncovered}"
