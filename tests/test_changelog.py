"""Changelog compaction / CDC-apply tests: brute-force parity, the
incremental==rebuild invariant at several batch boundaries, tombstone
semantics, and the schema guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_mapreduce_implementation_spark.operators import changelog
from pagerank_mapreduce_implementation_spark.sources import Catalog


def _brute_compact(rows, delete_type="error"):
    """Driver-side latest-wins: max (ts, event_id) per user, tombstone
    winners dropped."""
    best = {}
    for r in rows:
        k = r["user_id"]
        seq = (r["ts"], r["event_id"])
        if k not in best or seq > (best[k]["ts"], best[k]["event_id"]):
            best[k] = r
    return sorted(
        (r["user_id"], r["event_id"], r["ts"], r["event_type"], r["value"])
        for r in best.values()
        if r["event_type"] != delete_type
    )


def test_compact_matches_brute_force(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    got = changelog.compact_changelog(
        ev, ["user_id"], ["ts", "event_id"], delete_expr="event_type = 'error'"
    )
    got_rows = sorted(
        (r["user_id"], r["event_id"], r["ts"], r["event_type"], r["value"])
        for r in got.collect()
    )
    assert got_rows == _brute_compact(ev.collect())


@pytest.mark.parametrize("cut", ["2024-01-08", "2024-01-16", "2024-01-25"])
def test_apply_equals_batch_recompute(spark, sf_dir, cut):
    """apply(compact(pre), post) == compact(pre ∪ post) at several
    batch boundaries — the invariant the registry oracle gates."""
    ev = Catalog(spark, sf_dir).events
    keys, seqs, dele = ["user_id"], ["ts", "event_id"], "event_type = 'error'"
    base = changelog.compact_changelog(
        ev.filter(F.col("ts") < cut), keys, seqs, delete_expr=dele
    )
    incremental = changelog.apply_changelog(
        base, ev.filter(F.col("ts") >= cut), keys, seqs, delete_expr=dele
    )
    full = changelog.compact_changelog(ev, keys, seqs, delete_expr=dele)
    key = lambda r: (r["user_id"], r["event_id"])
    assert sorted(map(tuple, incremental.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, full.collect()), key=lambda t: t[:2]
    )


def test_tombstone_deletes_snapshot_key(spark):
    """A key whose latest batch row is a tombstone disappears even
    though the snapshot holds it; an upsert after a tombstone within
    the same batch resurrects it (latest wins)."""
    snap = spark.createDataFrame(
        [(1, 10, "live", 1.0), (2, 11, "live", 2.0)],
        "k INT, seq INT, op STRING, v DOUBLE",
    )
    batch = spark.createDataFrame(
        [(1, 20, "del", 0.0), (2, 21, "del", 0.0), (2, 22, "live", 9.0)],
        "k INT, seq INT, op STRING, v DOUBLE",
    )
    out = changelog.apply_changelog(
        snap, batch, ["k"], ["seq"], delete_expr="op = 'del'"
    )
    assert sorted(map(tuple, out.collect())) == [(2, 22, "live", 9.0)]


def test_compact_keeps_delete_winners_when_no_delete_expr(spark):
    batch = spark.createDataFrame(
        [(1, 1, "del"), (1, 2, "live")], "k INT, seq INT, op STRING"
    )
    out = changelog.compact_changelog(batch, ["k"], ["seq"])
    assert [tuple(r) for r in out.collect()] == [(1, 2, "live")]


def test_schema_mismatch_raises(spark):
    snap = spark.createDataFrame([(1, 1)], "k INT, seq INT")
    batch = spark.createDataFrame([(1, 1, "x")], "k INT, seq INT, op STRING")
    with pytest.raises(ValueError, match="columns"):
        changelog.apply_changelog(snap, batch, ["k"], ["seq"])


def test_empty_key_cols_raise(spark):
    df = spark.createDataFrame([(1, 1)], "k INT, seq INT")
    with pytest.raises(ValueError, match="non-empty"):
        changelog.compact_changelog(df, [], ["seq"])
