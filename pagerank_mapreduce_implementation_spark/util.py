"""Small shared runtime utilities (no operator logic lives here)."""

from __future__ import annotations


def persistent_rdd_ids(spark) -> set[int]:
    """Snapshot of the ids of every RDD currently pinned by the cache
    manager OR a localCheckpoint (``SparkContext.getPersistentRDDs``
    sees both — unlike ``DataFrame.unpersist``, which only reaches
    cache-manager entries and is a documented no-op on checkpoints)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def release_persistent_rdds_since(spark, before: set[int]) -> None:
    """Unpersist — at the RDD layer — every RDD pinned since ``before``
    was snapshotted. This is the only handle that actually frees
    localCheckpoint storage (round-5 advice: the checkpoint persists
    its RDD outside the cache manager, so ``uncacheQuery`` never finds
    it and ``DataFrame.unpersist()`` silently leaks). Diff-based on
    purpose: the checkpointed RDD is private to the Dataset internals,
    so callers cannot name it directly. Single-caller discipline —
    concurrent jobs persisting RDDs between snapshot and release would
    be released too; library code only calls this around loops it owns.
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        if int(k) not in before:
            jmap.get(k).unpersist(False)
