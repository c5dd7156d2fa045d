"""Iteration driver for fixed-point DataFrame loops (O18).

The reference runs 10 chained MapReduce jobs, each writing its state to
HDFS and deleting the (i-2)th directory (PageRank.java:190-244, GC at
:222-228). The Spark-native equivalent keeps state as a persisted
DataFrame between iterations, unpersists the (i-1)th once the next is
materialized, and truncates lineage with ``localCheckpoint`` every few
iterations — without that, the logical plan doubles per iteration
(join+agg on top of the previous plan) and analysis time explodes long
before data size matters.

At cluster scale ``localCheckpoint`` (executor-local blocks) is the
right default for a loop whose state is small relative to the inputs
(the rank vector: 2 columns x |V|); a reliable ``checkpoint()`` to
distributed storage is only needed for fault-tolerance of very long
loops, which callers opt into via ``reliable_dir``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class IterationDriver:
    def __init__(
        self,
        checkpoint_every: int = 4,
        reliable_dir: str | None = None,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    ) -> None:
        self.checkpoint_every = checkpoint_every
        self.reliable_dir = reliable_dir
        self.storage_level = storage_level

    def run(
        self,
        state: DataFrame,
        step: Callable[[DataFrame, int], DataFrame],
        n_iters: int,
        converged: Callable[[DataFrame, DataFrame], bool] | None = None,
    ) -> DataFrame:
        """Iterate ``state = step(state, i)`` ``n_iters`` times.

        ``converged(prev, cur)`` (optional) is checked after each
        iteration for early exit — the reference has no convergence
        test (hard-coded 10 iterations), so parity callers leave it None.
        """
        if self.reliable_dir:
            state.sparkSession.sparkContext.setCheckpointDir(self.reliable_dir)
        prev: DataFrame | None = None
        for i in range(1, n_iters + 1):
            new_state = step(state, i)
            if i % self.checkpoint_every == 0:
                # Eager: cuts lineage AND materializes in one pass.
                new_state = (
                    new_state.checkpoint(eager=True)
                    if self.reliable_dir
                    else new_state.localCheckpoint(eager=True)
                )
            else:
                new_state = new_state.persist(self.storage_level)
                new_state.count()  # materialize before dropping the old state
            # Mirror of the reference's iter(i-2) directory GC
            # (PageRank.java:222-228): once iteration i is materialized,
            # state i-1 is only needed for the convergence check.
            if converged is not None and converged(state, new_state):
                if prev is not None:
                    prev.unpersist()
                state.unpersist()
                return new_state
            if prev is not None:
                prev.unpersist()
            prev, state = state, new_state
        return state
