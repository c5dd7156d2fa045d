"""Changelog compaction and snapshot maintenance (CDC apply).

A 100 TB training corpus is not rebuilt per crawl — it is MAINTAINED:
each ingestion batch is a changelog of upserts and delete tombstones
against the previous snapshot (the Hudi/Delta/Iceberg merge-on-read
compaction step, and the jar's chained job-state handoff taken to its
incremental conclusion — the reference rewrites full state between
jobs, PageRank.java:190-244; here only the delta moves).

Two operators:

- ``compact_changelog``: latest-wins per key over a change stream —
  ONE key shuffle via ``max_by`` over a lexicographic sequence struct
  (partial aggregation combines map-side; NO window sort — a window
  ``row_number`` materializes and sorts every key's full history in
  one task, which for a hot key at corpus scale is a straggler; the
  agg keeps one struct per key per partition).
- ``apply_changelog``: merge a compacted batch into an existing
  snapshot — changes override by construction (they are newer than
  the snapshot by contract, no cross-seq comparison needed), delete
  tombstones drop keys. Snapshot-side work is one anti-join on the
  key the snapshot is typically already bucketed by (co-located at
  rest → no snapshot shuffle on a bucketed table); the changes side
  is batch-sized, broadcast when small.

The invariant that gates both (see the registry oracle):
``apply(compact(pre), post) == compact(pre ∪ post)`` — the
incremental path must reproduce the batch recompute exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compact_changelog(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    delete_expr: Column | str | None = None,
) -> DataFrame:
    """Latest state per key → one row per surviving key.

    The winner is the row with the lexicographically greatest
    ``seq_cols`` struct (callers make it unique — e.g. ``(ts,
    event_id)`` — so the result is deterministic under any
    partitioning). If ``delete_expr`` evaluates true ON THE WINNING
    ROW, the key is a tombstone and is dropped from the output.

    Output schema == input schema (key + payload columns, winner's
    values). Plan: ONE shuffle on the key with map-side partial
    ``max_by`` — per-partition state is one struct per key.
    """
    if not key_cols or not seq_cols:
        raise ValueError("key_cols and seq_cols must be non-empty")
    payload = [c for c in changes.columns if c not in key_cols]
    win = (
        changes.groupBy(*key_cols)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]),
                F.struct(*[F.col(c) for c in seq_cols]),
            ).alias("__w")
        )
        .select(
            *[
                F.col(c) if c in key_cols else F.col(f"__w.{c}").alias(c)
                for c in changes.columns
            ]
        )
    )
    if delete_expr is not None:
        pred = F.expr(delete_expr) if isinstance(delete_expr, str) else delete_expr
        win = win.filter(~pred)
    return win


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    delete_expr: Column | str | None = None,
) -> DataFrame:
    """Merge a change batch into a snapshot → the next snapshot.

    Contract: every change row is NEWER than the snapshot (the batch
    boundary orders them), so a key present in the batch always takes
    the batch's latest value — including being dropped when that
    latest row is a delete tombstone. Keys untouched by the batch
    pass through unchanged.

    Plan: ``compact_changelog`` on the batch (batch-sized shuffle),
    then snapshot LEFT ANTI JOIN touched-keys ∪ surviving-changes.
    The anti-join is on the snapshot's own key — co-located for free
    on a key-bucketed snapshot table, and the touched-keys side is
    batch-sized (AQE broadcasts it when it fits). The snapshot is
    never grouped, sorted, or rewritten beyond that join.
    """
    if sorted(snapshot.columns) != sorted(changes.columns):
        raise ValueError(
            f"snapshot columns {snapshot.columns} != changes columns "
            f"{changes.columns} — changelog rows must carry the snapshot schema"
        )
    # compact WITHOUT the tombstone filter: a deleted key must still
    # suppress the snapshot row, so tombstone winners participate in
    # the anti-join and are dropped only from the union's change side
    winners = compact_changelog(changes, key_cols, seq_cols, delete_expr=None)
    touched = winners.select(*key_cols)
    # the list-form join key reorders keys to the front even on an
    # anti join — re-project to the snapshot's own column order
    kept = snapshot.join(touched, on=key_cols, how="left_anti").select(
        *snapshot.columns
    )
    if delete_expr is not None:
        pred = F.expr(delete_expr) if isinstance(delete_expr, str) else delete_expr
        winners = winners.filter(~pred)
    return kept.unionByName(winners)
