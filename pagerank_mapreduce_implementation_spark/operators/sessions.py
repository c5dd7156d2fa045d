"""Sessionization over event streams/tables (engine extension; the
reference has no time semantics at all — SURVEY.md §2.3 "Streaming:
none").

``user_sessions`` groups each user's events into gap-bounded sessions
with the built-in ``session_window`` — the idiomatic Spark form, one
shuffle on (user_id), state merged by the aggregation itself. The SAME
expression works batch and streaming (streaming adds a watermark for
state eviction; see streaming/queries.py:streaming_user_sessions).

Session semantics (Spark's, mirrored exactly by the DuckDB oracle in
__spark_entry__.py): a session is [first_ts, last_ts + gap); an event
at t extends a session iff t < current_end, so a gap of exactly
``gap`` starts a NEW session (windows are end-exclusive).

Scale: sessionization at 100 TB is one hash shuffle on user_id with
map-side partial merging of overlapping windows; no window function,
no self-join, no per-user sort on the full table (Spark sorts within
partitions during the session merge — bounded by partition size, spill
-aware).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions per user:
    ``(user_id, session_start, session_end, n_events, value_sum)``.

    ``session_end`` is last event + gap (Spark session_window
    semantics). ``value_sum`` goes through decimal(18,6) so the sum is
    order-independent and oracle-exact (same policy as events_hourly).
    """
    w = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(F.col(user_col), w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double"), 2
            ).alias("value_sum"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )
