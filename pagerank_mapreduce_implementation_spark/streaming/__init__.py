from pagerank_mapreduce_implementation_spark.streaming.queries import (
    read_events_stream,
    read_table_stream,
    run_to_memory,
    streaming_approx_uniques,
    streaming_bounded_dedup,
    streaming_click_attribution,
    streaming_exact_dedup,
    streaming_search,
    streaming_user_sessions,
    streaming_windowed_events,
    streaming_word_count,
    user_stats_stateful,
)

__all__ = [
    "read_events_stream",
    "read_table_stream",
    "run_to_memory",
    "streaming_approx_uniques",
    "streaming_bounded_dedup",
    "streaming_click_attribution",
    "streaming_exact_dedup",
    "streaming_search",
    "streaming_user_sessions",
    "streaming_windowed_events",
    "streaming_word_count",
    "user_stats_stateful",
]
