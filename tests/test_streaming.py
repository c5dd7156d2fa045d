"""Structured Streaming tests: the contract is batch/stream semantic
parity — availableNow over the full input must equal the batch twin."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pagerank_mapreduce_implementation_spark.operators import text
from pagerank_mapreduce_implementation_spark.sources import Catalog
from pagerank_mapreduce_implementation_spark.streaming import (
    read_events_stream,
    run_to_memory,
    streaming_windowed_events,
    streaming_word_count,
)


def test_streaming_windowed_events_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    run_to_memory(
        streaming_windowed_events(stream), "stream_events_win", "complete"
    )
    got = (
        spark.table("stream_events_win")
        .select("window_start", "event_type", "cnt", "value_sum")
        .collect()
    )
    ev = Catalog(spark, sf_dir).events
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
            ).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "value_sum")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_streaming_word_count_matches_batch(spark, sf_dir):
    docs_schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    stream = (
        spark.readStream.schema(docs_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    run_to_memory(
        streaming_word_count(stream, text_col="text"), "stream_wc", "complete"
    )
    got = {r["word"]: r["cnt"] for r in spark.table("stream_wc").collect()}
    want = {
        r["word"]: r["cnt"]
        for r in text.word_count(Catalog(spark, sf_dir).documents).collect()
    }
    assert got == want


def test_watermark_present_in_plan(spark, sf_dir):
    stream = streaming_windowed_events(read_events_stream(spark, sf_dir))
    # watermark node must exist for state cleanup at scale
    assert "EventTimeWatermark" in stream._jdf.queryExecution().analyzed().toString()
