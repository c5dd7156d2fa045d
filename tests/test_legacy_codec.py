"""Legacy record codec round-trip (SplitTest.java surface)."""

from __future__ import annotations

from pagerank_mapreduce_implementation_spark.sources.legacy import (
    decode_pagerank_records,
    encode_pagerank_records,
)


def test_decode_split_test_record(spark):
    # the exact record shape SplitTest.java:7 exercises
    kv = spark.createDataFrame(
        [
            ("url1", "0.25,,,,,a#####b#####c"),
            ("dangling", "0.5,,,,,"),
            ("noseg", "1.0,,,,,x"),
        ],
        "key string, value string",
    )
    got = {r["url"]: r for r in decode_pagerank_records(kv).collect()}
    assert got["url1"]["rank"] == 0.25
    assert got["url1"]["outlinks"] == ["a", "b", "c"]
    assert got["dangling"]["outlinks"] == []
    assert got["noseg"]["outlinks"] == ["x"]


def test_round_trip(spark):
    pages = spark.createDataFrame(
        [("p", 0.15, ["q", "r"]), ("d", 0.85, [])],
        "url string, rank double, outlinks array<string>",
    )
    rt = decode_pagerank_records(encode_pagerank_records(pages))
    got = {r["url"]: r for r in rt.collect()}
    assert got["p"]["rank"] == 0.15 and got["p"]["outlinks"] == ["q", "r"]
    assert got["d"]["outlinks"] == []
