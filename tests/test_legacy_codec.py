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


def test_decode_trailing_delimiter_production_format(spark):
    """The reference's ACTUAL on-disk format: every outlink is followed
    by ``#####`` (PageRank.java:405,528). Java split drops the trailing
    empty; phantom '' outlinks must not appear (they would inflate
    out_degree and create empty-string edges)."""
    kv = spark.createDataFrame(
        [
            ("url1", "0.25,,,,,a#####b#####"),
            ("single", "0.5,,,,,only#####"),
            ("multi_trail", "0.1,,,,,a##########"),   # 'a' + two trailing delims
            ("interior", "0.2,,,,,a##########b#####"),  # empty [[]] link kept, like Java
        ],
        "key string, value string",
    )
    got = {r["url"]: r for r in decode_pagerank_records(kv).collect()}
    assert got["url1"]["outlinks"] == ["a", "b"]
    assert got["single"]["outlinks"] == ["only"]
    assert got["multi_trail"]["outlinks"] == ["a"]
    assert got["interior"]["outlinks"] == ["a", "", "b"]


def test_decode_length_guard_matches_reference(spark):
    """The reference splits with NO limit and requires length==2
    (hasOriginalPRAndOutlinkList): a value whose outlink segment itself
    contains ``,,,,,`` is 3+ pieces -> dangling, NOT kept as outlinks."""
    kv = spark.createDataFrame(
        [
            ("embedded", "0.25,,,,,a,,,,,b"),        # 3 pieces -> dangling
            ("embedded_trail", "0.25,,,,,a,,,,,"),   # Java: ["0.25","a"] -> outlinks
            ("double_delim", "0.5,,,,,,,,,,"),       # Java: ["0.5"] -> dangling
            ("interior_empty", "0.1,,,,,,,,,,x"),    # ["0.1","","x"] -> dangling
        ],
        "key string, value string",
    )
    got = {r["url"]: r for r in decode_pagerank_records(kv).collect()}
    assert got["embedded"]["outlinks"] == []
    assert got["embedded"]["rank"] == 0.25
    assert got["embedded_trail"]["outlinks"] == ["a"]
    assert got["double_delim"]["outlinks"] == []
    assert got["interior_empty"]["outlinks"] == []


def test_encode_writes_trailing_delimiter(spark):
    """Encode parity: files we write must be byte-identical to what the
    reference's mapper writes (rank,,,,,a#####b##### — trailing delim)."""
    pages = spark.createDataFrame(
        [("p", 0.25, ["a", "b"]), ("d", 0.5, [])],
        "url string, rank double, outlinks array<string>",
    )
    got = {r["key"]: r["value"] for r in encode_pagerank_records(pages).collect()}
    assert got["p"] == "0.25,,,,,a#####b#####"
    assert got["d"] == "0.5,,,,,"


def test_round_trip(spark):
    pages = spark.createDataFrame(
        [("p", 0.15, ["q", "r"]), ("d", 0.85, [])],
        "url string, rank double, outlinks array<string>",
    )
    rt = decode_pagerank_records(encode_pagerank_records(pages))
    got = {r["url"]: r for r in rt.collect()}
    assert got["p"]["rank"] == 0.15 and got["p"]["outlinks"] == ["q", "r"]
    assert got["d"]["outlinks"] == []
