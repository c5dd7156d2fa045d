"""Regex-parse parity tests (O7/O8/O11) including the PatternTest quirks.

Mirrors PatternTest.java:12 exactly: the nested-bracket page
``<title>1</title> <text>[[3[[5]]]][[5]]</text>`` must yield outlinks
``['3[[5', '5']`` (lazy ``(.*?)`` inside ``\\[\\[...\\]\\]``), and the
attribute-bearing ``<text xml:space="preserve">`` tag must still match
(prod regex ``<text(.*?)</text>``, PageRank.java:391).
"""

from __future__ import annotations

from pagerank_mapreduce_implementation_spark.functions.wiki import parse_pages


def test_pattern_test_nested_brackets(spark):
    lines = spark.createDataFrame(
        [("<title>1</title> <text>[[3[[5]]]][[5]]</text>",)], ["line"]
    )
    rows = parse_pages(lines).collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "1"
    assert rows[0]["outlinks"] == ["3[[5", "5"]


def test_attribute_bearing_text_tag(spark):
    lines = spark.createDataFrame(
        [('<title>A</title><text xml:space="preserve">x [[B]] y [[C]]</text>',)],
        ["line"],
    )
    rows = parse_pages(lines).collect()
    assert rows[0]["outlinks"] == ["B", "C"]


def test_blank_and_titleless_lines_dropped(spark):
    lines = spark.createDataFrame(
        [("",), ("no markup here",), ("<title>P</title><text></text>",)], ["line"]
    )
    rows = parse_pages(lines).collect()
    assert [r["url"] for r in rows] == ["P"]
    assert rows[0]["outlinks"] == []


def test_duplicate_outlinks_preserved(spark):
    lines = spark.createDataFrame(
        [("<title>P</title><text>[[Q]][[Q]][[R]]</text>",)], ["line"]
    )
    rows = parse_pages(lines).collect()
    assert rows[0]["outlinks"] == ["Q", "Q", "R"]
