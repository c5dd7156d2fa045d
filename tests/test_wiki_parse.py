"""Regex-parse parity tests (O7/O8/O11) — PRODUCTION mapper semantics.

The shipped job (PageRank.java:379-411) differs from the PatternTest
scratch test in three ways all covered here: links are bracket-stripped
(``[[3[[5]]]]`` -> ``35``, PageRank.java:402 — PatternTest's raw
``3[[5`` is pre-normalization), the LAST <title> match wins
(:386-388 find() loop), and EVERY <text...</text body is scanned
(:392,397). The attribute-bearing ``<text xml:space="preserve">`` tag
must still match (prod regex ``<text(.*?)</text>``, PageRank.java:391).
"""

from __future__ import annotations

from pagerank_mapreduce_implementation_spark.functions.wiki import parse_pages


def test_pattern_test_nested_brackets_production_strip(spark):
    # PatternTest.java:12's input, but the PRODUCTION expectation:
    # lazy match captures '3[[5', then :402 strips the residual '[['.
    lines = spark.createDataFrame(
        [("<title>1</title> <text>[[3[[5]]]][[5]]</text>",)], ["line"]
    )
    rows = parse_pages(lines).collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "1"
    assert rows[0]["outlinks"] == ["35", "5"]


def test_last_title_match_wins(spark):
    # while (matcher0.find()) overwrites mainURL -> last title wins
    lines = spark.createDataFrame(
        [("<title>first</title><title>last</title><text>[[X]]</text>",)],
        ["line"],
    )
    rows = parse_pages(lines).collect()
    assert rows[0]["url"] == "last"


def test_all_text_bodies_scanned(spark):
    # the reference iterates every <text...</text match on the line
    lines = spark.createDataFrame(
        [("<title>P</title><text>[[A]]</text> junk <text>[[B]]</text>",)],
        ["line"],
    )
    rows = parse_pages(lines).collect()
    assert rows[0]["outlinks"] == ["A", "B"]


def test_line_trimmed_before_parse(spark):
    lines = spark.createDataFrame(
        [("   <title>P</title><text>[[Q]]</text>   ",), ("   ",)], ["line"]
    )
    rows = parse_pages(lines).collect()
    assert [r["url"] for r in rows] == ["P"]
    assert rows[0]["outlinks"] == ["Q"]


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
