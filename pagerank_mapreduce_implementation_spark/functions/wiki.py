"""Wiki-XML page-line parsing expressions (O7/O8/O11 of SURVEY.md §2).

The reference parses each page line with two nested regexes
(PageRank.java:384-407):

- title:    ``<title>(.*?)</title>``            (PageRank.java:384)
- text:     ``<text(.*?)</text>``  — note NO closing ``>`` after
            ``text``, so attribute-bearing tags like
            ``<text xml:space="preserve">`` match (PageRank.java:391)
- outlinks: ``\\[\\[(.*?)\\]\\]`` repeatedly over the text body
            (PageRank.java:394-407). Lazy matching gives the quirky
            nested-bracket behavior ``[[3[[5]]]]`` -> link ``3[[5``
            (PatternTest.java:12,26-31) — preserved here.

These are pure Column expressions (JVM-side, codegen'd) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TITLE_RE = "<title>(.*?)</title>"
TEXT_RE = "<text(.*?)</text>"
LINK_RE = r"\[\[(.*?)\]\]"


def page_title(line: Column | str) -> Column:
    """Extract the page title; empty string when absent (the reference
    skips pages whose title is empty, PageRank.java:410)."""
    return F.regexp_extract(line, TITLE_RE, 1)


def page_text(line: Column | str) -> Column:
    """Extract the <text...</text body (attributes included in group 1,
    matching the reference's missing-``>`` quirk)."""
    return F.regexp_extract(line, TEXT_RE, 1)


def page_outlinks(line: Column | str) -> Column:
    """All ``[[link]]`` targets inside the text body, in order, with
    duplicates (each occurrence scatters rank separately,
    PageRank.java:454-468)."""
    return F.regexp_extract_all(page_text(line), F.lit(LINK_RE), 1)


def parse_pages(lines, line_col: str = "line"):
    """O11 link-graph construction: page line -> (url, outlinks).

    Drops blank lines and pages without a title (PageRank.java:347,410).
    """
    parsed = lines.filter(F.length(F.col(line_col)) > 0).select(
        page_title(F.col(line_col)).alias("url"),
        page_outlinks(F.col(line_col)).alias("outlinks"),
    )
    return parsed.filter(F.col("url") != "")
