"""PII detection & redaction (engine extension; SURVEY.md §2.4).

The standard scrub pass of a training-data pipeline: find and mask
emails / phone numbers / URLs before text reaches a training set.
Pure narrow column expressions — regexp_count + regexp_replace chains,
zero shuffles, scan-speed at 100 TB, and reproducible in the DuckDB
oracle (patterns are kept inside the RE2 ∩ Java-regex common subset:
no backrefs, no lookaround).

Real deployments extend PATTERNS (SSNs, IBANs, street addresses, NER
models via a Pandas UDF); the dataflow — count, then replace
longest-pattern-first so a URL's embedded host is not half-redacted
by the email pass — is the deliverable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: pattern order matters: URLs first (an email-looking token inside a
#: URL must redact as part of the URL), then emails, then phones.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

PATTERNS: list[tuple[str, str, str]] = [
    ("urls", URL_RE, "[URL]"),
    ("emails", EMAIL_RE, "[EMAIL]"),
    ("phones", PHONE_RE, "[PHONE]"),
]


def redact_pii(
    docs: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """Per doc: PII counts + the redacted text:
    ``(doc_id, n_urls, n_emails, n_phones, redacted)``.

    Counts run on the running (previously-masked) text in PATTERNS
    order: only the first pattern (urls) sees the original text; each
    later pattern counts on text already masked by its predecessors.
    So a URL containing an ``@`` is counted once as a URL and zero
    times as an email, because the email count runs on text whose URLs
    are already masked — the same longest-first discipline the
    replacement uses.
    """
    staged = docs.select(F.col(doc_col).alias("doc_id"), F.col(text_col).alias("_t"))
    out_cols: list[Column] = []
    running = F.col("_t")
    for name, pattern, mask in PATTERNS:
        out_cols.append(
            F.regexp_count(running, F.lit(pattern)).alias(f"n_{name}")
        )
        running = F.regexp_replace(running, pattern, mask)
    return staged.select("doc_id", *out_cols, running.alias("redacted"))
