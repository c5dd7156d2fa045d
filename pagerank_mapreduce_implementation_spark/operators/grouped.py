"""Grouped-Arrow batch surface: ``groupBy().applyInPandas`` — the
batch sibling of the streaming ``applyInPandasWithState`` operator and
the ``mapInPandas`` codec steps (SURVEY.md §2.4).

This is the escape hatch for PER-GROUP logic no built-in expresses
(custom robust statistics, per-user model scoring, grouped
resampling): each group arrives as ONE Arrow-backed pandas frame.
The cost model to respect at 100 TB: one shuffle on the group key,
then each group must FIT IN MEMORY in a single task — right for
per-user / per-session groups (bounded fan-in), wrong for per-day or
per-language groups (use built-in aggregates or salt first). There is
also a fixed PER-GROUP Python cost (~3 ms/group measured at sf0.1:
1.5k groups ≈ 4.5 s, vs ~0.3 s for the same median as a built-in
``F.percentile``) — the surface is for kernels built-ins CANNOT
express; never route an expressible aggregate through it.

The demonstration kernel here (per-group count + median) is
deliberately one a SQL oracle can verify exactly — sort-based median
is arrival-order-independent, unlike a naive float mean — so the
grouped-Arrow plumbing itself sits behind the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group row count and interpolated median of ``value_col`` via
    ``applyInPandas``: ``(group_col, n, median_value)``, median rounded
    to 6 digits JVM-side (``F.round``, half-up — matching the SQL
    oracle's rounding, not Python's banker's ``round``).

    Group-key dtype is taken from the input schema so the contract
    works for any atomic key type.
    """
    import pandas as pd

    key_type = df.schema[group_col].dataType.simpleString()

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [len(pdf)],
                "median_value": [float(pdf[value_col].median())],
            }
        )

    out = df.groupBy(group_col).applyInPandas(
        per_group,
        schema=f"{group_col} {key_type}, n long, median_value double",
    )
    return out.select(
        group_col, "n", F.round("median_value", 6).alias("median_value")
    )
