"""Regenerate the frozen PCA basis literals in ``__spark_entry__.py``
(``_PCA_MEANS`` / ``_PCA_COMPONENTS``): fit ``pca_components(k=4)`` on
the sf0.001 embeddings snapshot and print the two constant blocks in
the committed formatting. Run after a testdata regeneration changes the
embeddings table; paste the output over the existing constants (the
provenance test ``tests/test_staged_ops2.py::
test_pca_basis_literals_match_sf0001_fit`` fails loudly when they
drift)."""

from __future__ import annotations

import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from pagerank_mapreduce_implementation_spark.operators import embeddings as E  # noqa: E402
from pagerank_mapreduce_implementation_spark.session import get_spark  # noqa: E402
from pagerank_mapreduce_implementation_spark.sources.catalog import Catalog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_FIT_SF_DIR", "/root/testdata/sf0.001")


def _fmt(xs, indent: int) -> str:
    body = ", ".join(repr(float(x)) for x in xs)
    return textwrap.fill(
        body, width=76, initial_indent=" " * indent, subsequent_indent=" " * indent
    )


def main() -> None:
    spark = get_spark(app_name="refit-pca-basis")
    spark.sparkContext.setLogLevel("ERROR")
    _, comps, _, mu = E.pca_components(Catalog(spark, SF_DIR).embeddings, k=4)
    print("_PCA_MEANS: list[float] = [")
    print(_fmt(mu, 4))
    print("]")
    print("_PCA_COMPONENTS: list[list[float]] = [")
    for c in comps:
        print("    [")
        print(_fmt(c, 8))
        print("    ],")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()
