"""Iterative PageRank over an edge DataFrame (O5, O9-O18 of SURVEY.md §2).

Reference semantics (``reference parity`` mode, the default) recovered
from PageRank.java:

- seed rank = 1/N where N = page count           (PageRank.java:156,378)
- new rank  = 0.15 + 0.85 * sum(contributions)   (PageRank.java:523)
  — NON-normalized damping: the constant term is 0.15, not (1-d)/N.
- each page scatters rank/|outlinks| to every outlink OCCURRENCE
  (duplicates included)                          (PageRank.java:454-468)
- dangling pages (no outlinks) scatter nothing — their mass is lost
  (no dangling redistribution)                   (PageRank.java:454 guard)
- "red links" (targets with no page of their own) receive contributions
  but are dropped from the output; only real pages are emitted
  (``hasOriginalPRAndOutlinkList``)              (PageRank.java:493,515,527)
- a page with no inbound links still gets rank 0.15 + 0.85*0
  (its own pass-through record reaches the reducer, PageRank.java:472,527)
- fixed 10 iterations, no convergence test       (PageRank.java:190)

``mode="textbook"`` instead computes the standard normalized PageRank:
rank' = (1-d)/N + d * (sum(contrib) + dangling_mass/N), which keeps the
rank vector a probability distribution.

Scale design (100 TB posture):
- graph state is ROWS (src,dst edges), never packed strings or arrays:
  explode-free, and the out-degree join is a plain shuffle-on-src.
- ``links`` (edges + out_degree) is repartitioned by its join key ONCE
  and persisted; every iteration's join reuses that partitioning, so
  per-iteration shuffles are only (a) rank vector -> src partitioning
  and (b) contributions groupBy(dst). The big static table never
  re-shuffles.
- partial aggregation (map-side combine) on the contribution sum is
  automatic via HashAggregateExec — the reference shipped the full
  shuffle volume (no combiner, SURVEY.md §4).
- the rank vector (2 cols x |V|) is orders of magnitude smaller than
  the edge table; lineage is truncated by the IterationDriver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_mapreduce_implementation_spark.plans.iterative import IterationDriver

DAMPING = 0.85


def out_degree(edges: DataFrame) -> DataFrame:
    """Out-degree per source, counting duplicate edges (the reference
    divides by the full outlink-list length, duplicates included:
    PageRank.java:465)."""
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))


def pagerank(
    edges: DataFrame,
    n_iters: int = 10,
    mode: str = "reference",
    damping: float = DAMPING,
    checkpoint_every: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """PageRank over (src, dst) edges; vertex set = distinct src.

    Returns ``(url, rank)``. ``mode="reference"`` reproduces the
    reference's quirks exactly (see module docstring); ``"textbook"``
    is standard normalized PageRank with dangling-mass redistribution.
    """
    if mode not in ("reference", "textbook"):
        raise ValueError(f"unknown mode {mode!r}")
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # Static per-iteration join input: one row per edge occurrence with
    # the source's out-degree attached. Partitioned by src once, reused
    # every iteration.
    deg = out_degree(edges)
    links = (
        edges.join(deg, "src")
        .repartition(num_partitions, "src")
        .persist()
    )
    vertices = links.select(F.col("src").alias("url")).distinct().persist()
    n = vertices.count()  # O5 count-all + O9 scalar broadcast (a literal)
    if n == 0:
        links.unpersist()
        vertices.unpersist()
        return spark.createDataFrame([], "url string, rank double")

    ranks = vertices.select("url", F.lit(1.0 / n).alias("rank"))

    def step(ranks: DataFrame, _i: int) -> DataFrame:
        # O13 scatter: contribution = rank(src)/out_degree(src) per edge
        # occurrence. Join is src-partitioned (links side pre-shuffled).
        contribs = links.join(
            ranks.withColumnRenamed("url", "src"), "src"
        ).select(
            F.col("dst").alias("url"),
            (F.col("rank") / F.col("out_degree")).alias("contrib"),
        )
        # O15 gather: partial agg map-side, final agg on url.
        sums = contribs.groupBy("url").agg(F.sum("contrib").alias("contrib_sum"))
        if mode == "reference":
            # O14/O17: join back to the vertex set — red links drop out,
            # pages with no inbound keep a NULL->0 contribution.
            return vertices.join(sums, "url", "left").select(
                "url",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("contrib_sum"), F.lit(0.0))
                ).alias("rank"),
            )
        # textbook: redistribute dangling mass, normalize constant by N.
        dangling = (
            ranks.join(deg.withColumnRenamed("src", "url"), "url", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        return vertices.join(sums, "url", "left").select(
            "url",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("contrib_sum"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )

    driver = IterationDriver(checkpoint_every=checkpoint_every)
    result = driver.run(ranks, step, n_iters)
    return result


def rank_descending(ranks: DataFrame, limit: int | None = None) -> DataFrame:
    """O19-O21 + O30: global descending sort by rank.

    The reference forces a single reducer for total order
    (PageRank.java:276) — Spark's orderBy range-partitions (sampled
    boundaries) and sorts in parallel. ``url`` breaks ties
    deterministically (the reference's tie order is arbitrary,
    PageRank.java:552-563). With ``limit``, Catalyst plans
    TakeOrderedAndProject — no global sort materialized at all.
    """
    out = ranks.orderBy(F.desc("rank"), F.asc("url"))
    if limit is not None:
        out = out.limit(limit)
    return out
