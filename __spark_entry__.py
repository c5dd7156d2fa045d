"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference-parity PageRank over
a lineitem-derived supplier graph) at sf0.001. ``queries()`` /
``oracle_sql()`` pair every implemented operator from SURVEY.md §2 with
a DuckDB-equivalent ANSI-SQL oracle; column names are aliased
identically on both sides (the driver hashes values under sorted column
names).

Determinism notes:
- money-style double SUMs go through decimal(18,6) casts on BOTH sides
  (order-independent exact summation; see operators/relational.py).
- every floating-point output column is rounded (6 digits; money 2) on
  BOTH sides, and every top-k sort key includes a unique tiebreak
  column so the limit boundary is identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_mapreduce_implementation_spark.operators import graph, relational, text
from pagerank_mapreduce_implementation_spark.oracles import EDGES_SQL, pagerank_sql
from pagerank_mapreduce_implementation_spark.sources.catalog import Catalog

SEARCH_TERMS = ["spark", "window", "table"]

# DuckDB tokenizer CTEs — must mirror operators/text.py:tokenize
# (whitespace split, drop empties; doc pipeline lowercases).
_TOK = (
    "tok AS (SELECT doc_id, w AS word FROM (SELECT doc_id, "
    "unnest(regexp_split_to_array(text, '\\s+')) AS w FROM documents) WHERE w <> '')"
)
_TOK_LOWER = (
    "tok AS (SELECT doc_id, lower(w) AS word FROM (SELECT doc_id, "
    "unnest(regexp_split_to_array(text, '\\s+')) AS w FROM documents) WHERE w <> '')"
)
_TF = (
    "cnt AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word), "
    "tf AS (SELECT doc_id, word, 1.0 + log10(c) AS tf FROM cnt)"
)
_TFIDF = (
    "dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word), "
    "tfidf AS (SELECT t.doc_id, t.word, t.tf * log10(1.0 + "
    "CAST((SELECT count(*) FROM documents) AS DOUBLE)/dfreq.df) AS tfidf "
    "FROM tf t JOIN dfreq USING (word))"
)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier graph from lineitem — the Spark twin of oracles.EDGES_SQL.

    dst spans 2x the supplier key range: half the targets are red links
    (dropped, PageRank.java:527); duplicate edges occur naturally and
    scatter rank once per occurrence (PageRank.java:454-468).
    """
    cat = Catalog(spark, sf_dir)
    n_supp = cat.supplier.count()
    return cat.lineitem.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(
            F.lit("s"), ((F.col("l_partkey") % (2 * n_supp)) + 1).cast("string")
        ).alias("dst"),
    )


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = graph.pagerank(_edges(spark, sf_dir), n_iters=10, mode="reference")
    return (
        ranks.select("url", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("url"))
        .limit(20)
    )


def _q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.word_count(Catalog(spark, sf_dir).documents)


def _q_doc_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.doc_word_count(Catalog(spark, sf_dir).documents)


def _q_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = text.term_frequency(Catalog(spark, sf_dir).documents)
    return tf.select("doc_id", "word", F.round("tf", 6).alias("tf"))


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = text.tf_idf(Catalog(spark, sf_dir).documents)
    return out.select("doc_id", "word", F.round("tfidf", 6).alias("tfidf"))


def _q_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = text.search(text.tf_idf(Catalog(spark, sf_dir).documents), SEARCH_TERMS)
    return scored.select("doc_id", F.round("score", 6).alias("score"))


def _q_search_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = text.search(text.tf_idf(Catalog(spark, sf_dir).documents), SEARCH_TERMS)
    return (
        scored.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.pricing_summary(Catalog(spark, sf_dir).lineitem)


def _q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return relational.top_customers_by_revenue(cat.customer, cat.orders, cat.lineitem)


def _q_nation_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return relational.nation_order_stats(cat.customer, cat.orders, cat.nation, cat.region)


def _q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return relational.order_priority_counts(cat.orders, cat.lineitem)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 10-iteration reference-parity PageRank at sf0.001."""
    return _q_pagerank(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pagerank_top20": _q_pagerank,
        "word_count": _q_word_count,
        "doc_word_count": _q_doc_word_count,
        "term_frequency": _q_term_frequency,
        "tfidf": _q_tfidf,
        "search": _q_search,
        "search_top10": _q_search_top10,
        "pricing_summary": _q_pricing_summary,
        "top_customers": _q_top_customers,
        "nation_order_stats": _q_nation_order_stats,
        "order_priority": _q_order_priority,
    }


def oracle_sql() -> dict[str, str]:
    terms = ", ".join(f"'{t}'" for t in SEARCH_TERMS)
    return {
        "pagerank_top20": pagerank_sql(EDGES_SQL, n_iters=10, limit=20),
        "word_count": (
            f"WITH {_TOK} SELECT word, count(*) AS cnt FROM tok GROUP BY word"
        ),
        "doc_word_count": (
            f"WITH {_TOK_LOWER} "
            "SELECT doc_id, word, count(*) AS cnt FROM tok GROUP BY doc_id, word"
        ),
        "term_frequency": (
            f"WITH {_TOK_LOWER}, {_TF} "
            "SELECT doc_id, word, round(tf, 6) AS tf FROM tf"
        ),
        "tfidf": (
            f"WITH {_TOK_LOWER}, {_TF}, {_TFIDF} "
            "SELECT doc_id, word, round(tfidf, 6) AS tfidf FROM tfidf"
        ),
        "search": (
            f"WITH {_TOK_LOWER}, {_TF}, {_TFIDF} "
            f"SELECT doc_id, round(sum(tfidf), 6) AS score FROM tfidf "
            f"WHERE word IN ({terms}) GROUP BY doc_id"
        ),
        "search_top10": (
            f"WITH {_TOK_LOWER}, {_TF}, {_TFIDF} "
            f"SELECT doc_id, round(sum(tfidf), 6) AS score FROM tfidf "
            f"WHERE word IN ({terms}) GROUP BY doc_id "
            "ORDER BY score DESC, doc_id ASC LIMIT 10"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty, "
            "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_base_price, "
            "round(CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_disc_price, "
            "round(CAST(sum(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_charge, "
            "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)/count(*), 6) AS avg_qty, "
            "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/count(*), 6) AS avg_price, "
            "round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/count(*), 6) AS avg_disc, "
            "count(*) AS count_order "
            "FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01' "
            "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
        ),
        "top_customers": (
            "WITH rev AS (SELECT o_custkey, "
            "round(CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_custkey) "
            "SELECT c_custkey, c_name, revenue FROM rev "
            "JOIN customer ON o_custkey = c_custkey "
            "ORDER BY revenue DESC, c_custkey ASC LIMIT 10"
        ),
        "nation_order_stats": (
            "SELECT r_name, n_name, count(*) AS order_cnt, "
            "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_price "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name, n_name ORDER BY r_name, n_name"
        ),
        "order_priority": (
            "SELECT o_orderpriority, count(*) AS order_cnt FROM orders o "
            "WHERE EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05) "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
    }
