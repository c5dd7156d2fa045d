"""STAGED operators queued for a later driver window — the round-16
continuation cohort (hybrid_rrf_search, blocklist_hits, encoding_qa).
Until registered this file is their correctness gate: DuckDB parity
through the registry harness's normalize/compare, plus semantics on
hand-checkable fixtures and plan-shape asserts (registered entries
keep their tests here as the local regression gate)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_mapreduce_implementation_spark import oracles
from pagerank_mapreduce_implementation_spark.operators import similarity
from pagerank_mapreduce_implementation_spark.sources.catalog import Catalog

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SEARCH_TERMS = ["spark", "window", "table"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def check(spark_df, duck_con, oracle_sql):
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.sql(oracle_sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    for col in got.columns:
        gk, wk = got[col].dtype.kind, want[col].dtype.kind
        assert not ((gk in "iu" and wk == "f") or (gk == "f" and wk in "iu")), (
            f"{col}: integer-vs-float divergence ({got[col].dtype} vs {want[col].dtype})"
        )


# --- hybrid retrieval: reciprocal-rank fusion ------------------------------


def test_hybrid_rrf_parity(spark, sf_dir, duck):
    got = similarity.hybrid_rrf_search(
        Catalog(spark, sf_dir).documents,
        Catalog(spark, sf_dir).embeddings,
        SEARCH_TERMS,
        query_vec_id=0,
        n=50,
        k=10,
    )
    rows = got.collect()
    assert len(rows) == 10
    # non-vacuous: fusion must actually fuse — at least one returned doc
    # carries BOTH branch ranks
    assert any(
        r["lex_rank"] is not None and r["sem_rank"] is not None for r in rows
    ), "vacuous: no doc appeared in both branches' top-n"
    check(got, duck, oracles.hybrid_rrf_search_sql(SEARCH_TERMS, 0, 50, 10))


def test_hybrid_rrf_semantics(spark):
    """Textbook-RRF hand calc: BM25 ranks doc2 over doc1 (shorter doc,
    same idf), cosine ranks 1 > 3 > 2 — fusion flips the lexical
    winner because doc1 places well in BOTH branches, and a doc absent
    from one branch gets a NULL rank contributing 0."""
    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple"), (3, "cherry")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.6, 0.8]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = similarity.hybrid_rrf_search(
        docs, emb, ["apple"], query_vec_id=0, n=10, k=10
    ).collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3]
    r1, r2, r3 = out
    # lex: doc2 rank 1, doc1 rank 2 (bm25 length normalization);
    # sem: vec1 rank 1 (cos 1), vec3 rank 2 (cos .6), vec2 rank 3 (cos 0)
    assert (r1["lex_rank"], r1["sem_rank"]) == (2, 1)
    assert (r2["lex_rank"], r2["sem_rank"]) == (1, 3)
    assert r3["lex_rank"] is None and r3["sem_rank"] == 2
    assert r1["rrf"] == round(1 / 62 + 1 / 61, 6)
    assert r2["rrf"] == round(1 / 61 + 1 / 63, 6)
    assert r3["rrf"] == round(1 / 62, 6)


def test_hybrid_rrf_n_cutoff(spark):
    """The top-n cut is per-branch: with n=2 the semantic branch keeps
    only vecs 1 and 3, so doc2 loses its semantic contribution
    entirely (NULL sem_rank) while keeping its lexical one."""
    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple"), (3, "cherry")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.6, 0.8]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["doc_id"]: r
        for r in similarity.hybrid_rrf_search(
            docs, emb, ["apple"], query_vec_id=0, n=2, k=10
        ).collect()
    }
    assert rows[2]["sem_rank"] is None
    assert rows[2]["rrf"] == round(1 / 61, 6)


def test_hybrid_rrf_guards(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    emb = Catalog(spark, sf_dir).embeddings
    with pytest.raises(ValueError):
        similarity.hybrid_rrf_search(docs, emb, ["a"], 0, n=0)
    with pytest.raises(ValueError):
        similarity.hybrid_rrf_search(docs, emb, ["a"], 0, rrf_k=0)
    with pytest.raises(ValueError):
        similarity.hybrid_rrf_search(docs, emb, [], 0)


def test_hybrid_rrf_plan_shape(spark, sf_dir):
    """Each branch must end in a TakeOrderedAndProject BEFORE rank
    assignment (the window runs on <= n rows, never the corpus), and
    the documents scan prunes to (doc_id, text)."""
    import re as _re

    df = similarity.hybrid_rrf_search(
        Catalog(spark, sf_dir).documents,
        Catalog(spark, sf_dir).embeddings,
        SEARCH_TERMS,
        query_vec_id=0,
        n=50,
        k=10,
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("TakeOrderedAndProject") >= 2
    for scan_cols in _re.findall(r"FileScan parquet \[([^\]]*)\]", p):
        cols = [c.split("#")[0] for c in scan_cols.split(",")]
        assert "lang" not in cols and "label" not in cols
