"""Round-12 STAGED operators (cohort 3) — built this round, queued for
a later driver window (the round-8 capacity policy; the r12 window is
full with tranche 1 + the due r9 cohort). Until registered this file is
their correctness gate: DuckDB-oracle parity at sf0.001 through the
same normalize/compare the registry harness uses, plus semantics on
hand-checkable fixtures."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_mapreduce_implementation_spark import oracles
from pagerank_mapreduce_implementation_spark.operators import sampling, similarity
from pagerank_mapreduce_implementation_spark.sources.catalog import Catalog

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


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


_QUERY_IDS = [0, 7, 23]


# --- oracle parity (the registry harness comparison) -----------------------


def test_ann_recall_parity(spark, sf_dir, duck):
    got = similarity.ann_recall_report(
        Catalog(spark, sf_dir).embeddings, _QUERY_IDS, k=10, n_cells=16, n_probe=4
    )
    check(got, duck, oracles.ann_recall_sql(_QUERY_IDS, k=10, n_cells=16, n_probe=4))


def test_token_budget_mix_parity(spark, sf_dir, duck):
    # testdata sources are src0..src19, ~1.4k ws-tokens each: these
    # budgets exercise partial fill, near-total fill, and a tiny quota
    budgets = {"src0": 600, "src1": 1200, "src2": 40}
    got = sampling.token_budget_mix(Catalog(spark, sf_dir).documents, budgets)
    out = got.toPandas()
    assert len(out) > 0, "vacuous gate: no source matched a budget"
    check(got, duck, oracles.token_budget_mix_sql(budgets))


# --- semantics on hand-checkable fixtures ----------------------------------


def test_ann_recall_full_probe_is_exhaustive(spark, sf_dir):
    """n_probe == n_cells scans every cell — the index IS brute force,
    so recall must be exactly 1.0 for every query."""
    emb = Catalog(spark, sf_dir).embeddings
    rows = similarity.ann_recall_report(
        emb, _QUERY_IDS, k=5, n_cells=8, n_probe=8
    ).collect()
    assert len(rows) == len(_QUERY_IDS)
    assert all(r["recall"] == 1.0 and r["hits"] == r["n_truth"] for r in rows)


def test_ann_recall_probe_limited_and_bounds(spark):
    """A query whose true neighbors live in an unprobed cell scores
    recall < 1; n_truth caps at corpus-1 when the corpus is under k."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),     # seed cell 1 (query)
            (1, [0.0, 1.0]),     # seed cell 2
            (2, [0.99, 0.14]),   # near the query -> lands in cell 1
            (3, [0.14, 0.99]),   # cell 2
            (4, [0.97, 0.24]),   # cell 1
        ],
        "vec_id long, embedding array<double>",
    )
    full = {
        r["query_id"]: r
        for r in similarity.ann_recall_report(
            emb, [0], k=10, n_cells=2, n_probe=2
        ).collect()
    }
    assert full[0]["n_truth"] == 4  # corpus-1 < k
    assert full[0]["recall"] == 1.0
    limited = {
        r["query_id"]: r
        for r in similarity.ann_recall_report(
            emb, [0], k=10, n_cells=2, n_probe=1
        ).collect()
    }
    # probing only the query's own cell misses the cell-2 vectors
    assert limited[0]["hits"] == 2 and limited[0]["n_truth"] == 4
    assert limited[0]["recall"] == 0.5
    with pytest.raises(ValueError):
        similarity.ann_recall_report(emb, [], k=5)
    with pytest.raises(ValueError):
        similarity.ann_recall_report(emb, [0], k=0)


def test_token_budget_mix_greedy_fill(spark):
    """Per source, docs enter best-score-first while the PRIOR total is
    under budget — the straddling doc is kept; unbudgeted sources and
    exhausted budgets drop; bad budgets raise."""
    docs = spark.createDataFrame(
        [
            # source a: scores 9 > 8 > 7, 3 tokens each, budget 5:
            # doc 1 (cb=0) kept, doc 2 (cb=3 < 5) kept straddling,
            # doc 3 (cb=6 >= 5) dropped
            (1, "a", 9, "t t t"),
            (2, "a", 8, "t t t"),
            (3, "a", 7, "t t t"),
            # source b: budget 1 -> only the best doc survives
            (4, "b", 5, "x y"),
            (5, "b", 4, "x y"),
            # source c: no budget entry -> dropped entirely
            (6, "c", 99, "z z z z"),
        ],
        "doc_id long, source string, n_chars long, text string",
    )
    out = {
        r["doc_id"]: r["n_tokens"]
        for r in sampling.token_budget_mix(
            docs, {"a": 5, "b": 1}
        ).collect()
    }
    assert out == {1: 3, 2: 3, 4: 2}
    with pytest.raises(ValueError):
        sampling.token_budget_mix(docs, {})
    with pytest.raises(ValueError):
        sampling.token_budget_mix(docs, {"a": 0})


def test_token_budget_mix_tiebreak_is_key_asc(spark):
    """Equal scores: the lower doc_id wins the last budget slot."""
    docs = spark.createDataFrame(
        [(10, "s", 1, "w w"), (11, "s", 1, "w w")],
        "doc_id long, source string, n_chars long, text string",
    )
    rows = sampling.token_budget_mix(docs, {"s": 2}).collect()
    assert [r["doc_id"] for r in rows] == [10]
