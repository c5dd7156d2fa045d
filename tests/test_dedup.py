"""Behavioral tests for dedup operators: recall on planted duplicates,
not just oracle agreement (the oracle can't tell us the operator finds
what it should — these fixtures can)."""

from __future__ import annotations

import pytest

from pagerank_mapreduce_implementation_spark.operators import dedup


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup of 1
        (4, "completely different content about spark engines"),
        (5, "THE  Quick Brown   fox jumps over the lazy dog"),  # exact after norm
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalizes(spark, planted):
    out = {r["doc_id"]: r for r in dedup.exact_dedup(planted).collect()}
    assert out[2]["keeper"] == 1 and out[2]["is_dup"] == 1
    assert out[5]["keeper"] == 1 and out[5]["is_dup"] == 1  # case/whitespace
    assert out[3]["is_dup"] == 0  # near-dup is NOT an exact dup
    assert out[4]["is_dup"] == 0


def test_incremental_exact_dedup(spark, planted):
    # seen store = fingerprints of docs 1-2 (one distinct fingerprint);
    # new batch = docs 3-5: 5 collides with the store (normalized dup
    # of 1), 3 and 4 are genuinely new
    seen = (
        dedup.exact_dedup(planted.filter("doc_id <= 2"))
        .select("fingerprint")
        .distinct()
    )
    batch = planted.filter("doc_id >= 3")
    out = {r["doc_id"] for r in dedup.incremental_exact_dedup(batch, seen).collect()}
    assert out == {3, 4}
    # in-batch rule: two copies inside one batch keep only the min id
    batch2 = spark.createDataFrame(
        [(7, "same text"), (8, "same text"), (9, "other")],
        "doc_id long, text string",
    )
    empty_seen = seen.filter("1 = 0")
    out2 = {r["doc_id"] for r in dedup.incremental_exact_dedup(batch2, empty_seen).collect()}
    assert out2 == {7, 9}


def test_minhash_finds_planted_near_dup(spark, planted):
    # bands=8 (r=2): collision threshold ~(1/8)^(1/2)=0.35 — right for
    # catching 0.5-jaccard pairs. The default bands=4 targets ~0.7+ and
    # misses some 0.78 pairs (band-limited recall, by design).
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_near_dups(planted, threshold=0.5, bands=8).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.7  # 1-word edit
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard_exact_recall(spark, planted):
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in dedup.ngram_jaccard_pairs(planted, 0.4, 3).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_simhash_hamming_zero_for_exact(spark, planted):
    out = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(planted, max_hamming=10).collect()
    }
    assert out[(1, 2)] == 0  # identical token multiset
    assert (1, 3) in out  # near dup within 10 bits


def test_error_and_empty_paths(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    # empty corpora flow through every dedup op with stable schemas
    assert dedup.exact_dedup(empty).count() == 0
    assert dedup.minhash_near_dups(empty, 0.5).count() == 0
    assert dedup.ngram_jaccard_pairs(empty, 0.5).count() == 0
    assert dedup.simhash_near_dups(empty).count() == 0
    # bands that don't divide num_hashes would silently drop rows
    with pytest.raises(ValueError, match="evenly divide"):
        dedup.minhash_near_dups(empty, 0.5, num_hashes=16, bands=3)


def test_pagerank_error_and_empty_paths(spark):
    from pagerank_mapreduce_implementation_spark.operators import graph

    empty = spark.createDataFrame([], "src string, dst string")
    out = graph.pagerank(empty, n_iters=2)
    assert out.count() == 0 and out.columns == ["url", "rank"]
    with pytest.raises(ValueError, match="unknown mode"):
        graph.pagerank(empty, n_iters=1, mode="nonsense")


def test_similarity_empty_paths(spark):
    from pagerank_mapreduce_implementation_spark.operators import similarity

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert similarity.cosine_topk(empty, 0).count() == 0
    assert similarity.cosine_pairs_lsh(empty, 0.5).count() == 0
    assert similarity.ivf_topk(empty, 0).count() == 0


def test_shingles_ngram_windows(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = sorted(r["shingle"] for r in dedup.shingles(docs, 3).collect())
    assert got == ["a b c", "b c d"]
    # shorter than n -> no shingles
    docs2 = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert dedup.shingles(docs2, 3).count() == 0


def test_exact_dedup_skew_safe_property_equal(spark, planted):
    """skew_safe=True (groupBy+join, AQE-splittable hot keys) must be
    row-for-row identical to the window plan — on the planted fixture
    AND on random corpora with a deliberately hot fingerprint."""
    import random

    def rows_of(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows_of(dedup.exact_dedup(planted)) == rows_of(
        dedup.exact_dedup(planted, skew_safe=True)
    )

    rng = random.Random(17)
    # 300 rows, ~60% of them the SAME text (the hot-fingerprint case
    # the skew_safe plan exists for), rest drawn from 20 templates
    hot = "boilerplate cookie banner accept all cookies"
    corpus = [
        (i, hot if rng.random() < 0.6 else f"doc variant {rng.randrange(20)}")
        for i in range(300)
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    a = rows_of(dedup.exact_dedup(docs))
    b = rows_of(dedup.exact_dedup(docs, skew_safe=True))
    assert a == b and len(a) == 300


def test_ngram_containment_catches_embedded_doc(spark):
    """A small doc fully embedded in a large one: Jaccard ~small,
    containment == 1.0 — the asymmetric operator's reason to exist."""
    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated text entirely different")],
        "doc_id long, text string",
    )
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.ngram_containment_pairs(docs, 0.5, ngram=3).collect()
    }
    assert cont[(1, 2)] == 1.0  # every 3-gram of the small doc is in the big
    assert (1, 3) not in cont and (2, 3) not in cont
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, 0.0001, ngram=3).collect()
    }
    assert jac[(1, 2)] < 0.05  # symmetric Jaccard would have missed it
