"""Vendored BPE tokenizer tests: losslessness, determinism, encoder
parity with the windowed chunker, and the training-order invariant the
one-at-a-time encoder (and its DuckDB recursive-CTE oracle) relies on."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pagerank_mapreduce_implementation_spark.functions import bpe


def test_merge_table_loads_and_is_ranked():
    ranks = bpe.load_merge_ranks()
    assert len(ranks) > 50
    assert sorted(ranks.values()) == list(range(len(ranks)))


def test_training_order_invariant():
    """Every merge's left/right symbol is either a single character or
    the output of an EARLIER merge — the invariant that makes
    leftmost-lowest-rank one-at-a-time application equivalent to
    classic all-occurrences BPE (see functions/bpe.py docstring)."""
    ranks = bpe.load_merge_ranks()
    produced_at = {left + right: r for (left, right), r in ranks.items()}
    for (left, right), r in ranks.items():
        for part in (left, right):
            assert len(part) == 1 or produced_at[part] < r, (
                f"merge {r} uses symbol {part!r} produced later"
            )


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_encode_word_lossless_and_deterministic(word):
    ranks = bpe.load_merge_ranks()
    pieces = bpe.encode_word(word, ranks)
    assert "".join(pieces) == word
    assert pieces == bpe.encode_word(word, ranks)
    # fixpoint: no adjacent pair of the output is still mergeable
    assert all(
        (pieces[i], pieces[i + 1]) not in ranks for i in range(len(pieces) - 1)
    )


def test_common_seed_words_compress():
    ranks = bpe.load_merge_ranks()
    assert bpe.encode_word("the", ranks) == ["the"]
    assert len(bpe.encode_word("window", ranks)) < 6  # fewer pieces than chars


def test_encode_text_concatenates_per_word():
    got = bpe.encode_text("The  table")
    assert got == bpe.encode_text("the") + bpe.encode_text("table")
    assert bpe.encode_text("") == []


def test_chunk_documents_bpe_matches_python_reference(spark):
    from pagerank_mapreduce_implementation_spark.operators import text as text_ops

    rows = [(1, "the window table scan merges the sorted stream"), (2, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    window, stride = 5, 3
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk"], r["n_tokens"])
        for r in text_ops.chunk_documents_bpe(df, window=window, stride=stride).collect()
    }
    want = {}
    for doc_id, txt in rows:
        toks = bpe.encode_text(txt)
        n = len(toks)
        if n == 0:
            continue
        n_chunks = min(
            1 + math.ceil(max(0, n - window) / stride), 1 + (n - 1) // stride
        )
        for i in range(n_chunks):
            sl = toks[i * stride : i * stride + window]
            want[(doc_id, i)] = (" ".join(sl), len(sl))
    assert got == want
