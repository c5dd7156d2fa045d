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


class TestBpeTrain:
    """text.bpe_train — distributed BPE-merge LEARNING (the trainer
    counterpart of the vendored encoder above)."""

    @staticmethod
    def _reference(weighted_words, num_merges):
        """Brute-force Sennrich-style trainer (driver-side python):
        pair stats count every adjacent (overlapping) occurrence
        weighted by word count; argmax tie-break (count DESC, lhs ASC,
        rhs ASC); merge applied left-to-right, scan resuming AFTER a
        merged token."""
        vocab = {}
        for w, c in weighted_words.items():
            key = tuple(list(w) + ["</w>"])
            vocab[key] = vocab.get(key, 0) + c
        out = []
        for rank in range(1, num_merges + 1):
            stats = {}
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    stats[p] = stats.get(p, 0) + c
            if not stats:
                break
            m = max(stats.values())
            lhs, rhs = sorted(p for p, c in stats.items() if c == m)[0]
            out.append((rank, lhs, rhs, lhs + rhs))
            nxt = {}
            for syms, c in vocab.items():
                merged, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                        merged.append(lhs + rhs)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                key = tuple(merged)
                nxt[key] = nxt.get(key, 0) + c
            vocab = nxt
        return out

    def test_matches_reference_on_corpus(self, spark, sf_dir):
        """Learned merge table == brute-force trainer on the same word
        counts (exercises argmax tie-breaks and the Catalyst fold on
        real data)."""
        import collections
        import re

        from pagerank_mapreduce_implementation_spark.operators import text
        from pagerank_mapreduce_implementation_spark.sources import Catalog

        docs = Catalog(spark, sf_dir).documents
        got = [
            (r["rank"], r["lhs"], r["rhs"], r["merged"])
            for r in text.bpe_train(docs, num_merges=12).collect()
        ]
        words = collections.Counter()
        for (t,) in docs.select("text").collect():
            for w in re.split(r"\s+", t):
                if w:
                    words[w] += 1
        assert sorted(got) == sorted(self._reference(dict(words), 12))

    def test_overlapping_pair_merge_is_left_to_right(self, spark):
        """'aaaa' with merge (a,a): the left-to-right non-overlapping
        pass gives [aa, aa, </w>] — the struct-fold's pending slot must
        not let a merged token act as lhs again in the same pass."""
        from pagerank_mapreduce_implementation_spark.operators import text

        docs = spark.createDataFrame(
            [(1, "aaaa aaaa b")], "doc_id INT, text STRING"
        )
        merges = text.bpe_train(docs, num_merges=2).collect()
        by_rank = {r["rank"]: (r["lhs"], r["rhs"]) for r in merges}
        # (a,a) counts 3 overlapping occurrences x2 words = 6
        assert by_rank[1] == ("a", "a")
        # each 'aaaa' is now [aa, aa, </w>]: (aa,aa)=2 ties (aa,</w>)=2;
        # '</w>' < 'aa' byte-wise so rhs='</w>' wins the tie-break
        assert by_rank[2] == ("aa", "</w>")

    def test_stops_when_pairs_exhausted(self, spark):
        """num_merges past exhaustion stops emitting (every word fused
        to one symbol) — mirrors the oracle's empty-argmax CTEs."""
        from pagerank_mapreduce_implementation_spark.operators import text

        docs = spark.createDataFrame([(1, "ab ab")], "doc_id INT, text STRING")
        merges = text.bpe_train(docs, num_merges=10).collect()
        # (a,b,</w>) fuses to one symbol in exactly 2 merges
        assert len(merges) == 2
        assert [r["merged"] for r in merges] == ["ab", "ab</w>"]


def test_trained_merges_drive_one_at_a_time_encoding(spark, sf_dir):
    """Coherence of trainer and encoder: applying bpe_train's learned
    merge table with the encoder's one-at-a-time leftmost-lowest-rank
    loop reproduces the trainer's own final word segmentations —
    the training-order invariant (every merge's inputs are chars or
    earlier outputs) holds for LEARNED tables too, so the two
    application orders agree (see functions/bpe.py docstring)."""
    import collections
    import re

    from pagerank_mapreduce_implementation_spark.operators import text
    from pagerank_mapreduce_implementation_spark.sources import Catalog

    docs = Catalog(spark, sf_dir).documents
    merges = text.bpe_train(docs, num_merges=16).collect()
    ranks = {(r["lhs"], r["rhs"]): r["rank"] for r in merges}
    # the invariant itself
    produced_at = {lhs + rhs: rank for (lhs, rhs), rank in ranks.items()}
    for (lhs, rhs), rank in ranks.items():
        for part in (lhs, rhs):
            assert len(part) == 1 or part == "</w>" or produced_at[part] < rank

    words = collections.Counter()
    for (t,) in docs.select("text").collect():
        for w in re.split(r"\s+", t):
            if w:
                words[w] += 1
    # reference: replay the trainer (all-occurrences per round)
    vocab = {tuple(list(w) + ["</w>"]): w for w in words}
    for r in sorted(merges, key=lambda m: m["rank"]):
        lhs, rhs = r["lhs"], r["rhs"]
        nxt = {}
        for syms, w in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = w
        vocab = nxt
    expected = {w: syms for syms, w in vocab.items()}

    # encoder order: one-at-a-time leftmost-lowest-rank to fixpoint
    def encode(w):
        pieces = list(w) + ["</w>"]
        while len(pieces) > 1:
            best, bi = None, None
            for i in range(len(pieces) - 1):
                rk = ranks.get((pieces[i], pieces[i + 1]))
                if rk is not None and (best is None or rk < best):
                    best, bi = rk, i
            if bi is None:
                break
            pieces[bi : bi + 2] = [pieces[bi] + pieces[bi + 1]]
        return tuple(pieces)

    for w in words:
        assert encode(w) == expected[w], w
