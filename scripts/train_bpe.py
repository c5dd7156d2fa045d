"""Offline BPE trainer for the vendored merge table.

Trains a small character-level BPE merge list (classic Sennrich-style
byte-pair encoding: repeatedly merge the most frequent adjacent symbol
pair) on the fixed English seed text embedded below, and writes the
ranked merges to ``pagerank_mapreduce_implementation_spark/resources/bpe_merges.txt``
(one merge per line: ``left<TAB>right``, line number = rank).

Run once at build time; the output is vendored so tokenization is fully
deterministic and self-contained (no downloads, no runtime training).
The seed text is original filler prose over common English vocabulary —
its only job is to give the merge table realistic English bigram
statistics. Determinism: pair ties break lexicographically, so the same
seed always yields the same merge list.

Training guarantees the invariant the one-at-a-time encoder relies on:
a merged symbol exists only AFTER the merge that creates it, so any
pair containing it has a strictly higher rank than that merge — which
makes leftmost-lowest-rank single-pair application equivalent to the
classic "merge all occurrences of the best pair" loop.
"""

from __future__ import annotations

import collections
import pathlib

N_MERGES = 200

SEED_TEXT = """
the quick data system reads every table and writes every row to the
store while the planner keeps the cost of each scan low and the join
order stable across runs the worker sorts the keys and merges the
partial results into one sorted stream so that the final pass can
group the values and count them without holding the whole input in
memory a good pipeline filters early projects only the needed columns
and pushes the predicate down to the scan so the reader skips whole
blocks of the file the schedule places each task near its data and
retries the slow ones on another machine when the stragglers hold the
stage back the shuffle moves the rows between the workers by hashing
the key and the reducer streams the sorted runs together the window
functions rank the rows inside each partition and the sample keeps a
small share of the stream for the profile the text tokenizer splits
the words and counts them and the search ranks the documents by the
sum of their term scores the graph walker spreads the rank of each
page along its links and gathers the sums at the targets until the
values settle the cache keeps the hot table in memory and drops the
cold blocks first the writer packs the rows into columnar pages and
the footer keeps the statistics that let the next reader prune the
stripes the stream keeps an event time watermark and closes a window
only when the late data has had its chance the state store holds the
running counts and the checkpoint makes the whole job restart safe
this simple steady language gives the trainer common english pairs
like th he in er an re on at en nd ti es or te of ed is it al ar st
to nt ng se ha as ou io le ve co me de hi ri ro ic ne ea ra ce li
ch ll be ma si om ur
"""


def train(text: str, n_merges: int) -> list[tuple[str, str]]:
    words = collections.Counter(text.split())
    # symbol sequences per distinct word, weighted by frequency
    seqs: dict[tuple[str, ...], int] = {
        tuple(w): f for w, f in words.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for seq, freq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # most frequent pair; lexicographic tie-break for determinism
        best, best_n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_n < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, freq in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[tuple(out)] = new_seqs.get(tuple(out), 0) + freq
        seqs = new_seqs
    return merges


def main() -> None:
    merges = train(SEED_TEXT.lower(), N_MERGES)
    out = (
        pathlib.Path(__file__).resolve().parent.parent
        / "pagerank_mapreduce_implementation_spark"
        / "resources"
        / "bpe_merges.txt"
    )
    with open(out, "w") as fh:
        for left, right in merges:
            fh.write(f"{left}\t{right}\n")
    print(f"wrote {len(merges)} merges to {out}")


if __name__ == "__main__":
    main()
