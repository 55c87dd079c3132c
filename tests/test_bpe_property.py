"""Property tests for the driver-side BPE merge loop (llm/bpe.py).

The distributed loop is pinned against the driver loop and the
Sennrich replica on a fixed corpus in test_bpe.py; here hypothesis
drives the DRIVER loop (pure Python — no Spark job per example)
against the straightforward recount replica over random vocabularies,
so the incremental pair-count + occurrence-index bookkeeping is
exercised across merge/overlap/tie shapes no hand-written corpus
would cover.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_procedure_codes_crawler_spark.llm.bpe import _train_driver


def _ref_merges(word_freqs: dict[str, int], num_merges: int, min_pair_freq: int):
    """Sennrich recount reference (the same replica test_bpe.py pins
    the Spark paths against)."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        top = max(pairs.values())
        if top < min_pair_freq:
            break
        best = min(p for p, c in pairs.items() if c == top)
        merges.append((best[0], best[1], top))
        merged = best[0] + best[1]
        new_vocab: dict = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


# a 3-letter alphabet maximizes pair collisions, overlap runs ("aaaa")
# and ties — the hard cases for incremental bookkeeping
_WORDS = st.text(alphabet="abc", min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(
    freqs=st.dictionaries(_WORDS, st.integers(1, 9), min_size=1, max_size=12),
    num_merges=st.integers(0, 25),
    min_pair_freq=st.integers(1, 3),
)
def test_incremental_driver_loop_matches_recount_reference(
    freqs, num_merges, min_pair_freq
):
    word_freqs = sorted(freqs.items())
    merges, rows = _train_driver(word_freqs, num_merges, min_pair_freq, "stop")
    ref, ref_vocab = _ref_merges(freqs, num_merges, min_pair_freq)
    assert [(left, right, cnt) for _r, left, right, cnt in merges] == ref
    # the final symbol tables agree word-by-word
    got_vocab: Counter = Counter()
    for _w, f, syms in rows:
        got_vocab[tuple(syms)] += f
    assert got_vocab == Counter(ref_vocab)


@settings(max_examples=100, deadline=None)
@given(
    freqs=st.dictionaries(_WORDS, st.integers(1, 9), min_size=1, max_size=10),
)
def test_driver_loop_segmentations_reconstruct_words(freqs):
    """Invariant regardless of the merge path: concatenating a word's
    final symbols reproduces the word exactly (symbols are contiguous
    substrings), and every frequency is preserved."""
    word_freqs = sorted(freqs.items())
    _merges, rows = _train_driver(word_freqs, 15, 2, "stop")
    assert {(w, f) for w, f, _s in rows} == set(word_freqs)
    for w, _f, syms in rows:
        assert "".join(syms) == w
