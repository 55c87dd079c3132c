"""Property test: ngram_jaccard_pairs (with and without the
document-frequency stop-shingle cap) ≡ a pure-Python reference on
random corpora built from a tiny vocabulary (forcing heavy shingle
sharing, the adversarial case for the cap)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_procedure_codes_crawler_spark.llm.dedup import ngram_jaccard_pairs

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]
_DOC = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10).map(" ".join)


def _shingles(text: str, k: int = 3) -> frozenset:
    toks = text.split()
    if len(toks) >= k:
        return frozenset(
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        )
    return frozenset([" ".join(toks)])


def _reference_pairs(texts, threshold, max_doc_freq):
    sets = {i: _shingles(t) for i, t in enumerate(texts)}
    if max_doc_freq is not None:
        df: dict[str, int] = {}
        for s in sets.values():
            for sh in s:
                df[sh] = df.get(sh, 0) + 1
        sets = {
            i: frozenset(sh for sh in s if df[sh] <= max_doc_freq)
            for i, s in enumerate(sets.values())
        }
    out = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter and union and inter / union >= threshold:
            out[(a, b)] = inter / union
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_DOC, min_size=2, max_size=8),
    max_doc_freq=st.sampled_from([None, 1, 2, 3, 100]),
)
def test_jaccard_matches_reference(spark, texts, max_doc_freq):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, threshold=0.3, max_doc_freq=max_doc_freq
        ).collect()
    }
    expected = _reference_pairs(texts, 0.3, max_doc_freq)
    assert set(got) == set(expected)
    for pair, j in expected.items():
        assert abs(got[pair] - j) < 1e-12, pair
