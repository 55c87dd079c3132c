"""Property tests: duplicate_spans ≡ a pure-Python diagonal-run
reference, and unimax_budgets ≡ the greedy water-filling replica with
its invariants — on random corpora from a tiny vocabulary (forcing
heavy gram sharing, the adversarial case)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_procedure_codes_crawler_spark.llm.dedup import duplicate_spans
from etl_procedure_codes_crawler_spark.llm.mixture import unimax_budgets

_WORDS = ["a", "b", "c"]
_DOC = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(
    " ".join
)


def _reference_spans(texts, min_len):
    """Maximal shared runs per doc pair via brute-force diagonal scan."""
    toks = {i: t.split() for i, t in enumerate(texts)}
    out = set()
    for a, b in combinations(sorted(toks), 2):
        ta, tb = toks[a], toks[b]
        for diag in range(-(len(tb)), len(ta) + 1):
            run = 0
            # scan pos_a from 1..len(ta)-min_len+1 gram starts; a gram
            # match at (pa, pb=pa-diag) means min_len tokens equal
            for pa in range(1, len(ta) - min_len + 2):
                pb = pa - diag
                ok = (
                    1 <= pb <= len(tb) - min_len + 1
                    and ta[pa - 1 : pa - 1 + min_len]
                    == tb[pb - 1 : pb - 1 + min_len]
                )
                if ok:
                    run += 1
                else:
                    if run:
                        start = pa - run
                        out.add(
                            (a, b, start, start - diag, run + min_len - 1)
                        )
                    run = 0
            if run:
                start = len(ta) - min_len + 2 - run
                out.add((a, b, start, start - diag, run + min_len - 1))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_DOC, min_size=2, max_size=5))
def test_duplicate_spans_match_reference(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        tuple(r)
        for r in duplicate_spans(
            docs, min_len=3, max_gram_freq=10**9
        ).collect()
    }
    assert got == _reference_spans(texts, 3)


def _py_unimax(counts, max_epochs, budget):
    xs = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(xs)
    k, p = 0, 0
    for i, (_, c) in enumerate(xs, 1):
        if max_epochs * c * (n - i + 1) + max_epochs * p <= budget:
            k += 1
            p += c
        else:
            break
    share = (budget - max_epochs * p) // (n - k) if n > k else None
    return {
        s: (i < k, max_epochs * c if i < k else share)
        for i, (s, c) in enumerate(xs)
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.dictionaries(
        st.sampled_from(["s1", "s2", "s3", "s4", "s5", "s6"]),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=6,
    ),
    max_epochs=st.integers(min_value=1, max_value=5),
    budget=st.integers(min_value=1, max_value=200_000),
)
def test_unimax_matches_replica_and_invariants(
    spark, counts, max_epochs, budget
):
    per_source = spark.createDataFrame(
        [(s, 1, c) for s, c in counts.items()],
        "source string, n_docs long, n_tokens long",
    )
    out = unimax_budgets(
        per_source, max_epochs=max_epochs, budget_tokens=budget
    ).collect()
    want = _py_unimax(counts, max_epochs, budget)
    assert {r.source: (r.capped, r.alloc_tokens) for r in out} == want
    # invariants: ceiling respected, budget never overspent, leftover
    # below one per-source share
    assert all(r.alloc_tokens <= max_epochs * r.n_tokens for r in out)
    spent = sum(r.alloc_tokens for r in out)
    assert spent <= budget
    uncapped = [r for r in out if not r.capped]
    if uncapped:
        assert budget - spent < max_epochs * 1 + len(out)
        # every uncapped source gets the same share
        assert len({r.alloc_tokens for r in uncapped}) == 1
