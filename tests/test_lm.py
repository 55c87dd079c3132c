"""Bigram-LM perplexity scoring (llm/lm.py) vs a numpy replica."""

from __future__ import annotations

import math

import pytest

from etl_procedure_codes_crawler_spark.llm.lm import bigram_lm_perplexity
from etl_procedure_codes_crawler_spark.plans.relational import load


def _np_log_ppl(corpus: dict[int, str], k: float) -> dict[int, float | None]:
    """Pure-python replica: same tokenization (whitespace — NB Spark's
    split(trim(''), '\\s+') yields [''] on empty text, so the empty
    token is a vocab member, exactly like the engine), same add-k
    bigram model trained on the corpus, position-ordered summation."""
    import re

    toks = {i: re.split(r"\s+", t.strip()) for i, t in corpus.items()}
    vocab = {w for ts in toks.values() for w in ts}
    c1: dict[str, int] = {}
    c2: dict[tuple[str, str], int] = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            c1[a] = c1.get(a, 0) + 1
            c2[(a, b)] = c2.get((a, b), 0) + 1
    out: dict[int, float | None] = {}
    for i, ts in toks.items():
        if len(ts) < 2:
            out[i] = None
            continue
        s = 0.0
        for a, b in zip(ts, ts[1:]):
            s += math.log((c2[(a, b)] + k) / (c1[a] + k * len(vocab)))
        out[i] = -s / (len(ts) - 1)
    return out


class TestBigramLmPerplexity:
    CORPUS = {
        0: "the cat sat on the mat",
        1: "the cat sat on the hat",
        2: "the dog sat on the mat",
        # word salad: COMMON prefixes with never-seen continuations —
        # the signature a self-trained bigram LM actually punishes (a
        # doc of purely self-repeating novel bigrams would look typical
        # to a model trained on a corpus containing it)
        3: "the zx on qq sat vv the ww",
        4: "one",  # single token: no transitions
        5: "",  # empty
    }

    def _spark_scores(self, spark, cutoff=None):
        df = spark.createDataFrame(
            list(self.CORPUS.items()), "doc_id long, text string"
        )
        return {
            r["doc_id"]: r
            for r in bigram_lm_perplexity(df, k=0.5, cutoff=cutoff).collect()
        }

    def test_matches_python_replica(self, spark):
        expected = _np_log_ppl(self.CORPUS, k=0.5)
        got = self._spark_scores(spark)
        for i, exp in expected.items():
            if exp is None:
                assert got[i]["log_ppl"] is None
                assert got[i]["n_bigrams"] == 0
            else:
                assert got[i]["log_ppl"] == pytest.approx(exp, abs=1e-6)

    def test_gibberish_scores_worse_than_prose(self, spark):
        got = self._spark_scores(spark)
        prose = [got[i]["log_ppl"] for i in (0, 1, 2)]
        assert got[3]["log_ppl"] > max(prose)

    def test_cutoff_keeps_short_docs_and_splits_on_threshold(self, spark):
        base = self._spark_scores(spark)
        # a cutoff strictly between prose and gibberish scores
        cut = (
            max(base[i]["log_ppl"] for i in (0, 1, 2))
            + base[3]["log_ppl"]
        ) / 2
        got = self._spark_scores(spark, cutoff=cut)
        assert got[0]["keep"] and got[1]["keep"] and got[2]["keep"]
        assert not got[3]["keep"]
        # no transitions to judge -> kept (length gates are separate)
        assert got[4]["keep"] and got[5]["keep"]

    def test_deterministic_across_runs(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents")
        a = sorted(bigram_lm_perplexity(docs).collect())
        b = sorted(bigram_lm_perplexity(docs).collect())
        assert a == b

    def test_bad_k_raises(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="k > 0"):
            bigram_lm_perplexity(df, k=0.0)
