"""Linear quality-model scoring (llm/quality.py)."""

from __future__ import annotations

import pytest

from etl_procedure_codes_crawler_spark.llm import quality as Q


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_prose_outscores_markup_blob(spark):
    prose = (
        "it was the best of times and it was the worst of times and "
        "you could say that the city was full of the sound of it"
    )
    blob = "0xdeadbeef41c3 aa55aa55aa55 fe03b122 0x1189cdef 0xfeedface77"
    rows = {
        r.doc_id: r
        for r in Q.score_documents(_docs(spark, [(1, prose), (2, blob)])).collect()
    }
    assert rows[1].quality_score > rows[2].quality_score
    assert rows[1].keep and not rows[2].keep


def test_custom_model_and_threshold(spark):
    docs = _docs(spark, [(1, "the the the the"), (2, "zzz zzz zzz zzz")])
    model = {"bias": 0.0, "stop_ratio": 1.0}
    out = {
        r.doc_id: r
        for r in Q.score_documents(docs, model=model, threshold=0.5).collect()
    }
    assert out[1].quality_score == 1.0 and out[1].keep  # all stopwords
    assert out[2].quality_score == 0.0 and not out[2].keep


def test_unknown_feature_rejected(spark):
    docs = _docs(spark, [(1, "hello world")])
    with pytest.raises(ValueError, match="unknown quality features"):
        Q.score_documents(docs, model={"bias": 0.0, "perplexity": 1.0})


def test_scoring_is_a_single_projection(spark):
    """Model-as-data: no shuffle, no Python stage — one projection."""
    import re

    docs = _docs(spark, [(i, f"some text number {i}") for i in range(50)])
    plan = (
        Q.score_documents(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not re.findall(r"Exchange hashpartitioning", plan)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestGopherRules:
    """Each Gopher rule flips on a handcrafted document while the
    healthy control passes (llm/quality.py:gopher_rules)."""

    GOOD = (
        "the quick brown fox jumps over that lazy dog and then runs "
        "back to the barn with all of its friends because it can be "
        "fun to have company when the day is long and the sun is out "
        "and everyone wants to play games in the open field together "
        "until it gets dark and they all go home for dinner and rest"
    )

    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return {r.doc_id: r for r in Q.gopher_rules(df, **kw).collect()}

    def test_healthy_doc_keeps(self, spark):
        out = self._run(spark, [(1, self.GOOD)])
        assert out[1].keep
        assert out[1].alpha_ratio == 1.0 and out[1].stop_hits >= 2

    def test_word_count_bounds(self, spark):
        out = self._run(spark, [(1, "too short to be a document")])
        assert not out[1].keep and out[1].n_words < 50
        # lowering the floor admits it (threshold is a knob, not baked)
        out = self._run(
            spark, [(1, "the dog can be of that have with")], min_words=1
        )
        assert out[1].keep

    def test_mean_word_length(self, spark):
        long_words = " ".join(["the", "be"] + ["supercalifragilistic"] * 60)
        out = self._run(spark, [(1, long_words)])
        assert not out[1].keep and out[1].mean_word_len > 10.0

    def test_symbol_ratio(self, spark):
        hashy = self.GOOD + " " + "# # # # # # # # # # # # # # # #"
        out = self._run(spark, [(1, hashy)])
        assert not out[1].keep and out[1].symbol_ratio > 0.1
        dotty = self.GOOD + " " + "... ... ... ... ... ... ... ..."
        out2 = self._run(spark, [(1, dotty)], max_symbol_ratio=0.01)
        assert not out2[1].keep and out2[1].symbol_ratio > 0.01

    def test_bullet_and_ellipsis_lines(self, spark):
        bullets = "\n".join(["- item " + self.GOOD] * 10)
        out = self._run(spark, [(1, bullets)], max_bullet_ratio=0.5)
        assert not out[1].keep and out[1].bullet_ratio == 1.0
        trailing = "\n".join([self.GOOD + " more..."] * 10)
        out2 = self._run(spark, [(1, trailing)])
        assert not out2[1].keep and out2[1].ellipsis_line_ratio == 1.0

    def test_alpha_ratio(self, spark):
        nums = self.GOOD + " " + " ".join(["12345"] * 80)
        out = self._run(spark, [(1, nums)])
        assert not out[1].keep and out[1].alpha_ratio < 0.8

    def test_stopword_rule(self, spark):
        # 60 words, none from the 8-word Gopher list
        nostop = " ".join(["alpha", "beta", "gamma", "delta"] * 15)
        out = self._run(spark, [(1, nostop)])
        assert not out[1].keep and out[1].stop_hits == 0

    def test_map_only_plan(self, spark):
        import re

        df = spark.createDataFrame([(1, self.GOOD)], "doc_id bigint, text string")
        plan = (
            Q.gopher_rules(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert not re.findall(r"Exchange hashpartitioning", plan)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
