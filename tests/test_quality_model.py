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
