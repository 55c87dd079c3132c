"""Multimodal binary-column plumbing: schemas, batch shape, stub gating."""

from __future__ import annotations

import pytest

from etl_procedure_codes_crawler_spark.llm import multimodal as M


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world", "en", "src0", 11), (2, "abc", "en", "src1", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_media_schema_and_payload_bytes(spark):
    media = M.documents_as_media(_docs(spark))
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "mime", "n_bytes", "source",
    ]
    rows = {r.media_id: r for r in media.collect()}
    assert bytes(rows[1].payload) == b"hello world"
    assert rows[1].n_bytes == 11 and rows[2].n_bytes == 3


def test_feature_extraction_batch_shape(spark):
    features = M.extract_features(M.documents_as_media(_docs(spark)))
    assert features.schema == M.FEATURES_SCHEMA
    rows = {r.media_id: r for r in features.collect()}
    assert len(rows[1].feature) == M.FEATURE_DIM
    # deterministic: byte-histogram of 'abc' = bytes 97,98,99 → slots 1,2,3 of 16
    feats = rows[2].feature
    assert abs(feats[97 % 16] - 1 / 3) < 1e-6
    assert sum(feats) == pytest.approx(1.0, abs=1e-6)


def test_decode_stub_is_gated(spark):
    with pytest.raises(NotImplementedError):
        M._decode_stub(b"payload")


def test_empty_payload_features(spark):
    assert M._fake_features(b"") == [0.0] * M.FEATURE_DIM
