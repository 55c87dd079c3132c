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


class TestFrameSampling:
    def test_fanout_counts_and_roundtrip(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.llm import multimodal as M
        from etl_procedure_codes_crawler_spark.plans.relational import load

        media = M.documents_as_media(load(spark, sf_dir, "documents")).limit(50)
        frames = M.sample_frames(media, frame_bytes=100)
        stats = {
            r.media_id: (r.n, r.total)
            for r in frames.groupBy("media_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("frame_bytes").alias("total"))
            .collect()
        }
        for row in media.collect():
            n, total = stats[row.media_id]
            expected_frames = max(1, -(-row.n_bytes // 100))  # ceil, min 1
            assert n == expected_frames
            assert total == row.n_bytes  # slicing loses no bytes

    def test_frame_indices_contiguous(self, spark, sf_dir):
        from etl_procedure_codes_crawler_spark.llm import multimodal as M
        from etl_procedure_codes_crawler_spark.plans.relational import load

        media = M.documents_as_media(load(spark, sf_dir, "documents")).limit(10)
        frames = M.sample_frames(media, frame_bytes=64).collect()
        by_media = {}
        for r in frames:
            by_media.setdefault(r.media_id, []).append(r.frame_idx)
        for idxs in by_media.values():
            assert sorted(idxs) == list(range(len(idxs)))


class TestResize:
    def test_resize_caps_payload(self, spark, sf_dir):
        from etl_procedure_codes_crawler_spark.llm import multimodal as M
        from etl_procedure_codes_crawler_spark.plans.relational import load

        media = M.documents_as_media(load(spark, sf_dir, "documents")).limit(20)
        out = M.resize_media(media, width=8, height=8).collect()
        originals = {r.media_id: r.n_bytes for r in media.collect()}
        for r in out:
            assert r.width == 8 and r.height == 8
            assert r.n_bytes == min(originals[r.media_id], 64)
            assert len(r.payload or b"") == r.n_bytes

    def test_decode_stub_raises(self):
        import pytest as _pytest

        from etl_procedure_codes_crawler_spark.llm.multimodal import _decode_stub

        with _pytest.raises(NotImplementedError):
            _decode_stub(b"payload")
