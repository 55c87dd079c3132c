"""Persisted perceptual-hash store + the streaming media ingest gate
(llm/phash_store.py, streaming/incremental.stream_ingest_media_neardup)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

import etl_procedure_codes_crawler_spark.llm.multimodal as M
import etl_procedure_codes_crawler_spark.llm.phash_store as PS


def _png_media(spark, rows):
    """rows: (media_id, text) -> real PNG media frame."""
    docs = spark.createDataFrame(
        [(i, t, "src") for i, t in rows],
        "doc_id long, text string, source string",
    )
    return M.documents_as_png(docs, corrupt_every=0)


class TestPhashStore:
    def test_append_idempotent_and_probe_finds_twins(self, spark, tmp_path):
        store = str(tmp_path / "store")
        PS.create_phash_store(spark, store)
        base = M.image_hashes(
            _png_media(spark, [(1, "alpha beta " * 9), (2, "other words " * 7)])
        )
        assert PS.append_to_phash_store(spark, store, base) == 2
        # replayed append is a no-op
        assert PS.append_to_phash_store(spark, store, base) == 0
        # a byte-identical twin under a new id probes at hamming 0
        twin = M.image_hashes(_png_media(spark, [(100, "alpha beta " * 9)]))
        got = {
            (r.new_id, r.existing_id, r.hamming)
            for r in PS.near_dups_against_phash_store(
                spark, store, twin
            ).collect()
        }
        assert got == {(100, 1, 0)}
        # an unrelated image probes clean
        other = M.image_hashes(
            _png_media(spark, [(200, "entirely different content here " * 5)])
        )
        assert (
            PS.near_dups_against_phash_store(spark, store, other).count() == 0
        )

    def test_null_hashes_never_stored(self, spark, tmp_path):
        store = str(tmp_path / "store")
        PS.create_phash_store(spark, store)
        hashes = spark.createDataFrame(
            [(1, None, "e"), (2, 42, None)],
            "media_id long, phash long, decode_error string",
        )
        assert PS.append_to_phash_store(spark, store, hashes) == 1
        assert {r.id for r in PS.read_phash_store(spark, store).collect()} == {2}


class TestStreamIngestMediaNearDup:
    def _drop(self, spark, source_dir, name, rows):
        import glob
        import shutil
        import tempfile

        staging = tempfile.mkdtemp()
        _png_media(spark, rows).repartition(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(source_dir, f"{name}.parquet"))
        shutil.rmtree(staging, ignore_errors=True)

    def _run(self, spark, dirs):
        from etl_procedure_codes_crawler_spark.streaming.incremental import (
            stream_ingest_media_neardup,
        )

        q = stream_ingest_media_neardup(
            spark,
            dirs["source"],
            M.MEDIA_SCHEMA,
            dirs["warehouse"],
            dirs["store"],
            dirs["checkpoint"],
        )
        q.awaitTermination(180)
        q.stop()

    @pytest.fixture()
    def dirs(self, tmp_path, spark):
        src = tmp_path / "in"
        src.mkdir()
        d = {
            "source": str(src),
            "warehouse": str(tmp_path / "wh"),
            "store": str(tmp_path / "store"),
            "checkpoint": str(tmp_path / "ck"),
        }
        PS.create_phash_store(spark, d["store"])
        return d

    def test_gate_rejects_perceptual_copies_across_batches(self, spark, dirs):
        # batch 1: two distinct images, plus an intra-batch twin of the
        # first (same pixels, new id) that must collapse to one
        self._drop(
            spark,
            dirs["source"],
            "b1",
            [
                (1, "the quick brown fox " * 8),
                (2, "completely different words " * 6),
                (31, "the quick brown fox " * 8),  # intra twin of 1
            ],
        )
        self._run(spark, dirs)
        got1 = sorted(
            r.media_id
            for r in spark.read.parquet(dirs["warehouse"]).collect()
        )
        assert got1 == [1, 2]  # twin 31 collapsed in-batch
        # batch 2: a re-hosted copy of image 1 + a genuinely new image
        self._drop(
            spark,
            dirs["source"],
            "b2",
            [
                (41, "the quick brown fox " * 8),  # perceptual copy
                (42, "brand new unrelated thing " * 7),
            ],
        )
        self._run(spark, dirs)
        got2 = sorted(
            r.media_id
            for r in spark.read.parquet(dirs["warehouse"]).collect()
        )
        assert got2 == [1, 2, 42]  # the copy was gated by the store
        # crash-replay with a wiped checkpoint: everything re-offers,
        # nothing re-appends (id gate + store gate)
        import shutil

        shutil.rmtree(dirs["checkpoint"])
        self._run(spark, dirs)
        again = sorted(
            r.media_id
            for r in spark.read.parquet(dirs["warehouse"]).collect()
        )
        assert again == [1, 2, 42]


def test_compact_phash_store_changes_nothing(spark, tmp_path):
    store = str(tmp_path / "store")
    PS.create_phash_store(spark, store)
    for i in range(4):  # 4 appended segments = 4+ files
        PS.append_to_phash_store(
            spark,
            store,
            spark.createDataFrame(
                [(i * 10 + j, i * 1000 + j, None) for j in range(3)],
                "media_id long, phash long, decode_error string",
            ),
        )
    before = sorted(
        (r.id, r.phash) for r in PS.read_phash_store(spark, store).collect()
    )
    PS.compact_phash_store(spark, store)
    after = sorted(
        (r.id, r.phash) for r in PS.read_phash_store(spark, store).collect()
    )
    assert before == after and len(after) == 12


def test_compact_budget_stats_preserves_consumed_totals(spark, tmp_path):
    from etl_procedure_codes_crawler_spark.streaming.incremental import (
        compact_budget_stats,
        read_consumed_tokens,
    )

    stats = str(tmp_path / "stats")
    for b in range(3):
        spark.createDataFrame(
            [("g", b, "src0", 10 + b), ("g", b, "src1", 5)],
            "gate_id string, batch_id long, source string, n_tokens long",
        ).write.mode("append").parquet(stats)
    before = {
        r.source: r._used
        for r in read_consumed_tokens(spark, stats).collect()
    }
    compact_budget_stats(spark, stats)
    after = {
        r.source: r._used
        for r in read_consumed_tokens(spark, stats).collect()
    }
    assert before == after == {"src0": 33, "src1": 15}


class TestMediaGateLabelMode:
    _drop = TestStreamIngestMediaNearDup._drop

    def test_label_mode_admits_and_clusters_media(self, spark, tmp_path):
        """neardup_action='label' on the media gate: perceptual copies
        are ADMITTED and the phash store's persisted cluster labels
        tie them to their originals across batches — keep-best-copy
        runs off the store, no component recompute."""
        import os

        from etl_procedure_codes_crawler_spark.llm.neardup_store import (
            store_cluster_labels,
        )
        from etl_procedure_codes_crawler_spark.streaming.incremental import (
            stream_ingest_media_neardup,
        )

        src = tmp_path / "in"
        src.mkdir()
        dirs = {
            "source": str(src),
            "warehouse": str(tmp_path / "wh"),
            "store": str(tmp_path / "store"),
            "checkpoint": str(tmp_path / "ck"),
        }
        PS.create_phash_store(spark, dirs["store"])

        def run():
            q = stream_ingest_media_neardup(
                spark,
                dirs["source"],
                M.MEDIA_SCHEMA,
                dirs["warehouse"],
                dirs["store"],
                dirs["checkpoint"],
                neardup_action="label",
            )
            q.awaitTermination(180)
            q.stop()

        # batch 1: image 1 + its in-batch twin 31 — BOTH admitted
        self._drop(
            spark, dirs["source"], "b1",
            [(1, "the quick brown fox " * 8), (31, "the quick brown fox " * 8)],
        )
        run()
        got1 = sorted(
            r.media_id
            for r in spark.read.parquet(dirs["warehouse"]).collect()
        )
        assert got1 == [1, 31]
        # batch 2: a re-hosted copy of 1 — admitted and labeled too
        self._drop(
            spark, dirs["source"], "b2",
            [(41, "the quick brown fox " * 8), (42, "other content " * 9)],
        )
        run()
        got2 = sorted(
            r.media_id
            for r in spark.read.parquet(dirs["warehouse"]).collect()
        )
        assert got2 == [1, 31, 41, 42]
        labels = {
            (r.id, r.cluster_id)
            for r in store_cluster_labels(
                spark,
                dirs["store"],
                all_ids=spark.read.parquet(dirs["warehouse"]).select(
                    "media_id"
                ),
            ).collect()
        }
        assert labels == {(1, 1), (31, 1), (41, 1), (42, 42)}
