"""Persisted MinHash store: incremental near-dup at ingest
(llm/neardup_store.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.llm import neardup_store as NS


BASE = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the quiet green field toward the old stone bridge"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture()
def store(spark, tmp_path):
    """Snapshot: the base doc + unrelated docs."""
    path = str(tmp_path / "store")
    snapshot = _docs(
        spark,
        [
            (0, BASE),
            (1, "completely different material about spark physical plans"),
            (2, "yet another unrelated document mentioning parquet footers"),
        ],
    )
    NS.build_minhash_store(snapshot, path)
    return path


def test_near_dup_found_and_unrelated_not(spark, store):
    new = _docs(
        spark,
        [
            # near-dup of doc 0: one word changed
            (10, BASE.replace("lazy", "sleepy")),
            # unrelated
            (11, "totally fresh content with no overlap whatsoever here"),
        ],
    )
    hits = NS.near_dups_against_store(spark, store, new, threshold=0.5)
    got = {(r.new_id, r.snapshot_id): r.est_jaccard for r in hits.collect()}
    assert (10, 0) in got, got
    assert got[(10, 0)] >= 0.5
    assert all(nid != 11 for nid, _ in got), got


def test_estimate_tracks_true_jaccard(spark, store):
    """The signature-agreement estimate must be in the right
    neighborhood of true shingle Jaccard for an exact duplicate."""
    new = _docs(spark, [(20, BASE)])  # exact text of doc 0
    hits = NS.near_dups_against_store(spark, store, new, threshold=0.5)
    got = {(r.new_id, r.snapshot_id): r.est_jaccard for r in hits.collect()}
    assert got.get((20, 0)) == 1.0  # identical shingles → identical sigs


def test_append_is_idempotent_and_grows_matching(spark, store):
    new = _docs(spark, [(30, "some brand new corpus material for the store")])
    assert NS.append_to_minhash_store(spark, store, new) == 1
    assert NS.append_to_minhash_store(spark, store, new) == 0  # replay

    # a later batch near-duping the APPENDED doc is now caught
    later = _docs(
        spark, [(40, "some brand new corpus material for this store")]
    )
    hits = NS.near_dups_against_store(spark, store, later, threshold=0.3)
    pairs = {(r.new_id, r.snapshot_id) for r in hits.collect()}
    assert (40, 30) in pairs, pairs


def test_store_parameters_come_from_meta(spark, tmp_path):
    path = str(tmp_path / "store")
    NS.build_minhash_store(
        _docs(spark, [(0, BASE)]), path, bands=4, rows_per_band=8
    )
    meta = NS.load_store_meta(spark, path)
    assert meta == {"k": 3, "bands": 4, "rows_per_band": 8}
    # query uses the stored banding: an exact dup still matches even
    # though the defaults (8 bands x 4 rows) differ
    hits = NS.near_dups_against_store(
        spark, path, _docs(spark, [(50, BASE)]), threshold=0.9
    )
    assert {(r.new_id, r.snapshot_id) for r in hits.collect()} == {(50, 0)}
