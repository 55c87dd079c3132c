"""Semantic tests for the dedup family on synthetic corpora with
KNOWN duplicates (the testdata has none exact, so these prove the
operators actually catch what they claim to)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.llm import dedup as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "The  Quick Brown Fox jumps over the lazy dog"),   # exact dup after normalization
    (2, "the quick brown fox jumps over the lazy cat"),    # near dup (1 token differs)
    (3, "spark shuffles partition data across the cluster fabric"),
    (4, "completely different content about query optimizers here"),
    (5, "the quick brown fox jumps over the lazy dog"),    # exact dup of 0
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicate_groups(spark):
    groups = D.exact_duplicate_groups(_docs(spark)).collect()
    by_copies = sorted((g.n_copies, g.first_id) for g in groups)
    # {0,1,5} collapse to one group (case/whitespace-normalized)
    assert by_copies == [(1, 2), (1, 3), (1, 4), (3, 0)]


def test_drop_exact_duplicates_keeps_min_id(spark):
    kept = sorted(r.doc_id for r in D.drop_exact_duplicates(_docs(spark)).collect())
    assert kept == [0, 2, 3, 4]


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()
    }
    # 0/1/5 identical after tokenization? No — shingles are case-sensitive
    # here (doc 1 differs in case), but 0 and 5 are identical: jaccard 1.0
    assert pairs[(0, 5)] == 1.0
    # 0 vs 2: 7 shingles each, 6 shared (only the final shingle changes)
    # → 6 / (7+7-6) = 0.75
    assert abs(pairs[(0, 2)] - 0.75) < 1e-12


def test_minhash_catches_identical_and_near_pairs(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.minhash_near_dup_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert pairs[(0, 5)] == 1.0            # identical docs always collide
    assert (0, 2) in pairs                 # j=0.56 ≥ 0.5 and LSH found it
    assert (0, 3) not in pairs             # unrelated docs


def test_minhash_lsh_is_subset_of_candidates_with_verification(spark):
    cands = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_candidate_pairs(_docs(spark)).collect()
    }
    verified = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_near_dup_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert verified <= cands


def test_simhash_identical_docs_distance_zero(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in D.simhash_near_dup_pairs(_docs(spark), max_hamming=10).collect()
    }
    assert pairs[(0, 5)] == 0
    sigs = {r.id: r.simhash for r in D.simhash_signatures(_docs(spark)).collect()}
    assert sigs[0] == sigs[5]
    assert sigs[0] != sigs[4]


def test_shingles_short_doc_fallback(spark):
    df = spark.createDataFrame([(9, "one two")], "doc_id long, text string")
    rows = D.shingle_rows(df).collect()
    assert [(r.id, r.shingle) for r in rows] == [(9, "one two")]
