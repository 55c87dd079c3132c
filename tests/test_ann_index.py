"""Persisted IVF+PQ index: build/query equality with the one-shot
operator, incremental append, and partition pruning (llm/index.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.llm import index as IX
from etl_procedure_codes_crawler_spark.llm import similarity as S


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_index_query_equals_oneshot_operator(spark, emb, tmp_path):
    """Same corpus, params and seed: the persisted index must return
    EXACTLY the one-shot cosine_topk_ivfpq result (same sample, same
    Lloyd iterations, same tie rules)."""
    path = str(tmp_path / "ix")
    IX.build_ivfpq_index(emb, path, num_centroids=16, seed=42)
    queries = emb.filter(F.col("vec_id") < 20)
    got = sorted(
        map(tuple, IX.query_ivfpq_index(spark, path, queries, k=5, nprobe=6).collect())
    )
    want = sorted(
        map(tuple, S.cosine_topk_ivfpq(emb, queries, k=5, nprobe=6, dim=64).collect())
    )
    assert got == want


def test_query_scan_partition_prunes_to_probe_cells(spark, emb, tmp_path):
    path = str(tmp_path / "ix")
    IX.build_ivfpq_index(emb, path, num_centroids=16, seed=42)
    out = IX.query_ivfpq_index(
        spark, path, emb.filter(F.col("vec_id") < 3), k=3, nprobe=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the coded scans must carry the static cell predicate as a
    # PARTITION filter (file skipping), not a post-scan data filter
    assert "PartitionFilters: [cell" in plan, plan
    # 3 queries × 2 probes can touch at most 6 distinct cells of 16
    import re

    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([^)]*)\)", plan)
    assert m and len(m.group(1).split(",")) <= 6, plan


def test_append_grows_without_retraining_and_is_idempotent(
    spark, emb, tmp_path
):
    path = str(tmp_path / "ix")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    IX.build_ivfpq_index(first, path, num_centroids=8, seed=42)
    n0 = spark.read.parquet(path + "/coded").count()

    n_added = IX.append_to_ivfpq_index(spark, path, rest)
    assert n_added == rest.count()
    assert spark.read.parquet(path + "/coded").count() == n0 + n_added
    # replaying the same batch appends nothing (anti-join on id)
    assert IX.append_to_ivfpq_index(spark, path, rest) == 0

    # appended vectors are findable: querying BY an appended vector
    # must return its exact-duplicate-free neighborhood incl. at
    # least one appended id among top-k (odd ids are half the corpus)
    q = rest.filter(F.col("vec_id") < 10)
    res = IX.query_ivfpq_index(spark, path, q, k=5, nprobe=4).collect()
    assert len(res) > 0
    per_q = {}
    for r in res:
        per_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert all(len(v) == 5 for v in per_q.values())


def test_empty_query_set_rejected(spark, emb, tmp_path):
    path = str(tmp_path / "ix")
    IX.build_ivfpq_index(emb, path, num_centroids=8, seed=42)
    with pytest.raises(ValueError, match="empty query set"):
        IX.query_ivfpq_index(
            spark, path, emb.filter(F.col("vec_id") < 0), k=3
        )


def test_distributed_query_path_equals_driver_path(spark, emb, tmp_path):
    """The DataFrame query path (large batches, no driver collect)
    must return exactly what the collect-based serving path returns —
    same quantizers, same tie rules."""
    path = str(tmp_path / "ix")
    IX.build_ivfpq_index(emb, path, num_centroids=16, seed=42)
    queries = emb.filter(F.col("vec_id") < 20)
    a = sorted(
        map(tuple, IX.query_ivfpq_index(spark, path, queries, k=5, nprobe=6).collect())
    )
    b = sorted(
        map(
            tuple,
            IX.query_ivfpq_index_distributed(
                spark, path, queries, k=5, nprobe=6
            ).collect(),
        )
    )
    assert a == b


def test_string_id_corpus_round_trips(spark, emb, tmp_path):
    """The serving path must carry the CALLER's id type end-to-end —
    it rebuilds the probe/re-rank relations driver-side, and a
    hard-coded bigint schema would crash a string-id corpus."""
    semb = emb.select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
        "embedding",
    )
    path = str(tmp_path / "ix_str")
    IX.build_ivfpq_index(semb, path, num_centroids=8, seed=42)
    queries = semb.limit(5)
    out = IX.query_ivfpq_index(spark, path, queries, k=3, nprobe=4)
    rows = out.collect()
    assert rows and all(isinstance(r.query_id, str) for r in rows)
    assert all(isinstance(r.neighbor_id, str) for r in rows)
    # and it agrees with the id-type-agnostic distributed twin
    dist = IX.query_ivfpq_index_distributed(spark, path, queries, k=3, nprobe=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, dist.collect()))
