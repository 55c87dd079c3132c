"""Consistent deletion across persisted artifacts (llm/forget.py)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.llm import fingerprint as FP
from etl_procedure_codes_crawler_spark.llm import forget as FG
from etl_procedure_codes_crawler_spark.llm import index as IX
from etl_procedure_codes_crawler_spark.llm import neardup_store as NS


def _ids(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "doc_id bigint")


def test_forget_removes_from_every_artifact_idempotently(
    spark, sf_dir, tmp_path
):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 60
    )
    wh = str(tmp_path / "wh")
    nd = str(tmp_path / "nd")
    wn = str(tmp_path / "wn")
    ix = str(tmp_path / "ix")
    docs.write.parquet(wh)
    NS.build_minhash_store(docs, nd)
    FP.build_winnow_store(docs, wn)
    IX.build_ivfpq_index(emb, ix, num_centroids=8, seed=42)

    doomed = [3, 7, 11]
    removed = FG.forget_documents(
        _ids(spark, doomed),
        warehouse_path=wh,
        neardup_store_path=nd,
        winnow_store_path=wn,
        ann_index_path=ix,
    )
    assert removed["warehouse"] == 3
    assert removed["neardup_store"] == 3  # one signature row per doc
    assert removed["winnow_store"] >= 3  # many fingerprint rows per doc
    assert removed["ann_index"] == 3

    for path, col in [(wh, "doc_id"), (f"{nd}/signatures", "id"),
                      (f"{wn}/fps", "id"), (f"{ix}/coded", "id")]:
        left = {r[col] for r in spark.read.parquet(path).select(col).collect()}
        assert not (left & set(doomed)), path

    # the index still serves, and never returns a forgotten id
    out = IX.query_ivfpq_index(
        spark, ix, emb.filter(F.col("vec_id").isin([1, 2])), k=5, nprobe=8
    )
    assert not {r.neighbor_id for r in out.collect()} & set(doomed)

    # idempotent: a re-run (the documented crash recovery) removes 0
    again = FG.forget_documents(
        _ids(spark, doomed),
        warehouse_path=wh,
        neardup_store_path=nd,
        winnow_store_path=wn,
        ann_index_path=ix,
    )
    assert set(again.values()) == {0}


def test_forget_drops_emptied_index_cells(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite only replaces partitions present in
    the written data — a cell whose every vector is forgotten must be
    deleted outright, not silently left holding its old files."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 80
    )
    ix = str(tmp_path / "ix")
    IX.build_ivfpq_index(emb, ix, num_centroids=8, seed=42)
    coded = spark.read.parquet(f"{ix}/coded")
    # pick one whole cell to erase
    cell = coded.groupBy("cell").count().orderBy("count").first()["cell"]
    cell_ids = [r.id for r in coded.filter(F.col("cell") == cell).collect()]
    removed = FG.forget_documents(
        spark.createDataFrame([(i,) for i in cell_ids], "doc_id bigint"),
        ann_index_path=ix,
    )
    assert removed["ann_index"] == len(cell_ids)
    assert not os.path.isdir(f"{ix}/coded/cell={cell}")
    # other cells untouched, index still queryable
    remaining = spark.read.parquet(f"{ix}/coded")
    assert remaining.filter(F.col("cell") == cell).count() == 0
    out = IX.query_ivfpq_index(spark, ix, emb.limit(3), k=3, nprobe=8)
    assert out.count() > 0


def test_forget_noop_for_absent_ids(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    wh = str(tmp_path / "wh")
    docs.write.parquet(wh)
    removed = FG.forget_documents(
        _ids(spark, [10**9]), warehouse_path=wh
    )
    assert removed == {"warehouse": 0}
    assert spark.read.parquet(wh).count() == 10


def test_forget_recovers_interrupted_plain_swap(spark, sf_dir, tmp_path):
    """Crash inside the warehouse swap window (path renamed aside,
    replacement not yet in): the documented recovery — just re-run —
    must restore and converge, not throw on the missing path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    wh = str(tmp_path / "wh")
    docs.write.parquet(wh)
    os.rename(wh, wh + "._previous")  # the dangerous window
    removed = FG.forget_documents(_ids(spark, [3]), warehouse_path=wh)
    assert removed["warehouse"] == 1
    left = {r.doc_id for r in spark.read.parquet(wh).collect()}
    assert 3 not in left and len(left) == 19


def test_forget_recovers_interrupted_cell_swap(spark, sf_dir, tmp_path):
    """Crash between the two renames of one cell's swap: the cell dir
    is missing and ._forget_prev holds the only copy — the re-run must
    restore it first, then converge."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 60
    )
    ix = str(tmp_path / "ix")
    IX.build_ivfpq_index(emb, ix, num_centroids=8, seed=42)
    coded = spark.read.parquet(f"{ix}/coded")
    cell = coded.groupBy("cell").count().orderBy(F.desc("count")).first()["cell"]
    victim = coded.filter(F.col("cell") == cell).first()["id"]
    # simulate: that cell renamed aside mid-swap (after the victim
    # lookup — the stale pre-rename file listing must not be re-read)
    os.makedirs(f"{ix}/coded._forget_prev", exist_ok=True)
    os.rename(f"{ix}/coded/cell={cell}", f"{ix}/coded._forget_prev/cell={cell}")
    removed = FG.forget_documents(
        _ids(spark, [victim]), ann_index_path=ix
    )
    assert removed["ann_index"] == 1
    after = spark.read.parquet(f"{ix}/coded")
    assert after.filter(F.col("id") == victim).count() == 0
    # the healed cell kept its innocent rows
    assert after.filter(F.col("cell") == cell).count() > 0
    assert not os.path.exists(f"{ix}/coded._forget_prev")


def test_forget_total_index_wipe_raises(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 30
    )
    ix = str(tmp_path / "ix")
    IX.build_ivfpq_index(emb, ix, num_centroids=4, seed=42)
    all_ids = [r.id for r in spark.read.parquet(f"{ix}/coded").select("id").collect()]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unreadable empty index"):
        FG.forget_documents(
            spark.createDataFrame([(i,) for i in all_ids], "doc_id bigint"),
            ann_index_path=ix,
        )
    # nothing was deleted by the refused operation
    assert spark.read.parquet(f"{ix}/coded").count() == len(all_ids)
