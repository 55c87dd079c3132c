"""Persisted MinHash signature store: incremental NEAR-dup at ingest.

The exact-hash incremental dedup (:func:`.dedup.incremental_dedup_new_docs`)
only catches byte-identical content; production crawls also need
"is this NEARLY a document we already hold?" at ingest time — without
re-shingling the whole historical corpus per batch. This store
persists one row per snapshot document: ``(id, sig)`` where ``sig``
is the MinHash signature (``num_hashes`` bigints ≈ 256 bytes/doc —
the corpus text stays out of the dedup path entirely).

Query flow for a new batch: shingle + sign ONLY the new docs (one
pass over the batch), derive LSH band buckets map-side from both
sides' signature arrays, equi-join on (band, bucket), and estimate
Jaccard as the fraction of agreeing minhashes (the standard unbiased
estimator) — no shingle join against history, no text reads. Scale
shape: the only wide operation is the (band, bucket) candidate join;
the store side shuffles 8-byte bucket keys plus the 256-byte
signature, never documents.

Store layout (plain parquet):
    <path>/meta/        one JSON row: k, bands, rows_per_band
    <path>/signatures/  (id, sig array<bigint>)

Parameters ride in meta so a batch signed with mismatched banding
cannot silently produce an empty join.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import minhash_signatures


def _sig_array(
    df: DataFrame, text_col: str, id_col: str, k: int, num_hashes: int
) -> DataFrame:
    # one row per id: minhash groups shingles by id, so duplicate ids
    # (even with identical text) must collapse BEFORE signing — two
    # different texts sharing an id would merge into one garbage
    # signature matching neither
    sig = minhash_signatures(
        df.dropDuplicates([id_col]), text_col, id_col, k, num_hashes
    )
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def _band_buckets(sig_col, bands: int, rows_per_band: int):
    """(band, bucket) structs derived map-side from a signature array —
    same xxhash64-of-band-rows construction as
    :func:`.dedup.minhash_buckets`, so buckets agree across batches."""
    return F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.xxhash64(
                    *[
                        F.element_at(sig_col, band * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ]
                ).alias("bucket"),
            )
            for band in range(bands)
        ]
    )


def build_minhash_store(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    bands: int = 8,
    rows_per_band: int = 4,
) -> None:
    """Sign the snapshot corpus (one shingle pass) and persist the
    signatures. The store is append-grown by
    :func:`append_to_minhash_store` as batches are accepted."""
    spark = docs.sparkSession
    _sig_array(docs, text_col, id_col, k, bands * rows_per_band).write.mode(
        "overwrite"
    ).parquet(path.rstrip("/") + "/signatures")
    meta = {"k": k, "bands": bands, "rows_per_band": rows_per_band}
    spark.createDataFrame(
        [(json.dumps(meta),)], "meta string"
    ).repartition(1).write.mode("overwrite").parquet(
        path.rstrip("/") + "/meta"
    )


def load_store_meta(spark: SparkSession, path: str) -> dict:
    return json.loads(
        spark.read.parquet(path.rstrip("/") + "/meta").first()["meta"]
    )


def append_to_minhash_store(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Sign and append docs not already in the store (anti-join on
    id). Idempotent under batch replay; banding parameters come from
    the store's meta, never the caller."""
    meta = load_store_meta(spark, path)
    num_hashes = meta["bands"] * meta["rows_per_band"]
    existing = spark.read.parquet(path.rstrip("/") + "/signatures").select("id")
    fresh = (
        new_docs.where(F.col(id_col).isNotNull())
        # one row per id BEFORE signing: minhash groups shingles by id,
        # so two different texts sharing an id would otherwise merge
        # into one garbage signature (the min over the UNION of both
        # shingle sets) that matches neither document
        .dropDuplicates([id_col])
        .join(existing.withColumnRenamed("id", id_col), id_col, "left_anti")
    )
    signed = _sig_array(
        fresh, text_col, id_col, meta["k"], num_hashes
    ).localCheckpoint(eager=True)  # lineage reads the path being appended
    n = signed.count()
    if n:
        signed.write.mode("append").parquet(path.rstrip("/") + "/signatures")
    return n


def near_dups_against_store(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(new_id, snapshot_id, est_jaccard) for every new document that
    LSH-collides with a stored one and whose signature-agreement
    estimate clears ``threshold``. Self-matches (same id already in
    the store) are excluded — replayed docs are the exact-dedup
    path's job. Recall < 1 by LSH design; tune bands/rows at build
    time for the corpus's similarity profile."""
    meta = load_store_meta(spark, path)
    bands, rpb = meta["bands"], meta["rows_per_band"]
    num_hashes = bands * rpb

    new_sig = _sig_array(new_docs, text_col, id_col, meta["k"], num_hashes)
    snap = spark.read.parquet(path.rstrip("/") + "/signatures")

    nb = new_sig.select(
        F.col("id").alias("new_id"),
        F.col("sig").alias("new_sig"),
        F.explode(_band_buckets(F.col("sig"), bands, rpb)).alias("bb"),
    ).select("new_id", "new_sig", "bb.band", "bb.bucket")
    sb = snap.select(
        F.col("id").alias("snapshot_id"),
        F.col("sig").alias("snap_sig"),
        F.explode(_band_buckets(F.col("sig"), bands, rpb)).alias("bb"),
    ).select("snapshot_id", "snap_sig", "bb.band", "bb.bucket")

    agree = F.aggregate(
        F.zip_with(
            F.col("new_sig"),
            F.col("snap_sig"),
            lambda a, b: (a == b).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        nb.join(sb, ["band", "bucket"])
        .filter(F.col("new_id") != F.col("snapshot_id"))
        .select(
            "new_id",
            "snapshot_id",
            (agree.cast("double") / F.lit(num_hashes)).alias("est_jaccard"),
        )
        # a pair colliding in several bands dedups to one row; the
        # estimate is identical per pair so max() is exact
        .groupBy("new_id", "snapshot_id")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )
