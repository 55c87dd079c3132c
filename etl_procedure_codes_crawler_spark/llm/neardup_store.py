"""Persisted MinHash signature store: incremental NEAR-dup at ingest.

The exact-hash incremental dedup (:func:`.dedup.incremental_dedup_new_docs`)
only catches byte-identical content; production crawls also need
"is this NEARLY a document we already hold?" at ingest time — without
re-shingling the whole historical corpus per batch. This store
persists one row per snapshot document: ``(id, sig, buckets)`` where
``sig`` is the MinHash signature (``num_hashes`` bigints ≈ 256
bytes/doc — the corpus text stays out of the dedup path entirely) and
``buckets`` is the pre-derived LSH (band, bucket) assignment (v2
layout: ~16 B/band, saves the store side a map-side re-derivation on
EVERY query — the store is read once per ingest batch forever, the
signature is written once).

Query flow for a new batch: shingle + sign ONLY the new docs (one
pass over the batch), derive the batch side's band buckets map-side,
explode the store side's PERSISTED buckets, equi-join on
(band, bucket), and estimate Jaccard as the fraction of agreeing
minhashes (the standard unbiased estimator) — no shingle join against
history, no text reads. Scale shape: the only wide operation is the
(band, bucket) candidate join; the store side shuffles 8-byte bucket
keys plus the 256-byte signature, never documents — and degenerate
buckets (boilerplate corpora: thousands of near-identical pages in
ONE bucket) are CAPPED to ``max_store_bucket_size`` store rows per
(band, bucket), so a hot bucket emits |batch|×cap candidate rows
instead of |batch|×|store| — linear in the batch, never quadratic
inside a task (:func:`store_bucket_stats` reports what the cap
truncated). Capping store rows is sound for the gate's question
("does this batch doc near-dup ANYTHING held?"): a bucket only
degenerates when its members are near-identical, so the ranked
survivors are representative of the members dropped.

Store layout (plain parquet):
    <path>/meta/        one JSON row: k, bands, rows_per_band, version
    <path>/signatures/  v2: (id, sig array<bigint>,
                             buckets array<struct<band int, bucket bigint>>)
                        v1: (id, sig) — still queryable; buckets are
                        derived map-side as they were written

Parameters ride in meta so a batch signed with mismatched banding
cannot silently produce an empty join.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .dedup import minhash_signatures

#: store rows kept per (band, bucket) in the candidate join — high
#: enough that non-degenerate LSH buckets (a handful of members) are
#: never touched, low enough that a boilerplate bucket cannot go
#: quadratic
DEFAULT_MAX_STORE_BUCKET = 64


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


def _signed_with_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    bands: int,
    rows_per_band: int,
) -> DataFrame:
    """(id, sig, buckets) — the v2 store row: buckets are a pure
    map-side function of the signature, persisted once at write time
    so every future query skips re-deriving them for the store side."""
    signed = _sig_array(df, text_col, id_col, k, bands * rows_per_band)
    return signed.withColumn(
        "buckets", _band_buckets(F.col("sig"), bands, rows_per_band)
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
    signatures + pre-derived band buckets (v2 layout). The store is
    append-grown by :func:`append_to_minhash_store` as batches are
    accepted."""
    spark = docs.sparkSession
    _signed_with_buckets(
        docs, text_col, id_col, k, bands, rows_per_band
    ).write.mode("overwrite").parquet(path.rstrip("/") + "/signatures")
    meta = {"k": k, "bands": bands, "rows_per_band": rows_per_band, "version": 2}
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
    the store's meta, never the caller. Appends match the store's
    layout version: a v1 store keeps receiving (id, sig) rows — mixed
    schemas within one dataset would corrupt the scan."""
    meta = load_store_meta(spark, path)
    bands, rpb = meta["bands"], meta["rows_per_band"]
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
    if meta.get("version", 1) >= 2:
        signed = _signed_with_buckets(fresh, text_col, id_col, meta["k"], bands, rpb)
    else:
        signed = _sig_array(fresh, text_col, id_col, meta["k"], bands * rpb)
    signed = signed.localCheckpoint(eager=True)  # lineage reads the path being appended
    n = signed.count()
    if n:
        signed.write.mode("append").parquet(path.rstrip("/") + "/signatures")
    return n


def _store_bucket_rows(snap: DataFrame, bands: int, rpb: int) -> DataFrame:
    """One (snapshot_id, snap_sig, band, bucket) row per store doc per
    band — from the persisted buckets column when present (v2), else
    derived map-side (v1)."""
    if "buckets" in snap.columns:
        bb = F.explode(F.col("buckets")).alias("bb")
    else:
        bb = F.explode(_band_buckets(F.col("sig"), bands, rpb)).alias("bb")
    return snap.select(
        F.col("id").alias("snapshot_id"),
        F.col("sig").alias("snap_sig"),
        bb,
    ).select("snapshot_id", "snap_sig", "bb.band", "bb.bucket")


def near_dups_against_store(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_store_bucket_size: int = DEFAULT_MAX_STORE_BUCKET,
) -> DataFrame:
    """(new_id, snapshot_id, est_jaccard) for every new document that
    LSH-collides with a stored one and whose signature-agreement
    estimate clears ``threshold``. Self-matches (same id already in
    the store) are excluded — replayed docs are the exact-dedup
    path's job. Recall < 1 by LSH design; tune bands/rows at build
    time for the corpus's similarity profile.

    Degenerate buckets are bounded: only the ``max_store_bucket_size``
    lowest-id store rows per (band, bucket) enter the candidate join
    (deterministic ranked truncation — the window's (band, bucket)
    exchange is the same partitioning the join needs, so the cap adds
    no extra wide stage). A boilerplate bucket holding thousands of
    near-identical snapshots therefore costs |batch|×cap rows, not
    |batch|×|store|; for the gate's any-match semantics the truncated
    members are interchangeable with the survivors. What got capped is
    observable via :func:`store_bucket_stats`.
    """
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
    w_cap = Window.partitionBy("band", "bucket").orderBy("snapshot_id")
    sb = (
        _store_bucket_rows(snap, bands, rpb)
        .withColumn("_bkrank", F.row_number().over(w_cap))
        .filter(F.col("_bkrank") <= max_store_bucket_size)
        .drop("_bkrank")
    )

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


def store_bucket_stats(
    spark: SparkSession,
    path: str,
    max_store_bucket_size: int = DEFAULT_MAX_STORE_BUCKET,
) -> DataFrame:
    """Monitoring companion to the store-join cap (same contract as
    :func:`.dedup.lsh_bucket_stats`): per-band bucket count, largest
    bucket, and how many buckets the candidate join truncates at
    ``max_store_bucket_size`` — one cheap groupBy over the persisted
    bucket assignments, no signatures or text read."""
    meta = load_store_meta(spark, path)
    snap = spark.read.parquet(path.rstrip("/") + "/signatures")
    rows = _store_bucket_rows(snap, meta["bands"], meta["rows_per_band"])
    return (
        rows.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("bucket_size").alias("max_bucket_size"),
            F.sum(
                F.when(
                    F.col("bucket_size") > max_store_bucket_size, 1
                ).otherwise(0)
            ).alias("n_capped_buckets"),
        )
    )


def compact_minhash_store(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Restore a compact file layout after incremental appends.

    Every accepted ingest micro-batch appends one signature file, so a
    long-running gate accretes thousands of small files and the store
    scan in :func:`near_dups_against_store` — executed once per batch,
    forever — pays the listing/open overhead each time. Delegates to
    :func:`..sinks.parquet.compact_dataset` (atomic swap, crash-healed
    on the next call); query results are unaffected — signatures are a
    set, the layout carries no ordering contract. Returns the new file
    count."""
    from ..sinks.parquet import compact_dataset

    return compact_dataset(
        spark, path.rstrip("/") + "/signatures", target_file_mb
    )
