"""Persisted passage-frequency store: corpus-wide boilerplate
statistics maintained incrementally — the lifecycle form of
:func:`.dedup.remove_boilerplate_passages`.

C4/CCNet-style pipelines compute passage (line) frequencies over the
WHOLE crawl, then strip frequent passages from every document; a
growing corpus cannot re-aggregate history per batch. This store
persists mergeable per-batch count segments:

    <path>/meta/      one JSON row: block, version
    <path>/segments/  (fp, df) — per-segment DISTINCT-document counts;
                      the read path sums segments, which equals the
                      global distinct-document frequency under the
                      store's contract: EVERY DOCUMENT IS OFFERED
                      EXACTLY ONCE (the ingest gates' id anti-join
                      provides this — the same once-per-doc discipline
                      the budget gate's stats artifact relies on).

Counts are additive, so the store is mergeable like the HLL/Bloom
stores but EXACT; 32-byte fingerprints + one long per distinct
passage per segment. Compaction is file-layout-only
(:func:`..sinks.parquet.compact_dataset` — row-preserving atomic
swap); the read-side sum handles segment multiplicity, so folding is
an optimization, not a correctness need.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _rebuild_cleaned, passage_rows


def _meta_path(path: str) -> str:
    return path.rstrip("/") + "/meta"


def _segments_path(path: str) -> str:
    return path.rstrip("/") + "/segments"


def _segments_schema():
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [StructField("fp", StringType()), StructField("df", LongType())]
    )


def create_passage_freq_store(
    spark: SparkSession, path: str, block: int = 16
) -> dict:
    """Initialize an empty store; ``block`` rides in meta so a batch
    chunked at a different granularity cannot silently contribute
    incomparable counts."""
    meta = {"block": int(block), "version": 1}
    spark.createDataFrame([(json.dumps(meta),)], "meta string").repartition(
        1
    ).write.mode("overwrite").parquet(_meta_path(path))
    return meta


def load_passage_freq_meta(spark: SparkSession, path: str) -> dict:
    return json.loads(
        spark.read.parquet(_meta_path(path)).first()["meta"]
    )


def append_passage_counts(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Append one count segment covering ``docs`` — (fp, distinct-doc
    count) within the batch. The caller must offer each document
    exactly once across the store's lifetime (ingest gates' id
    anti-join); re-offering a document inflates its passages'
    frequencies, which for a boilerplate detector only errs toward
    stripping more. Returns the segment's row count."""
    meta = load_passage_freq_meta(spark, path)
    seg = (
        passage_rows(docs, meta["block"], text_col, id_col)
        .groupBy("fp")
        .agg(F.countDistinct("id").cast("bigint").alias("df"))
        .localCheckpoint(eager=True)  # lineage must not read the append
    )
    n = seg.count()
    if n:
        seg.write.mode("append").parquet(_segments_path(path))
    return n


def read_passage_freqs(spark: SparkSession, path: str) -> DataFrame:
    """(fp, df) summed over all segments — the corpus-wide passage
    document-frequency relation (one row per distinct passage)."""
    from ..sources.parquet import read_table_or_empty

    return (
        read_table_or_empty(spark, _segments_path(path), _segments_schema())
        .groupBy("fp")
        .agg(F.sum("df").cast("bigint").alias("df"))
    )


def strip_boilerplate_against_store(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    min_doc_freq: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Clean ``docs`` against the PERSISTED corpus-wide frequencies:
    passages whose stored document frequency exceeds ``min_doc_freq``
    are stripped, survivors reassemble in order — the same output
    contract as :func:`.dedup.remove_boilerplate_passages`
    ``(id, n_passages, n_removed, text_clean)``, but the frequency
    side never re-reads history (the store relation is
    distinct-passage-sized, and the join hashes 32-byte
    fingerprints). Passages absent from the store count as df=0
    (never seen → never boilerplate)."""
    meta = load_passage_freq_meta(spark, path)
    chunks = passage_rows(docs, meta["block"], text_col, id_col)
    judged = chunks.join(
        read_passage_freqs(spark, path).withColumnRenamed("df", "_df"),
        "fp",
        "left",
    ).withColumn("_df", F.coalesce(F.col("_df"), F.lit(0)))
    return _rebuild_cleaned(docs, judged, min_doc_freq, id_col)


def compact_passage_freq_store(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """File-layout compaction (row-preserving atomic swap via
    :func:`..sinks.parquet.compact_dataset`); the read-side sum is
    layout-invariant. Folding segments into one row per fingerprint
    would ALSO be sound (sums are associative) but is deliberately not
    done on the hot path: a crash between writing a folded segment and
    deleting its inputs would double-count, so folding would need the
    swap protocol anyway — which compact_dataset already provides for
    the layout problem that actually hurts (file-count growth)."""
    from ..sinks.parquet import compact_dataset

    return compact_dataset(spark, _segments_path(path), target_file_mb)
