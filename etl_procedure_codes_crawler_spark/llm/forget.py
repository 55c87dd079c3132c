"""Right-to-be-forgotten: consistent deletion across persisted state.

A takedown (GDPR/DMCA/opt-out) is not one delete — a document a
pipeline ingested lives in the WAREHOUSE, its MinHash signature in the
near-dup store, its winnowing fingerprints in the decontamination
store, and its embedding in the ANN index. Deleting only the warehouse
copy leaves the document's shadow influencing dedup and similarity
decisions forever. :func:`forget_documents` removes a set of ids from
every artifact it is given, each with the right rewrite strategy:

- plain datasets (warehouse, signature store, fingerprint store):
  anti-join + atomic swap (:func:`..operators.merge.
  replace_dataset_atomically` — readers see old or new, never a mix);
- the cell-partitioned ANN index: PARTITION-PRUNED rewrite — only the
  cells actually holding a forgotten id are rewritten (driver-side
  ``cell IN (...)`` from a metadata-sized semi-join), via dynamic
  partition overwrite; a cell left EMPTY by the deletion is removed
  outright (dynamic overwrite only replaces partitions present in the
  written data, so an emptied cell would otherwise silently keep its
  old files — the classic dynamic-overwrite deletion pitfall).

Crash contract: each artifact's swap is individually atomic, but the
multi-artifact operation is NOT transactional — a crash can leave the
ids forgotten in some artifacts and not others. The operation is
IDEMPOTENT (every step is an anti-join against ids), so the recovery
procedure is simply to run it again; the returned per-artifact counts
make partial progress visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _forget_plain(
    spark: SparkSession, path: str, ids: DataFrame, key: str
) -> int:
    """Anti-join rewrite of an unpartitioned dataset; returns rows
    removed (0 rows → no rewrite at all)."""
    from ..operators.merge import replace_dataset_atomically

    current = spark.read.parquet(path)
    doomed = ids.withColumnRenamed(ids.columns[0], key)
    n = current.join(doomed, key, "left_semi").count()
    if n == 0:
        return 0
    remaining = current.join(doomed, key, "left_anti").localCheckpoint(
        eager=True  # the swap rewrites the path this lineage reads
    )
    replace_dataset_atomically(spark, path, remaining)
    return n


def _forget_index_cells(
    spark: SparkSession, index_path: str, ids: DataFrame
) -> int:
    """Partition-pruned deletion from the IVF+PQ coded table: rewrite
    only the cells holding forgotten ids; drop cells left empty."""
    from ..sinks.fsutil import hadoop_fs

    coded_path = index_path.rstrip("/") + "/coded"
    coded = spark.read.parquet(coded_path)
    doomed = ids.withColumnRenamed(ids.columns[0], "id")
    hit = coded.join(doomed, "id", "left_semi")
    cells = [int(r["cell"]) for r in hit.select("cell").distinct().collect()]
    if not cells:
        return 0
    n = hit.count()
    affected = coded.where(F.col("cell").isin(cells))
    survivors = affected.join(doomed, "id", "left_anti").localCheckpoint(
        eager=True  # the overwrite below rewrites what this reads
    )
    kept_cells = {
        int(r["cell"]) for r in survivors.select("cell").distinct().collect()
    }
    if kept_cells:
        previous = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                survivors.repartition(max(len(kept_cells), 1), "cell")
                .write.mode("overwrite")
                .partitionBy("cell")
                .parquet(coded_path)
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", previous
            )
    # cells with no survivors never appear in the written data, so
    # dynamic overwrite leaves their old files — remove them directly
    fs, hpath = hadoop_fs(spark, coded_path)
    for cell in cells:
        if cell not in kept_cells:
            fs.delete(hpath(f"{coded_path}/cell={cell}"), True)
    return n


def forget_documents(
    ids: DataFrame,
    warehouse_path: str | None = None,
    neardup_store_path: str | None = None,
    winnow_store_path: str | None = None,
    ann_index_path: str | None = None,
    id_col: str = "doc_id",
) -> dict[str, int]:
    """Remove every trace of ``ids`` (a one-column DataFrame, or any
    DataFrame whose ``id_col`` holds the doomed ids) from the given
    artifacts. Returns rows removed per artifact — re-run after a
    crash until every count is 0 (idempotent convergence)."""
    spark = ids.sparkSession
    key_ids = (
        ids.select(F.col(id_col).alias("_doomed"))
        .where(F.col("_doomed").isNotNull())
        .dropDuplicates(["_doomed"])
        .localCheckpoint(eager=True)  # joined against every artifact
    )
    removed: dict[str, int] = {}
    if warehouse_path is not None:
        removed["warehouse"] = _forget_plain(
            spark, warehouse_path, key_ids, id_col
        )
    if neardup_store_path is not None:
        removed["neardup_store"] = _forget_plain(
            spark, neardup_store_path.rstrip("/") + "/signatures", key_ids, "id"
        )
    if winnow_store_path is not None:
        removed["winnow_store"] = _forget_plain(
            spark, winnow_store_path.rstrip("/") + "/fps", key_ids, "id"
        )
    if ann_index_path is not None:
        removed["ann_index"] = _forget_index_cells(
            spark, ann_index_path, key_ids
        )
    return removed
