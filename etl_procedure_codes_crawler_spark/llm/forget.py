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
  replace_dataset_atomically`), preceded by
  :func:`..operators.merge.recover_interrupted_swap` — a re-run after
  a crash inside the swap window must restore the backup BEFORE
  reading the target, or the read throws and recovery never converges;
- the cell-partitioned ANN index: PARTITION-SCOPED atomic swaps —
  survivors of every affected cell are staged in one partitioned
  write OUTSIDE the table, then each cell directory is swapped with
  the rename pair the other maintenance ops use (never dynamic
  partition overwrite, whose delete-then-commit window would lose a
  cell's innocent survivors unrecoverably on a crash). Cells left
  EMPTY by the deletion are removed outright — safe to redo, since
  every row in them is doomed. A prior crashed run is healed at entry
  (restore any cell whose swap was interrupted, clear stale staging).

Crash contract: each artifact's swap — and each index CELL's swap —
is individually atomic, but the multi-artifact operation is NOT
transactional: a crash can leave the ids forgotten in some artifacts
and not others. Every step is an anti-join against the doomed ids, so
the operation is IDEMPOTENT and the recovery procedure is simply to
run it again until every returned count is 0.

Deliberate limit: forgetting EVERY remaining vector of the index
raises — an all-partitions-deleted parquet dataset is unreadable
(no schema to infer), so a total wipe must go through
``sinks.parquet.delete_path`` + rebuild instead of masquerading as a
row-level delete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _forget_plain(
    spark: SparkSession, path: str, ids: DataFrame, key: str
) -> int:
    """Anti-join rewrite of an unpartitioned dataset; returns rows
    removed (0 rows → no rewrite at all)."""
    from ..operators.merge import (
        recover_interrupted_swap,
        replace_dataset_atomically,
    )

    # a crashed prior swap leaves the path missing and ._previous as
    # the only copy — restore before the read below, or re-running
    # (the documented recovery) throws instead of converging
    recover_interrupted_swap(spark, path)
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


def _heal_index_cells(fs, hpath, coded_path: str) -> None:
    """Entry-time recovery for the per-cell swaps: any cell saved in
    the ._forget_prev area whose live directory is missing was caught
    mid-swap — restore it; everything else there (and any stale
    staging) is leftover from a completed or restartable step and is
    safe to clear."""
    from ..sinks.fsutil import checked_rename, remove_stale

    prev_root = hpath(coded_path + "._forget_prev")
    if fs.exists(prev_root):
        it = fs.listStatus(prev_root)
        for st in it:
            name = st.getPath().getName()
            live = hpath(f"{coded_path}/{name}")
            if name.startswith("cell=") and not fs.exists(live):
                checked_rename(fs, st.getPath(), live)
        fs.delete(prev_root, True)
    remove_stale(fs, hpath(coded_path + "._forget_staging"))


def _forget_index_cells(
    spark: SparkSession, index_path: str, ids: DataFrame
) -> int:
    """Partition-scoped deletion from the IVF+PQ coded table: rewrite
    only the cells holding forgotten ids, each via an atomic rename
    swap; drop cells left empty."""
    from ..sinks.fsutil import checked_rename, hadoop_fs

    coded_path = index_path.rstrip("/") + "/coded"
    fs, hpath = hadoop_fs(spark, coded_path)
    _heal_index_cells(fs, hpath, coded_path)

    coded = spark.read.parquet(coded_path)
    doomed = ids.withColumnRenamed(ids.columns[0], "id")
    # one pass: affected cells AND the removed-row total together
    per_cell = {
        int(r["cell"]): int(r["cnt"])
        for r in coded.join(doomed, "id", "left_semi")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    if not per_cell:
        return 0
    n = sum(per_cell.values())
    cells = sorted(per_cell)
    survivors = (
        coded.where(F.col("cell").isin(cells))
        .join(doomed, "id", "left_anti")
        .localCheckpoint(eager=True)  # the swaps rewrite what this read
    )
    kept = {
        int(r["cell"]) for r in survivors.select("cell").distinct().collect()
    }
    emptied = [c for c in cells if c not in kept]
    existing = [
        st.getPath().getName()
        for st in fs.listStatus(hpath(coded_path))
        if st.getPath().getName().startswith("cell=")
    ]
    if len(emptied) >= len(existing):
        raise ValueError(
            "forget_documents: deleting every remaining vector would leave "
            "an unreadable empty index (no partitions, no schema); drop the "
            "index with sinks.parquet.delete_path and rebuild instead"
        )

    staging = coded_path + "._forget_staging"
    prev_root = coded_path + "._forget_prev"
    if kept:
        (
            survivors.repartition(len(kept), "cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(staging)
        )
        fs.mkdirs(hpath(prev_root))
        for cell in sorted(kept):
            live = hpath(f"{coded_path}/cell={cell}")
            prev = hpath(f"{prev_root}/cell={cell}")
            # the dangerous window per cell is between these renames; a
            # crash there is healed at the next call's entry (restore
            # from ._forget_prev), after which the re-run re-removes
            checked_rename(fs, live, prev)
            checked_rename(fs, hpath(f"{staging}/cell={cell}"), live)
        fs.delete(hpath(prev_root), True)
        fs.delete(hpath(staging), True)
    # fully-emptied cells: every row in them is doomed, so a direct
    # delete is idempotent — a crash mid-loop just re-deletes
    for cell in emptied:
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
