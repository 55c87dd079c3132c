"""Key-merge (upsert) maintenance for parquet warehouses.

Plain parquet has no MERGE INTO; this operator supplies the
latest-wins upsert every warehouse eventually needs (the reference
only ever appends — corrections were impossible without manual S3
surgery):

    target ⟕anti updates  ∪  updates(not deleted)  → atomic swap

Scale shape: one anti-join shuffle on the key + a union — no
per-row driver work. The merged result is localCheckpoint'ed BEFORE
the swap because its lineage reads the very path being replaced
(collecting after the overwrite would re-scan the new files — the
same mutated-snapshot hazard plans/pipeline.py guards against); the
swap itself is rename-based so readers never see a half-written
dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.fsutil import checked_rename, hadoop_fs, remove_stale
from ..sources.parquet import read_table_or_empty


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    delete_col: str | None = None,
) -> int:
    """Upsert ``updates`` into the parquet dataset at ``target_path``:
    rows with existing keys are replaced, new keys inserted; when
    ``delete_col`` is given, update rows with it true remove the key.
    Updates must be unique per key (enforced). Returns the row count
    of the merged dataset."""
    recover_interrupted_swap(spark, target_path)
    dup = updates.groupBy(key).count().filter(F.col("count") > 1)
    if not dup.isEmpty():
        sample = [r[key] for r in dup.limit(5).collect()]
        raise ValueError(f"updates contain duplicate keys, e.g. {sample}")
    if not updates.filter(F.col(key).isNull()).isEmpty():
        # an anti-join can never match a NULL key, so a NULL-key update
        # would APPEND on every apply instead of replacing — reject it
        # rather than silently accumulate duplicates
        raise ValueError("updates contain a NULL merge key")

    survivors = updates
    if delete_col is not None:
        survivors = updates.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)

    target = read_table_or_empty(spark, target_path, survivors.schema)
    merged = target.join(
        updates.select(key), on=key, how="left_anti"
    ).unionByName(survivors)

    pinned = merged.localCheckpoint(eager=True)
    n = pinned.count()
    replace_dataset_atomically(spark, target_path, pinned, op="merge")
    return n


def recover_interrupted_swap(spark: SparkSession, target_path: str) -> bool:
    """Restore the dataset if a prior swap crashed in its one
    dangerous window — between renaming ``dst`` aside to ``._previous``
    and renaming the staged result in. In that state ``dst`` is
    MISSING and the backup holds the only surviving copy; any caller
    that reads the target (or clears "stale" paths) before restoring
    would silently treat the warehouse as empty and then delete the
    backup. Must run before any read of ``target_path`` in a
    maintenance operation; returns True if a restore happened."""
    fs, hpath = hadoop_fs(spark, target_path)
    dst = hpath(target_path)
    backup = hpath(target_path.rstrip("/") + "._previous")
    if (not fs.exists(dst)) and fs.exists(backup):
        checked_rename(fs, backup, dst)
        return True
    return False


def replace_dataset_atomically(
    spark: SparkSession, target_path: str, df: DataFrame, op: str = "rewrite"
) -> None:
    """Write ``df`` beside ``target_path`` then rename into place —
    readers see the old dataset or the new one, never a mix. ``df``
    must NOT have lineage reading ``target_path`` unless checkpointed
    first (see module docstring). ``op`` names the maintenance
    operation for the versioning rewrite stamp (so an expired
    versioned read can say "merge at rw2" vs "forget at rw3")."""
    from ..sinks.versions import _data_files, _versions_dir, record_rewrite

    tmp = target_path.rstrip("/") + "._staging"
    fs, hpath = hadoop_fs(spark, target_path)
    dst = hpath(target_path)
    tmp_p = hpath(tmp)
    backup = hpath(target_path.rstrip("/") + "._previous")
    # Crash recovery ordering matters: if a prior run died between its
    # two renames, ._previous is the ONLY copy — restore it before
    # treating it as stale. (Callers that READ the target must have
    # called recover_interrupted_swap before their read; this repeat
    # is defense in depth for direct callers.)
    if (not fs.exists(dst)) and fs.exists(backup):
        checked_rename(fs, backup, dst)
    # Now any remaining ._staging/._previous is genuinely stale (dst
    # exists, or never existed); either would make the renames below
    # fail (occupied destination). Clear them before writing.
    remove_stale(fs, tmp_p, backup)
    # capture the vanishing file set ONLY when the dataset actually
    # has versions — an unconditional recursive listing would tax
    # every swap on unversioned warehouses for nothing
    versioned = fs.exists(hpath(_versions_dir(target_path)))
    old_files = (
        _data_files(fs, hpath, target_path)
        if versioned and fs.exists(dst)
        else []
    )
    df.write.mode("overwrite").option("compression", "snappy").parquet(tmp)
    if fs.exists(dst):
        checked_rename(fs, dst, backup)
    checked_rename(fs, tmp_p, dst)
    fs.delete(backup, True)
    # stamp AFTER the swap is durable: a stamp for a swap that never
    # happened would falsely expire readable versions; a crash before
    # stamping degrades to "unknown rewrite" in the expiry message,
    # never to wrong data
    record_rewrite(spark, target_path, op, old_files)
