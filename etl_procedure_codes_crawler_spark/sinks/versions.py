"""Manifest-based dataset versioning: time travel for append-grown data.

A training run must be reproducible against the corpus AS IT WAS —
"version 37 of the warehouse" — but the ingest gate appends files
continuously. Table formats (Delta/Iceberg) solve this with manifest
files; this module implements the minimal public idea over plain
parquet: a version is a JSON manifest listing the data files present
at commit time, and reading a version reads EXACTLY those files.

    <path>._versions/v<N>.json   {"version": N, "files": [...],
                                  "n_files": int, "note": str}

The manifest directory is a SIBLING of the dataset, not inside it:
the maintenance operations (compaction, atomic swaps) replace the
dataset DIRECTORY wholesale, and manifests stored within would be
destroyed with the old directory — exactly when the expiry check
needs them to explain what happened.

Why it is sound here: this engine's write discipline is append-only
(the gate, the stores, the index) — existing files are never mutated,
so an old manifest's files remain valid as new ones land beside them.
The one operation that DOES rewrite files is compaction (and the
forget op): both invalidate older manifests, which is surfaced rather
than hidden — :func:`read_version` raises listing the missing files
instead of silently returning a partial corpus. The practical
protocol: commit a version before compacting/forgetting, and treat
older versions as expired after (forget especially: keeping doomed
bytes readable through old manifests would defeat the deletion —
expiry is the correct behavior, not a limitation).

Scale shape: a manifest is metadata (one filename per task output —
thousands of entries at 100 TB, kilobytes to megabytes of JSON); the
versioned read hands Spark the explicit file list, so planning cost
equals a normal read with the listing already done.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .fsutil import hadoop_fs


def _data_files(fs, hpath, path: str) -> list[str]:
    files = []
    it = fs.listFiles(hpath(path), True)
    while it.hasNext():
        p = it.next().getPath()
        name = p.getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            files.append(p.toString())
    return sorted(files)


def _versions_dir(path: str) -> str:
    return path.rstrip("/") + "._versions"


def list_versions(spark: SparkSession, path: str) -> list[int]:
    fs, hpath = hadoop_fs(spark, path)
    vdir = hpath(_versions_dir(path))
    if not fs.exists(vdir):
        return []
    out = []
    for st in fs.listStatus(vdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def commit_version(spark: SparkSession, path: str, note: str = "") -> int:
    """Record the dataset's current file set as the next version and
    return its number. Metadata-only — no data moves. Concurrent
    committers are not arbitrated (the ingest gate is the single
    writer in this engine); the manifest write itself is a single
    file create, atomic on any sane filesystem."""
    fs, hpath = hadoop_fs(spark, path)
    files = _data_files(fs, hpath, path)
    version = (list_versions(spark, path) or [0])[-1] + 1
    manifest = {
        "version": version,
        "n_files": len(files),
        "files": files,
        "note": note,
    }
    vdir = _versions_dir(path)
    fs.mkdirs(hpath(vdir))
    out = fs.create(hpath(f"{vdir}/v{version}.json"), False)
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The dataset exactly as of ``version`` (default: latest
    committed). Raises if any manifest file has since been rewritten
    away (compaction/forget) — a silently partial corpus would be
    worse than a loud expiry."""
    versions = list_versions(spark, path)
    if not versions:
        raise ValueError(f"no committed versions under {path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    fs, hpath = hadoop_fs(spark, path)
    raw = fs.open(hpath(f"{_versions_dir(path)}/v{version}.json"))
    try:
        data = bytes(raw.readAllBytes())
    finally:
        raw.close()
    manifest = json.loads(data.decode("utf-8"))
    missing = [f for f in manifest["files"] if not fs.exists(hpath(f))]
    if missing:
        raise ValueError(
            f"version {version} expired: {len(missing)} of "
            f"{manifest['n_files']} files were rewritten since the commit "
            f"(compaction or forget) — first missing: {missing[0]}"
        )
    if not manifest["files"]:
        raise ValueError(f"version {version} committed an empty dataset")
    return spark.read.parquet(*manifest["files"])
