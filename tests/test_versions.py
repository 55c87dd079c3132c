"""Manifest-based dataset versioning (sinks/versions.py)."""

from __future__ import annotations

import pytest

from etl_procedure_codes_crawler_spark.sinks import versions as V


def _write(spark, path, ids, mode="append"):
    spark.createDataFrame([(i,) for i in ids], "doc_id bigint").repartition(
        1
    ).write.mode(mode).parquet(path)


def test_versions_pin_the_file_set_across_appends(spark, tmp_path):
    path = str(tmp_path / "wh")
    _write(spark, path, [1, 2, 3])
    v1 = V.commit_version(spark, path, note="after batch 1")
    _write(spark, path, [4, 5])
    v2 = V.commit_version(spark, path)
    _write(spark, path, [6])

    assert (v1, v2) == (1, 2)
    assert V.list_versions(spark, path) == [1, 2]
    assert {r.doc_id for r in V.read_version(spark, path, 1).collect()} == {1, 2, 3}
    assert {r.doc_id for r in V.read_version(spark, path, 2).collect()} == {
        1, 2, 3, 4, 5,
    }
    # default = latest committed, NOT the uncommitted tail
    assert V.read_version(spark, path).count() == 5
    # the live read still sees everything
    assert spark.read.parquet(path).count() == 6


def test_manifests_invisible_to_plain_reads(spark, tmp_path):
    path = str(tmp_path / "wh")
    _write(spark, path, [1, 2])
    V.commit_version(spark, path)
    # manifests live in a SIBLING directory (inside the dataset they
    # would be destroyed by compaction's whole-directory swap) — a
    # plain read is unaffected
    assert spark.read.parquet(path).count() == 2


def test_rewritten_files_expire_the_version_loudly(spark, tmp_path):
    from etl_procedure_codes_crawler_spark.sinks.parquet import compact_dataset

    path = str(tmp_path / "wh")
    _write(spark, path, [1, 2, 3])
    _write(spark, path, [4])
    v = V.commit_version(spark, path)
    compact_dataset(spark, path)  # rewrites every file
    with pytest.raises(ValueError, match="expired"):
        V.read_version(spark, path, v)
    # a fresh commit over the compacted layout works again
    v2 = V.commit_version(spark, path)
    assert V.read_version(spark, path, v2).count() == 4


def test_unknown_and_missing_versions_raise(spark, tmp_path):
    path = str(tmp_path / "wh")
    _write(spark, path, [1])
    with pytest.raises(ValueError, match="no committed versions"):
        V.read_version(spark, path)
    V.commit_version(spark, path)
    with pytest.raises(ValueError, match="not in"):
        V.read_version(spark, path, 99)


def test_commit_refuses_empty_or_missing_dataset(spark, tmp_path):
    path = str(tmp_path / "wh")
    with pytest.raises(ValueError, match="no dataset at"):
        V.commit_version(spark, path)
    import os

    os.makedirs(path)
    with pytest.raises(ValueError, match="no data files"):
        V.commit_version(spark, path)


def test_stray_files_in_manifest_dir_ignored(spark, tmp_path):
    import os

    path = str(tmp_path / "wh")
    _write(spark, path, [1, 2])
    v = V.commit_version(spark, path)
    vdir = path + "._versions"
    for junk in ("versions.json", "v_backup.json", "v2.json.tmp", "notes.txt"):
        with open(os.path.join(vdir, junk), "w") as f:
            f.write("{}")
    assert V.list_versions(spark, path) == [v]
    assert V.read_version(spark, path).count() == 2


def test_interrupted_commit_leaves_no_visible_version(spark, tmp_path):
    """The manifest lands via tmp + rename: simulate a crash that left
    only the tmp — no broken version is advertised, and the next
    commit proceeds cleanly."""
    import os

    path = str(tmp_path / "wh")
    _write(spark, path, [1, 2, 3])
    V.commit_version(spark, path)
    vdir = path + "._versions"
    with open(os.path.join(vdir, "v2.json.tmp"), "w") as f:
        f.write('{"version": 2, "files"')  # truncated mid-write
    assert V.list_versions(spark, path) == [1]
    assert V.read_version(spark, path).count() == 3  # latest = intact v1
    assert V.commit_version(spark, path) == 2  # tmp cleared, commit lands
    assert V.read_version(spark, path, 2).count() == 3
