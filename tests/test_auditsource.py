"""Tests for the audit-log Python DataSource write path
(sinks/auditsource.py): two-phase commit semantics end-to-end."""

from __future__ import annotations

import json
import os

import pytest

from etl_procedure_codes_crawler_spark.sinks.auditsource import (
    AuditLogDataSource,
    AuditLogWriter,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(AuditLogDataSource)
    return spark


def _audit_df(spark, rows):
    return spark.createDataFrame(
        rows, "dag_id string, task_id string, run_id string, error string"
    )


class TestWriteReadRoundTrip:
    def test_append_and_read_back(self, registered, tmp_path):
        path = str(tmp_path / "audit")
        os.makedirs(path)
        df = _audit_df(
            registered,
            [("dag1", "crawl", "run-1", "boom"), ("dag1", "sink", "run-1", "disk")],
        )
        df.write.format("audit_log").option("path", path).mode("append").save()
        back = (
            registered.read.format("audit_log").option("path", path).load()
        )
        got = sorted((r.task_id, r.error) for r in back.collect())
        assert got == [("crawl", "boom"), ("sink", "disk")]

    def test_append_accumulates_batches(self, registered, tmp_path):
        path = str(tmp_path / "audit")
        os.makedirs(path)
        for run in ("run-1", "run-2"):
            _audit_df(registered, [("d", "t", run, "e")]).write.format(
                "audit_log"
            ).option("path", path).mode("append").save()
        back = registered.read.format("audit_log").option("path", path).load()
        assert sorted(r.run_id for r in back.collect()) == ["run-1", "run-2"]

    def test_no_staging_visible_after_commit(self, registered, tmp_path):
        path = str(tmp_path / "audit")
        os.makedirs(path)
        _audit_df(registered, [("d", "t", "r", "e")]).write.format(
            "audit_log"
        ).option("path", path).mode("append").save()
        staging_root = os.path.join(path, "_staging")
        # the job's own staging dir is gone; the shared root may remain
        assert (not os.path.isdir(staging_root)) or os.listdir(
            staging_root
        ) == []


class TestCommitProtocol:
    def test_commit_publishes_only_named_files(self, tmp_path):
        """Files staged by unnamed (failed/speculative) attempts are
        swept, not published."""
        path = str(tmp_path / "audit")
        os.makedirs(path)
        w = AuditLogWriter({"path": path}, overwrite=False)
        staging = w._staging()
        os.makedirs(staging)
        # a successful attempt's staged file
        good = "part-good.jsonl"
        with open(os.path.join(staging, good), "w") as fh:
            fh.write(json.dumps({"dag_id": "d", "task_id": "t",
                                 "run_id": "r", "error": "e"}) + "\n")
        # an orphan from a failed attempt — staged but never named
        with open(os.path.join(staging, "part-orphan.jsonl"), "w") as fh:
            fh.write("{}\n")

        from etl_procedure_codes_crawler_spark.sinks.auditsource import _StagedFile

        w.commit([_StagedFile(name=good, rows=1)])
        published = [f for f in os.listdir(path) if f.endswith(".jsonl")]
        assert published == [good]
        assert not os.path.isdir(staging)  # job dir swept, orphan gone

    def test_abort_sweeps_staging(self, tmp_path):
        path = str(tmp_path / "audit")
        os.makedirs(path)
        w = AuditLogWriter({"path": path}, overwrite=False)
        staging = w._staging()
        os.makedirs(staging)
        with open(os.path.join(staging, "part-x.jsonl"), "w") as fh:
            fh.write("{}\n")
        w.abort([None])
        assert not os.path.isdir(staging)
        assert [f for f in os.listdir(path) if f.endswith(".jsonl")] == []

    def test_concurrent_jobs_do_not_sweep_each_other(self, tmp_path):
        """Job A's commit must not delete job B's staged files (the
        shared-path race a production audit channel actually hits)."""
        path = str(tmp_path / "audit")
        os.makedirs(path)
        a = AuditLogWriter({"path": path}, overwrite=False)
        b = AuditLogWriter({"path": path}, overwrite=False)
        os.makedirs(a._staging())
        os.makedirs(b._staging())
        with open(os.path.join(a._staging(), "part-a.jsonl"), "w") as fh:
            fh.write(json.dumps({"dag_id": "a", "task_id": "t",
                                 "run_id": "r", "error": "e"}) + "\n")
        with open(os.path.join(b._staging(), "part-b.jsonl"), "w") as fh:
            fh.write(json.dumps({"dag_id": "b", "task_id": "t",
                                 "run_id": "r", "error": "e"}) + "\n")

        from etl_procedure_codes_crawler_spark.sinks.auditsource import _StagedFile

        a.commit([_StagedFile(name="part-a.jsonl", rows=1)])
        # B's staged file survives A's commit and then publishes fine
        b.commit([_StagedFile(name="part-b.jsonl", rows=1)])
        published = sorted(
            f for f in os.listdir(path) if f.endswith(".jsonl")
        )
        assert published == ["part-a.jsonl", "part-b.jsonl"]

    def test_commit_with_no_tasks_is_a_noop(self, tmp_path):
        """A zero-partition write never creates staging; commit([])
        must not crash."""
        path = str(tmp_path / "audit")
        os.makedirs(path)
        w = AuditLogWriter({"path": path}, overwrite=False)
        w.commit([])  # no staging dir exists
        assert [f for f in os.listdir(path) if f.endswith(".jsonl")] == []

    def test_overwrite_mode_replaces_log(self, registered, tmp_path):
        path = str(tmp_path / "audit")
        os.makedirs(path)
        _audit_df(registered, [("d", "t", "old", "e")]).write.format(
            "audit_log"
        ).option("path", path).mode("append").save()
        _audit_df(registered, [("d", "t", "new", "e")]).write.format(
            "audit_log"
        ).option("path", path).mode("overwrite").save()
        back = registered.read.format("audit_log").option("path", path).load()
        assert [r.run_id for r in back.collect()] == ["new"]


class TestErrorSinkIntegration:
    def test_register_error_rows_flow_through(self, registered, tmp_path):
        """K8 end-to-end: the reference's Airflow run-spec JSON becomes
        a typed row (sinks/errors.py) and lands in the audit log via
        the DataSource write path."""
        from etl_procedure_codes_crawler_spark.sinks.errors import error_row

        path = str(tmp_path / "audit")
        os.makedirs(path)
        spec = json.dumps(
            {"dag_id": "crawl_dag", "task_id": "extract", "run_id": "r42"}
        )
        df = error_row(registered, spec, "page timeout")
        df.write.format("audit_log").option("path", path).mode("append").save()
        back = registered.read.format("audit_log").option("path", path).load()
        row = back.collect()[0]
        assert (row.dag_id, row.task_id, row.run_id) == (
            "crawl_dag", "extract", "r42"
        )
        assert "timeout" in row.error
