"""Tests for config.py — the reference's fail-fast env handling
(``crawler/src/utils/config.py:10-32``) rebuilt as a picklable
dataclass. Pure Python; no SparkSession needed."""

from __future__ import annotations

import pytest

from etl_procedure_codes_crawler_spark.config import (
    MissingConfigError,
    PipelineConfig,
    handle_env_vars,
)


class TestHandleEnvVars:
    def test_required_present(self):
        out = handle_env_vars(required=["A"], env={"A": "x"})
        assert out == {"A": "x"}

    def test_required_missing_raises_with_all_names(self):
        with pytest.raises(MissingConfigError) as ei:
            handle_env_vars(required=["A", "B"], env={"A": ""})
        # both missing vars named, sorted — one error reports everything
        assert "A" in str(ei.value) and "B" in str(ei.value)

    def test_blank_counts_as_missing(self):
        # the reference treats whitespace-only values as absent
        with pytest.raises(MissingConfigError):
            handle_env_vars(required=["A"], env={"A": "   "})

    def test_optional_defaults_and_overrides(self):
        out = handle_env_vars(
            optional={"X": "dx", "Y": "dy"}, env={"Y": "set"}
        )
        assert out == {"X": "dx", "Y": "set"}


class TestPipelineConfig:
    def test_defaults_from_empty_env(self):
        cfg = PipelineConfig.from_env(env={})
        assert cfg.database == "default"
        assert cfg.codes_table == "procedure_codes"
        assert cfg.fetch_batch_size == 200  # reference chunk_size

    def test_env_overrides(self):
        cfg = PipelineConfig.from_env(
            env={
                "LOGICAL_DATE": "2026-08-13",
                "DATABASE": "prod",
                "FETCH_BATCH_SIZE": "50",
            }
        )
        assert cfg.logical_date == "2026-08-13"
        assert cfg.database == "prod"
        assert cfg.fetch_batch_size == 50

    def test_frozen_and_picklable(self):
        import pickle

        cfg = PipelineConfig.from_env(env={})
        with pytest.raises(Exception):
            cfg.database = "x"  # type: ignore[misc]
        assert pickle.loads(pickle.dumps(cfg)) == cfg
