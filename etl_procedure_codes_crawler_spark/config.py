"""Validated settings, replacing the reference's import-time env-var block.

Reference pattern: ``crawler/src/utils/config.py:10-32`` (``handle_env_vars``
raises on missing required vars) and the env block at
``crawler/src/procedure_code.py:27-39``. We keep the same fail-fast
semantics but collect everything into one dataclass so executors receive
a picklable config object instead of reading ``os.environ`` mid-task.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


class MissingConfigError(RuntimeError):
    """A required configuration variable is absent or blank."""


def handle_env_vars(
    required: list[str] | None = None,
    optional: dict[str, str] | None = None,
    env: dict[str, str] | None = None,
) -> dict[str, str]:
    """Resolve env vars, failing fast on missing required ones.

    Mirrors the contract of the reference's ``handle_env_vars``
    (``crawler/src/utils/config.py:10-32``): every name in ``required``
    must be present and non-blank; ``optional`` supplies defaults.
    """
    env = os.environ if env is None else env
    resolved: dict[str, str] = {}
    missing: list[str] = []
    for name in required or []:
        value = env.get(name, "")
        if not value.strip():
            missing.append(name)
        else:
            resolved[name] = value
    if missing:
        raise MissingConfigError(
            f"missing required environment variables: {', '.join(sorted(missing))}"
        )
    for name, default in (optional or {}).items():
        resolved[name] = env.get(name, default)
    return resolved


@dataclass(frozen=True)
class PipelineConfig:
    """Everything the crawl pipeline needs, resolved once on the driver.

    Mirrors the env block at ``crawler/src/procedure_code.py:27-39``
    (db/table names, logical date, secret id, base site) minus the
    AWS-specific plumbing, which Spark's catalog + a secrets provider
    replace.
    """

    logical_date: str = ""
    base_site: str = ""
    database: str = "default"
    codes_table: str = "procedure_codes"
    modifiers_table: str = "procedure_modifiers"
    ndc_table: str = "procedure_ndc"
    errors_table: str = "airflow_errors"
    warehouse_path: str = ""
    secret_id: str = ""
    fetch_batch_size: int = 200  # reference chunk_size, procedure_code.py:725
    extra: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "PipelineConfig":
        resolved = handle_env_vars(
            required=[],
            optional={
                "LOGICAL_DATE": "",
                "BASE_SITE": "",
                "DATABASE": "default",
                "CODES_TABLE": "procedure_codes",
                "MODIFIERS_TABLE": "procedure_modifiers",
                "NDC_TABLE": "procedure_ndc",
                "ERRORS_TABLE": "airflow_errors",
                "WAREHOUSE_PATH": "",
                "SECRET_ID": "",
                "FETCH_BATCH_SIZE": "200",
            },
            env=env,
        )
        return cls(
            logical_date=resolved["LOGICAL_DATE"],
            base_site=resolved["BASE_SITE"],
            database=resolved["DATABASE"],
            codes_table=resolved["CODES_TABLE"],
            modifiers_table=resolved["MODIFIERS_TABLE"],
            ndc_table=resolved["NDC_TABLE"],
            errors_table=resolved["ERRORS_TABLE"],
            warehouse_path=resolved["WAREHOUSE_PATH"],
            secret_id=resolved["SECRET_ID"],
            fetch_batch_size=int(resolved["FETCH_BATCH_SIZE"]),
        )
