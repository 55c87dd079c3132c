"""Secrets providers (SURVEY §2.1 S7, §2.6 F23/F25).

Reference: ``crawler/src/utils/secret_manager.py:8-23`` fetches a JSON
payload from AWS Secrets Manager and ``procedure_code.py:680-684``
parses it with ``json.loads``. Spark-first translation: secrets are
resolved ONCE on the driver and travel to executors inside picklable
config objects (never re-fetched per task — at 1000 executors a
per-task secrets call is a rate-limit outage).

The provider is a protocol so tests and non-AWS deployments inject
dict/env-backed implementations; the AWS client is import-gated.
"""

from __future__ import annotations

import json
import os
from typing import Protocol


class SecretProvider(Protocol):
    def get_secret(self, secret_id: str) -> str:
        """Return the raw secret payload (usually a JSON string)."""
        ...


class DictSecretProvider:
    """In-memory provider for tests and local runs."""

    def __init__(self, secrets: dict[str, str]):
        self._secrets = dict(secrets)

    def get_secret(self, secret_id: str) -> str:
        try:
            return self._secrets[secret_id]
        except KeyError:
            raise KeyError(f"secret not found: {mask_secret_id(secret_id)}")


class EnvSecretProvider:
    """Secrets from environment variables (secret_id = var name)."""

    def get_secret(self, secret_id: str) -> str:
        value = os.environ.get(secret_id, "")
        if not value:
            raise KeyError(f"secret not found: {mask_secret_id(secret_id)}")
        return value


class AwsSecretsManagerProvider:
    """AWS Secrets Manager (``utils/secret_manager.py:8-23``).

    Import-gated: instantiating without boto3 installed raises with a
    clear message instead of failing at module import.
    """

    def __init__(self, region_name: str | None = None):
        try:
            import boto3  # noqa: F401
        except ImportError as exc:  # pragma: no cover - no boto3 in CI
            raise ImportError(
                "boto3 is required for AwsSecretsManagerProvider"
            ) from exc
        import boto3

        self._client = boto3.client("secretsmanager", region_name=region_name)

    def get_secret(self, secret_id: str) -> str:  # pragma: no cover
        response = self._client.get_secret_value(SecretId=secret_id)
        return response["SecretString"]


def parse_secret_json(payload: str) -> dict:
    """F23: JSON secret payload → dict (``procedure_code.py:680-684``)."""
    return json.loads(payload)


def mask_secret_id(secret_id: str) -> str:
    """F25: log-safe masking (``utils/postgres.py:10,13``) — keep the
    first half, replace the rest with ``***``."""
    if not secret_id:
        return "***"
    return secret_id[: len(secret_id) // 2] + "***"
