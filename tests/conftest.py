from __future__ import annotations

import os
import sys

import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
# Executor python workers import the package by reference — they need the
# repo root on PYTHONPATH (set before the JVM starts).
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

from etl_procedure_codes_crawler_spark.session import get_spark  # noqa: E402

TESTDATA_ROOT = "/root/testdata"
#: override with SPARK_GRAFT_TEST_SF=sf0.01 to run the whole suite
#: (incl. the oracle-parity replica) at the driver's gate scale
SF_SMOKE = os.path.join(
    TESTDATA_ROOT, os.environ.get("SPARK_GRAFT_TEST_SF", "sf0.001")
)


def pytest_collection_modifyitems(config, items):
    """Apply the `slow` marker from tests/slow_tier.txt (see
    pytest.ini: the default run is the fast tier; `-m slow` runs the
    heavy tier — registry sweeps mark themselves in-file)."""
    ledger = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "slow_tier.txt"
    )
    try:
        with open(ledger) as fh:
            slow_ids = {
                ln.strip()
                for ln in fh
                if ln.strip() and not ln.startswith("#")
            }
    except OSError:
        return
    for item in items:
        if item.nodeid in slow_ids:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark(
        app_name="etl-procedure-codes-crawler-spark-tests",
        shuffle_partitions=4,
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture()
def fixtures_dir() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
