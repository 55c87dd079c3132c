"""Every registered query must hash-match its DuckDB oracle —
the local replica of the driver's t2 correctness gate (sf0.001 here
for speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from etl_procedure_codes_crawler_spark.plans.parity import compare_query
from etl_procedure_codes_crawler_spark.plans.relational import ORACLES, QUERIES
from etl_procedure_codes_crawler_spark.llm.queries import ROWS_ONLY  # registers llm queries


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    report = compare_query(spark, sf_dir, QUERIES[name], ORACLES[name])
    assert report["rows_match"], report
    assert report["columns_match"], report
    assert report["values_match"], {
        k: v for k, v in report.items() if k != "values_match"
    } | {"first_diffs": report.get("first_diffs")}


def test_every_query_has_an_oracle_or_is_flagged():
    # queries without oracles get the weaker rows-only driver check;
    # keep the list explicit so additions are deliberate
    no_oracle = set(QUERIES) - set(ORACLES)
    assert no_oracle == ROWS_ONLY, f"unexpected oracle-less queries: {no_oracle ^ ROWS_ONLY}"


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_queries_run_and_are_deterministic(spark, sf_dir, name):
    first = QUERIES[name](spark, sf_dir)
    rows_a = first.count()
    rows_b = QUERIES[name](spark, sf_dir).count()
    assert rows_a == rows_b  # deterministic run-to-run
    assert rows_a >= 0
