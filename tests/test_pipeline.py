"""End-to-end crawl pipeline: clean → crawl → fan-out → dedup → sink."""

from __future__ import annotations

import functools
import os

from etl_procedure_codes_crawler_spark.plans.pipeline import (
    run_and_sink,
    run_crawl_pipeline,
)
from etl_procedure_codes_crawler_spark.schemas import (
    CODES_INPUT_SCHEMA,
    PROCEDURE_MODIFIERS_SCHEMA,
)
from etl_procedure_codes_crawler_spark.sources.fetcher import FixtureFetcher

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _pages():
    pages = {}
    for code, name in {
        "99213": "cpt_normal.html",
        "J0120": "hcpcs_normal.html",
        "XXXXX": "page_404.html",
        "0001M": "deleted_code.html",
    }.items():
        with open(os.path.join(FIXDIR, name)) as handle:
            pages[code] = handle.read()
    return pages


_URLS = {
    "99213": "https://example.test/cpt-codes/99213",
    "0001M": "https://example.test/cpt-codes/0001M",
    "J0120": "https://example.test/hcpcs-codes/J0120",
}

_factory = functools.partial(FixtureFetcher, pages=_pages(), urls=_URLS)

# dirty input: blanks, 'false', dup — P1-P3 exercise
RAW_CODES = ["99213", "", "false", "99213", "J0120", "XXXXX", "0001M", None]


def test_full_pipeline_first_run(spark):
    codes = spark.createDataFrame([(c,) for c in RAW_CODES], CODES_INPUT_SCHEMA)
    result = run_crawl_pipeline(spark, codes, _factory)
    out_codes = {r.code for r in result.codes.collect()}
    # 404 row excluded; deleted row included
    assert out_codes == {"99213", "J0120", "0001M"}
    assert sorted(r.modifier for r in result.modifiers.collect()) == ["25", "59"]
    assert result.ndc.count() == 3


def test_pipeline_dedups_vs_existing_modifiers(spark):
    codes = spark.createDataFrame([("99213",)], CODES_INPUT_SCHEMA)
    existing = spark.createDataFrame(
        [("25", "already known")], PROCEDURE_MODIFIERS_SCHEMA
    )
    result = run_crawl_pipeline(
        spark, codes, _factory, existing_modifiers=existing
    )
    assert [r.modifier for r in result.modifiers.collect()] == ["59"]


def test_incremental_run_and_sink_idempotent(spark, tmp_path):
    warehouse = str(tmp_path / "wh")
    codes = spark.createDataFrame([(c,) for c in RAW_CODES], CODES_INPUT_SCHEMA)

    first = run_and_sink(spark, codes, _factory, warehouse, load_date="20260813")
    assert first.codes.count() == 3
    stored = spark.read.parquet(f"{warehouse}/procedure_codes")
    assert stored.count() == 3

    # Second run with the same input: everything already known → no appends.
    second = run_and_sink(spark, codes, _factory, warehouse, load_date="20260814")
    assert second.codes.count() == 0
    assert second.modifiers.count() == 0
    assert second.ndc.count() == 0
    assert spark.read.parquet(f"{warehouse}/procedure_codes").count() == 3
    assert spark.read.parquet(f"{warehouse}/procedure_modifiers").count() == 2
    assert spark.read.parquet(f"{warehouse}/procedure_ndc").count() == 3


def test_incremental_new_code_appends_only_new(spark, tmp_path):
    warehouse = str(tmp_path / "wh2")
    first_codes = spark.createDataFrame([("99213",)], CODES_INPUT_SCHEMA)
    run_and_sink(spark, first_codes, _factory, warehouse, load_date="20260813")

    both = spark.createDataFrame([("99213",), ("J0120",)], CODES_INPUT_SCHEMA)
    second = run_and_sink(spark, both, _factory, warehouse, load_date="20260814")
    assert [r.code for r in second.codes.collect()] == ["J0120"]
    stored = spark.read.parquet(f"{warehouse}/procedure_ndc")
    # 2 NDC rows from 99213 (run 1) + 1 from J0120 (run 2)
    assert stored.count() == 3


class TestObservedMetrics:
    def test_extract_metrics_ride_the_job(self, spark, fixtures_dir):
        """Observation metrics come from the extraction pass itself —
        no second job — and reconcile with the input code count."""
        import functools
        import os

        from etl_procedure_codes_crawler_spark.plans.pipeline import (
            run_crawl_pipeline,
        )
        from etl_procedure_codes_crawler_spark.schemas import CODES_INPUT_SCHEMA
        from etl_procedure_codes_crawler_spark.sources.fetcher import FixtureFetcher

        pages_dir = fixtures_dir
        codes = [os.path.splitext(f)[0] for f in os.listdir(pages_dir) if f.endswith(".html")]
        codes_df = spark.createDataFrame(
            [(c,) for c in codes] + [("MISSING1",)], CODES_INPUT_SCHEMA
        )
        result = run_crawl_pipeline(
            spark,
            codes_df,
            functools.partial(FixtureFetcher, directory=pages_dir),
        )
        result.codes.count()  # any action over the observed plan
        metrics = result.extract_metrics
        assert metrics["n_pages"] == len(codes) + 1
        assert metrics["n_errors"] >= 1  # the MISSING1 fetch error
        assert metrics["n_ok"] + metrics["n_deleted"] + metrics["n_errors"] <= metrics["n_pages"]
