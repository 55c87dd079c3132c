"""mapInPandas extraction operator + 3-way fan-out (SURVEY §2.7)."""

from __future__ import annotations

import os

import pytest

from etl_procedure_codes_crawler_spark.operators.extract import (
    extract_procedure_pages,
    split_procedure_outputs,
)
from etl_procedure_codes_crawler_spark.schemas import (
    CODES_INPUT_SCHEMA,
    PROCEDURE_CODES_COLUMNS,
)
from etl_procedure_codes_crawler_spark.sources.fetcher import FixtureFetcher

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _load_pages():
    pages = {}
    for code, name in {
        "99213": "cpt_normal.html",
        "J0120": "hcpcs_normal.html",
        "XXXXX": "page_404.html",
        "J9999": "deleted_hcpcs_listing.html",
        "0001M": "deleted_code.html",
        "0042T": "cpt_empty_tabs.html",
    }.items():
        with open(os.path.join(FIXDIR, name)) as handle:
            pages[code] = handle.read()
    return pages


# partial(FixtureFetcher, pages=...) pickles the class by reference and
# the page dict by value — importable on executors.
import functools

# per-code final URLs, as the live site's redirects would produce them
_URLS = {
    "99213": "https://example.test/cpt-codes/99213",
    "0042T": "https://example.test/cpt-codes/0042T",
    "0001M": "https://example.test/cpt-codes/0001M",
    "J0120": "https://example.test/hcpcs-codes/J0120",
    "J9999": "https://example.test/hcpcs-codes/J9999",
}

_factory = functools.partial(FixtureFetcher, pages=_load_pages(), urls=_URLS)


CODES = ["99213", "J0120", "XXXXX", "J9999", "0001M", "0042T", "NOFIX"]


@pytest.fixture(scope="module")
def extracted(spark):
    codes = spark.createDataFrame([(c,) for c in CODES], CODES_INPUT_SCHEMA)
    # cpt-codes URL prefix keeps code-type classification meaningful for
    # CPT fixtures; HCPCS fixtures carry their own hcpcs URLs in tests
    # of the parse layer.
    df = extract_procedure_pages(
        codes, _factory, base_url="https://example.test/cpt-codes/"
    ).persist()
    yield df
    df.unpersist()


def test_statuses(extracted):
    status = {r.code: r.status for r in extracted.collect()}
    assert status == {
        "99213": "ok",
        "J0120": "ok",
        "XXXXX": "error_404",
        "J9999": "deleted_listing",
        "0001M": "deleted",
        "0042T": "ok",
        "NOFIX": "fetch_error",
    }


def test_fetch_error_carries_message(extracted):
    row = extracted.filter("code = 'NOFIX'").collect()[0]
    assert "no fixture" in row.error


def test_ok_row_fields(extracted):
    row = extracted.filter("code = '99213'").collect()[0]
    assert row.code_type == "CPT"
    assert row.main_interval == "99202-99215"
    assert list(row.modifiers) == ["25", "59"]
    assert list(row.revenue_lookup) == ["0510", "0982"]
    assert row.modifier_rows[0].modifier == "25"
    assert row.ndc_rows[1].drug_name == "DrugB"


def test_hcpcs_classification_from_final_url(extracted):
    # the fetcher's post-redirect URL, not base_url, drives CPT/HCPCS
    row = extracted.filter("code = 'J0120'").collect()[0]
    assert row.code_type == "HCPCS"
    assert row.main_interval == "J0120-J8999"
    assert list(row.cpt_code_symbols) == [
        "Carrier judgment",
        "Special coverage instructions apply",
    ]


def test_none_vs_empty_array_survives_arrow(extracted):
    row = extracted.filter("code = '0042T'").collect()[0]
    assert list(row.revenue_lookup) == []   # present-but-empty
    assert row.icd10_cm is None             # absent


def test_split_outputs(extracted):
    codes, modifiers, ndc = split_procedure_outputs(extracted)
    assert codes.columns == PROCEDURE_CODES_COLUMNS
    # ok(3) + deleted(1); 404/listing/fetch-error excluded
    assert codes.count() == 4
    assert sorted(r.modifier for r in modifiers.collect()) == ["25", "59"]
    assert ndc.count() == 3  # 2 from 99213 + 1 from J0120
    deleted = codes.filter("code = '0001M'").collect()[0]
    assert deleted.date_deleted is not None and deleted.main_interval is None
