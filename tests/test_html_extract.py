"""Pure-parser unit tests (SURVEY §5.1) against fixture HTML variants."""

from __future__ import annotations

import os

import pytest

from etl_procedure_codes_crawler_spark.functions import html_extract as hx
from etl_procedure_codes_crawler_spark.functions.htmldom import parse_html


def _load(fixtures_dir, name):
    with open(os.path.join(fixtures_dir, name)) as handle:
        return handle.read()


@pytest.fixture()
def cpt_doc(fixtures_dir):
    return parse_html(_load(fixtures_dir, "cpt_normal.html"))


@pytest.fixture()
def hcpcs_doc(fixtures_dir):
    return parse_html(_load(fixtures_dir, "hcpcs_normal.html"))


# -- page predicates (P6) ---------------------------------------------------

def test_404_detection(fixtures_dir):
    doc = parse_html(_load(fixtures_dir, "page_404.html"))
    assert hx.is_error_404_page(doc)
    assert not hx.is_deleted_hcpcs_page(doc)


def test_deleted_listing_detection(fixtures_dir):
    doc = parse_html(_load(fixtures_dir, "deleted_hcpcs_listing.html"))
    assert hx.is_deleted_hcpcs_page(doc)
    assert not hx.is_error_404_page(doc)


def test_normal_page_is_neither(cpt_doc):
    assert not hx.is_error_404_page(cpt_doc)
    assert not hx.is_deleted_hcpcs_page(cpt_doc)
    assert hx.extract_deleted(cpt_doc) is None


# -- F1 deleted-code page ---------------------------------------------------

def test_deleted_code_extraction(fixtures_dir):
    doc = parse_html(_load(fixtures_dir, "deleted_code.html"))
    result = hx.extract_deleted(doc)
    assert result is not None
    date_deleted, advice, lay_term, guidelines, description = result
    assert date_deleted == "This code was Deleted effective January 1, 2023."
    assert advice == "See code 0002M for the replacement assay panel."
    assert "COVID–19" in lay_term
    assert guidelines == "No CPT Guidelines found for this code."
    assert description == "Infectious disease, HCV, six biochemical assays utilizing serum."


# -- F2-F5 header/breadcrumbs ----------------------------------------------

def test_short_description_after_comma(cpt_doc):
    assert hx.extract_short_description(cpt_doc) == "Office outpatient visit est"


def test_short_description_no_comma(fixtures_dir):
    doc = parse_html(_load(fixtures_dir, "cpt_empty_tabs.html"))
    assert hx.extract_short_description(doc) == "0042T"


def test_long_description_div_and_h2_fallback(cpt_doc, hcpcs_doc):
    assert (
        hx.extract_long_description(cpt_doc)
        == "Office or other outpatient visit for an established patient"
    )
    assert (
        hx.extract_long_description(hcpcs_doc)
        == "Injection, tetracycline, up to 250 mg"
    )


def test_main_interval_name_breadcrumb_walk(cpt_doc, hcpcs_doc):
    assert hx.extract_main_interval_name(cpt_doc) == [
        "Evaluation and Management",
        "Established Patient Office Visits",
    ]
    assert hx.extract_main_interval_name(hcpcs_doc) == [
        "Drugs Administered J0120-J8999"
    ]


def test_main_interval_cpt_and_hcpcs(cpt_doc, hcpcs_doc):
    assert hx.extract_main_interval(cpt_doc, is_cpt=True) == "99202-99215"
    assert hx.extract_main_interval(hcpcs_doc, is_cpt=False) == "J0120-J8999"


# -- F6 modifiers -----------------------------------------------------------

def test_modifier_rows_dual_output(cpt_doc):
    pairs, codes = hx.extract_modifier_rows(cpt_doc)
    assert codes == ["25", "59"]
    assert pairs[0] == ("25", "Significant separately identifiable E/M service")


def test_modifier_rows_absent(hcpcs_doc):
    pairs, codes = hx.extract_modifier_rows(hcpcs_doc)
    assert pairs == [] and codes == []


# -- F7-F11 tab panes -------------------------------------------------------

def test_betos_cpt_and_hcpcs_panes(cpt_doc, hcpcs_doc):
    assert hx.extract_betos(cpt_doc) == ("M1B", "Office visits - established")
    assert hx.extract_betos(hcpcs_doc) == ("O1E", "Other drugs")


def test_guidelines_advice_report(cpt_doc):
    assert "level of the MDM" in hx.extract_guidelines(cpt_doc)
    assert "low level established" in hx.extract_advice(cpt_doc)
    assert hx.extract_report(cpt_doc) == "Report 99213 once per encounter."


def test_missing_panes_are_none(hcpcs_doc):
    assert hx.extract_guidelines(hcpcs_doc) is None
    assert hx.extract_advice(hcpcs_doc) is None
    assert hx.extract_report(hcpcs_doc) is None


def test_lay_term_summary_and_read_less_removal(cpt_doc):
    summary, lay_term = hx.extract_lay_term(cpt_doc)
    assert summary == "The provider sees an established patient for a routine visit."
    assert "Read Less" not in lay_term
    assert lay_term.endswith("focused history and exam.")


def test_lay_term_absent(fixtures_dir):
    doc = parse_html(_load(fixtures_dir, "cpt_empty_tabs.html"))
    assert hx.extract_lay_term(doc) == (None, None)


# -- F12-F15 AJAX tables, None vs [] ---------------------------------------

def test_revenue_lookup_rows(cpt_doc):
    assert hx.extract_revenue_lookup(cpt_doc) == ["0510", "0982"]


def test_revenue_lookup_empty_table_is_empty_list(fixtures_dir):
    # Table present, zero data rows → [] (NOT None): procedure_code.py:332
    doc = parse_html(_load(fixtures_dir, "cpt_empty_tabs.html"))
    assert hx.extract_revenue_lookup(doc) == []


def test_revenue_lookup_absent_is_none(hcpcs_doc):
    assert hx.extract_revenue_lookup(hcpcs_doc) is None


def test_icd10_cm_dot_stripping(cpt_doc):
    assert hx.extract_icd10_cm(cpt_doc) == ["A09", "B029"]


def test_icd10_cm_absent(hcpcs_doc):
    assert hx.extract_icd10_cm(hcpcs_doc) is None


def test_ndc_rows_and_blank_row_dropped(cpt_doc):
    ids, records = hx.extract_ndc(cpt_doc)
    assert ids == ["00002-1433-80", "00002-1434-80"]
    assert records[0]["bill_unit"] == "UN"  # trailing space stripped
    assert len(records) == 2  # all-blank row dropped


def test_ndc_absent(fixtures_dir):
    doc = parse_html(_load(fixtures_dir, "cpt_empty_tabs.html"))
    assert hx.extract_ndc(doc) == (None, None)


def test_icd_pcs_x(cpt_doc, fixtures_dir):
    assert hx.extract_icd_pcs_x(cpt_doc) == ["0016070"]
    empty = parse_html(_load(fixtures_dir, "cpt_empty_tabs.html"))
    assert hx.extract_icd_pcs_x(empty) is None


# -- F16-F17 symbols / descriptor ------------------------------------------

def test_cpt_symbols(cpt_doc):
    assert hx.extract_cpt_code_symbols(cpt_doc, "https://x/cpt-codes/99213") == [
        "Telemedicine eligible",
        "Add-on code",
    ]


def test_hcpcs_symbols_img_removed(hcpcs_doc):
    assert hx.extract_cpt_code_symbols(
        hcpcs_doc, "https://x/hcpcs-codes/J0120"
    ) == ["Carrier judgment", "Special coverage instructions apply"]


def test_official_descriptor(cpt_doc):
    text = hx.extract_official_descriptor(cpt_doc)
    assert text.startswith("Office or other outpatient visit for the evaluation")


# -- whole-page parse (SURVEY §2.7 core) -----------------------------------

def test_parse_procedure_page_ok(fixtures_dir):
    record = hx.parse_procedure_page(
        "99213", "https://x/cpt-codes/99213", _load(fixtures_dir, "cpt_normal.html")
    )
    assert record["status"] == hx.STATUS_OK
    assert record["code_type"] == "CPT"
    assert record["main_interval"] == "99202-99215"
    assert record["modifiers"] == ["25", "59"]
    assert record["modifier_rows"][0][0] == "25"
    assert record["ndc_rows"][0][0] == "00002-1433-80"
    assert record["icd10_cm"] == ["A09", "B029"]


def test_parse_procedure_page_statuses(fixtures_dir):
    r404 = hx.parse_procedure_page(
        "X", "https://x/cpt-codes/X", _load(fixtures_dir, "page_404.html")
    )
    assert r404["status"] == hx.STATUS_404 and r404["code_type"] is None
    listing = hx.parse_procedure_page(
        "J1", "https://x/hcpcs-codes/J1", _load(fixtures_dir, "deleted_hcpcs_listing.html")
    )
    assert listing["status"] == hx.STATUS_DELETED_LISTING


def test_parse_procedure_page_deleted_sparse_row(fixtures_dir):
    record = hx.parse_procedure_page(
        "0001M", "https://x/cpt-codes/0001M", _load(fixtures_dir, "deleted_code.html")
    )
    assert record["status"] == hx.STATUS_DELETED
    assert record["code_type"] == "CPT"
    assert record["date_deleted"].startswith("This code was Deleted")
    # sparse-row shape per procedure_code.py:576-598
    assert record["main_interval"] is None
    assert record["modifiers"] is None
    assert record["modifier_rows"] is None
    assert record["ndc_rows"] is None


def test_parse_procedure_page_none_vs_empty_array(fixtures_dir):
    record = hx.parse_procedure_page(
        "0042T", "https://x/cpt-codes/0042T", _load(fixtures_dir, "cpt_empty_tabs.html")
    )
    assert record["status"] == hx.STATUS_OK
    assert record["revenue_lookup"] == []      # tab present, zero rows
    assert record["icd_10_pcs_x"] is None      # tab present, no table
    assert record["icd10_cm"] is None          # tab absent
