"""J1/J2 anti-join dedup semantics (reference: procedure_code.py:763-772)."""

from __future__ import annotations

from etl_procedure_codes_crawler_spark.operators.dedup import (
    anti_join_on_key,
    incremental_new_rows,
)
from etl_procedure_codes_crawler_spark.schemas import PROCEDURE_NDC_SCHEMA


def _ndc(spark, ids):
    rows = [(i, f"drug-{i}", f"lab-{i}", "1 ML", "UN") for i in ids]
    return spark.createDataFrame(rows, PROCEDURE_NDC_SCHEMA)


def test_partial_overlap(spark):
    new = _ndc(spark, ["a", "b", "c"])
    existing = _ndc(spark, ["b", "x"])
    out = sorted(
        r.ndc_alternate_id
        for r in anti_join_on_key(new, existing, "ndc_alternate_id").collect()
    )
    assert out == ["a", "c"]


def test_disjoint_and_empty_existing(spark):
    new = _ndc(spark, ["a", "b"])
    assert anti_join_on_key(new, _ndc(spark, []), "ndc_alternate_id").count() == 2
    assert (
        anti_join_on_key(new, _ndc(spark, ["z"]), "ndc_alternate_id").count() == 2
    )


def test_all_existing(spark):
    new = _ndc(spark, ["a"])
    existing = _ndc(spark, ["a", "b"])
    assert anti_join_on_key(new, existing, "ndc_alternate_id").count() == 0


def test_incremental_dedups_within_batch(spark):
    # The reference's isin-filter does NOT dedup within the batch
    # (SURVEY §2.4 note); incremental_new_rows must.
    new = _ndc(spark, ["a", "a", "b", None])
    existing = _ndc(spark, ["b"])
    out = incremental_new_rows(new, existing, "ndc_alternate_id")
    assert [r.ndc_alternate_id for r in out.collect()] == ["a"]


def test_columns_preserved(spark):
    new = _ndc(spark, ["a"])
    out = anti_join_on_key(new, _ndc(spark, []), "ndc_alternate_id")
    assert out.columns == list(PROCEDURE_NDC_SCHEMA.names)
    row = out.collect()[0]
    assert row.drug_name == "drug-a"


def test_anti_join_plan_broadcasts_existing(spark):
    new = _ndc(spark, ["a", "b"])
    existing = _ndc(spark, ["b"])
    plan = anti_join_on_key(
        new, existing, "ndc_alternate_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
