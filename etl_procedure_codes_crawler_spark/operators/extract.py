"""The per-code extraction operator (SURVEY §2.7) as ``mapInPandas``.

Reference shape: ``extracted_procedure_modifiers_v2``
(``crawler/src/procedure_code.py:540-651``) — one code → three pandas
frames, run serially against one global browser. Spark-first shape:

    codes DF ── mapInPandas(extract) ──► flat DF (21 cols + modifier_rows
                                          + ndc_rows + status + error)
               ── select / explode ────► three typed relations

Design points for 100 TB scale:

- one fetcher per *partition*, built lazily inside the iterator and
  closed in ``finally`` (connection/login reuse without driver state);
- Arrow-batched both directions; the parse layer is pure Python per
  page (inherently row-wise work — the page is the row);
- failures become ``status``/``error`` columns, not exceptions, so one
  bad page costs one row, not a task retry storm;
- fan-out to the three output relations is ``select``/``explode`` —
  Catalyst handles it JVM-side, and the wide frame is only traversed
  once per output (cache it if all three sinks run in one job).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.html_extract import parse_procedure_page
from ..schemas import (
    EXTRACT_RESULT_SCHEMA,
    PROCEDURE_CODES_COLUMNS,
)
from ..sources.fetcher import FetcherFactory

_RESULT_COLUMNS = [f.name for f in EXTRACT_RESULT_SCHEMA.fields]


def extract_procedure_pages(
    codes: DataFrame,
    fetcher_factory: FetcherFactory,
    base_url: str = "",
    code_column: str = "code",
    batch_partitions: int | None = None,
) -> DataFrame:
    """Fetch+parse every code; returns the flat extraction relation.

    ``batch_partitions`` repartitions the codes first — the analog of
    the reference's 200-codes-per-chunk scheduling
    (``procedure_code.py:725``), but expressed as partition count so
    the cluster, not a driver loop, owns the parallelism.
    """
    source = codes.select(F.col(code_column).alias("code"))
    if batch_partitions:
        source = source.repartition(batch_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetcher = None
        try:
            for batch in batches:
                records = []
                for code in batch["code"]:
                    if fetcher is None:
                        fetcher = fetcher_factory()
                    result = fetcher.fetch(code)
                    # Final (post-redirect) URL when the fetcher knows it —
                    # CPT/HCPCS classification depends on it (reference:
                    # driver.current_url, procedure_code.py:550).
                    url = result.url or (base_url + (code or "").strip())
                    if result.html is None:
                        record = parse_procedure_page(code, url, "")
                        record["status"] = "fetch_error"
                        record["error"] = result.error
                    else:
                        record = parse_procedure_page(code, url, result.html)
                    records.append(record)
                yield pd.DataFrame(
                    records, columns=_RESULT_COLUMNS
                )
        finally:
            if fetcher is not None:
                fetcher.close()

    return source.mapInPandas(run, schema=EXTRACT_RESULT_SCHEMA)


def split_procedure_outputs(
    extracted: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fan the flat extraction relation out into the three output tables.

    Matches the reference's emission rules (``procedure_code.py:556-599``):
    404 / deleted-listing / fetch-error / parse-error rows contribute to
    NO table; deleted rows contribute a sparse codes row only; ok rows
    contribute to all three.
    """
    codes = extracted.filter(
        F.col("status").isin("ok", "deleted")
    ).select(*PROCEDURE_CODES_COLUMNS)

    ok = extracted.filter(F.col("status") == "ok")

    modifiers = (
        ok.select(F.explode("modifier_rows").alias("m"))
        .select(
            F.col("m.modifier").alias("modifier"),
            F.col("m.description").alias("description"),
        )
    )

    ndc = (
        ok.select(F.explode("ndc_rows").alias("n"))
        .select(
            F.col("n.ndc_alternate_id").alias("ndc_alternate_id"),
            F.col("n.drug_name").alias("drug_name"),
            F.col("n.labeler_name").alias("labeler_name"),
            F.col("n.hcpcs_dosage").alias("hcpcs_dosage"),
            F.col("n.bill_unit").alias("bill_unit"),
        )
    )

    return codes, modifiers, ndc
