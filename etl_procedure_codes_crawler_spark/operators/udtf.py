"""Python UDTF variant of the parse fan-out (SURVEY §2.7 alternative).

The engine's primary extraction path is ``mapInPandas``
(``operators/extract.py``) — Arrow-batched, fetcher-per-partition,
three relations in one pass. Spark's Python UDTFs (SQL: ``SELECT *
FROM extract_modifiers(...)``, lateral-joinable) are the OTHER way to
express one-row→many-rows extraction; this module provides the
modifier fan-out as a UDTF over the same pure parse layer so both
API shapes are covered and provably agree (tested).

When to prefer which: UDTFs compose in SQL text and per-row lateral
joins; mapInPandas wins when extraction needs per-partition state
(an authenticated fetcher) or Arrow-batch-level vectorization — which
is why the pipeline uses it.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="modifier: string, description: string")
class ExtractModifiersUDTF:
    """One (html) page → n (modifier, description) rows, via the same
    pure parser the pipeline uses (functions/html_extract.py F6)."""

    def eval(self, html: str):
        if not html:
            return
        from ..functions.html_extract import extract_modifier_rows
        from ..functions.htmldom import parse_html

        rows, _codes = extract_modifier_rows(parse_html(html))
        for modifier, description in rows:
            yield modifier, description


def register_udtfs(spark) -> None:
    """Make the UDTFs usable from SQL text:
    ``SELECT m.* FROM pages, LATERAL extract_modifiers(html) m``."""
    spark.udtf.register("extract_modifiers", ExtractModifiersUDTF)
