"""Schema-drift tripwire for the driver-owned testdata.

Round 3 was lost to a silent physical-type change in a file this repo
does not own (`events.ts`: TIMESTAMP(NANOS) → naive micros). The
events column now has a dtype-aware normalizer and its own encoding
matrix test; this test generalizes the lesson to EVERY table the
query corpus reads: each column must fall into the semantic class the
queries assume (integral key, floating measure, string, date-ish,
float vector). A future regeneration that shifts a physical type
outside its class fails HERE, naming the table and column — instead
of surfacing as a hash mismatch (or worse, silently plausible wrong
answers) three layers up.

Classes are deliberately wide: INT→BIGINT, DOUBLE→DECIMAL,
DATE→TIMESTAMP_NTZ drifts are all absorbed by the queries (money math
casts through DECIMAL explicitly; date comparisons coerce), so they
stay green. Only class-crossing drift (a timestamp arriving as
string, an embedding as array<string>) trips.
"""

from __future__ import annotations

import os
import re

import pytest

INTEGRAL = {"int", "bigint", "smallint", "tinyint"}
FLOATING = {"float", "double"}  # or decimal(p,s) — checked by pattern
STRINGY = {"string"}
DATEISH = {"date", "timestamp", "timestamp_ntz"}
#: events.ts additionally tolerates the legacy nanos-as-long read
TS_RAW = DATEISH | {"bigint"}


def _is_numeric(dtype: str) -> bool:
    return (
        dtype in INTEGRAL
        or dtype in FLOATING
        or re.fullmatch(r"decimal\(\d+,\d+\)", dtype) is not None
    )


#: table -> column -> set of acceptable Spark dtypes (or a predicate)
EXPECTED = {
    "region": {"r_regionkey": INTEGRAL, "r_name": STRINGY},
    "nation": {
        "n_nationkey": INTEGRAL,
        "n_name": STRINGY,
        "n_regionkey": INTEGRAL,
    },
    "customer": {
        "c_custkey": INTEGRAL,
        "c_name": STRINGY,
        "c_nationkey": INTEGRAL,
        "c_acctbal": _is_numeric,
        "c_mktsegment": STRINGY,
    },
    "supplier": {
        "s_suppkey": INTEGRAL,
        "s_name": STRINGY,
        "s_nationkey": INTEGRAL,
        "s_acctbal": _is_numeric,
    },
    "part": {
        "p_partkey": INTEGRAL,
        "p_name": STRINGY,
        "p_brand": STRINGY,
        "p_type": STRINGY,
        "p_size": INTEGRAL,
        "p_retailprice": _is_numeric,
    },
    "orders": {
        "o_orderkey": INTEGRAL,
        "o_custkey": INTEGRAL,
        "o_orderstatus": STRINGY,
        "o_totalprice": _is_numeric,
        "o_orderdate": DATEISH,
        "o_orderpriority": STRINGY,
    },
    "lineitem": {
        "l_orderkey": INTEGRAL,
        "l_partkey": INTEGRAL,
        "l_suppkey": INTEGRAL,
        "l_linenumber": INTEGRAL,
        "l_quantity": _is_numeric,
        "l_extendedprice": _is_numeric,
        "l_discount": _is_numeric,
        "l_tax": _is_numeric,
        "l_returnflag": STRINGY,
        "l_linestatus": STRINGY,
        "l_shipdate": DATEISH,
    },
    "events": {
        "event_id": INTEGRAL,
        "ts": TS_RAW,
        "user_id": INTEGRAL,
        "event_type": STRINGY,
        "value": _is_numeric,
        "props": STRINGY,
    },
    "documents": {
        "doc_id": INTEGRAL,
        "text": STRINGY,
        "lang": STRINGY,
        "source": STRINGY,
        "n_chars": INTEGRAL,
    },
    "embeddings": {
        "vec_id": INTEGRAL,
        "embedding": {"array<float>", "array<double>"},
        "label": INTEGRAL,
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_columns_stay_in_semantic_class(spark, sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    # same legacy tolerance the loaders apply — a nanos regression
    # should trip the CLASS check, not an unreadable-file error
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dtypes = dict(spark.read.parquet(path).dtypes)
    spec = EXPECTED[table]
    missing = set(spec) - set(dtypes)
    assert not missing, (
        f"testdata drift: {table} lost columns {sorted(missing)} "
        f"(regenerated with a new layout?) — update loaders/queries"
    )
    for col, allowed in spec.items():
        dtype = dtypes[col]
        ok = allowed(dtype) if callable(allowed) else dtype in allowed
        assert ok, (
            f"testdata drift: {table}.{col} is now {dtype!r}, outside its "
            f"semantic class {allowed if not callable(allowed) else 'numeric'}"
            " — the regeneration changed a physical type the queries assume;"
            " extend the relevant normalizer (see functions/timestamps.py"
            " for the events.ts precedent) before trusting query output"
        )
