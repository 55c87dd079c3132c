"""Hypothesis properties for the winnowing scheme — run against the
UDF's pure Python body (the `spark` fixture is only needed so the
udf wrapper can parse its return type; NO Spark job runs per
example)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_procedure_codes_crawler_spark.llm import fingerprint as FP

#: already-normalized alphabet (lowercase, no whitespace) so the
#: normalization step the Spark plan applies is the identity here
_norm_text = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=0, max_size=200)


def _fps(*texts, k=8, window=16):
    fn = FP._winnow_udf(k, window).func
    return [set(x) for x in fn(pd.Series(list(texts)))]


@given(prefix_a=_norm_text, prefix_b=_norm_text, shared=st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz", min_size=23, max_size=60),
    suffix_a=_norm_text, suffix_b=_norm_text)
@settings(max_examples=200, deadline=None)
def test_winnowing_guarantee(spark, prefix_a, prefix_b, shared, suffix_a, suffix_b):
    """ANY shared run of k+window-1 = 23 chars guarantees a shared
    selected fingerprint, whatever surrounds it — the Schleimer et
    al. selection property the overlap detector relies on."""
    a, b = _fps(prefix_a + shared + suffix_a, prefix_b + shared + suffix_b)
    assert a & b


@given(text=_norm_text)
@settings(max_examples=200, deadline=None)
def test_fingerprint_count_bounded_and_deterministic(spark, text):
    k, w = 8, 16
    a, b = _fps(text, text)
    assert a == b  # deterministic
    n = len(text)
    if n < k:
        assert a == set()
    else:
        m = n - k + 1
        # one min per window position, deduped
        assert 1 <= len(a) <= max(m - w + 1, 1)


@given(text=st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=8, max_size=100))
@settings(max_examples=100, deadline=None)
def test_hashes_are_in_modulus_range(spark, text):
    (a,) = _fps(text)
    assert all(0 <= h < FP.HASH_MOD for h in a)
