"""Distributed BPE vocabulary training (Sennrich-style merges).

Training the tokenizer ON the corpus is a training-data-pipeline step
the token-counting operators (:func:`.text.bpe_pretoken_count`)
presuppose; this module learns the merge table itself with pure
DataFrame ops.

Algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine Translation
of Rare Words with Subword Units" — the public BPE formulation): count
word frequencies once, represent each word as a symbol sequence
(initially characters), then repeatedly (1) count adjacent symbol
pairs weighted by word frequency, (2) merge the most frequent pair
everywhere, greedy left-to-right. Ties break lexicographically so the
learned vocabulary is deterministic.

Scale shape — the part that matters at 100 TB: the CORPUS is scanned
exactly once (the pretoken → word-frequency groupBy); every merge
iteration afterwards touches only the word-frequency table, which is
VOCABULARY-sized (unique words, not corpus rows — tens of millions at
web scale, comfortably cluster-resident). Each iteration is one
pair-count aggregation (shuffle of 2-symbol pairs), one driver-side
1-row argmax, and one map-side rewrite of the symbol arrays;
per-iteration ``localCheckpoint`` truncates the growing lineage the
same way :mod:`.cluster`'s label propagation does. The rewrite is a
JVM ``aggregate`` scan — greedy left-to-right non-overlapping, the
same rule the reference implementation uses (pinned against a pure
Python replica in tests/test_bpe.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .text import bpe_pretokens


class BpeNotProgressing(RuntimeError):
    """No pair reached ``min_pair_freq`` before ``num_merges`` merges
    were learned — the corpus is too small for the requested vocab."""


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the GPT-style pretokens — the ONE corpus
    scan; everything after operates on this vocabulary-sized table."""
    return (
        df.select(F.explode(bpe_pretokens(text_col)).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(sym_col):
    """array<struct<left,right>> of adjacent symbol pairs; empty for
    single-symbol words (sequence(1, 0) would count DOWN in Spark —
    the guard is load-bearing)."""
    pair_array = F.transform(
        F.sequence(F.lit(1), F.size(sym_col) - 1),
        lambda i: F.struct(
            F.element_at(sym_col, i).alias("left"),
            F.element_at(sym_col, i + 1).alias("right"),
        ),
    )
    return F.when(F.size(sym_col) >= 2, pair_array).otherwise(
        F.array().cast("array<struct<left:string,right:string>>")
    )


def _merge_pair(sym_col, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) →
    left+right inside one symbol array: an aggregate scan whose
    accumulator is the rewritten prefix. Non-overlap falls out of the
    scan order: once a pair merges, the merged symbol is the new
    lookback and cannot be the ``left`` of the same rule unless it
    string-equals it (symbols are contiguous substrings, so string
    equality IS identity)."""
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_pair_freq: int,
    on_exhausted: str,
):
    """(merge list, final symbol table) — shared by the merge-table
    and vocabulary entry points so the vocab does not re-nest every
    merge scan into one expression tree."""
    syms = (
        word_frequencies(df, text_col)
        .select(
            "word",
            "freq",
            # split-to-chars; the (?!^) boundary also matches at
            # end-of-string, so drop the trailing empty symbol it emits
            F.filter(
                F.split("word", "(?!^)"), lambda s: s != F.lit("")
            ).alias("sym"),
        )
        .localCheckpoint(eager=True)  # iterations must not rescan text
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        best = (
            syms.select("freq", F.explode(_adjacent_pairs(F.col("sym"))).alias("p"))
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_freq:
            if on_exhausted == "raise":
                raise BpeNotProgressing(
                    f"learned {rank}/{num_merges} merges before pair "
                    f"frequency fell below {min_pair_freq}"
                )
            break
        left, right, cnt = best[0]["left"], best[0]["right"], int(best[0]["cnt"])
        merges.append((rank, left, right, cnt))
        syms = syms.select(
            "word", "freq", _merge_pair(F.col("sym"), left, right).alias("sym")
        ).localCheckpoint(eager=True)  # truncate per-iteration lineage
    return merges, syms


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_pair_freq: int = 2,
    on_exhausted: str = "stop",
) -> DataFrame:
    """Learn the BPE merge table: (rank, left, right, merged,
    pair_freq), rank = merge order. Deterministic: the argmax
    tie-breaks on (freq desc, left asc, right asc).

    ``on_exhausted`` controls what happens when no pair reaches
    ``min_pair_freq`` before ``num_merges``: ``"stop"`` (default)
    returns the merges learned so far; ``"raise"`` raises
    :class:`BpeNotProgressing` for pipelines where a short vocabulary
    must be loud."""
    merges, _syms = _train(df, text_col, num_merges, min_pair_freq, on_exhausted)
    return df.sparkSession.createDataFrame(
        [(r, a, b, a + b, c) for r, a, b, c in merges],
        "rank bigint, left string, right string, merged string, pair_freq bigint",
    )


def bpe_vocab(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_pair_freq: int = 2,
) -> DataFrame:
    """(token, freq) of the post-merge symbol vocabulary — the
    characters plus every learned merge, with corpus frequencies —
    read straight off the trainer's final symbol table."""
    _merges, syms = _train(df, text_col, num_merges, min_pair_freq, "stop")
    return (
        syms.select("freq", F.explode("sym").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("freq"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_pair_freq: int = 2,
):
    """(merge list as (left, right) in rank order, segmentation table
    (word, tokens)) — the two artifacts encoding needs. The
    segmentation table is the trainer's OWN final symbol state, so
    encoding a word the trainer saw is a LOOKUP, not a recomputation."""
    merges, syms = _train(df, text_col, num_merges, min_pair_freq, "stop")
    return (
        [(a, b) for _r, a, b, _c in merges],
        syms.select("word", F.col("sym").alias("tokens")),
    )


def _encode_word_udf(merges: list[tuple[str, str]]):
    """Rank-order replay of the merge table over one word — the exact
    training procedure, so in-vocab words reproduce the trainer's
    segmentation and OOV words get the deterministic best-effort one.
    Runs only for OOV words (the segment-table join covers the rest)."""

    @pandas_udf("array<string>")
    def encode(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            if w is None:
                out.append(None)
                continue
            syms = list(w)
            for left, right in merges:
                i, merged, res = 0, left + right, []
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            out.append(syms)
        return pd.Series(out)

    return encode


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    segment_table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens) — tokenize the corpus with a trained merge table.

    Scale shape: pretokens join the vocabulary-sized segmentation
    table on the word string (AQE broadcasts it when it fits — the
    common case: the vocab is millions of rows, the corpus billions),
    so the overwhelmingly-frequent in-vocab words are segmented by
    LOOKUP; only out-of-vocabulary words run the rank-order replay
    UDF. Per-document order is restored with an array_sort over
    (position, tokens) structs — one exchange on the doc id, no
    global sort."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bpe_pretokens(text_col)).alias("pos", "word"),
    ).where(F.length("word") > 0)
    joined = words.join(segment_table, "word", "left")
    known = joined.filter(F.col("tokens").isNotNull())
    encode = _encode_word_udf(merges)
    oov = joined.filter(F.col("tokens").isNull()).select(
        "word", "id", "pos", encode(F.col("word")).alias("tokens")
    )
    grouped = (
        known.select("id", "pos", "tokens")
        .unionByName(oov.select("id", "pos", "tokens"))
        .groupBy("id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tokens"))),
                    lambda x: x["tokens"],
                )
            ).alias("tokens")
        )
    )
    # empty/whitespace-only documents produce zero pretokens and would
    # otherwise VANISH from the output (posexplode emits no rows); a
    # tokenizer must return (id, []) so downstream joins (packing,
    # manifests) keep every document
    return (
        df.select(F.col(id_col).alias("id"))
        .dropDuplicates(["id"])
        .join(grouped, "id", "left")
        .select(
            "id",
            F.coalesce(
                F.col("tokens"), F.array().cast("array<string>")
            ).alias("tokens"),
        )
    )
