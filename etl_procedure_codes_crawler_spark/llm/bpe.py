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


def _pair_entries(sym_col, delta_col):
    """array<struct<l,r,d>> of adjacent pairs tagged with a count
    delta — the flat single-transform twin of :func:`_adjacent_pairs`
    (nesting a second transform over its output tripped expression
    rewriting into binding one array's indices to the other's
    elements)."""
    entries = F.transform(
        F.sequence(F.lit(1), F.size(sym_col) - 1),
        lambda i: F.struct(
            F.element_at(sym_col, i).alias("l"),
            F.element_at(sym_col, i + 1).alias("r"),
            delta_col.alias("d"),
        ),
    )
    return F.when(F.size(sym_col) >= 2, entries).otherwise(
        F.array().cast("array<struct<l:string,r:string,d:bigint>>")
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


#: every Nth merge the symbol table is localCheckpoint'ed to truncate
#: the (cached but still nested) plan lineage
_CHECKPOINT_EVERY = 8

#: vocabularies at or below this many unique words train the merge
#: loop on the DRIVER (see _train docstring); above it, distributed
_MAX_DRIVER_WORDS = 100_000


def _train_driver(
    word_freqs: list[tuple[str, int]],
    num_merges: int,
    min_pair_freq: int,
    on_exhausted: str,
):
    """The merge loop on the driver: incremental pair counts plus an
    occurrence index (pair → word ids), so each merge touches only the
    words that contain the pair — the classic fast-BPE structure.
    Returns (merges, final (word, freq, syms) rows). Tie-break and
    greedy left-to-right semantics are bit-identical to the
    distributed loop (pinned against each other in tests/test_bpe.py).
    """
    words: list[list[str]] = [list(w) for w, _ in word_freqs]
    freqs = [f for _, f in word_freqs]
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        f = freqs[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + f
            where.setdefault(p, set()).add(wi)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        best = (
            min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if counts
            else None
        )
        if best is None or best[1] < min_pair_freq:
            if on_exhausted == "raise":
                raise BpeNotProgressing(
                    f"learned {rank}/{num_merges} merges before pair "
                    f"frequency fell below {min_pair_freq}"
                )
            break
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        merged = left + right
        for wi in sorted(where.get((left, right), ())):
            old, f = words[wi], freqs[wi]
            new, i = [], 0
            while i < len(old):
                if i + 1 < len(old) and old[i] == left and old[i + 1] == right:
                    new.append(merged)
                    i += 2
                else:
                    new.append(old[i])
                    i += 1
            for syms, sign in ((old, -f), (new, f)):
                for j in range(len(syms) - 1):
                    p = (syms[j], syms[j + 1])
                    c = counts.get(p, 0) + sign
                    if c <= 0:
                        counts.pop(p, None)
                    else:
                        counts[p] = c
                    idx = where.setdefault(p, set())
                    if sign > 0:
                        idx.add(wi)
            words[wi] = new
        # occurrence sets are not eagerly pruned on removal (a word may
        # still hold OTHER occurrences of the pair); stale entries are
        # harmless — the per-word recount above is exact regardless
        where.pop((left, right), None)
    rows = [
        (w, f, syms)
        for (w, _), f, syms in zip(word_freqs, freqs, words)
    ]
    return merges, rows


def _train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_pair_freq: int,
    on_exhausted: str,
    max_driver_words: int = _MAX_DRIVER_WORDS,
):
    """(merge list, final symbol table) — shared by the merge-table
    and vocabulary entry points so the vocab does not re-nest every
    merge scan into one expression tree.

    The CORPUS is scanned exactly once (the word-frequency groupBy);
    everything after runs on the vocabulary-sized word table, which is
    metadata next to the corpus. Where the merge loop itself runs is
    sized to that table:

    - ``n_words <= max_driver_words`` (default 100k): the loop runs ON
      THE DRIVER over the collected (word, freq) list with incremental
      pair counts and a pair→words occurrence index — the classic
      fast-BPE structure, and what single-node trainers
      (SentencePiece, HF tokenizers) do with far larger vocabularies.
      A 100k-word table is a few MB; scheduling a Spark job per merge
      against it costs ~0.3 s/merge of pure query overhead (measured),
      thousands of times the actual work.
    - larger vocabs: the DISTRIBUTED incremental loop — pair counts
      live in a driver dict (pair-TYPE-shaped, bounded by the unique
      adjacent pairs of the word table, never corpus rows), the argmax
      comes off the dict for free, and each merge is ONE Spark job
      that rewrites the symbol arrays and returns the exact per-pair
      deltas of the words that changed. Round 6 recounted every pair
      of every word per merge — a full vocab-table shuffle plus a
      sort-limit job per iteration, ~2× the jobs (63 vs 28 measured at
      num_merges=20) and orders of magnitude more shuffled rows.

    Both loops share tie-break ((freq desc, left asc, right asc) —
    Python tuple order equals Spark's UTF8 binary order here, both
    code-point) and greedy left-to-right merge semantics; tests pin
    them against each other and against the pure-Python Sennrich
    replica.

    Why the distributed dict's initial ``min_pair_freq`` pruning is
    safe: initial pairs are all single-char/single-char, and a merge
    only ever CREATES pairs involving its (multi-char) merged symbol,
    so a pruned initial pair can never gain count later; existing
    pairs only lose count. Entries are deleted only at count 0 —
    sub-threshold residuals must keep accumulating deltas because a
    later merge can re-create a multi-char pair that dropped to 0.
    """
    spark = df.sparkSession
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
    n_words = syms.count()  # already materialized — metadata-cheap
    if n_words <= max_driver_words:
        word_freqs = [
            (r["word"], int(r["freq"]))
            for r in syms.select("word", "freq").collect()
        ]
        merges, rows = _train_driver(
            word_freqs, num_merges, min_pair_freq, on_exhausted
        )
        return merges, spark.createDataFrame(
            rows, "word string, freq bigint, sym array<string>"
        )
    counts: dict[tuple[str, str], int] = {
        (r["left"], r["right"]): int(r["cnt"])
        for r in syms.select(
            "freq", F.explode(_adjacent_pairs(F.col("sym"))).alias("p")
        )
        .groupBy("p.left", "p.right")
        .agg(F.sum("freq").alias("cnt"))
        .where(F.col("cnt") >= min_pair_freq)
        .collect()
    }
    merges: list[tuple[int, str, str, int]] = []
    prev_cached: DataFrame | None = None
    # Size the loop's partitioning to the VOCAB, not the session
    # default: ~50k words per partition, so a just-over-threshold
    # vocab runs 2-3 real tasks instead of 32 near-empty ones.
    parts = max(
        1,
        min(
            int(spark.sparkContext.defaultParallelism),
            int(n_words) // 50_000 + 1,
        ),
    )
    if parts < syms.rdd.getNumPartitions():
        syms = syms.coalesce(parts)
    # AQE off for the merge loop only: every loop query is a tiny
    # vocab-table aggregation whose shape is fully known, and AQE's
    # per-query-stage scheduling turns each one-collect iteration into
    # 2-3 jobs (measured: 68 vs 28 jobs at num_merges=20). Shuffle
    # partitions pinned to the vocab-sized `parts` for the same
    # reason. The corpus scan and initial pair count above still run
    # under the session's normal (adaptive) config; both confs are
    # restored before returning.
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    shuf_prev = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        if aqe_prev != "false":
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        if shuf_prev != str(parts):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        merges, syms, prev_cached = _merge_loop(
            syms, counts, num_merges, min_pair_freq, on_exhausted
        )
    finally:
        if aqe_prev != "false":
            spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
        if shuf_prev != str(parts):
            spark.conf.set("spark.sql.shuffle.partitions", shuf_prev)
    if prev_cached is not None:
        # pin the final table before dropping the cache it reads
        syms = syms.localCheckpoint(eager=True)
        prev_cached.unpersist()
    return merges, syms


def _merge_loop(
    syms: DataFrame,
    counts: dict[tuple[str, str], int],
    num_merges: int,
    min_pair_freq: int,
    on_exhausted: str,
):
    merges: list[tuple[int, str, str, int]] = []
    prev_cached: DataFrame | None = None
    for rank in range(num_merges):
        best = (
            min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if counts
            else None
        )
        if best is None or best[1] < min_pair_freq:
            if on_exhausted == "raise":
                if prev_cached is not None:
                    prev_cached.unpersist()
                raise BpeNotProgressing(
                    f"learned {rank}/{num_merges} merges before pair "
                    f"frequency fell below {min_pair_freq}"
                )
            break
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        # The rewritten array gets a FRESH name (re-aliasing it back to
        # "sym" in the same projection shadows the input column, and
        # projection collapse then mixed old-array sizes with new-array
        # lookups in the pushed-down filter — observed as element_at
        # out-of-bounds). The merge scan runs unconditionally and
        # "_changed" is a size comparison on its OUTPUT: a pre-filter
        # via exists() would evaluate a second interpreted array scan
        # per row, costing more than the merge it tries to skip.
        step = (
            syms.select(
                "word",
                "freq",
                "sym",
                _merge_pair(F.col("sym"), left, right).alias("_new"),
            )
            .withColumn("_changed", F.size("_new") < F.size("sym"))
            .persist()
        )
        # exact per-pair deltas of the changed words: their old pairs
        # leave the counts, their new pairs enter — computed from the
        # REAL before/after arrays, so greedy-overlap bookkeeping
        # ("aaa" counts (a,a) twice but merges once) is correct by
        # construction. This collect also materializes `step`'s cache.
        deltas = (
            step.where("_changed")
            .select(
                F.explode(
                    F.concat(
                        _pair_entries(F.col("sym"), -F.col("freq")),
                        _pair_entries(F.col("_new"), F.col("freq")),
                    )
                ).alias("e")
            )
            .groupBy("e.l", "e.r")
            .agg(F.sum("e.d").alias("d"))
            .where(F.col("d") != 0)
            .collect()
        )
        for r in deltas:
            pair, d = (r["l"], r["r"]), int(r["d"])
            if pair in counts:
                counts[pair] += d
                if counts[pair] <= 0:
                    del counts[pair]
            elif d > 0:
                counts[pair] = d
            # a negative delta for an absent pair is one the initial
            # prune dropped — still unelectable, still ignorable
        if prev_cached is not None:
            prev_cached.unpersist()
        nxt = step.select("word", "freq", F.col("_new").alias("sym"))
        if (rank + 1) % _CHECKPOINT_EVERY == 0:
            syms = nxt.localCheckpoint(eager=True)
            step.unpersist()
            prev_cached = None
        else:
            syms = nxt
            prev_cached = step
    return merges, syms, prev_cached


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_pair_freq: int = 2,
    on_exhausted: str = "stop",
    max_driver_words: int = _MAX_DRIVER_WORDS,
) -> DataFrame:
    """Learn the BPE merge table: (rank, left, right, merged,
    pair_freq), rank = merge order. Deterministic: the argmax
    tie-breaks on (freq desc, left asc, right asc).

    ``on_exhausted`` controls what happens when no pair reaches
    ``min_pair_freq`` before ``num_merges``: ``"stop"`` (default)
    returns the merges learned so far; ``"raise"`` raises
    :class:`BpeNotProgressing` for pipelines where a short vocabulary
    must be loud."""
    merges, _syms = _train(
        df, text_col, num_merges, min_pair_freq, on_exhausted,
        max_driver_words=max_driver_words,
    )
    return df.sparkSession.createDataFrame(
        [(r, a, b, a + b, c) for r, a, b, c in merges],
        "rank bigint, left string, right string, merged string, pair_freq bigint",
    )


def bpe_vocab(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_pair_freq: int = 2,
    max_driver_words: int = _MAX_DRIVER_WORDS,
) -> DataFrame:
    """(token, freq) of the post-merge symbol vocabulary — the
    characters plus every learned merge, with corpus frequencies —
    read straight off the trainer's final symbol table."""
    _merges, syms = _train(
        df, text_col, num_merges, min_pair_freq, "stop",
        max_driver_words=max_driver_words,
    )
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
    max_driver_words: int = _MAX_DRIVER_WORDS,
):
    """(merge list as (left, right) in rank order, segmentation table
    (word, tokens)) — the two artifacts encoding needs. The
    segmentation table is the trainer's OWN final symbol state, so
    encoding a word the trainer saw is a LOOKUP, not a recomputation."""
    merges, syms = _train(
        df, text_col, num_merges, min_pair_freq, "stop",
        max_driver_words=max_driver_words,
    )
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
