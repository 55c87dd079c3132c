"""Unit tests for llm/packing.py (sequence packing) plus the vocab
and passage-dedup corpus queries' edge semantics.

Hand-computed micro-corpora: packing math (boundary crossing, fill,
per-shard independence) is checked against exact expected rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.llm import packing as PK


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def _text(n):
    return " ".join(f"w{i}" for i in range(n))


class TestPackSequences:
    def test_single_doc_shorter_than_seq(self, spark):
        df = _docs(spark, [(1, "a", _text(5))])
        rows = PK.pack_sequences(df, seq_len=8).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.shard, r.doc_id, r.seq_id, r.tokens_in_seq, r.crosses) == (
            "a", 1, 0, 5, False
        )

    def test_doc_spanning_three_sequences(self, spark):
        # 20 tokens at seq_len=8: seqs 0 (8), 1 (8), 2 (4)
        df = _docs(spark, [(1, "a", _text(20))])
        rows = sorted(PK.pack_sequences(df, seq_len=8).collect(), key=lambda r: r.seq_id)
        assert [(r.seq_id, r.tokens_in_seq, r.crosses) for r in rows] == [
            (0, 8, True), (1, 8, True), (2, 4, True)
        ]

    def test_exact_boundary_does_not_cross(self, spark):
        # doc1 fills seq 0 exactly; doc2 starts cleanly at seq 1
        df = _docs(spark, [(1, "a", _text(8)), (2, "a", _text(3))])
        rows = {r.doc_id: r for r in PK.pack_sequences(df, seq_len=8).collect()}
        assert (rows[1].seq_id, rows[1].crosses) == (0, False)
        assert (rows[2].seq_id, rows[2].tokens_in_seq) == (1, 3)

    def test_shards_pack_independently(self, spark):
        df = _docs(spark, [(1, "a", _text(6)), (2, "b", _text(6))])
        rows = {r.shard: r for r in PK.pack_sequences(df, seq_len=8).collect()}
        # both shards restart at seq 0 — no cross-shard stream
        assert rows["a"].seq_id == 0 and rows["b"].seq_id == 0

    def test_id_order_is_the_concat_order(self, spark):
        # doc 10 comes after doc 2 regardless of input row order
        df = _docs(spark, [(10, "a", _text(4)), (2, "a", _text(6))])
        rows = {r.doc_id: r for r in PK.pack_sequences(df, seq_len=8).collect()}
        assert rows[2].seq_id == 0
        # doc 10 occupies tokens [6, 10) → crosses the 8-token boundary
        ten = sorted(
            PK.pack_sequences(df, seq_len=8).filter(F.col("doc_id") == 10).collect(),
            key=lambda r: r.seq_id,
        )
        assert [(r.seq_id, r.tokens_in_seq) for r in ten] == [(0, 2), (1, 2)]


class TestSequenceStats:
    def test_fill_and_counts(self, spark):
        # shard a: 6 + 6 = 12 tokens at seq_len=8 → seq0 full (2 docs,
        # 1 crossing), seq1 holds 4 (fill 0.5, the crossing doc)
        df = _docs(spark, [(1, "a", _text(6)), (2, "a", _text(6))])
        stats = {r.seq_id: r for r in PK.sequence_stats(df, seq_len=8).collect()}
        assert stats[0].n_docs == 2
        assert stats[0].n_crossing_docs == 1
        assert stats[0].n_tokens == 8
        assert stats[0].fill == 1.0
        assert stats[1].n_docs == 1
        assert stats[1].n_tokens == 4
        assert stats[1].fill == 0.5

    def test_manifest_spans_in_doc_order(self, spark):
        # 6 + 6 tokens at seq_len=8: seq0 = "1:6,2:2", seq1 = "2:4"
        df = _docs(spark, [(1, "a", _text(6)), (2, "a", _text(6))])
        rows = {r.seq_id: r for r in PK.sequence_manifest(df, seq_len=8).collect()}
        assert rows[0].manifest == "1:6,2:2"
        assert rows[0].n_docs == 2
        assert rows[1].manifest == "2:4"

    def test_token_conservation(self, spark):
        # every token lands in exactly one (doc, seq) slot
        df = _docs(
            spark,
            [(i, f"s{i % 3}", _text(5 + 7 * i)) for i in range(1, 10)],
        )
        total_tokens = sum(5 + 7 * i for i in range(1, 10))
        packed = PK.sequence_stats(df, seq_len=16)
        assert (
            packed.agg(F.sum("n_tokens")).collect()[0][0] == total_tokens
        )
