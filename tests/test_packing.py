"""Unit tests for llm/packing.py (sequence packing) plus the vocab
and passage-dedup corpus queries' edge semantics.

Hand-computed micro-corpora: packing math (boundary crossing, fill,
per-shard independence) is checked against exact expected rows.
"""

from __future__ import annotations

import pytest

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


class TestTrainingShuffle:
    def _docs(self, spark, n=400):
        return spark.createDataFrame(
            [(i, f"src{i % 4}") for i in range(n)],
            "doc_id bigint, source string",
        )

    def test_permutation_complete_and_deterministic(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = self._docs(spark)
        a = PK.training_shuffle(docs, num_shards=8, seed=1).collect()
        b = PK.training_shuffle(docs, num_shards=8, seed=1).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # every doc exactly once
        assert sorted(r.doc_id for r in a) == list(range(400))
        # pos is 1..n_shard within each shard, no gaps
        by_shard: dict[int, list[int]] = {}
        for r in a:
            by_shard.setdefault(r.shard, []).append(r.pos)
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(1, len(poss) + 1)), shard

    def test_shards_balanced_and_order_scrambled(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        out = PK.training_shuffle(self._docs(spark), num_shards=8, seed=1)
        rows = out.collect()
        sizes = {}
        for r in rows:
            sizes[r.shard] = sizes.get(r.shard, 0) + 1
        assert len(sizes) == 8
        # Lehmer keys spread evenly: no shard more than 2x the mean
        assert max(sizes.values()) <= 2 * (400 // 8)
        # the read order inside a shard is NOT id order (it's a shuffle)
        shard0 = [r.doc_id for r in sorted(
            (r for r in rows if r.shard == 0), key=lambda r: r.pos)]
        assert shard0 != sorted(shard0)

    def test_seed_changes_permutation(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = self._docs(spark)
        a = {(r.doc_id, r.shard, r.pos)
             for r in PK.training_shuffle(docs, seed=1).collect()}
        b = {(r.doc_id, r.shard, r.pos)
             for r in PK.training_shuffle(docs, seed=2).collect()}
        assert a != b

    def test_no_unpartitioned_window_in_plan(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        plan = (
            PK.training_shuffle(self._docs(spark), num_shards=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        import re

        for line in plan.splitlines():
            m = re.search(r"\bWindow\s+(\[.*)", line)
            if m:
                assert len(re.findall(r"\], \[", m.group(1))) >= 2, line


class TestUpsampleManifest:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(i, f"src{i % 4}") for i in range(200)],
            "doc_id bigint, source string",
        )

    def test_copy_counts_follow_weights(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        out = PK.upsample_manifest(
            self._docs(spark),
            {"src1": 2.5, "src2": 0.25, "src3": 0.0},
            seed=7,
        ).collect()
        per_source: dict[str, int] = {}
        for r in out:
            per_source[r.source] = per_source.get(r.source, 0) + 1
            assert 1 <= r.copy <= r.n_copies
        # default weight 1.0: every src0 doc exactly once
        assert per_source["src0"] == 50
        # weight 0: dropped entirely
        assert "src3" not in per_source
        # weight 2.5: between 2x and 3x, near 2.5x for 50 docs
        assert 2 * 50 <= per_source["src1"] <= 3 * 50
        # weight 0.25: strict subset
        assert 0 < per_source["src2"] < 50

    def test_deterministic_and_shuffle_free(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = self._docs(spark)
        out = PK.upsample_manifest(docs, {"src1": 2.5}, seed=7)
        a = sorted(map(tuple, out.collect()))
        b = sorted(map(tuple, PK.upsample_manifest(
            docs, {"src1": 2.5}, seed=7).collect()))
        assert a == b
        plan = out._jdf.queryExecution().executedPlan().toString()
        # map-side only: explode + project, no exchange anywhere
        assert "Exchange" not in plan, plan


class TestWriteTrainingShards:
    def test_layout_order_and_completeness(self, spark, tmp_path):
        import glob
        import os

        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = spark.createDataFrame(
            [(i, f"text {i}", f"src{i % 3}") for i in range(300)],
            "doc_id bigint, text string, source string",
        )
        path = str(tmp_path / "shards")
        PK.write_training_shards(docs, path, num_shards=4, seed=1)

        shard_dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
        assert len(shard_dirs) == 4
        seen = []
        for d in shard_dirs:
            # one writer task per shard → one data file per shard
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)
            rows = spark.read.parquet(d).collect()
            # rows stream back in shard read order (pos ascending)
            poss = [r.pos for r in rows]
            assert poss == sorted(poss) == list(range(1, len(rows) + 1))
            seen.extend(r.doc_id for r in rows)
        # the shards together are exactly the corpus
        assert sorted(seen) == list(range(300))
        # payload columns rode along
        row = spark.read.parquet(path).filter("doc_id = 7").first()
        assert row.text == "text 7" and row.source == "src1"


class TestHoldoutSplit:
    def test_fractions_and_stability_under_growth(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        small = spark.createDataFrame(
            [(i,) for i in range(500)], "doc_id bigint"
        )
        grown = spark.createDataFrame(
            [(i,) for i in range(1000)], "doc_id bigint"
        )
        fr = {"train": 0.9, "val": 0.05, "test": 0.05}
        a = {r.doc_id: r.split
             for r in PK.holdout_split(small, fr, seed=3).collect()}
        b = {r.doc_id: r.split
             for r in PK.holdout_split(grown, fr, seed=3).collect()}
        # growth never reassigns an existing doc
        assert all(b[i] == a[i] for i in a)
        # proportions roughly honored on the grown corpus
        n = len(b)
        counts = {}
        for s in b.values():
            counts[s] = counts.get(s, 0) + 1
        assert abs(counts["train"] / n - 0.9) < 0.05
        assert counts["val"] > 0 and counts["test"] > 0

    def test_fractions_must_sum_to_one(self, spark):
        import pytest as _pytest

        from etl_procedure_codes_crawler_spark.llm import packing as PK

        df = spark.createDataFrame([(1,)], "doc_id bigint")
        with _pytest.raises(ValueError, match="sum to 1"):
            PK.holdout_split(df, {"train": 0.5, "val": 0.1})


class TestBestFitPacking:
    CAP = 100

    def _pack(self, spark, sizes):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        rows = [("s", i, n) for i, n in enumerate(sizes)]
        df = spark.createDataFrame(
            rows, "source string, doc_id bigint, n bigint"
        )
        return PK.pack_sequences_bestfit(
            df, self.CAP, n_tokens_col="n"
        ).collect()

    @staticmethod
    def _replica(sizes, cap):
        import bisect

        order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
        bins, nxt, out = [], 0, {}
        for i in order:
            n = sizes[i]
            if n > cap:
                out[i] = (nxt, True)
                nxt += 1
                continue
            j = bisect.bisect_left(bins, (n, -1))
            if j < len(bins):
                rem, sid = bins.pop(j)
                if rem - n > 0:
                    bisect.insort(bins, (rem - n, sid))
            else:
                sid = nxt
                nxt += 1
                if cap - n > 0:
                    bisect.insort(bins, (cap - n, sid))
            out[i] = (sid, False)
        return out

    def test_matches_pure_replica(self, spark):
        sizes = [60, 40, 40, 30, 30, 30, 150, 99, 1, 1, 70, 25, 5]
        got = {r.doc_id: (r.seq_id, r.oversize) for r in self._pack(spark, sizes)}
        assert got == self._replica(sizes, self.CAP)

    def test_invariants(self, spark):
        sizes = [37, 81, 12, 55, 99, 100, 101, 3, 64, 48, 29, 76]
        rows = self._pack(spark, sizes)
        assert sorted(r.doc_id for r in rows) == list(range(len(sizes)))
        fills: dict = {}
        for r in rows:
            fills.setdefault(r.seq_id, []).append(r)
        for seq_rows in fills.values():
            if any(r.oversize for r in seq_rows):
                assert len(seq_rows) == 1  # oversize docs sit alone
            else:
                assert sum(r.n_tokens for r in seq_rows) <= self.CAP
        # bin count sane: at least the volume bound, at most one per doc
        import math

        n_seqs = len(fills)
        vol = math.ceil(sum(s for s in sizes if s <= self.CAP) / self.CAP)
        assert vol <= n_seqs <= len(sizes)

    def test_zero_token_docs_occupy_nothing(self, spark):
        got = self._pack(spark, [0, 10])
        assert [r.doc_id for r in got] == [1]

    def test_stats_accounting(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        rows = [("s", i, n) for i, n in enumerate([90, 10, 60, 150])]
        df = spark.createDataFrame(
            rows, "source string, doc_id bigint, n bigint"
        )
        packed = PK.pack_sequences_bestfit(df, self.CAP, n_tokens_col="n")
        st = PK.bestfit_packing_stats(packed, self.CAP).collect()[0]
        # bins: {90,10} full, {60} pad 40, {150} oversize
        assert st.n_docs == 4 and st.n_seqs == 3
        assert st.n_oversize == 1 and st.total_padding == 40


class TestClusterHoldoutSplit:
    FR = {"train": 0.8, "val": 0.1, "test": 0.1}

    def _run(self, spark, n_docs, pairs):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = spark.createDataFrame(
            [(i,) for i in range(n_docs)], "doc_id bigint"
        )
        edges = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
        return PK.cluster_holdout_split(docs, edges, self.FR, seed=3)

    def test_clusters_never_straddle_splits(self, spark):
        # chain 0-1-2, pair 10-11, transitive 20-21 + 21-22
        pairs = [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22)]
        rows = self._run(spark, 200, pairs).collect()
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, set()).add(r.split)
        assert all(len(s) == 1 for s in by_cluster.values())
        by_doc = {r.doc_id: r for r in rows}
        assert by_doc[2].cluster_id == 0 and by_doc[2].split == by_doc[0].split
        assert by_doc[22].cluster_id == 20

    def test_singletons_match_plain_holdout(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = spark.createDataFrame(
            [(i,) for i in range(300)], "doc_id bigint"
        )
        plain = {
            r.doc_id: r.split
            for r in PK.holdout_split(docs, self.FR, seed=3).collect()
        }
        clustered = {
            r.doc_id: r
            for r in self._run(spark, 300, [(5, 6), (100, 250)]).collect()
        }
        for i in range(300):
            if i in (6, 250):  # moved into their representative's split
                rep = 5 if i == 6 else 100
                assert clustered[i].split == plain[rep]
                assert clustered[i].cluster_id == rep
            else:
                assert clustered[i].split == plain[i]
                assert clustered[i].cluster_id == i

    def test_every_doc_assigned_exactly_once(self, spark):
        out = self._run(spark, 120, [(1, 2), (2, 3), (3, 4)]).collect()
        assert len(out) == 120
        assert len({r.doc_id for r in out}) == 120


class TestIncrementalShuffle:
    def test_extends_without_moving_snapshot(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = spark.createDataFrame(
            [(i,) for i in range(400)], "doc_id bigint"
        )
        old = docs.filter("doc_id < 250")
        new = docs.filter("doc_id >= 250")
        snap = PK.training_shuffle(old, num_shards=4, seed=1)
        inc = PK.training_shuffle_incremental(
            new, snap, num_shards=4, seed=1
        )
        snap_rows = snap.collect()
        inc_rows = inc.collect()
        # new docs only, each exactly once
        assert sorted(r.doc_id for r in inc_rows) == list(range(250, 400))
        # same shard the full-shuffle would assign (same key)
        full = {
            r.doc_id: r.shard
            for r in PK.training_shuffle(docs, num_shards=4, seed=1).collect()
        }
        assert all(full[r.doc_id] == r.shard for r in inc_rows)
        # pos strictly continues after the snapshot max per shard
        base = {}
        for r in snap_rows:
            base[r.shard] = max(base.get(r.shard, 0), r.pos)
        by_shard = {}
        for r in inc_rows:
            by_shard.setdefault(r.shard, []).append(r.pos)
        for shard, poss in by_shard.items():
            lo = base.get(shard, 0)
            assert sorted(poss) == list(range(lo + 1, lo + 1 + len(poss)))

    def test_already_assigned_docs_skipped(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = spark.createDataFrame(
            [(i,) for i in range(100)], "doc_id bigint"
        )
        snap = PK.training_shuffle(docs, num_shards=4, seed=1)
        # replaying the same batch adds nothing
        inc = PK.training_shuffle_incremental(docs, snap, num_shards=4, seed=1)
        assert inc.count() == 0


class TestBudgetSelect:
    def test_boundary_order_and_exactness(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        # quality descending: doc 3 (0.9), doc 1 (0.8), doc 2 (0.8),
        # doc 0 (0.1); tokens 40 each; budget 100 → first TWO fit
        # (cum 40, 80), doc 2 would hit 120 > 100 → excluded
        docs = spark.createDataFrame(
            [(0, 0.1, 40), (1, 0.8, 40), (2, 0.8, 40), (3, 0.9, 40)],
            "doc_id bigint, quality double, n_tokens bigint",
        )
        got = {
            r.doc_id: r.cum_tokens
            for r in PK.budget_select(
                docs, "quality", "n_tokens", budget=100
            ).collect()
        }
        # tie at 0.8 broken by doc_id asc → doc 1 before doc 2
        assert got == {3: 40, 1: 80}

    def test_scales_without_unpartitioned_window(self, spark):
        import re

        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = spark.createDataFrame(
            [(i, float(i % 97) / 97, 10 + i % 7) for i in range(500)],
            "doc_id bigint, quality double, n_tokens bigint",
        )
        out = PK.budget_select(docs, "quality", "n_tokens", budget=1500)
        plan = out._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            m = re.search(r"\bWindow\s+(\[.*)", line)
            if m:
                assert len(re.findall(r"\], \[", m.group(1))) >= 2, line
        # selection is exactly the top-quality prefix
        rows = sorted(out.collect(), key=lambda r: r.cum_tokens)
        qualities = [r.quality for r in rows]
        assert qualities == sorted(qualities, reverse=True) or len(set(qualities)) < len(qualities)
        assert rows[-1].cum_tokens <= 1500


class TestCurriculumManifest:
    def test_within_shard_difficulty_order_and_shard_diversity(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = spark.createDataFrame(
            [(i, (i * 37) % 101) for i in range(300)],
            "doc_id bigint, difficulty bigint",
        )
        out = PK.curriculum_manifest(
            docs, "difficulty", num_shards=4, seed=1
        ).collect()
        # shard assignment matches the plain shuffle (same key/seed) —
        # curricula change READ ORDER, not shard membership
        full = {
            r.doc_id: r.shard
            for r in PK.training_shuffle(docs, num_shards=4, seed=1).collect()
        }
        assert all(full[r.doc_id] == r.shard for r in out)
        # within a shard: score ascending, contiguous pos from 1
        by_shard = {}
        for r in out:
            by_shard.setdefault(r.shard, []).append(r)
        for shard, rows in by_shard.items():
            rows.sort(key=lambda r: r.pos)
            scores = [r.score for r in rows]
            assert scores == sorted(scores), shard
            assert [r.pos for r in rows] == list(range(1, len(rows) + 1))

    def test_descending_order(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = spark.createDataFrame(
            [(i, i % 11) for i in range(100)],
            "doc_id bigint, difficulty bigint",
        )
        out = PK.curriculum_manifest(
            docs, "difficulty", num_shards=2, seed=1, ascending=False
        ).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r.shard, []).append(r)
        for rows in by_shard.values():
            rows.sort(key=lambda r: r.pos)
            scores = [r.score for r in rows]
            assert scores == sorted(scores, reverse=True)


class TestBudgetSelectNullContract:
    def test_null_quality_raises(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = spark.createDataFrame(
            [(0, 0.5, 40), (1, None, 40)],
            "doc_id bigint, quality double, n_tokens bigint",
        )
        with pytest.raises(ValueError, match="NULL 'quality'"):
            PK.budget_select(docs, "quality", "n_tokens", budget=100)

    def test_null_tokens_raises(self, spark):
        from etl_procedure_codes_crawler_spark.llm import packing as PK

        docs = spark.createDataFrame(
            [(0, 0.5, 40), (1, 0.9, None)],
            "doc_id bigint, quality double, n_tokens bigint",
        )
        with pytest.raises(ValueError, match="NULL"):
            PK.budget_select(docs, "quality", "n_tokens", budget=100)


class TestLengthBucketedBatches:
    def test_batches_are_length_contiguous_and_waste_exact(self, spark):
        # 70 docs with lengths 1..70 shuffled; batch_size 32
        import random

        rng = random.Random(5)
        lens = list(range(1, 71))
        rng.shuffle(lens)
        docs = spark.createDataFrame(
            [(i, n) for i, n in enumerate(lens)], "doc_id bigint, n_tokens bigint"
        )
        rows = {
            r.batch_id: r
            for r in PK.length_bucketed_batches(docs, batch_size=32).collect()
        }
        assert set(rows) == {0, 1, 2}
        # global length order → batch 0 holds lengths 1..32, etc.
        assert (rows[0].min_tokens, rows[0].max_tokens, rows[0].n_docs) == (1, 32, 32)
        assert (rows[1].min_tokens, rows[1].max_tokens, rows[1].n_docs) == (33, 64, 32)
        assert (rows[2].min_tokens, rows[2].max_tokens, rows[2].n_docs) == (65, 70, 6)
        # exact waste arithmetic: batch 0 pads 32 docs to 32 tokens
        assert rows[0].padded_tokens == 32 * 32
        assert rows[0].sum_tokens == sum(range(1, 33))
        # floor grid (not round) — cross-engine stable at .00005 ties
        import math

        assert rows[0].padding_waste == (
            math.floor((1 - rows[0].sum_tokens / 1024) * 10000) / 10000
        )

    def test_no_unpartitioned_window_in_plan(self, spark):
        import re

        docs = spark.createDataFrame(
            [(i, (i * 37) % 200 + 1) for i in range(500)],
            "doc_id bigint, n_tokens bigint",
        )
        out = PK.length_bucketed_batches(docs, batch_size=32)
        plan = out._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            m = re.search(r"\bWindow\s+(\[.*)", line)
            if m:
                assert len(re.findall(r"\], \[", m.group(1))) >= 2, line

    def test_rank_is_exact_row_number_semantics(self, spark):
        # ties on length broken by id: same semantics as the oracle's
        # ROW_NUMBER() OVER (ORDER BY _n, doc_id)
        docs = spark.createDataFrame(
            [(i, 10) for i in range(40)] + [(100 + i, 20) for i in range(40)],
            "doc_id bigint, n_tokens bigint",
        )
        ranked = PK.exact_global_rank(
            docs.select("doc_id", F.col("n_tokens").cast("bigint").alias("_n")),
            "_n",
            "doc_id",
        )
        got = {r.doc_id: r._rank for r in ranked.collect()}
        want = {
            d: i + 1
            for i, d in enumerate(
                sorted(got, key=lambda d: (10 if d < 100 else 20, d))
            )
        }
        assert got == want


class TestExactGlobalRankHardening:
    def test_null_values_raise(self, spark):
        docs = spark.createDataFrame(
            [(0, 10), (1, None)], "doc_id bigint, n_tokens bigint"
        )
        with pytest.raises(ValueError, match="NULL 'n_tokens'"):
            PK.exact_global_rank(docs, "n_tokens", "doc_id").collect()

    def test_tie_skew_splits_fat_bin_without_breaking_order(self, spark):
        """1000 rows share ONE length (the tie-skew case): the fat bin
        must sub-bin on the tiebreak — ranks stay exact ROW_NUMBER
        semantics AND no window partition holds all the ties."""
        import re

        rows = [(i, 50) for i in range(1000)] + [(2000, 1), (2001, 99)]
        docs = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
        ranked = PK.exact_global_rank(docs, "n_tokens", "doc_id")
        got = {r.doc_id: r._rank for r in ranked.collect()}
        order = sorted(rows, key=lambda t: (t[1], t[0]))
        want = {doc: i + 1 for i, (doc, _n) in enumerate(order)}
        assert got == want
        # the tie value's rows are spread over multiple sub-bins: the
        # plan's window runs over _bin partitions, and the per-bin
        # counts must show no bin holding all 1000 ties
        binned, _ = PK._quantile_edge_bin(
            docs.select("doc_id", F.col("n_tokens").cast("bigint").alias("_n")),
            "_n",
            16,
        )
        # sanity of the test construction: value-only binning DOES put
        # all ties in one bin — the function must beat this
        fat = (
            binned.groupBy("_bin").count().agg(F.max("count")).first()[0]
        )
        assert fat >= 1000


class TestWriteTrainingShards:
    def test_layout_one_file_per_shard_in_manifest_order(self, spark, tmp_path):
        import glob

        docs = spark.createDataFrame(
            [(i, f"doc text {i}") for i in range(200)],
            "doc_id bigint, text string",
        )
        path = str(tmp_path / "shards")
        assert PK.write_training_shards(docs, path, num_shards=4, seed=3) == 4
        dirs = sorted(glob.glob(f"{path}/shard=*"))
        assert len(dirs) == 4
        manifest = {
            r.doc_id: (r.shard, r.pos)
            for r in PK.training_shuffle(docs, num_shards=4, seed=3).collect()
        }
        total = 0
        for d in dirs:
            shard = int(d.rsplit("=", 1)[1])
            files = glob.glob(f"{d}/part-*.parquet")
            assert len(files) == 1  # one task per shard → one file
            # parquet preserves task row order: the file's physical
            # order must equal the manifest's read order
            import pyarrow.parquet as pq

            ids = pq.read_table(files[0], columns=["doc_id"])["doc_id"].to_pylist()
            want = [
                doc
                for doc, (s, _p) in sorted(
                    manifest.items(), key=lambda kv: kv[1][1]
                )
                if s == shard
            ]
            assert ids == want
            total += len(ids)
        assert total == 200


def test_pack_sequences_on_precomputed_counts(spark):
    """n_tokens_col path: packing on learned subword counts must give
    the same spans as packing text whose whitespace counts equal
    those numbers."""
    via_counts = spark.createDataFrame(
        [(1, "a", 6), (2, "a", 6)], "doc_id bigint, source string, n bigint"
    )
    got = sorted(
        map(
            tuple,
            PK.pack_sequences(
                via_counts, seq_len=8, n_tokens_col="n"
            ).collect(),
        )
    )
    via_text = _docs(spark, [(1, "a", _text(6)), (2, "a", _text(6))])
    want = sorted(map(tuple, PK.pack_sequences(via_text, seq_len=8).collect()))
    assert got == want
    # zero-count docs occupy no stream positions
    with_zero = spark.createDataFrame(
        [(1, "a", 6), (2, "a", 0), (3, "a", 6)],
        "doc_id bigint, source string, n bigint",
    )
    rows = PK.pack_sequences(with_zero, seq_len=8, n_tokens_col="n").collect()
    assert {r.doc_id for r in rows} == {1, 3}


def test_pack_sequences_null_precomputed_count_raises(spark):
    bad = spark.createDataFrame(
        [(1, "a", 6), (2, "a", None)], "doc_id bigint, source string, n bigint"
    )
    with pytest.raises(Exception, match="NULL n"):
        PK.pack_sequences(bad, seq_len=8, n_tokens_col="n").collect()


def test_bpe_training_shards_byte_identical_across_runs(spark, tmp_path):
    """Round-8 capstone determinism contract: the tokenizer-true
    layout (train BPE -> encode -> best-fit pack on subword counts ->
    reproducible shuffle -> physical shards) must produce
    BYTE-IDENTICAL shard files for the same corpus + seed — the
    property a resumable training run relies on. Compares file
    contents (names carry job UUIDs) per shard directory."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from etl_procedure_codes_crawler_spark.llm import bpe as B
    from etl_procedure_codes_crawler_spark.llm import packing as PK

    docs = spark.createDataFrame(
        [
            (i, ("alpha beta gamma delta epsilon zeta " * (i % 5 + 1)).strip(),
             f"src{i % 3}")
            for i in range(1, 41)
        ],
        "doc_id long, text string, source string",
    )

    def build(out_dir):
        merges, seg = B.train_bpe(docs, num_merges=8)
        counts = B.bpe_encode(docs, merges, seg).select(
            F.col("id").alias("doc_id"),
            F.size("tokens").cast("bigint").alias("n_bpe_tokens"),
        )
        sized = docs.select("doc_id", "source").join(counts, "doc_id")
        packed = PK.pack_sequences_bestfit(
            sized, seq_len=64, shard_col="source",
            n_tokens_col="n_bpe_tokens",
        ).withColumnRenamed("shard", "pack_shard")  # the shuffle owns "shard"
        PK.write_training_shards(packed, out_dir, num_shards=4, seed=1)
        layout = {}
        for shard_dir in sorted(os.listdir(out_dir)):
            if not shard_dir.startswith("shard="):
                continue
            full = os.path.join(out_dir, shard_dir)
            hashes = sorted(
                hashlib.sha256(
                    open(os.path.join(full, f), "rb").read()
                ).hexdigest()
                for f in os.listdir(full)
                if f.endswith(".parquet")
            )
            layout[shard_dir] = hashes
        return layout

    a = build(str(tmp_path / "a"))
    b = build(str(tmp_path / "b"))
    assert a and a == b
