"""Source-overlap analytics (llm/overlap.py): exact Jaccard vs a
python replica, MinHash sketch error floor, mergeability shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.llm.overlap import (
    group_minhash_signatures,
    group_overlap_minhash,
    group_shingle_overlap,
)
from etl_procedure_codes_crawler_spark.plans.relational import load


def _py_shingles(text: str, k: int = 3) -> set[str]:
    toks = re.split(r"\s+", text.strip())
    if len(toks) >= k:
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return {" ".join(toks)}


CORPUS = [
    (1, "alpha beta gamma delta epsilon zeta", "feedA"),
    (2, "alpha beta gamma delta other words here", "feedB"),  # overlaps A
    (3, "totally different content stream nothing shared", "feedC"),
    (4, "delta epsilon zeta eta theta", "feedA"),
    (5, None, "feedC"),  # NULL text: one empty-ish shingle, harmless
    (6, "alpha beta gamma delta epsilon zeta", None),  # NULL group: out
]


class TestExactOverlap:
    def _df(self, spark):
        return spark.createDataFrame(
            CORPUS, "doc_id long, text string, source string"
        )

    def test_matches_python_replica(self, spark):
        sets: dict[str, set] = {}
        for _, text, src in CORPUS:
            if src is None:
                continue
            sets.setdefault(src, set()).update(
                _py_shingles(text if text is not None else "")
            )
        got = {
            (r["group_a"], r["group_b"]): r
            for r in group_shingle_overlap(self._df(spark)).collect()
        }
        for a in sorted(sets):
            for b in sorted(sets):
                if a >= b:
                    continue
                inter = len(sets[a] & sets[b])
                if inter == 0:
                    assert (a, b) not in got
                    continue
                row = got[(a, b)]
                assert row["n_a"] == len(sets[a])
                assert row["n_b"] == len(sets[b])
                assert row["n_shared"] == inter
                assert row["jaccard"] == pytest.approx(
                    inter / len(sets[a] | sets[b])
                )
        # NULL-group docs contribute to no pair
        assert all(None not in pair for pair in got)

    def test_overlapping_feeds_rank_above_disjoint(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents")
        rows = group_shingle_overlap(docs).collect()
        assert rows, "testdata sources share no shingles?"
        for r in rows:
            assert 0.0 < r["jaccard"] <= 1.0
            assert r["n_shared"] <= min(r["n_a"], r["n_b"])


class TestMinhashOverlap:
    def test_estimate_within_sketch_error_of_exact(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents")
        exact = {
            (r["group_a"], r["group_b"]): r["jaccard"]
            for r in group_shingle_overlap(docs).collect()
        }
        est = {
            (r["group_a"], r["group_b"]): r["est_jaccard"]
            for r in group_overlap_minhash(docs).collect()
        }
        # every exact pair appears; disjoint pairs may appear with ~0
        for pair, j in exact.items():
            assert pair in est
            # 64 slots -> se ~ sqrt(J(1-J)/64) <= 0.0625; 3 sigma + slack
            assert abs(est[pair] - j) <= 0.25, (pair, j, est[pair])
        for pair, e in est.items():
            if pair not in exact:  # truly disjoint sources
                assert e <= 0.25

    def test_signatures_merge_map_side(self, spark, sf_dir):
        """The sketch pass must partially aggregate: two HashAggregate
        levels around one exchange, with no row-level shuffle of the
        shingle relation after the distinct."""
        docs = load(spark, sf_dir, "documents")
        plan = (
            group_minhash_signatures(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "partial_min" in plan or "partial_first" in plan or (
            plan.count("HashAggregate") >= 2
        )

    def test_deterministic(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents")
        a = sorted(group_overlap_minhash(docs).collect())
        b = sorted(group_overlap_minhash(docs).collect())
        assert a == b


class TestHllCardinality:
    def test_estimates_within_sketch_error_of_exact(self, spark, sf_dir):
        from etl_procedure_codes_crawler_spark.llm.overlap import (
            _group_shingles,
            group_cardinality_estimates,
        )

        docs = load(spark, sf_dir, "documents")
        est = {
            r.group: r.est_distinct
            for r in group_cardinality_estimates(docs).collect()
        }
        sh = _group_shingles(docs, "source", "text", 3)
        exact = {
            r.grp: r.n
            for r in sh.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        total_exact = sh.select("shingle").distinct().count()
        # lg_config_k=12 -> se ~1.6%; 3 sigma + slack
        for grp, n in exact.items():
            assert abs(est[grp] - n) / n <= 0.08, (grp, n, est[grp])
        assert abs(est[None] - total_exact) / total_exact <= 0.08
        # union row present exactly once, >= any single source
        assert sum(1 for g in est if g is None) == 1
        assert est[None] >= max(v for g, v in est.items() if g is not None)

    def test_single_scan_rollup_plan(self, spark, sf_dir):
        """Per-group + grand-total come from ONE rollup aggregation —
        exactly one scan of the documents table in the plan."""
        from etl_procedure_codes_crawler_spark.llm.overlap import (
            group_cardinality_estimates,
        )

        docs = load(spark, sf_dir, "documents")
        plan = (
            group_cardinality_estimates(docs)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan.count("Relation") == 1
        assert "Expand" in plan  # the rollup grouping sets

    def test_union_of_persisted_sketches_matches_rollup_row(
        self, spark, sf_dir
    ):
        """Folding per-group sketches with hll_union_agg must land
        within sketch error of the rollup's grand-total row (not bit-
        equal: the Datasketches union operator carries a wider internal
        register type than direct aggregation) — what makes per-batch
        sketches safe to persist and merge later."""
        from etl_procedure_codes_crawler_spark.llm.overlap import (
            group_cardinality_estimates,
            group_cardinality_sketches,
            union_cardinality,
        )

        docs = load(spark, sf_dir, "documents")
        rollup_total = {
            r.group: r.est_distinct
            for r in group_cardinality_estimates(docs).collect()
        }[None]
        merged = union_cardinality(
            group_cardinality_sketches(docs)
        ).collect()[0].est_distinct
        assert abs(merged - rollup_total) / rollup_total <= 0.05
