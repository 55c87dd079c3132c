"""Text operators: overlapping RAG chunking (llm/text.chunk_documents)."""

from __future__ import annotations

import pytest

class TestChunkDocuments:
    def _chunks(self, spark, text, chunk_size=10, overlap=3):
        from etl_procedure_codes_crawler_spark.llm import text as T

        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        return sorted(
            T.chunk_documents(
                df, chunk_size=chunk_size, overlap=overlap
            ).collect(),
            key=lambda r: r.chunk_idx,
        )

    def test_geometry_covers_every_token_with_exact_overlap(self, spark):
        words = [f"w{i}" for i in range(1, 26)]  # 25 tokens
        rows = self._chunks(spark, " ".join(words))
        # chunk 0: [1,10], chunk 1: [8,17], chunk 2: [15,24], chunk 3: [22,25]
        assert [(r.chunk_idx, r.start_token, r.n_tokens) for r in rows] == [
            (0, 1, 10), (1, 8, 10), (2, 15, 10), (3, 22, 4),
        ]
        # coverage: stitching non-overlap parts reconstructs the doc
        rebuilt = rows[0].chunk_text.split()
        for r in rows[1:]:
            rebuilt += r.chunk_text.split()[3:]  # drop the overlap tokens
        assert rebuilt == words
        # consecutive chunks share exactly `overlap` tokens
        for a, b in zip(rows, rows[1:]):
            assert a.chunk_text.split()[-3:] == b.chunk_text.split()[:3]

    def test_short_doc_single_chunk(self, spark):
        rows = self._chunks(spark, "just five little words here")
        assert [(r.chunk_idx, r.start_token, r.n_tokens) for r in rows] == [
            (0, 1, 5)
        ]
        assert rows[0].chunk_text == "just five little words here"

    def test_empty_and_whitespace_docs_yield_no_chunks(self, spark):
        from etl_procedure_codes_crawler_spark.llm import text as T

        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, None)], "doc_id bigint, text string"
        )
        assert T.chunk_documents(df).count() == 0

    def test_boundary_exact_multiple(self, spark):
        # n == chunk_size: exactly one chunk, no phantom second window
        rows = self._chunks(spark, " ".join(f"t{i}" for i in range(10)))
        assert len(rows) == 1 and rows[0].n_tokens == 10
        # n == chunk_size + 1: second chunk starts at step+1, short
        rows = self._chunks(spark, " ".join(f"t{i}" for i in range(11)))
        assert [(r.start_token, r.n_tokens) for r in rows] == [(1, 10), (8, 4)]

    def test_invalid_overlap_rejected(self, spark):
        from etl_procedure_codes_crawler_spark.llm import text as T

        df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="overlap"):
            T.chunk_documents(df, chunk_size=10, overlap=10)


class TestEmbeddingQaAndOutliers:
    def test_embedding_qa_flags_bad_vectors(self, spark):
        import math

        from etl_procedure_codes_crawler_spark.llm.queries import (
            embedding_qa_report,
        )

        rows = [
            (1, [1.0, 0.0], 0),
            (2, None, 0),
            (3, [float("nan"), 1.0], 0),
            (4, [0.0, 0.0], 0),
            (5, [float("inf"), 1.0], 1),
            # NULL ELEMENT (not a NULL vector): Spark's F.aggregate
            # would propagate it into a NULL sum while DuckDB's
            # list_sum skips it — the report must flag it as
            # non-finite and zero its norm contribution IN BOTH
            # ENGINES (round-8 ADVICE fix)
            (6, [None, 1.0], 2),
        ]
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            # single FLAT file, like the driver's testdata layout —
            # DuckDB's read_parquet needs a file path, not a dataset dir
            import glob as _glob
            import shutil as _shutil

            staging = d + "/_staging"
            df.coalesce(1).write.parquet(staging)
            _shutil.copy(
                _glob.glob(staging + "/part-*.parquet")[0],
                d + "/embeddings.parquet",
            )
            out = {
                r.label: r
                for r in embedding_qa_report(spark, d).collect()
            }
            # cross-engine pin on the synthesized corruption: the real
            # testdata has no NULL elements, so the driver's gate
            # would never exercise this divergence — replicate its
            # compare here on data that does
            from etl_procedure_codes_crawler_spark.plans.parity import (
                compare_query,
            )
            from etl_procedure_codes_crawler_spark.llm.queries import ORACLES

            report = compare_query(
                spark, d, embedding_qa_report, ORACLES["embedding_qa_report"]
            )
            assert report["values_match"], report
        assert out[0].n_vectors == 4 and out[0].n_null == 1
        assert out[0].n_nonfinite == 1  # the NaN vector
        assert out[0].n_zero == 1
        assert math.isclose(out[0].mean_sq_norm, 0.25)  # only v1: 1.0/4
        assert out[1].n_nonfinite == 1  # the Inf vector
        assert out[2].n_nonfinite == 1  # the NULL-element vector
        assert out[2].mean_sq_norm == 0.0

    def test_length_outliers_flag_extremes(self, spark):
        import tempfile

        from etl_procedure_codes_crawler_spark.llm.queries import (
            source_length_outliers,
        )

        # 20 docs at 100 chars + one at 10000: the spike is >2 sigma
        rows = [(i, "x", "s", 100) for i in range(20)]
        rows.append((99, "x", "s", 10_000))
        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, source string, n_chars bigint"
        )
        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(d + "/documents.parquet")
            out = {
                r.doc_id: r.is_outlier
                for r in source_length_outliers(spark, d).collect()
            }
        assert out[99] is True
        assert sum(1 for v in out.values() if v) == 1
