"""Similarity-search semantics on constructed vectors."""

from __future__ import annotations

import math

from etl_procedure_codes_crawler_spark.llm import similarity as S

# constructed corpus: 0⊥1, 2 = 0 scaled (cos=1), 3 close to 0, 4 opposite
VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0, 0.0]),
    (2, [2.0, 0.0, 0.0, 0.0]),
    (3, [0.9, 0.1, 0.0, 0.0]),
    (4, [-1.0, 0.0, 0.0, 0.0]),
]


def _vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_bruteforce_topk_exact_ordering(spark):
    df = _vecs(spark)
    out = S.cosine_topk_bruteforce(df, df.filter("vec_id = 0"), k=4).collect()
    ranked = [(r.rank, r.neighbor_id, r.cosine) for r in sorted(out, key=lambda r: r.rank)]
    assert [r[1] for r in ranked] == [2, 3, 1, 4]
    assert ranked[0][2] == 1.0
    expected_cos3 = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert abs(ranked[1][2] - round(expected_cos3, 4)) < 1e-9
    assert ranked[2][2] == 0.0 and ranked[3][2] == -1.0


def test_similar_pairs_threshold(spark):
    pairs = {
        (r.vec_a, r.vec_b): r.cosine
        for r in S.similar_pairs_bruteforce(_vecs(spark), threshold=0.9).collect()
    }
    assert set(pairs) == {(0, 2), (0, 3), (2, 3)}


def test_lsh_topk_finds_exact_match_and_reranks(spark):
    df = _vecs(spark)
    out = S.cosine_topk_lsh(
        df, df.filter("vec_id = 0"), k=4, num_tables=2, planes_per_table=2, dim=4
    ).collect()
    by_rank = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    # identical-direction vector lands in the same bucket by construction
    assert by_rank[0] == 2
    # candidates are re-ranked by exact cosine: order must be consistent
    cosines = [r.cosine for r in sorted(out, key=lambda r: r.rank)]
    assert cosines == sorted(cosines, reverse=True)


def test_lsh_recall_on_testdata(spark, sf_dir):
    """LSH top-5 should recover a decent fraction of the exact top-5 —
    sanity floor, not a precision claim (8 planes, single table)."""
    import etl_procedure_codes_crawler_spark.llm.queries  # noqa: F401 — registers
    from etl_procedure_codes_crawler_spark.plans.relational import QUERIES

    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_cosine_topk"](spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_cosine_topk_lsh"](spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"


class TestIvf:
    def test_ivf_recall_against_bruteforce(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.llm import similarity as S
        from etl_procedure_codes_crawler_spark.plans.relational import load

        embeddings = load(spark, sf_dir, "embeddings")
        queries = embeddings.filter(F.col("vec_id") < 10)
        exact = S.cosine_topk_bruteforce(embeddings, queries, k=5)
        ivf = S.cosine_topk_ivf(
            embeddings, queries, k=5, num_centroids=8, nprobe=4
        )
        exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
        ivf_pairs = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
        recall = len(exact_pairs & ivf_pairs) / len(exact_pairs)
        # probing half the cells must recover well over half the truth
        assert recall >= 0.6, f"IVF recall {recall:.2f}"
        # at most k rows per query, ranks contiguous from 1
        per_q = {}
        for r in ivf.collect():
            per_q.setdefault(r.query_id, []).append(r.rank)
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())

    def test_ivf_is_deterministic(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.llm import similarity as S
        from etl_procedure_codes_crawler_spark.plans.relational import load

        embeddings = load(spark, sf_dir, "embeddings")
        queries = embeddings.filter(F.col("vec_id") < 5)
        a = sorted(map(tuple, S.cosine_topk_ivf(embeddings, queries, k=3).collect()))
        b = sorted(map(tuple, S.cosine_topk_ivf(embeddings, queries, k=3).collect()))
        assert a == b


class TestSimilarPairsLsh:
    def test_lsh_pairs_recall_vs_bruteforce(self, spark, sf_dir):
        from etl_procedure_codes_crawler_spark.llm import similarity as S
        from etl_procedure_codes_crawler_spark.plans.relational import load

        embeddings = load(spark, sf_dir, "embeddings")
        exact = {
            (r.vec_a, r.vec_b)
            for r in S.similar_pairs_bruteforce(embeddings, 0.45).collect()
        }
        approx = {
            (r.vec_a, r.vec_b)
            for r in S.similar_pairs_lsh(embeddings, 0.45).collect()
        }
        assert approx <= exact  # verification step: no false positives
        if exact:
            recall = len(approx & exact) / len(exact)
            assert recall >= 0.5, f"LSH pair recall {recall:.2f}"


class TestMd5PlaneMode:
    """md5-mode hyperplane LSH (round 11): ±1 planes from md5 parity
    over fixed-point int64 coordinates — the signature relation is
    engine-deterministic, which is what moved ann_cosine_topk_lsh and
    embedding_similar_pairs_lsh from rows-only to hash-oracled."""

    def test_signatures_match_pure_python_replica(self, spark, sf_dir):
        import hashlib

        import numpy as np

        from etl_procedure_codes_crawler_spark.llm import similarity as S
        from etl_procedure_codes_crawler_spark.plans.relational import load

        embeddings = load(spark, sf_dir, "embeddings").filter(
            "vec_id < 30"
        )
        sig = S._md5_bucket_signatures(8, 5, 64)
        got = {
            (r.id, r.table): r.bucket
            for r in S.lsh_table_buckets(
                embeddings.selectExpr("vec_id AS id", "embedding AS v"),
                "id", "v", None, 8, 5, signature=sig,
            ).collect()
        }
        vecs = {
            r.vec_id: list(r.embedding) for r in embeddings.collect()
        }
        # pure-stdlib replica: int dots, no numpy order effects at all
        signs = [
            [
                1
                if int(
                    hashlib.md5(f"hp:{p}:{j}".encode()).hexdigest()[0], 16
                ) % 2
                else -1
                for j in range(64)
            ]
            for p in range(40)
        ]
        for vid, v in vecs.items():
            q = [int(np.floor(np.float64(x) * 1048576.0)) for x in v]
            for t in range(8):
                bucket = sum(
                    (1 << i)
                    for i in range(5)
                    if sum(
                        s * c
                        for s, c in zip(signs[t * 5 + i], q)
                    ) > 0
                )
                assert got[(vid, t)] == bucket, (vid, t)

    def test_md5_pairs_are_verified_and_recall_floored(
        self, spark, sf_dir
    ):
        from etl_procedure_codes_crawler_spark.llm import similarity as S
        from etl_procedure_codes_crawler_spark.plans.relational import load

        embeddings = load(spark, sf_dir, "embeddings")
        exact = {
            (r.vec_a, r.vec_b)
            for r in S.similar_pairs_bruteforce(embeddings, 0.45).collect()
        }
        approx = {
            (r.vec_a, r.vec_b)
            for r in S.similar_pairs_lsh(
                embeddings, 0.45, plane_mode="md5"
            ).collect()
        }
        assert approx <= exact  # exact-cosine verify: no false positives
        if exact:
            recall = len(approx & exact) / len(exact)
            assert recall >= 0.5, f"md5-mode pair recall {recall:.2f}"

    def test_md5_topk_recall_floor(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.llm import similarity as S
        from etl_procedure_codes_crawler_spark.plans.relational import load

        embeddings = load(spark, sf_dir, "embeddings")
        queries = embeddings.filter(F.col("vec_id") < 20)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in S.cosine_topk_bruteforce(
                embeddings, queries, k=5
            ).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in S.cosine_topk_lsh(
                embeddings, queries, k=5, plane_mode="md5"
            ).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.2, f"md5-mode topk recall {recall:.2f}"

    def test_unknown_plane_mode_rejected(self):
        import pytest as _pytest

        from etl_procedure_codes_crawler_spark.llm import similarity as S

        with _pytest.raises(ValueError, match="plane_mode"):
            S._resolve_planes("xx", 8, 5, 64, 42)


class TestPQ:
    def test_pq_recall_against_bruteforce(self, spark, sf_dir):
        """ADC shortlist + exact re-rank must recover most of the true
        top-5 (quantization only shortlists; exact cosine decides)."""
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.llm import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 20)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in S.cosine_topk_bruteforce(emb, qs, k=5).collect()
        }
        pq = {
            (r.query_id, r.neighbor_id)
            for r in S.cosine_topk_pq(emb, qs, k=5).collect()
        }
        recall = len(exact & pq) / len(exact)
        assert recall >= 0.6, f"PQ recall {recall:.2f}"
        # per-query k results, ranks 1..5, exact-cosine scores
        per_q: dict[int, int] = {}
        for r in S.cosine_topk_pq(emb, qs, k=5).collect():
            per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
            assert 1 <= r.rank <= 5
        assert all(n == 5 for n in per_q.values())

    def test_opq_rotation_is_orthonormal_and_balances_variance(self):
        import numpy as np

        from etl_procedure_codes_crawler_spark.llm.similarity import (
            _opq_rotation,
            _unit_np,
        )

        rng = np.random.RandomState(7)
        # anisotropic data: variance concentrated in the first dims
        scales = np.linspace(4.0, 0.05, 16)
        X = rng.randn(2000, 16) * scales
        m = 4
        R = _opq_rotation(X, m)
        # orthonormal: geometry (and the exact re-rank) untouched
        np.testing.assert_allclose(R.T @ R, np.eye(16), atol=1e-9)
        # subspace variances of the ROTATED data are far more balanced
        # than raw slicing's
        # eigenvalue allocation balances per-subspace variance
        # PRODUCTS (log-sums), the quantity that drives per-subspace
        # codebook quality — compare log-product spread
        U = _unit_np(X)

        def log_product_spread(Y):
            lp = [
                np.log(Y[:, j * 4 : (j + 1) * 4].var(axis=0) + 1e-12).sum()
                for j in range(m)
            ]
            return max(lp) - min(lp)

        assert log_product_spread(U @ R) < log_product_spread(U) / 4

    def test_opq_recall_at_least_matches_pq(self, spark, sf_dir):
        """rotate=True must keep the recall floor (the rotation is
        orthonormal, the exact re-rank is identical) — and the OPQ
        result set stays k-per-query well-formed."""
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.llm import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 20)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in S.cosine_topk_bruteforce(emb, qs, k=5).collect()
        }
        opq = {
            (r.query_id, r.neighbor_id)
            for r in S.cosine_topk_pq(emb, qs, k=5, rotate=True).collect()
        }
        recall = len(exact & opq) / len(exact)
        assert recall >= 0.6, f"OPQ recall {recall:.2f}"
        ivfpq = S.cosine_topk_ivfpq(
            emb, qs, k=5, nprobe=6, rotate=True
        ).collect()
        per_q: dict[int, int] = {}
        for r in ivfpq:
            per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
        assert all(n == 5 for n in per_q.values())

    def test_hadamard_signs_orthogonal(self):
        """H·Hᵀ = dim·I — the structured rotation preserves geometry
        exactly (scaled by sqrt(dim)); non-power-of-two dims raise."""
        import numpy as np
        import pytest as _pytest

        from etl_procedure_codes_crawler_spark.llm.similarity import (
            _hadamard_signs,
        )

        for d in (8, 64):
            H = _hadamard_signs(d)
            assert set(np.unique(H)) == {-1, 1}
            assert np.array_equal(H @ H.T, d * np.eye(d, dtype=np.int64))
        with _pytest.raises(ValueError, match="power-of-two"):
            _hadamard_signs(48)

    def test_hadamard_md5_pq_recall_floor(self, spark, sf_dir):
        """The md5-int Hadamard rotation (the oracle-able rotation
        family member) keeps the recall floor vs exact top-k."""
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.llm import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 20)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in S.cosine_topk_bruteforce(emb, qs, k=5).collect()
        }
        hpq = {
            (r.query_id, r.neighbor_id)
            for r in S.cosine_topk_pq(
                emb, qs, k=5, dim=64, max_iter=3,
                quant_mode="md5", rotate=True,
            ).collect()
        }
        recall = len(exact & hpq) / len(exact)
        assert recall >= 0.6, f"Hadamard-PQ recall {recall:.2f}"

    def test_pq_is_deterministic(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.llm import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 20)
        a = sorted(map(tuple, S.cosine_topk_pq(emb, qs, k=5).collect()))
        b = sorted(map(tuple, S.cosine_topk_pq(emb, qs, k=5).collect()))
        assert a == b


class TestIVFPQ:
    def test_ivfpq_recall_against_bruteforce(self, spark, sf_dir):
        """The composed pipeline multiplies the two approximations'
        losses (cell pruning × quantization), so the floor sits below
        either component's — 0.5 with nprobe=6 of 16 cells (measured
        0.71-0.72 on the testdata)."""
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.llm import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 20)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in S.cosine_topk_bruteforce(emb, qs, k=5).collect()
        }
        got = S.cosine_topk_ivfpq(emb, qs, k=5, nprobe=6)
        pairs = {(r.query_id, r.neighbor_id) for r in got.collect()}
        recall = len(exact & pairs) / len(exact)
        assert recall >= 0.5, f"IVF+PQ recall {recall:.2f}"

    def test_ivfpq_is_deterministic(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.llm import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 20)
        a = sorted(map(tuple, S.cosine_topk_ivfpq(emb, qs, k=5, nprobe=6).collect()))
        b = sorted(map(tuple, S.cosine_topk_ivfpq(emb, qs, k=5, nprobe=6).collect()))
        assert a == b


def test_pq_dim_param_and_empty_corpus_error(spark):
    import pytest as _pytest

    from etl_procedure_codes_crawler_spark.llm import similarity as S

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    # training on an empty corpus: explicit error, not a numpy crash
    with _pytest.raises(ValueError, match="empty corpus"):
        S._pq_context(empty, "embedding", 8, 4, 42, 1)
    tiny = spark.createDataFrame(
        [(i, [float(i * j % 7) for j in range(64)]) for i in range(8)],
        "vec_id bigint, embedding array<float>",
    )
    codebook, codes_udf, lut_udf, adc_score, _rot = S._pq_context(
        tiny, "embedding", 8, 4, 42, 1, dim=64
    )
    assert codebook.shape == (4, 8)
    # a dim that contradicts the corpus is an explicit error
    with _pytest.raises(ValueError, match="dim=32"):
        S._pq_context(tiny, "embedding", 8, 4, 42, 1, dim=32)


def test_adaptive_probe_paths_agree(spark):
    """The literal-expression probe (small centroid tables) and the
    Arrow probe (above _PROBE_LITERAL_CAP) must pick identical cells —
    including the tie contract (cell asc) — in both raw and unit
    geometry."""
    import numpy as np

    from pyspark.sql import functions as F

    from etl_procedure_codes_crawler_spark.llm import similarity as S

    rng = np.random.RandomState(7)
    centers = rng.randn(16, 64)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(64)]) for i in range(20)],
        "vec_id bigint, embedding array<float>",
    )
    for normalize in (False, True):
        lit_cells = vecs.select(
            "vec_id",
            S._probe_cells(
                F.col("embedding"), centers, 4, normalize=normalize
            ).alias("cells"),
        )
        udf_cells = vecs.select(
            "vec_id",
            S._ivf_probe_udf(centers, 4, normalize=normalize)(
                F.col("embedding")
            ).alias("cells"),
        )
        a = {r.vec_id: list(r.cells) for r in lit_cells.collect()}
        b = {r.vec_id: list(r.cells) for r in udf_cells.collect()}
        assert a == b, f"probe paths diverge (normalize={normalize})"
    # the adaptive switch actually takes the Arrow path above the cap
    big = np.zeros((80, 64))  # 5120 literals > _PROBE_LITERAL_CAP
    col = S._probe_cells(F.col("embedding"), big, 4, normalize=False)
    # a pandas-UDF column stringifies with the udf name, a literal
    # expression with array_sort — cheap structural check
    assert "probe" in str(col).lower()


def test_kmeans_np_empty_clusters_reseed_distinct():
    """Several clusters emptying in one Lloyd iteration must be
    re-seeded to DISTINCT points — duplicate centroids are dead PQ
    codes / permanently empty IVF cells."""
    import numpy as np

    from etl_procedure_codes_crawler_spark.llm import similarity as S

    # two tight blobs force most of k=8 clusters empty
    rng = np.random.RandomState(0)
    X = np.vstack(
        [rng.randn(50, 4) * 0.01, rng.randn(50, 4) * 0.01 + 100.0]
    )
    centers = S._kmeans_np(X, k=8, seed=1, max_iter=5)
    uniq = np.unique(np.round(centers, 9), axis=0)
    assert len(uniq) == len(centers), "duplicate centroids returned"
