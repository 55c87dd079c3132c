"""Similarity search over embedding columns (``array<float>``).

Two tiers, per SURVEY §7 Phase 5:

- brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the corpus, cosine via zip_with/aggregate (JVM
  higher-order fns, no UDF), rank with a window. Linear in corpus size
  per query; at 100 TB this is the re-rank stage, not the scan.
- random-hyperplane LSH — the scale path: 16-bit sign signatures
  bucket the corpus; candidates share a band; exact cosine re-ranks.
  Hyperplanes are generated deterministically (seeded) on the driver
  and folded into the plan as literals — no state on executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v):
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the L2 norm once per vector — never per pair."""
    return df.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (it is the small side by construction);
    the corpus streams through map tasks — no shuffle of the corpus.
    Ranking uses (cosine DESC, neighbor_id) so ties are deterministic.
    """
    q = with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        "qv",
    ).withColumnRenamed("_norm", "qn")
    c = with_norm(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        ),
        "cv",
    ).withColumnRenamed("_norm", "cn")
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def _pairs_above(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_a, vec_b, cosine) with UNROUNDED cosine for every unordered
    pair at cosine >= threshold — shared by the pair miner and the
    margin scorer (which must derive neighbor statistics from the raw
    values, not display-rounded ones)."""
    v = with_norm(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v"
    )
    a = v.select(
        F.col("id").alias("vec_a"), F.col("v").alias("va"), F.col("_norm").alias("na")
    )
    b = v.select(
        F.col("id").alias("vec_b"), F.col("v").alias("vb"), F.col("_norm").alias("nb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def similar_pairs_bruteforce(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All corpus pairs with cosine >= threshold (embedding-cosine
    near-dup detection). Exact baseline — use the LSH variant to
    pre-filter at scale."""
    return _pairs_above(df, threshold, vec_col, id_col).select(
        "vec_a", "vec_b", F.round("cosine", 4).alias("cosine")
    )


def margin_pairs_bruteforce(
    df: DataFrame,
    floor: float = 0.30,
    k: int = 4,
    margin_threshold: float = 1.1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Ratio-margin neighbor mining (Artetxe & Schwenk 2019, "Margin-
    based Parallel Corpus Mining with Multilingual Sentence
    Embeddings"): a pair counts as a true match not when its cosine is
    globally high but when it is high RELATIVE to what each endpoint's
    neighborhood scores — margin(x, y) = cos(x, y) / ((mean_k(x) +
    mean_k(y)) / 2), where mean_k(v) is the mean cosine of v's k
    nearest candidates. This kills hub vectors (high cosine with
    EVERYTHING — their margins hover near 1) that drown absolute-
    threshold mining, and is the standard bitext/near-dup pair scorer
    at corpus scale.

    Neighborhoods are defined over the candidate relation itself
    (pairs at cosine >= ``floor``); endpoints with fewer than ``k``
    candidate neighbors are dropped — a margin against an undersized
    neighborhood overstates the pair.  At 100 TB the same scoring runs
    off the LSH/IVF candidate stream instead of the O(n²) scan; the
    margin math is identical (it only consumes the pair relation).

    Determinism contract (the reason this is hash-oracle-able): the
    mean is a FIXED-ORDER fold over the rank-sorted top-k cosines —
    float addition is not associative, so a groupBy SUM's partition-
    dependent order would not reproduce across engines, but
    ``aggregate(array_sort(collect_list(struct(rank, cos))))`` folds
    in rank order everywhere.
    """
    # checkpoint: the O(n²) candidate scan would otherwise re-execute
    # once per scorer consumer (no exchange under the NLJ to reuse);
    # surfaced pairs are floor-pruned and small
    pairs = _pairs_above(df, floor, vec_col, id_col).localCheckpoint(
        eager=True
    )
    return margin_score_pairs(pairs, k=k, margin_threshold=margin_threshold)


def margin_score_pairs(
    pairs: DataFrame, k: int = 4, margin_threshold: float = 1.1
) -> DataFrame:
    """Margin scoring over any (vec_a, vec_b, cosine) candidate
    relation — the part of the miner that is candidate-source-agnostic
    (brute force here, ANN at scale). ``cosine`` must be
    full-precision; output rounds for display.

    The candidate relation feeds THREE consumers (both directed legs
    and the final pair join); whether to materialize it first depends
    on the producer — the brute-force caller checkpoints (its NLJ scan
    has no reusable exchange), the ANN caller does not (its candidate
    join reuses the broadcast/exchange across consumers, and forcing a
    checkpoint was measured SLOWER at sf0.1)."""
    directed = pairs.select(
        F.col("vec_a").alias("id"), F.col("vec_b").alias("nb"), "cosine"
    ).unionAll(
        pairs.select(
            F.col("vec_b").alias("id"), F.col("vec_a").alias("nb"), "cosine"
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("nb"))
    ranked = directed.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    knn = (
        ranked.groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rk", "cosine"))
            ).alias("_top"),
            F.count(F.lit(1)).alias("_cnt"),
        )
        .filter(F.col("_cnt") == k)
        .select(
            "id",
            (
                F.aggregate(
                    F.col("_top"),
                    F.lit(0.0),
                    lambda acc, x: acc + x["cosine"],
                )
                / F.lit(float(k))
            ).alias("mean_top"),
        )
    )
    ka = knn.select(F.col("id").alias("vec_a"), F.col("mean_top").alias("ma"))
    kb = knn.select(F.col("id").alias("vec_b"), F.col("mean_top").alias("mb"))
    margin = F.col("cosine") / ((F.col("ma") + F.col("mb")) / F.lit(2.0))
    return (
        pairs.join(ka, "vec_a")
        .join(kb, "vec_b")
        .withColumn("margin", margin)
        .filter(F.col("margin") >= margin_threshold)
        .select(
            "vec_a",
            "vec_b",
            F.round("cosine", 4).alias("cosine"),
            F.round("margin", 4).alias("margin"),
        )
    )


def similar_pairs_lsh(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_tables: int = 8,
    planes_per_table: int = 5,
    dim: int = 64,
    seed: int = 42,
    plane_mode: str = "gaussian",
) -> DataFrame:
    """Embedding near-dup pair mining at scale: LSH buckets generate
    candidates (self-join within (table, bucket) — quadratic only
    inside a bucket), exact cosine verifies. The scale path for
    :func:`similar_pairs_bruteforce`'s O(n²) scan; recall < 1 by
    design, tunable via num_tables. ``plane_mode='md5'`` swaps the
    Gaussian planes for md5-derived ±1 planes over fixed-point
    coordinates — integer-exact signatures a SQL oracle replays
    (hash-oracled); 'gaussian' stays the float default."""
    planes, signature = _resolve_planes(
        plane_mode, num_tables, planes_per_table, dim, seed
    )
    b = lsh_table_buckets(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        "id",
        "v",
        planes,
        num_tables,
        planes_per_table,
        signature=signature,
    )
    # cache once: the self-join below consumes BOTH sides of this
    # frame, and Spark plans the Arrow signature pass separately per
    # side (no exchange reuse across the join's aliases) — the
    # bucketing UDF ran twice over the corpus. persist() dedupes the
    # Python work while staying RECOMPUTABLE — unlike localCheckpoint,
    # a lost executor recomputes the blocks from lineage instead of
    # failing the query (nothing here rewrites the input files, so
    # cutting lineage buys nothing; contrast forget.py's swaps).
    bn = with_norm(b, "v").persist()
    lhs = bn.select(
        "table",
        "bucket",
        F.col("id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("_norm").alias("na"),
    )
    rhs = bn.select(
        "table",
        "bucket",
        F.col("id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("_norm").alias("nb"),
    )
    # cosine per COLLISION row, then groupBy-max dedup: the multi-table
    # dedup shuffles (vec_a, vec_b, cosine) — 24 bytes/row — instead of
    # two 64-dim vectors; duplicates carry identical cosines so max()
    # is exact (same rationale as cosine_topk_lsh). The threshold also
    # prunes BEFORE the dedup shuffle, shrinking it further.
    return (
        lhs.join(rhs, ["table", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .groupBy("vec_a", "vec_b")
        .agg(F.max("cosine").alias("cosine"))
        .select("vec_a", "vec_b", F.round("cosine", 4).alias("cosine"))
    )


def margin_pairs_ann(
    df: DataFrame,
    floor: float = 0.30,
    k: int = 4,
    margin_threshold: float = 1.1,
    knn: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int | None = None,
    nprobe: int = 6,
    seed: int = 42,
    cell_target: int = 256,
    quant_mode: str = "float",
    max_iter: int = 5,
) -> DataFrame:
    """The scale path for :func:`margin_pairs_bruteforce`: identical
    margin scoring over an IVF k-NN GRAPH instead of the O(n²) scan —
    the production shape (Artetxe & Schwenk mine margins over FAISS
    neighborhoods, not exact search). Threshold-LSH is the wrong
    candidate source here: at a low candidate floor like 0.30 the
    hyperplane collision probability per table is a few percent, and
    the margin statistic COMPOUNDS misses (a lost candidate both drops
    a pair and biases both endpoints' neighborhood means), measured
    <20% pair recall — while the k-NN graph recovers each vector's
    strongest ``knn`` neighbors at the IVF recall floor regardless of
    how weak "strong" is. Candidate edges are top-``knn`` IVF
    neighbors at cosine >= floor, symmetrized; unrounded cosines are
    re-derived pair-wise (the fold must not consume display-rounded
    values); scoring is :func:`margin_score_pairs`, shared with the
    exact twin. Recall floored against the exact variant in
    tests/test_r9s2_families.py.

    Cell count TRACKS the corpus unless pinned: with every vector a
    query, fixed cells make the candidate join quadratic (each query
    scans nprobe/ncells of the corpus — measured 31.9x wall for 4x
    vectors at 16 cells on the 10x sweep). ncells = n/cell_target
    keeps ~cell_target·nprobe candidates per query, so total candidate
    volume grows LINEARLY in n — the FAISS sizing rule applied to the
    kNN-graph case. The one extra count() job prices that decision."""
    if num_centroids is None:
        n = df.count()
        num_centroids = max(16, min(4096, n // int(cell_target)))
    edges = (
        cosine_topk_ivf(
            df, df, k=knn, vec_col=vec_col, id_col=id_col,
            num_centroids=num_centroids, nprobe=nprobe, seed=seed,
            quant_mode=quant_mode, max_iter=max_iter,
        )
        .filter(F.col("cosine") >= floor)
        .select(
            F.least("query_id", "neighbor_id").alias("vec_a"),
            F.greatest("query_id", "neighbor_id").alias("vec_b"),
        )
        .distinct()
    )
    v = with_norm(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v"
    )
    a = v.select(F.col("id").alias("vec_a"), F.col("v").alias("va"),
                 F.col("_norm").alias("na"))
    b = v.select(F.col("id").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("_norm").alias("nb"))
    raw = (
        edges.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
        # checkpoint: the IVF candidate join + top-knn window would
        # otherwise re-execute once per scorer consumer — negligible at
        # sf0.1 (broadcast reuse hides it) but 3x the dominant stage on
        # the 10x corpus; the floor-pruned edge relation itself is tiny
        .localCheckpoint(eager=True)
    )
    return margin_score_pairs(raw, k=k, margin_threshold=margin_threshold)


def _train_vectors(
    corpus: DataFrame, vec_col: str, train_sample: int
) -> np.ndarray:
    """Bounded driver-side training sample for k-means codebooks and
    coarse centroids — the FAISS approach: quantizers are trained on a
    capped sample (~64k vectors) regardless of corpus size, because
    cluster geometry converges long before the full corpus is seen.

    ``limit`` short-circuits the scan (LocalLimit stops feeding after
    ``train_sample`` rows), so driver memory and scan cost are constant
    in corpus size. A corpus whose leading files are pathologically
    unrepresentative should be pre-sampled by the caller; for training
    a quantizer this is the standard trade."""
    rows = (
        corpus.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .limit(train_sample)
        .collect()
    )
    if not rows:
        raise ValueError(
            f"cannot train on an empty corpus (vector column: {vec_col!r})"
        )
    return np.asarray([r[0] for r in rows], dtype=np.float64)


def _kmeans_np(
    X: np.ndarray, k: int, seed: int, max_iter: int
) -> np.ndarray:
    """Seeded vectorized Lloyd iterations on the (bounded, in-memory)
    training sample. Replaces MLlib KMeans for quantizer training: the
    distributed fit pays per-iteration job scheduling that dwarfs the
    math at any sample size worth training on (measured 40 s for 16k
    8-dim rows on local[32]; this runs in milliseconds). Empty clusters
    are re-seeded to the point currently farthest from its center."""
    rng = np.random.RandomState(seed)
    n = len(X)
    if n >= k:
        centers = X[rng.choice(n, size=k, replace=False)].copy()
    else:
        # degenerate tiny corpus: duplicate points, jitter to keep
        # centers distinct so argmin stays well-defined
        centers = X[rng.choice(n, size=k, replace=True)].copy()
        centers += rng.randn(k, X.shape[1]) * 1e-9
    for _ in range(max_iter):
        # one matmul for the full (n, k) distance matrix — the naive
        # (X[:,None,:] - centers[None,:,:]) broadcast materializes an
        # (n, k, dim) array, which at the k-tracks-corpus settings the
        # cell-scoped dedup uses (n=20k, k=625, dim=64) is 6.4 GB PER
        # ITERATION; the round-9 10x scale sweep caught it as a 47x
        # blowup (kmeans alone 200 s; ~1 s with the matmul identity)
        d = _sq_dists_np(X, centers)
        labels = d.argmin(axis=1)
        nearest = d[np.arange(n), labels]
        # vectorized per-cluster means (bincount/add.at), not a k-wide
        # Python loop of masked means
        counts = np.bincount(labels, minlength=k)
        sums = np.zeros_like(centers)
        np.add.at(sums, labels, X)
        filled = counts > 0
        centers[filled] = sums[filled] / counts[filled, None]
        empties = np.flatnonzero(~filled)
        if len(empties):
            # DISTINCT farthest points per empty cluster — one shared
            # reseed point would return duplicate centroids (dead PQ
            # codes / permanently empty IVF cells)
            order = np.argsort(-nearest, kind="stable")
            for i, j in enumerate(empties):
                centers[j] = X[order[i % n]]
    return centers


def _unit_np(X: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    return np.where(norms > 0, X / np.maximum(norms, 1e-30), 0.0)


def _sq_dists_np(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances via one matmul (‖x‖²−2x·c+‖c‖²)."""
    return (
        (X * X).sum(axis=1, keepdims=True)
        - 2.0 * (X @ C.T)
        + (C * C).sum(axis=1)
    )


def _stack_np(vectors: pd.Series) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in vectors])


# ---------------------------------------------------------------------------
# md5-int quantizer training (round 12): the trained-ANN conversion.
# The same fixed-point discipline that hash-oracled the float-LSH
# family, applied to k-means itself — md5-seeded init, a fixed number
# of Lloyd iterations, and INTEGER centroid arithmetic make training
# a pure function of (ids, quantized coordinates) that DuckDB replays
# as unrolled CTEs. Every op is engine-exact: quantization is one
# IEEE multiply + floor; distances are int64 sums (associative);
# centroid means are floor divisions of non-negative sums (the shift
# keeps coordinates >= 0, so numpy // == SQL //); argmin ties break
# to the lowest centroid id (numpy first-occurrence == ORDER BY d,
# cid). Empty cells keep their previous centroid — deliberately NOT
# the float path's farthest-point reseed, which is order-dependent
# and SQL-hostile.
# ---------------------------------------------------------------------------

#: fixed-point geometry shared by every md5-int quantizer and its SQL
#: oracle: SCALE is one IEEE multiply (2^20), SHIFT makes quantized
#: coordinates non-negative so integer mean division floors
#: identically everywhere (embedding coords are unit-scale; 2^21
#: covers anything in (-2, 2))
_FIXED_SCALE = float(1 << 20)
_FIXED_SHIFT = 1 << 21


def _md5_h60_py(s: str) -> int:
    """Driver-side twin of the oracle's md5-60 expression:
    CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _quantize_np(X: np.ndarray) -> np.ndarray:
    """floor(x * 2^20) + 2^21 per coordinate — the shifted fixed-point
    grid every md5-int distance lives on."""
    return np.floor(X * _FIXED_SCALE).astype(np.int64) + _FIXED_SHIFT


def _unit_seq_np(X: np.ndarray) -> np.ndarray:
    """Unit-normalize with a SEQUENTIAL-order norm accumulation —
    numpy's pairwise .sum() is faster but order-divergent from SQL's
    left fold; this loop is ((x1²+x2²)+x3²)+…, exactly DuckDB's
    list_sum, and sqrt/divide are single correctly-rounded IEEE ops."""
    acc = np.zeros(len(X), dtype=np.float64)
    for j in range(X.shape[1]):
        acc = acc + X[:, j] * X[:, j]
    n = np.sqrt(acc)
    safe = np.where(n > 0, n, 1.0)
    return np.where((n > 0)[:, None], X / safe[:, None], 0.0)


def _int_sq_dists(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 over int64 via the matmul identity — exact.

    The matmul runs in float64 BLAS WHEN EXACT and falls back to the
    int64 gufunc otherwise: numpy has no BLAS path for integer matmul
    (the round-12 100x sweep measured the naive int64 gufunc as the
    ANN families' super-linear wall), and float64 arithmetic on these
    operands is exact whenever max|coord|² · dim stays under the 2^53
    integer-exactness bound of IEEE double — true for every shifted
    fixed-point caller here (coords < 2^22, dim ≤ 64 → inner sums
    < 2^50). The bound is CHECKED per call, not assumed, so a future
    caller with larger coordinates silently gets the exact slow path
    rather than a rounded fast one."""
    if A.size and B.size:
        hi = max(
            int(np.abs(A).max(initial=0)), int(np.abs(B).max(initial=0))
        )
        if hi * hi * A.shape[1] < (1 << 53):
            Af = A.astype(np.float64)
            Bf = B.astype(np.float64)
            d = (
                (Af * Af).sum(axis=1, keepdims=True)
                - 2.0 * (Af @ Bf.T)
                + (Bf * Bf).sum(axis=1)
            )
            return np.rint(d).astype(np.int64)
    return (
        (A * A).sum(axis=1, keepdims=True)
        - 2 * (A @ B.T)
        + (B * B).sum(axis=1)
    )


def _train_vectors_by_id(
    corpus: DataFrame, vec_col: str, id_col: str, train_sample: int
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic training sample for md5-int quantizers: the
    ``train_sample`` LOWEST-id vectors — unlike :func:`_train_vectors`
    (unordered limit, fine for a float quantizer nobody replays), the
    oracle must re-derive the exact sample, so the cut is ORDER BY id
    LIMIT n. Same bounded-collect scale story: driver memory and scan
    cost are capped regardless of corpus size."""
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .where(F.col(vec_col).isNotNull())
        .orderBy(F.col(id_col))
        .limit(train_sample)
        .collect()
    )
    if not rows:
        raise ValueError(
            f"cannot train on an empty corpus (vector column: {vec_col!r})"
        )
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    X = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    return ids, X


def _kmeans_int(
    Q: np.ndarray,
    init_keys: list,
    k: int,
    max_iter: int,
) -> np.ndarray:
    """Integer Lloyd on the shifted fixed-point grid. Init = the k
    training rows with the smallest ``init_keys[j]`` — callers build
    keys as (md5_60(tag:id), id-tiebreak…) tuples so the oracle's
    ORDER BY (hash, id…) re-derives the identical selection. md5-60
    collisions are ~2^-60 so the tiebreak is belt-and-braces, but it
    must still order the same way the SQL does."""
    n = len(Q)
    kk = min(k, n)
    order = sorted(range(n), key=lambda j: init_keys[j])
    centers = Q[np.asarray(order[:kk])].copy()
    for _ in range(max_iter):
        labels = _int_sq_dists(Q, centers).argmin(axis=1)
        counts = np.bincount(labels, minlength=kk)
        sums = np.zeros_like(centers)
        np.add.at(sums, labels, Q)
        filled = counts > 0
        centers[filled] = sums[filled] // counts[filled, None]
    return centers


def _ivf_cell_int_udf(centers: np.ndarray, normalize: bool):
    """Arrow-batched md5-int cell assignment: quantize the batch onto
    the shared fixed-point grid, exact int64 argmin against the
    integer centroids (ties -> lowest cell id, same as the oracle's
    ORDER BY d, cid)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    G = np.asarray(centers, dtype=np.int64)

    @pandas_udf(IntegerType())
    def cell(vectors: pd.Series) -> pd.Series:
        X = _stack_np(vectors)
        if normalize:
            X = _unit_seq_np(X)
        q = _quantize_np(X)
        return pd.Series(
            _int_sq_dists(q, G).argmin(axis=1).astype(np.int32)
        )

    return cell


def _ivf_probe_int_udf(centers: np.ndarray, nprobe: int, normalize: bool):
    """md5-int probe: nprobe nearest integer centroids per query
    (stable argsort == ORDER BY d, cid LIMIT nprobe)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    G = np.asarray(centers, dtype=np.int64)

    @pandas_udf(ArrayType(IntegerType()))
    def probe(vectors: pd.Series) -> pd.Series:
        X = _stack_np(vectors)
        if normalize:
            X = _unit_seq_np(X)
        q = _quantize_np(X)
        order = np.argsort(_int_sq_dists(q, G), axis=1, kind="stable")
        return pd.Series(list(order[:, :nprobe].astype(np.int32)))

    return probe


def _pq_int_context(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m: int,
    codebook_size: int,
    max_iter: int,
    dim: int | None = None,
    train_sample: int = 1 << 16,
    train_data: "tuple[np.ndarray, np.ndarray] | None" = None,
):
    """md5-int twin of :func:`_pq_context`: unit-normalize with the
    SEQUENTIAL-order norm, quantize onto the shared fixed-point grid,
    pool the m subvector slices of the deterministic lowest-id
    training sample, and fit the shared codebook with integer Lloyd
    (:func:`_kmeans_int`, init keys md5_60('pq:id:slice')). Codes are
    exact int argmins; the ADC LUT holds INTEGER dots of the
    SHIFT-removed (signed) quantized slices — no float enters the
    shortlist, so a SQL oracle replays training, encoding, and
    ranking bit-for-bit. ``train_data=(ids, X)`` shares one collect
    with the IVFPQ cell trainer."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType, LongType

    if train_data is None:
        train_data = _train_vectors_by_id(
            corpus, vec_col, id_col, train_sample
        )
    ids, X = train_data
    if dim is None:
        dim = X.shape[1]
    elif dim != X.shape[1]:
        raise ValueError(
            f"dim={dim} but corpus vectors have {X.shape[1]} elements"
        )
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m

    QU = _quantize_np(_unit_seq_np(X))
    pooled = QU.reshape(len(QU) * m, sub)
    keys = [
        (_md5_h60_py(f"pq:{int(i)}:{s}"), int(i) * m + s)
        for i in ids
        for s in range(m)
    ]
    CB = _kmeans_int(pooled, keys, codebook_size, max_iter)
    codes, lut = _pq_int_codecs(CB, m, sub)

    def adc_score(codes_col, lut_colname):
        # same unrolled element_at sum as _pq_context — long-typed
        terms = [
            F.element_at(
                F.col(lut_colname),
                F.lit(j * codebook_size + 1) + F.element_at(codes_col, j + 1),
            )
            for j in range(m)
        ]
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        return total

    return CB, codes, lut, adc_score, None


def _pq_int_codecs(codebook: np.ndarray, m: int, sub: int):
    """(codes_udf, lut_udf) over a FIXED integer codebook — shared by
    the in-line trainer above and the persisted index, whose appends
    and serves must encode with the STORED quantizers."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType, LongType

    CB = np.asarray(codebook, dtype=np.int64)
    CBs = CB - _FIXED_SHIFT

    @pandas_udf(ArrayType(IntegerType()))
    def codes(vectors: pd.Series) -> pd.Series:
        q = _quantize_np(_unit_seq_np(_stack_np(vectors)))
        lab = _int_sq_dists(q.reshape(-1, sub), CB).argmin(axis=1)
        return pd.Series(list(lab.reshape(-1, m).astype(np.int32)))

    @pandas_udf(ArrayType(LongType()))
    def lut(vectors: pd.Series) -> pd.Series:
        qs = (
            _quantize_np(_unit_seq_np(_stack_np(vectors)))
            - _FIXED_SHIFT
        )
        out = _int_matmul(qs.reshape(len(qs), m, sub), CBs.T)
        return pd.Series(list(out.reshape(len(qs), -1)))

    return codes, lut


#: Hadamard-rotation fixed-point geometry (round 12): the rotation
#: sums 64 quantized coordinates, so the grid is 2^16 (not 2^20) and
#: the post-rotation shift 2^23 — keeps every kernel under the 2^53
#: BLAS-exactness bound (|rot| <= 64·2^16 = 2^22; products < 2^48,
#: 8-term sums < 2^51)
_HADAMARD_ROT_SCALE = float(1 << 16)
_HADAMARD_ROT_SHIFT = 1 << 23


def _hadamard_signs(dim: int) -> np.ndarray:
    """The Walsh-Hadamard sign matrix H[i][j] = (-1)^popcount(i & j)
    — ±1, orthogonal (H·Hᵀ = dim·I), and SQL-expressible as
    bit_count(i & j) % 2. ``dim`` must be a power of two."""
    if dim & (dim - 1):
        raise ValueError(f"Hadamard rotation needs power-of-two dim, got {dim}")
    idx = np.arange(dim)
    parity = np.vectorize(lambda x: bin(x).count("1") & 1)(
        idx[:, None] & idx[None, :]
    )
    return np.where(parity == 0, 1, -1).astype(np.int64)


def _hpq_int_context(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m: int,
    codebook_size: int,
    max_iter: int,
    dim: int | None = None,
    train_sample: int = 1 << 16,
    train_data: "tuple[np.ndarray, np.ndarray] | None" = None,
):
    """HADAMARD-rotated md5-int PQ (round 12): OPQ's learned rotation
    is an eigendecomposition — libm-bound, rows-only forever — but a
    STRUCTURED rotation attacks the same blind-slicing problem
    (FAISS/ScaNN both ship random/structured rotations) while staying
    integer-exact: pre-rotate the quantized unit coordinates with the
    ±1 Walsh-Hadamard matrix (every input dimension spreads across
    all subspaces), then run the proven integer codebook/codes/ADC
    machinery on the rotated integers. The rotation scales all norms
    by sqrt(dim) uniformly, so ADC ranking is unaffected and the
    exact re-rank uses the ORIGINAL vectors. Fully SQL-replayable:
    the sign matrix is bit_count(i & j) parity."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType, LongType

    if train_data is None:
        train_data = _train_vectors_by_id(
            corpus, vec_col, id_col, train_sample
        )
    ids, X = train_data
    if dim is None:
        dim = X.shape[1]
    elif dim != X.shape[1]:
        raise ValueError(
            f"dim={dim} but corpus vectors have {X.shape[1]} elements"
        )
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    H = _hadamard_signs(dim)

    def rot_shifted(batch: np.ndarray) -> np.ndarray:
        qs = np.floor(
            _unit_seq_np(batch) * _HADAMARD_ROT_SCALE
        ).astype(np.int64)
        return _int_matmul(qs, H) + _HADAMARD_ROT_SHIFT

    R = rot_shifted(X)
    pooled = R.reshape(len(R) * m, sub)
    keys = [
        (_md5_h60_py(f"hpq:{int(i)}:{s}"), int(i) * m + s)
        for i in ids
        for s in range(m)
    ]
    CB = _kmeans_int(pooled, keys, codebook_size, max_iter)
    CBs = CB - _HADAMARD_ROT_SHIFT

    @pandas_udf(ArrayType(IntegerType()))
    def codes(vectors: pd.Series) -> pd.Series:
        r = rot_shifted(_stack_np(vectors))
        lab = _int_sq_dists(r.reshape(-1, sub), CB).argmin(axis=1)
        return pd.Series(list(lab.reshape(-1, m).astype(np.int32)))

    @pandas_udf(ArrayType(LongType()))
    def lut(vectors: pd.Series) -> pd.Series:
        rs = rot_shifted(_stack_np(vectors)) - _HADAMARD_ROT_SHIFT
        out = _int_matmul(rs.reshape(len(rs), m, sub), CBs.T)
        return pd.Series(list(out.reshape(len(rs), -1)))

    def adc_score(codes_col, lut_colname):
        terms = [
            F.element_at(
                F.col(lut_colname),
                F.lit(j * codebook_size + 1) + F.element_at(codes_col, j + 1),
            )
            for j in range(m)
        ]
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        return total

    return CB, codes, lut, adc_score, None


def _int_matmul(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Exact integer matmul through float64 BLAS when the operands
    allow (same 2^53 bound discipline as :func:`_int_sq_dists`)."""
    if A.size and B.size:
        hi = max(
            int(np.abs(A).max(initial=0)), int(np.abs(B).max(initial=0))
        )
        if hi * hi * A.shape[-1] < (1 << 53):
            return np.rint(
                A.astype(np.float64) @ B.astype(np.float64)
            ).astype(np.int64)
    return A @ B


def _opq_rotation(train_X: np.ndarray, m: int) -> np.ndarray:
    """OPQ-style orthonormal rotation (Ge et al. 2013, the
    eigenvalue-allocation variant): PCA-decorrelate the (normalized)
    training sample, then GREEDILY deal the principal directions to
    the ``m`` subspaces so each subspace's eigenvalue PRODUCT stays
    balanced — product quantization splits the vector into blind
    slices, and on anisotropic data the raw slicing gives a few
    subspaces all the variance (codebooks there saturate while the
    rest encode noise). The rotation is orthonormal, so cosine/L2
    geometry — and the exact re-rank — are untouched; only the code
    assignment improves. Returns R with the convention
    ``rotated = x @ R`` (columns are the permuted eigenvectors)."""
    X = _unit_np(np.asarray(train_X, dtype=np.float64))
    d = X.shape[1]
    assert d % m == 0
    sub = d // m
    mean = X.mean(axis=0)
    cov = (X - mean).T @ (X - mean) / max(1, len(X))
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(evals)[::-1]
    evals = np.clip(evals[order], 0.0, None)
    evecs = evecs[:, order]
    # eigenvalue allocation as LPT scheduling on log-eigenvalues:
    # balancing per-subspace PRODUCTS = balancing SUMS of log λ. The
    # logs are negative (unit-normalized data ⇒ λ < 1), so the naive
    # "give the next eigen-dim to the smallest-product bucket" greedy
    # degenerates (whichever bucket receives the first factor has the
    # smallest product forever — identity allocation). LPT on the
    # magnitudes is the classic fix: place the most extreme log first,
    # each into the non-full bucket whose running sum is currently
    # LARGEST (least negative), which equalizes the final sums.
    logs = np.log(np.maximum(evals, 1e-12))
    totals = np.zeros(m)
    counts = np.zeros(m, dtype=int)
    slots: list[list[int]] = [[] for _ in range(m)]
    for i in sorted(range(d), key=lambda i: logs[i]):
        j = max(
            (jj for jj in range(m) if counts[jj] < sub),
            key=lambda jj: totals[jj],
        )
        slots[j].append(i)
        totals[j] += logs[i]
        counts[j] += 1
    perm = [i for block in slots for i in block]
    return np.ascontiguousarray(evecs[:, perm])


def _pq_codes_udf(
    codebook: np.ndarray, m: int, sub: int, R: np.ndarray | None = None
):
    """Arrow-batched PQ encode: unit-normalize, (optionally) rotate,
    slice into ``m`` subvectors, argmin against the closure codebook —
    one (n·m, sub) @ (sub, k) matmul per batch (the sanctioned
    pandas-UDF case, same rationale as
    :func:`_all_bucket_signatures`)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    C = np.asarray(codebook, dtype=np.float64)

    @pandas_udf(ArrayType(IntegerType()))
    def codes(vectors: pd.Series) -> pd.Series:
        X = _unit_np(_stack_np(vectors))
        if R is not None:
            X = X @ R
        lab = _sq_dists_np(X.reshape(-1, sub), C).argmin(axis=1)
        return pd.Series(list(lab.reshape(-1, m).astype(np.int32)))

    return codes


def _pq_lut_udf(
    codebook: np.ndarray, m: int, sub: int, R: np.ndarray | None = None
):
    """Arrow-batched ADC lookup table: for each query, the dot of every
    (rotated) subvector slice with every codebook entry — flattened
    (m·k,) so a candidate's score is ``m`` element_at adds."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    C = np.asarray(codebook, dtype=np.float64)

    @pandas_udf(ArrayType(DoubleType()))
    def lut(vectors: pd.Series) -> pd.Series:
        X = _unit_np(_stack_np(vectors))
        if R is not None:
            X = X @ R
        out = (X.reshape(len(X), m, sub) @ C.T).reshape(len(X), -1)
        return pd.Series(list(out))

    return lut


def _ivf_cell_udf(centroids: np.ndarray, normalize: bool):
    """Arrow-batched IVF cell assignment: argmin distance to the
    closure centroids — the corpus-side replacement for a per-row
    nested-lambda argmin expression (interpreted, ~µs/element) with
    one matmul per batch."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    G = np.asarray(centroids, dtype=np.float64)

    @pandas_udf(IntegerType())
    def cell(vectors: pd.Series) -> pd.Series:
        X = _stack_np(vectors)
        if normalize:
            X = _unit_np(X)
        return pd.Series(_sq_dists_np(X, G).argmin(axis=1).astype(np.int32))

    return cell


def _sqdist_lit(vec, center) -> "F.Column":
    """Squared L2 distance from an array column to a literal centroid
    (constant-folded weights, JVM execution, no UDF)."""
    return F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(float(w)) for w in center]),
            lambda x, w: (x.cast("double") - w) * (x.cast("double") - w),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _probe_cells_col(vec, centroids: list[list[float]], nprobe: int):
    """The query side of IVF: the ``nprobe`` nearest cell ids as an
    array column ((dist, cell) structs → array_sort orders by first
    field → slice → project the cell). Ties order by cell asc (struct
    comparison falls through to the second field)."""
    cells = F.array(
        *[
            F.struct(_sqdist_lit(vec, c).alias("d"), F.lit(i).alias("cell"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(F.slice(F.array_sort(cells), 1, nprobe), lambda s: s.cell)


#: above this many embedded literals (num_centroids × dim), the probe
#: expression tree itself becomes the bottleneck (Catalyst analysis +
#: interpreted eval scale with tree size) — switch to the Arrow probe
_PROBE_LITERAL_CAP = 4096


def _ivf_probe_udf(centroids: np.ndarray, nprobe: int, normalize: bool):
    """Arrow-batched probe for large centroid tables: nprobe nearest
    cells per query via one matmul + stable argsort (ties order by
    cell asc — same contract as :func:`_probe_cells_col`)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    G = np.asarray(centroids, dtype=np.float64)

    @pandas_udf(ArrayType(IntegerType()))
    def probe(vectors: pd.Series) -> pd.Series:
        X = _stack_np(vectors)
        if normalize:
            X = _unit_np(X)
        order = np.argsort(_sq_dists_np(X, G), axis=1, kind="stable")
        return pd.Series(list(order[:, :nprobe].astype(np.int32)))

    return probe


def _probe_cells(vec, centers: np.ndarray, nprobe: int, normalize: bool):
    """Adaptive IVF probe: the literal JVM expression for small
    centroid tables (no Python worker round-trip for a tiny query
    side), the Arrow matmul above :data:`_PROBE_LITERAL_CAP`. The
    caller passes the RAW vector column; normalization (when the cell
    geometry is unit-space) happens inside either branch."""
    if centers.size <= _PROBE_LITERAL_CAP:
        if normalize:
            n = _norm(vec)
            vec = F.transform(
                vec,
                lambda x: F.when(n > 0, x.cast("double") / n).otherwise(0.0),
            )
        return _probe_cells_col(vec, centers.tolist(), nprobe)
    return _ivf_probe_udf(centers, nprobe, normalize)(vec)


def _hyperplanes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(num_planes, dim).tolist()


#: fixed-point scale for md5-mode signatures: quantizing each
#: coordinate with ONE IEEE multiply + floor makes every plane dot an
#: exact int64 sum — order-independent, so numpy matmul here equals
#: DuckDB's list fold bit-for-bit (the round-10 md5-60 MinHash trick,
#: extended to float-embedding LSH)
_MD5_PLANE_SCALE = float(1 << 20)


def _md5_sign_planes(num_planes: int, dim: int) -> "np.ndarray":
    """±1 hyperplane entries from md5 bit parity: entry (p, j) is +1
    iff the first hex digit of md5('hp:p:j') is odd. Rademacher
    planes are a standard SimHash choice (Charikar 2002 needs only a
    sign-symmetric distribution, and Achlioptas 2001 shows ±1
    projections preserve angles like Gaussians); deriving them from
    md5 makes the SQL oracle reproduce the exact matrix."""
    import hashlib

    signs = np.empty((num_planes, dim), dtype=np.int64)
    for p in range(num_planes):
        for j in range(dim):
            digit = hashlib.md5(f"hp:{p}:{j}".encode()).hexdigest()[0]
            signs[p, j] = 1 if int(digit, 16) % 2 else -1
    return signs


def _md5_bucket_signatures(
    num_tables: int, planes_per_table: int, dim: int
):
    """Integer-exact twin of :func:`_all_bucket_signatures` (md5
    mode): coordinates quantized to fixed-point int64, dots an int64
    matmul against the ±1 plane matrix (associative — no float
    order hazard), bucket = Σ 2^i·(dot_i > 0) per table. Every step
    is replayable in ANSI SQL, which is what moves the float-LSH
    queries from rows-only to hash-oracled."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    signs = _md5_sign_planes(num_tables * planes_per_table, dim)
    weights = (2 ** np.arange(planes_per_table)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def buckets(vectors: pd.Series) -> pd.Series:
        stacked = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in vectors]
        )
        q = np.floor(stacked * _MD5_PLANE_SCALE).astype(np.int64)
        bits = (q @ signs.T) > 0  # (n, T*r), exact integer dots
        per_table = [
            bits[:, t * planes_per_table : (t + 1) * planes_per_table]
            @ weights
            for t in range(num_tables)
        ]
        return pd.Series(list(np.stack(per_table, axis=1)))

    return buckets


def lsh_bucket_column(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id: bit i = 1 iff dot(v, plane_i) > 0.

    The dot products are literal-weighted sums over the array column —
    constant-folded plane values, JVM execution, no UDF."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def _all_bucket_signatures(
    planes: list[list[float]], num_tables: int, planes_per_table: int
):
    """Vectorized all-tables signature column: one Arrow-batched numpy
    matmul computes every table's bucket per vector.

    The pure-expression alternative (:func:`lsh_bucket_column` per
    table) is JVM-side but codegens num_tables × planes_per_table
    chained lambda folds — measured ~7s of fixed plan/compile cost at
    40 planes regardless of data size. One (n,dim)@(dim,planes) matmul
    per batch is the right shape at every scale; this is the sanctioned
    pandas-UDF case (built-ins express it, but pathologically)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    plane_matrix = np.asarray(planes, dtype=np.float64)  # (T*r, dim)
    weights = (2 ** np.arange(planes_per_table)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def buckets(vectors: pd.Series) -> pd.Series:
        stacked = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in vectors]
        )  # (n, dim)
        signs = (stacked @ plane_matrix.T) > 0  # (n, T*r)
        per_table = [
            signs[:, t * planes_per_table : (t + 1) * planes_per_table] @ weights
            for t in range(num_tables)
        ]
        return pd.Series(list(np.stack(per_table, axis=1)))

    return buckets


def lsh_table_buckets(
    df: DataFrame,
    id_alias: str,
    vec_col: str,
    planes: list[list[float]],
    num_tables: int,
    planes_per_table: int,
    spread: bool = True,
    signature=None,
) -> DataFrame:
    """(id, vec, table, bucket) rows — one row per LSH table.

    Multi-table construction: each table uses its own slice of
    hyperplanes; a pair is a candidate if it collides in ANY table.
    Recall per table p^r compounds to 1-(1-p^r)^L overall.

    ``spread=False`` skips the narrow-input repartition — pass it for
    the query side of a top-k search, which is tiny by construction
    and about to be broadcast anyway; paying a shuffle plus a 32-batch
    Arrow stage to fan out 20 rows costs more than the matmul saves.

    ``signature`` overrides the bucket UDF (the md5-mode integer
    signatures pass theirs; default = Gaussian-plane matmul).
    """
    from .text import spread_small_input

    if signature is None:
        signature = _all_bucket_signatures(planes, num_tables, planes_per_table)
    # spread narrow inputs so the Arrow signature batches use every
    # core (a single parquet file otherwise pins the matmul to one)
    if spread:
        df = spread_small_input(df)
    # posexplode_outer + post-explode null filter: the non-outer form
    # plants an implicit size>0 predicate on the UDF column, which
    # ExtractPythonUDFs splits into TWO ArrowEvalPython stages — the
    # signature batch ran twice per vector. Filtering the GENERATED
    # column keeps one Python pass with identical semantics (outer
    # rows from empty/NULL signatures carry NULL table/bucket).
    return (
        df.select(
            F.col(id_alias),
            F.col(vec_col),
            F.posexplode_outer(signature(F.col(vec_col))).alias(
                "table", "bucket"
            ),
        )
        .where(F.col("bucket").isNotNull())
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    max_iter: int = 5,
    train_sample: int = 1 << 16,
    quant_mode: str = "float",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means partitions the
    corpus into cells; each query probes its ``nprobe`` nearest cells
    and brute-forces only within them.

    The scale shape: centroids are trained on a bounded driver-side
    sample (:func:`_train_vectors` — quantizer geometry converges long
    before the corpus is exhausted; training distributed pays
    per-iteration scheduling that dwarfs the math) and folded into the
    plan as literals; the corpus is scanned ONCE, assigning each vector
    its cell with a closed-form argmin — no ML model state on
    executors, ever. Per query the candidate set shrinks by
    ~nprobe/num_centroids. Seeded k-means keeps runs reproducible.

    ``quant_mode='md5'`` (round 12): md5-seeded FIXED-POINT integer
    k-means (:func:`_kmeans_int`) — training, cell assignment, and
    probes become engine-exact integer relations a SQL oracle replays
    (``seed`` is ignored; the md5 init is the seed); 'float' stays
    the throughput default."""
    from .text import spread_small_input

    if quant_mode == "md5":
        ids, X = _train_vectors_by_id(
            corpus, vec_col, id_col, train_sample
        )
        keys = [(_md5_h60_py(f"km:{i}"), int(i)) for i in ids]
        centers = _kmeans_int(
            _quantize_np(X), keys, num_centroids, max_iter
        )
        cell_udf = _ivf_cell_int_udf(centers, normalize=False)
    elif quant_mode == "float":
        centers = _kmeans_np(
            _train_vectors(corpus, vec_col, train_sample),
            num_centroids,
            seed,
            max_iter,
        )
        cell_udf = _ivf_cell_udf(centers, normalize=False)
    else:
        raise ValueError(f"unknown quant_mode {quant_mode!r}")
    # spread narrow inputs so the Arrow cell-assign batches use every
    # core (same rationale as lsh_table_buckets)
    assigned = spread_small_input(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
    ).select(
        "neighbor_id",
        "cv",
        # coalesce makes the join key non-nullable (the UDF never
        # returns null — argmin is total): without it Spark inserts an
        # isnotnull(cell) filter under the join whose UDF extraction
        # runs the cell assignment TWICE (two stacked ArrowEvalPython
        # stages over the full corpus); plan pinned in
        # tests/test_plan_quality.py
        F.coalesce(cell_udf(F.col("cv")), F.lit(-1)).alias("cell"),
    )
    if quant_mode == "md5":
        probe_col = _ivf_probe_int_udf(centers, nprobe, normalize=False)(
            F.col("qv")
        )
    else:
        probe_col = _probe_cells(
            F.col("qv"), centers, nprobe, normalize=False
        )
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .select(
            "query_id",
            "qv",
            F.explode(probe_col).alias("cell"),
        )
    )
    qn = with_norm(probes, "qv").withColumnRenamed("_norm", "qn")
    cn = with_norm(assigned, "cv").withColumnRenamed("_norm", "cn")
    pairs = (
        cn.join(F.broadcast(qn), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def _resolve_planes(
    plane_mode: str,
    num_tables: int,
    planes_per_table: int,
    dim: int,
    seed: int,
):
    """(planes, signature_udf) for a plane mode: 'gaussian' = float
    planes + BLAS matmul signatures (throughput default), 'md5' =
    ±1 planes + integer-exact signatures (oracle-replayable)."""
    if plane_mode == "gaussian":
        return _hyperplanes(num_tables * planes_per_table, dim, seed), None
    if plane_mode == "md5":
        return None, _md5_bucket_signatures(num_tables, planes_per_table, dim)
    raise ValueError(f"unknown plane_mode {plane_mode!r}")


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_tables: int = 8,
    planes_per_table: int = 5,
    dim: int = 64,
    seed: int = 42,
    plane_mode: str = "gaussian",
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH generates
    candidates (union over tables), exact cosine re-ranks them.

    Recall < 1 by design — tune num_tables/planes_per_table for the
    corpus's similarity profile (more tables → recall↑ candidates↑).
    At 100 TB the (table, bucket) join replaces the full corpus scan
    per query; buckets partition evenly because hyperplane signs are
    balanced. ``plane_mode='md5'``: integer-exact ±1 signatures a SQL
    oracle replays (see :func:`_md5_bucket_signatures`)."""
    planes, signature = _resolve_planes(
        plane_mode, num_tables, planes_per_table, dim, seed
    )
    q = lsh_table_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id",
        "qv",
        planes,
        num_tables,
        planes_per_table,
        spread=False,
        signature=signature,
    )
    c = lsh_table_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "neighbor_id",
        "cv",
        planes,
        num_tables,
        planes_per_table,
        signature=signature,
    )
    qn = with_norm(q, "qv").withColumnRenamed("_norm", "qn")
    cn = with_norm(c, "cv").withColumnRenamed("_norm", "cn")
    # cosine is computed per COLLISION row (before dedup): a pair
    # colliding in several tables computes the same dot a few extra
    # times (64 mults each — trivial), but the multi-table dedup then
    # shuffles only (query_id, neighbor_id, cosine) — 24 bytes/row —
    # instead of two 64-dim vectors (~1 KB/row). max() is an exact
    # dedup because duplicate rows carry identical cosines.
    pairs = (
        cn.join(F.broadcast(qn), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def _pq_context(
    corpus: DataFrame,
    vec_col: str,
    m: int,
    codebook_size: int,
    seed: int,
    max_iter: int,
    dim: int | None = None,
    train_sample: int = 1 << 16,
    train_X: np.ndarray | None = None,
    rotate: bool = False,
):
    """Train the shared PQ codebook and return the column builders the
    PQ variants compose: ``codes_udf`` (Arrow-batched argmin encode),
    ``lut_udf`` (per-query lookup table), ``adc_score`` (sum of ``m``
    LUT lookups for a (codes, lut) pair — a static, lambda-free
    expression that participates in whole-stage codegen).

    The codebook is fit driver-side on a bounded sample
    (:func:`_train_vectors`, or a caller-provided ``train_X`` to share
    one collect across quantizers) — one small job instead of an MLlib
    fit whose per-iteration scheduling cost dwarfs the math. ``dim``
    defaults to the sample's width; pass it to assert an expectation.

    Encode and LUT are pandas UDFs, not higher-order-function
    expressions, for the same measured reason as
    :func:`_all_bucket_signatures`: the pure-expression encode is
    m × codebook_size nested lambda folds evaluated interpreted per
    row (plus a per-element norm recompute inside the normalize
    lambda) — ~15 s for 2k × 64-dim vectors vs milliseconds for one
    (n·m, sub) @ (sub, k) matmul per Arrow batch. The codebook rides
    the closure (a few KB), not a crossJoined relation."""
    if train_X is None:
        # an empty corpus raises _train_vectors' ValueError directly
        train_X = _train_vectors(corpus, vec_col, train_sample)
    if dim is None:
        dim = train_X.shape[1]
    elif dim != train_X.shape[1]:
        raise ValueError(
            f"dim={dim} but corpus vectors have {train_X.shape[1]} elements"
        )
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m

    # ONE shared-codebook fit over all pooled m·n subvector slices of
    # the (unit-normalized) training sample; reshape(-1, sub) lays the
    # m slices of each row out consecutively — same pooling an
    # explode would produce. Cap the pooled set so the Lloyd distance
    # matrix stays small even at the full train_sample.
    # optional OPQ rotation (``rotate=True``): decorrelate + balance
    # variance across the m subspaces BEFORE pooling, so the shared
    # codebook trains on the same geometry the encode path will see
    # fully deterministic from the training sample (mean/cov/eigh +
    # greedy allocation) — deliberately NOT seed-controlled
    R = _opq_rotation(train_X, m) if rotate else None
    rotated = _unit_np(train_X) @ R if R is not None else _unit_np(train_X)
    pooled = rotated.reshape(-1, sub)
    pool_cap = 1 << 17
    if len(pooled) > pool_cap:
        idx = np.random.RandomState(seed).choice(
            len(pooled), size=pool_cap, replace=False
        )
        pooled = pooled[idx]
    codebook = _kmeans_np(pooled, codebook_size, seed, max_iter)
    codes_udf = _pq_codes_udf(codebook, m, sub, R)
    lut_udf = _pq_lut_udf(codebook, m, sub, R)

    def adc_score(codes_col, lut_colname):
        # unrolled, lambda-free: m element_at adds — whole-stage
        # codegen keeps the per-pair hot loop JVM-compiled (this runs
        # once per candidate pair, the widest relation in the plan)
        terms = [
            F.element_at(
                F.col(lut_colname),
                F.lit(j * codebook_size + 1) + F.element_at(codes_col, j + 1),
            )
            for j in range(m)
        ]
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        return total

    return codebook, codes_udf, lut_udf, adc_score, R


def _adc_shortlist_rerank(
    pairs: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    shortlist_factor: int,
) -> DataFrame:
    """Standard PQ second stage: the quantized ADC score only
    SHORTLISTS (``k × shortlist_factor`` per query); exact cosine
    re-ranks the shortlist — quantization noise decides nothing final,
    and the exact math runs on k×factor rows per query, not the
    corpus. ``pairs`` must carry (query_id, neighbor_id, adc_score)."""
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    short = (
        pairs.withColumn("_arank", F.row_number().over(w_adc))
        .filter(F.col("_arank") <= k * shortlist_factor)
        .select("query_id", "neighbor_id")
    )
    cn = with_norm(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        ),
        "cv",
    ).withColumnRenamed("_norm", "cn")
    qn = with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        "qv",
    ).withColumnRenamed("_norm", "qn")
    reranked = (
        # the shortlist is queries × k × factor rows — broadcast it so
        # the corpus re-read streams map-side instead of sort-merging
        # (AQE would usually rescue this, but the initial plan should
        # already be right)
        cn.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qn), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 4).alias("cosine"),
            "rank",
        )
    )


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    codebook_size: int = 64,
    seed: int = 42,
    max_iter: int = 5,
    shortlist_factor: int = 10,
    dim: int | None = None,
    train_sample: int = 1 << 16,
    rotate: bool = False,
    quant_mode: str = "float",
) -> DataFrame:
    """Product-quantization ANN with ADC (asymmetric distance
    computation) scoring: the corpus is stored as ``m`` small codes
    per vector instead of ``d`` floats, each query scores a candidate
    with ``m`` lookup-table adds instead of ``d`` multiplies, and the
    quantized score shortlists ``k × shortlist_factor`` candidates
    that exact cosine re-ranks (quantization noise never decides the
    final ranking).

    Spark-first construction, no ML-model state on executors: one
    shared-codebook k-means over all pooled subvector slices of a
    bounded driver-side sample (a single fit instead of ``m`` — a
    standard PQ simplification; see :func:`_train_vectors`); the
    codebook rides the UDF closure (a few KB); encode/LUT are
    Arrow-batched matmuls and the per-pair ADC score is a lambda-free
    codegen-able sum — no ML model call at scoring time, no per-row
    Python in the pair loop. The 100 TB win: the
    corpus side of the score join carries 8-byte code arrays, not
    256-byte float vectors (codes for 1e9×64-dim fit in ~8 GB).

    Brute ADC over all (query, candidate) pairs — see
    :func:`cosine_topk_ivfpq` for the cell-pruned composition.
    Approximate by design (rows-only; recall floor pinned in
    tests/test_llm_similarity.py).
    """
    from .text import spread_small_input

    if quant_mode == "md5":
        # rotate in md5 mode = the Hadamard structured rotation (the
        # integer-exact answer to OPQ's libm eigendecomposition)
        ctx = _hpq_int_context if rotate else _pq_int_context
        _, codes_udf, lut_udf, adc_score, _R = ctx(
            corpus, vec_col, id_col, m, codebook_size, max_iter,
            dim=dim, train_sample=train_sample,
        )
    elif quant_mode == "float":
        _, codes_udf, lut_udf, adc_score, _R = _pq_context(
            corpus, vec_col, m, codebook_size, seed, max_iter, dim=dim,
            train_sample=train_sample, rotate=rotate,
        )
    else:
        raise ValueError(f"unknown quant_mode {quant_mode!r}")
    coded = spread_small_input(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
    ).select("neighbor_id", codes_udf(F.col("cv")).alias("codes"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        lut_udf(F.col(vec_col)).alias("lut"),
    )
    pairs = (
        coded.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            adc_score(F.col("codes"), "lut").alias("adc_score"),
        )
    )
    return _adc_shortlist_rerank(
        pairs, corpus, queries, vec_col, id_col, k, shortlist_factor
    )


def cosine_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    codebook_size: int = 64,
    seed: int = 42,
    max_iter: int = 5,
    shortlist_factor: int = 10,
    dim: int | None = None,
    train_sample: int = 1 << 16,
    rotate: bool = False,
    quant_mode: str = "float",
) -> DataFrame:
    """IVF + PQ — the canonical billion-scale ANN pipeline, composed
    from this module's two halves:

    - **IVF prunes compute**: k-means cells partition the corpus; each
      query probes only its ``nprobe`` nearest cells, so the candidate
      join is an EQUI-join on ``cell`` (a plain shuffled/broadcast
      hash join) touching ~``nprobe/num_centroids`` of the corpus —
      never an all-pairs scan;
    - **PQ prunes memory**: within probed cells, candidates are scored
      by ADC over 8-byte code arrays, not 256-byte float vectors;
    - **exact re-rank**: the quantized score shortlists
      ``k × shortlist_factor``; exact cosine decides the final top-k.

    Cell centroids and the PQ codebook are both trained driver-side on
    one shared bounded sample (:func:`_train_vectors` — collected
    once, fed to both quantizers) and folded into the plan — the
    scoring join has no ML state, no Python, no UDFs; the corpus is
    scanned ONCE, producing (cell, codes) per vector. Approximate by
    design (recall floor pinned in tests/test_llm_similarity.py);
    recall knobs: ``nprobe`` (cell coverage) × ``shortlist_factor``
    (rank depth).
    """
    from .text import spread_small_input

    if quant_mode == "md5":
        if rotate:
            raise ValueError("rotate (OPQ) has no md5-int mode — eigh is libm")
        ids, X = _train_vectors_by_id(
            corpus, vec_col, id_col, train_sample
        )
        _, codes_udf, lut_udf, adc_score, _R = _pq_int_context(
            corpus, vec_col, id_col, m, codebook_size, max_iter,
            dim=dim, train_sample=train_sample, train_data=(ids, X),
        )
        # IVF cells on the QUANTIZED unit vectors (cosine geometry,
        # integer Lloyd — same grid as the PQ codebook)
        keys = [(_md5_h60_py(f"km:{int(i)}"), int(i)) for i in ids]
        centers = _kmeans_int(
            _quantize_np(_unit_seq_np(X)), keys, num_centroids, max_iter
        )
        cell_udf = _ivf_cell_int_udf(centers, normalize=True)
    elif quant_mode == "float":
        train_X = _train_vectors(corpus, vec_col, train_sample)
        _, codes_udf, lut_udf, adc_score, _R = _pq_context(
            corpus, vec_col, m, codebook_size, seed, max_iter, dim=dim,
            train_X=train_X, rotate=rotate,
        )

        # IVF cells on the unit vectors (cosine geometry)
        centers = _kmeans_np(
            _unit_np(train_X), num_centroids, seed, max_iter
        )
        cell_udf = _ivf_cell_udf(centers, normalize=True)
    else:
        raise ValueError(f"unknown quant_mode {quant_mode!r}")

    # corpus side: Arrow-batched cell assignment + PQ codes in ONE pass
    # over the corpus (both UDFs run in the same ArrowEvalPython stage)
    coded = spread_small_input(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
    ).select(
        "neighbor_id",
        # non-nullable join key — see cosine_topk_ivf: keeps both UDFs
        # in ONE ArrowEvalPython stage instead of an extra full-corpus
        # cell pass under the join's null filter
        F.coalesce(cell_udf(F.col("cv")), F.lit(-1)).alias("cell"),
        codes_udf(F.col("cv")).alias("codes"),
    )

    # query side: nprobe nearest cells (adaptive probe in unit space —
    # cell geometry is cosine) + the ADC LUT, in one pass
    if quant_mode == "md5":
        probe_col = _ivf_probe_int_udf(centers, nprobe, normalize=True)(
            F.col("qv")
        )
    else:
        probe_col = _probe_cells(
            F.col("qv"), centers, nprobe, normalize=True
        )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
        .select(
            "query_id",
            lut_udf(F.col("qv")).alias("lut"),
            F.explode(probe_col).alias("cell"),
        )
    )
    pairs = (
        coded.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            adc_score(F.col("codes"), "lut").alias("adc_score"),
        )
    )
    return _adc_shortlist_rerank(
        pairs, corpus, queries, vec_col, id_col, k, shortlist_factor
    )
