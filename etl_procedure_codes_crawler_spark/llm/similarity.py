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


def similar_pairs_bruteforce(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All corpus pairs with cosine >= threshold (embedding-cosine
    near-dup detection). Exact baseline — use the LSH variant to
    pre-filter at scale."""
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
        .select("vec_a", "vec_b", F.round("cosine", 4).alias("cosine"))
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
) -> DataFrame:
    """Embedding near-dup pair mining at scale: LSH buckets generate
    candidates (self-join within (table, bucket) — quadratic only
    inside a bucket), exact cosine verifies. The scale path for
    :func:`similar_pairs_bruteforce`'s O(n²) scan; recall < 1 by
    design, tunable via num_tables."""
    planes = _hyperplanes(num_tables * planes_per_table, dim, seed)
    b = lsh_table_buckets(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        "id",
        "v",
        planes,
        num_tables,
        planes_per_table,
    )
    bn = with_norm(b, "v")
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


def _hyperplanes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(num_planes, dim).tolist()


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
) -> DataFrame:
    """(id, vec, table, bucket) rows — one row per LSH table.

    Multi-table construction: each table uses its own slice of
    hyperplanes; a pair is a candidate if it collides in ANY table.
    Recall per table p^r compounds to 1-(1-p^r)^L overall.

    ``spread=False`` skips the narrow-input repartition — pass it for
    the query side of a top-k search, which is tiny by construction
    and about to be broadcast anyway; paying a shuffle plus a 32-batch
    Arrow stage to fan out 20 rows costs more than the matmul saves.
    """
    from .text import spread_small_input

    signature = _all_bucket_signatures(planes, num_tables, planes_per_table)
    # spread narrow inputs so the Arrow signature batches use every
    # core (a single parquet file otherwise pins the matmul to one)
    if spread:
        df = spread_small_input(df)
    return df.select(
        F.col(id_alias),
        F.col(vec_col),
        F.posexplode(signature(F.col(vec_col))).alias("table", "bucket"),
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
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means partitions the
    corpus into cells; each query probes its ``nprobe`` nearest cells
    and brute-forces only within them.

    The scale shape: the corpus is scanned once to train + assign
    (both distributed); per query the candidate set shrinks by
    ~num_centroids/nprobe. Centroids are driver-side literals folded
    into the probe expression — no model state on executors at query
    time. Seeded k-means keeps runs reproducible."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    # random init, not k-means||: the parallel init runs several extra
    # distributed passes to pick spread-out seeds — worth it for a
    # final clustering, not for IVF cells, which only need to be
    # balanced-ish (recall is governed by nprobe, and the floor is
    # pinned in tests/test_llm_similarity.py). Cuts fit time ~3×.
    model = KMeans(
        k=num_centroids, seed=seed, maxIter=max_iter, initMode="random"
    ).fit(train)
    assigned = model.transform(train).select(
        "neighbor_id", "cv", F.col("prediction").alias("cell")
    )
    centroids = [c.tolist() for c in model.clusterCenters()]

    def _sqdist(vec, center: list[float]):
        return F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in center]),
                lambda x, w: (x.cast("double") - w) * (x.cast("double") - w),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # per query: (dist, cell) structs → sort (orders by first field) →
    # first nprobe cells → explode into probe rows
    cells = F.array(
        *[
            F.struct(
                _sqdist(F.col("qv"), center).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, center in enumerate(centroids)
        ]
    )
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .select(
            "query_id",
            "qv",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(cells), 1, nprobe), lambda s: s.cell
                )
            ).alias("cell"),
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
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH generates
    candidates (union over tables), exact cosine re-ranks them.

    Recall < 1 by design — tune num_tables/planes_per_table for the
    corpus's similarity profile (more tables → recall↑ candidates↑).
    At 100 TB the (table, bucket) join replaces the full corpus scan
    per query; buckets partition evenly because hyperplane signs are
    balanced."""
    planes = _hyperplanes(num_tables * planes_per_table, dim, seed)
    q = lsh_table_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id",
        "qv",
        planes,
        num_tables,
        planes_per_table,
        spread=False,
    )
    c = lsh_table_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "neighbor_id",
        "cv",
        planes,
        num_tables,
        planes_per_table,
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
):
    """Train the shared PQ codebook and return the column builders the
    PQ variants compose: ``unit`` (L2-normalize), ``slices`` (split
    into ``m`` subvectors), ``code_col`` (closed-form argmin encode —
    requires the ``cb`` column from :return:`cb` in scope),
    ``lut_col`` (per-query lookup table), ``adc_score`` (sum of
    ``m`` LUT lookups for a (codes, lut) pair).

    Pass ``dim`` explicitly (array columns don't carry a length in the
    schema) to avoid the fallback, which launches one extra Spark job
    just to read a row."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    if dim is None:
        probe = corpus.select(vec_col).first()
        if probe is None or probe[0] is None:
            raise ValueError(
                f"cannot infer embedding dim from an empty corpus; pass "
                f"dim= explicitly (corpus column: {vec_col!r})"
            )
        dim = len(probe[0])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m

    def unit(v):
        n = _norm(v)
        return F.transform(
            v, lambda x: F.when(n > 0, x.cast("double") / n).otherwise(0.0)
        )

    def slices(v):
        return F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.slice(v, j * sub + 1, sub),
        )

    # ONE shared-codebook fit over all pooled m·n subvector slices
    pooled = corpus.select(
        F.explode(slices(unit(F.col(vec_col)))).alias("s")
    ).select(array_to_vector("s").alias("features"))
    model = KMeans(
        k=codebook_size, seed=seed, maxIter=max_iter, initMode="random"
    ).fit(pooled)
    cb_rows = [[float(x) for x in c] for c in model.clusterCenters()]
    cb = F.broadcast(
        spark.createDataFrame([(cb_rows,)], "cb array<array<double>>")
    )

    def _sqdist(s, c):
        return F.aggregate(
            F.zip_with(s, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def code_col(s):
        dists = F.transform(F.col("cb"), lambda c: _sqdist(s, c))
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    def lut_col(slices_col):
        return F.flatten(
            F.transform(
                slices_col,
                lambda s: F.transform(F.col("cb"), lambda c: _dot(s, c)),
            )
        )

    def adc_score(codes_col, lut_colname):
        return F.aggregate(
            F.zip_with(
                codes_col,
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda c, j: F.element_at(
                    F.col(lut_colname), (j * codebook_size + c + 1).cast("int")
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return cb, unit, slices, code_col, lut_col, adc_score


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
        short.join(cn, "neighbor_id")
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
) -> DataFrame:
    """Product-quantization ANN with ADC (asymmetric distance
    computation) scoring: the corpus is stored as ``m`` small codes
    per vector instead of ``d`` floats, each query scores a candidate
    with ``m`` lookup-table adds instead of ``d`` multiplies, and the
    quantized score shortlists ``k × shortlist_factor`` candidates
    that exact cosine re-ranks (quantization noise never decides the
    final ranking).

    Spark-first construction, no state on executors: one
    shared-codebook k-means over all pooled subvector slices (a single
    distributed fit instead of ``m`` — a standard PQ simplification);
    the codebook rides the plan as a broadcast single-row relation;
    encoding is a closed-form argmin in JVM higher-order functions —
    no ML model call at scoring time, no Python. The 100 TB win: the
    corpus side of the score join carries 8-byte code arrays, not
    256-byte float vectors (codes for 1e9×64-dim fit in ~8 GB).

    Brute ADC over all (query, candidate) pairs — see
    :func:`cosine_topk_ivfpq` for the cell-pruned composition.
    Approximate by design (rows-only; recall floor pinned in
    tests/test_llm_similarity.py).
    """
    cb, unit, slices, code_col, lut_col, adc_score = _pq_context(
        corpus, vec_col, m, codebook_size, seed, max_iter, dim=dim
    )
    coded = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            slices(unit(F.col(vec_col))).alias("_sl"),
        )
        .crossJoin(cb)
        .select("neighbor_id", F.transform(F.col("_sl"), code_col).alias("codes"))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            slices(unit(F.col(vec_col))).alias("_sl"),
        )
        .crossJoin(cb)
        .select("query_id", lut_col(F.col("_sl")).alias("lut"))
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

    Cell centroids and the PQ codebook are both trained distributed
    (seeded, deterministic) and folded into the plan — the scoring
    join has no ML state, no Python, no UDFs. Approximate by design
    (recall floor pinned in tests/test_llm_similarity.py); recall
    knobs: ``nprobe`` (cell coverage) × ``shortlist_factor`` (rank
    depth).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cb, unit, slices, code_col, lut_col, adc_score = _pq_context(
        corpus, vec_col, m, codebook_size, seed, max_iter, dim=dim
    )

    # IVF cells on the unit vectors (cosine geometry)
    train = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        unit(F.col(vec_col)).alias("_uv"),
    ).withColumn("features", array_to_vector(F.col("_uv")))
    ivf = KMeans(
        k=num_centroids, seed=seed, maxIter=max_iter, initMode="random"
    ).fit(train)
    centroids = [c.tolist() for c in ivf.clusterCenters()]

    # corpus side: cell assignment (model.transform) + PQ codes in ONE
    # pass over the corpus — no self-join of derived relations
    coded = (
        ivf.transform(train)
        .select(
            "neighbor_id",
            F.col("prediction").alias("cell"),
            slices(F.col("_uv")).alias("_sl"),
        )
        .crossJoin(cb)
        .select(
            "neighbor_id",
            "cell",
            F.transform(F.col("_sl"), code_col).alias("codes"),
        )
    )

    # query side: nprobe nearest cells (closed-form distance to the
    # centroid literals, exploded) + the ADC LUT, also in one pass
    def _csqdist(vec, center: list[float]):
        return F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in center]),
                lambda x, w: (x - w) * (x - w),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cells = F.array(
        *[
            F.struct(
                _csqdist(F.col("_uv"), c).alias("d"), F.lit(i).alias("cell")
            )
            for i, c in enumerate(centroids)
        ]
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            unit(F.col(vec_col)).alias("_uv"),
        )
        .crossJoin(cb)
        .select(
            "query_id",
            lut_col(slices(F.col("_uv"))).alias("lut"),
            F.explode(
                F.transform(
                    F.slice(F.array_sort(cells), 1, nprobe), lambda s: s.cell
                )
            ).alias("cell"),
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
