"""Similarity search over embedding columns (BASELINE.json north star).

Brute-force cosine top-k as the correctness baseline, plus a
sign-LSH-bucketed variant as the scale path.  The dot products run
JVM-side via higher-order functions (``zip_with`` + ``aggregate``) — no
Python in the hot loop; at 100 TB the candidate set is cut by the LSH
bucket equi-join before any distance is computed.
"""

from __future__ import annotations

import pandas as pd  # annotations of Arrow kernels resolve against this
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import single_partition_key
from ..io_tables import load_table, parallelize_if_underpartitioned
from ..functions.checkpoint import cut_lineage, cut_lineage_eager

TOP_K = 10
N_QUERIES = 10  # vec_id < N_QUERIES are the query vectors
LSH_PLANES = 8  # sign-LSH bits for the bucketed variant
EMB_DIM = 64  # embedding dimensionality of the corpus tables


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings, hash-distributed by vec_id across the session's cores.

    Same single-row-group local-input fix as dedup._shingles_raw:
    without it the scan is one task and every per-vector float kernel
    (dot products, norms, quantization) serializes on one core.  vec_id
    hash keeps the distribution reusable by downstream per-vector
    aggregations.  Gated (``parallelize_if_underpartitioned``) so a real
    lake whose scan is already well-split pays no exchange.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return parallelize_if_underpartitioned(emb, "vec_id")


def _as_double(col: str):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _norm_den(a: str, b: str):
    """NULL-safe cosine denominator: a zero vector has no direction, so
    its cosine is NULL (DuckDB's division-by-zero semantics) and
    ranking/threshold comparisons drop it — under Spark 4's default
    ANSI mode a bare division would instead abort the whole job with
    DIVIDE_BY_ZERO."""
    return F.nullif(F.col(a) * F.col(b), F.lit(0.0))


def with_norm(df: DataFrame) -> DataFrame:
    """(vec_id, vec ARRAY<DOUBLE>, norm DOUBLE)."""
    vec = _as_double("embedding")
    return df.select(
        "vec_id",
        vec.alias("vec"),
        F.sqrt(
            F.aggregate(
                F.transform(vec, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("norm"),
    )


def cosine_pairs(queries: DataFrame, candidates: DataFrame) -> DataFrame:
    """Cosine similarity for every (query, candidate) pair.

    Query side is tiny -> broadcast; candidates stream through one
    map stage.  dot = fold over zip_with products (sequential left
    fold — same summation order as the oracle).
    """
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("norm").alias("q_norm"),
    )
    c = candidates.select(
        F.col("vec_id").alias("c_id"),
        F.col("vec").alias("c_vec"),
        F.col("norm").alias("c_norm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", dot / _norm_den("q_norm", "c_norm"))
        .filter(F.col("cosine").isNotNull())  # zero vectors: no direction
        .select("q_id", "c_id", "cosine")
    )


def cosine_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Brute-force top-k: (q_id, c_id, cosine, rk) for rk <= k."""
    normed = with_norm(emb)
    queries = normed.filter(F.col("vec_id") < n_queries)
    pairs = cosine_pairs(queries, normed)
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("c_id").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select(
            "q_id", "c_id", F.round("cosine", 6).alias("cosine"), "rk"
        )
    )


def _lsh_weight(seed: int, p: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane weight in (-1, 1):
    w = 2·frac(sin((seed+p)·1000 + j)·43758.5453) − 1, evaluated ONCE
    driver-side (the weights become plan literals — no per-row
    transcendentals at runtime).  No external random state, so the
    bucketing is reproducible everywhere."""
    import math

    return math.fmod(
        math.sin((seed + p) * 1000.0 + j) * 43758.5453, 1.0
    ) * 2.0 - 1.0


def lsh_bucket_array(
    df: DataFrame,
    planes: int = LSH_PLANES,
    tables: int = 1,
    dim: int = EMB_DIM,
    seed_base: int = 1,
) -> DataFrame:
    """ALL tables' sign-LSH bucket ids per vector in ONE map stage:
    appends ``buckets ARRAY<BIGINT>`` (index = table).

    The signature computation is (tables·planes) dot products per
    vector — a dense (batch × dim) @ (dim × tables·planes) matmul, i.e.
    exactly the shape BLAS exists for.  It runs as an Arrow-batched
    ``pandas_udf`` (the ``ml/infer`` vectorized-kernel pattern): one
    matmul signs every hyperplane, one small matmul packs sign bits
    into per-table bucket ids.  Map-only, no shuffle, whole-corpus
    single pass; the hyperplane matrix is a driver-computed constant in
    the UDF closure.

    Two prior formulations measured and rejected at sf0.1: per-table
    Catalyst branches re-evaluated the scan+norm subtree ``tables``
    times with per-row ``sin`` weights (3.4 s); a literal-matrix
    higher-order-function form hit Catalyst's project-collapse
    re-inlining the 128-dot array into every bit access (~70 s at
    sf0.001).  The Arrow kernel does the same math in milliseconds and
    keeps the plan a single ArrowEvalPython over the scan.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    W = np.array(
        [
            [_lsh_weight(t * planes + seed_base, p, j) for j in range(dim)]
            for t in range(tables)
            for p in range(planes)
        ]
    ).T  # (dim, tables*planes)
    pow2 = (1 << np.arange(planes)).astype("int64")
    n_tables = tables

    @pandas_udf("array<long>")
    def _sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        M = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (M @ W) > 0  # (batch, tables*planes)
        b = signs.reshape(len(M), n_tables, -1) @ pow2  # (batch, tables)
        return pd.Series(list(b))

    return df.withColumn("buckets", _sig(F.col("vec")))


LSH_TABLES = 8  # OR-amplification: candidate if ANY table's bucket matches


def lsh_candidate_set(
    normed: DataFrame,
    n_queries: int = N_QUERIES,
    planes: int = LSH_PLANES,
    tables: int = LSH_TABLES,
    probe_hamming: int = 1,
) -> DataFrame:
    """Distinct (q_id, c_id) LSH candidates across all tables/probes.

    Query side probes every bucket whose signature is within Hamming
    ``probe_hamming`` of its own (XOR masks with popcount <= radius),
    in every table — standard multiprobe amplification.  Probe count
    per query per table = sum_{i<=h} C(planes, i); candidate volume is
    that fraction of the corpus, NOT the n² pair space.

    Plan shape: ONE pass computes every table's bucket
    (:func:`lsh_bucket_array`), ``posexplode`` fans out to
    (table, bucket) rows, and the tiny probe side broadcasts — the
    corpus never shuffles.
    """
    tagged = lsh_bucket_array(normed, planes, tables, seed_base=1)
    c_all = tagged.select(
        F.col("vec_id").alias("c_id"),
        F.posexplode("buckets").alias("table", "bucket"),
    )
    # The query side runs its OWN signature pass over only the
    # n_queries rows (the filter pushes below the Arrow stage): the
    # signature function is per-row deterministic, so values are
    # identical to filtering `tagged`, but the corpus-wide Arrow pass
    # executes ONCE instead of twice — Catalyst reuses exchanges, not
    # ArrowEvalPython subtrees (round 9; ~0.3 s at sf0.1).
    q_tagged = lsh_bucket_array(
        normed.filter(F.col("vec_id") < n_queries),
        planes,
        tables,
        seed_base=1,
    )
    q_all = _lsh_query_probes(q_tagged, planes, probe_hamming)
    return (
        c_all.join(F.broadcast(q_all), ["table", "bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )


def _lsh_query_probes(
    q_tagged: DataFrame, planes: int, probe_hamming: int
) -> DataFrame:
    """(q_id, table, bucket) multiprobe fan-out of a signature frame —
    shared by the inline candidate set and the prebuilt-index query."""
    masks = [0] + [
        m for m in range(1, 2**planes) if bin(m).count("1") <= probe_hamming
    ]
    return (
        q_tagged
        .select(
            F.col("vec_id").alias("q_id"),
            F.posexplode("buckets").alias("table", "bucket"),
        )
        .select(
            "q_id",
            "table",
            # one parsed expression for the whole probe fan-out (37
            # masks at the production config) — the per-mask Column
            # chain was ~130 ms of plan construction per submission
            F.expr(
                "explode(array({}))".format(
                    ", ".join(f"bucket ^ {m}" for m in masks)
                )
            ).alias("bucket"),
        )
    )


#: measured on the testdata (tools/ann_recall_curve.py, BASELINE.md):
#: recall@10 = 0.88 at sf0.01.  Candidate volume there is 68% of brute
#: force only because the corpus (500 vecs) is small vs 2^planes=256
#: buckets; at scale each probe touches ~corpus/256, so 16 tables x 37
#: probes cost ~tables*probes/2^planes ≈ 2.3x corpus per query — the
#: constant-per-query shape that beats n² brute force asymptotically.
LSH_RECALL08 = {"planes": 8, "tables": 16, "probe_hamming": 2}

#: IVF production config: recall@10 = 0.90 at sf0.01 probing half the
#: lists (or 0.83 probing 4/16 — the at-scale shape).
IVF_RECALL08 = {"n_lists": 8, "n_probe": 4}

#: Bump whenever build_lsh_index's on-disk layout or the signature
#: kernel changes.  Part of the recipe stamp a cached /tmp index is
#: compared against at reuse time (r10 ADVICE: a stamp carrying only
#: {sf_dir, rows} silently reused a stale index after a build-code or
#: config change — the prebuilt query path has no oracle to catch it).
LSH_INDEX_VERSION = 1
IVF_INDEX_VERSION = 1


def lsh_build_recipe(planes: int, tables: int) -> dict:
    """The reuse-gating identity of a persisted LSH index: every input
    that changes the index bytes (build config + build-code version)."""
    return {
        "kind": "lsh",
        "version": LSH_INDEX_VERSION,
        "planes": planes,
        "tables": tables,
    }


def ivf_build_recipe(n_lists: int) -> dict:
    """Reuse-gating identity of a persisted IVF index."""
    return {"kind": "ivf", "version": IVF_INDEX_VERSION, "n_lists": n_lists}


def cosine_topk_lsh(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    planes: int = LSH_PLANES,
    tables: int = LSH_TABLES,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k via multi-table, multi-probe sign-LSH.

    A single sign-LSH table has vanishing recall for moderate-cosine
    neighbors (p = (1-θ/π)^planes per table — measured ~5% on this
    corpus), so the scale-honest form amplifies:

    * OR over ``tables`` independent tables (candidate if any bucket
      matches), and
    * multiprobe: each query also probes buckets within Hamming
      ``probe_hamming`` of its own signature — the standard trick to
      buy recall without more tables.

    Exact cosine ranks the candidates.  The recall/candidate-volume
    trade-off is MEASURED, not asserted: tools/ann_recall_curve.py
    sweeps (tables, probe_hamming, planes); the curve lives in
    BASELINE.md, and ``LSH_RECALL08`` names the production config with
    recall@10 >= 0.8 (floor pinned in tests/test_similarity_recall.py).
    Approximate vs brute force but DETERMINISTIC, so the driver check
    is a real hash oracle (:func:`_lsh_oracle`) since round 9.
    """
    normed = with_norm(emb)
    cands = lsh_candidate_set(
        normed, n_queries, planes, tables, probe_hamming
    )
    return _lsh_exact_rerank(cands, normed, n_queries, k)


def _lsh_exact_rerank(
    cands: DataFrame, normed: DataFrame, n_queries: int, k: int
) -> DataFrame:
    """Exact-cosine rerank of LSH candidates against a (vec_id, vec,
    norm) frame — shared by the inline and prebuilt-index paths."""
    # Only vec_id < n_queries can appear as q_id in cands; filtering
    # before the broadcast keeps the hash table at n_queries rows
    # instead of the whole corpus (broadcast-OOM risk at scale).
    q = normed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("norm").alias("q_norm"),
    )
    c = normed.select(
        F.col("vec_id").alias("c_id"),
        F.col("vec").alias("c_vec"),
        F.col("norm").alias("c_norm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        cands.join(F.broadcast(q), "q_id")
        .join(c, "c_id")
        .withColumn("cosine", dot / _norm_den("q_norm", "c_norm"))
        .filter(F.col("cosine").isNotNull())  # zero vectors: no direction
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("c_id").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", F.round("cosine", 6).alias("cosine"), "rk")
    )


def build_lsh_index(
    emb: DataFrame,
    path: str,
    planes: int = LSH_PLANES,
    tables: int = LSH_TABLES,
) -> None:
    """Build and persist the LSH index — the third leg of the ANN
    deployment trilogy (IVF: :func:`build_ivf_index`; PQ:
    kmeans.build_pq_index): ``path/vectors`` stores the pre-normalized
    (vec_id, vec, norm) frame for the exact rerank, ``path/buckets``
    the exploded (c_id, table, bucket) posting rows PARTITIONED BY
    table (a query probes per-table buckets, so each table's postings
    prune to their own directory), and ``path/meta.json`` the (planes,
    tables) config so the query side derives identical signatures.
    A query session then pays ONE tiny Arrow pass over the query rows
    plus the broadcast probe join — the corpus-wide signature pass
    happens once at build time.

    ``path`` must be a LOCAL directory: ``meta.json`` is written with
    plain ``open()`` (the parquet parts go through Spark and would
    accept any URI, but the sidecar does not) — asserted up front so a
    non-local path fails BEFORE the corpus-wide signature pass is paid,
    not after (r10 ADVICE)."""
    import json
    import os

    if "://" in path and not path.startswith("file:"):
        raise ValueError(
            f"build_lsh_index requires a local path (meta.json sidecar "
            f"is written with open()); got {path!r}"
        )
    os.makedirs(path.removeprefix("file:"), exist_ok=True)

    normed = with_norm(emb)
    normed.write.mode("overwrite").parquet(f"{path}/vectors")
    tagged = lsh_bucket_array(normed, planes, tables, seed_base=1)
    (
        tagged.select(
            F.col("vec_id").alias("c_id"),
            F.posexplode("buckets").alias("table", "bucket"),
        )
        .write.mode("overwrite")
        .partitionBy("table")
        .parquet(f"{path}/buckets")
    )
    with open(os.path.join(path.removeprefix("file:"), "meta.json"), "w") as fh:
        json.dump({"planes": planes, "tables": tables}, fh)


def cosine_topk_lsh_prebuilt(
    spark: SparkSession,
    path: str,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    probe_hamming: int = 1,
) -> DataFrame:
    """Query a persisted LSH index (:func:`build_lsh_index`): identical
    results to the inline :func:`cosine_topk_lsh` for the same
    parameters, without re-signing the corpus.  The signature kernel
    runs only over the n_queries probe rows; candidates come from the
    stored posting table."""
    import json
    import os

    # build_lsh_index accepts a 'file:' URI and strips it for the
    # sidecar write — strip symmetrically here so building and querying
    # with the SAME path string round-trips (ADVICE r11).
    with open(os.path.join(path.removeprefix("file:"), "meta.json")) as fh:
        meta = json.load(fh)
    vectors = spark.read.parquet(f"{path}/vectors")
    c_all = spark.read.parquet(f"{path}/buckets")
    q_tagged = lsh_bucket_array(
        vectors.filter(F.col("vec_id") < n_queries),
        meta["planes"],
        meta["tables"],
        seed_base=1,
    )
    q_all = _lsh_query_probes(q_tagged, meta["planes"], probe_hamming)
    cands = (
        c_all.join(F.broadcast(q_all), ["table", "bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )
    return _lsh_exact_rerank(cands, vectors, n_queries, k)


def kmeans_centroids(
    normed: DataFrame, k: int = 8, iterations: int = 5
) -> DataFrame:
    """Deterministic Lloyd iterations for the IVF coarse quantizer.

    Seeds = the first k vectors by vec_id (deterministic, no RNG state);
    each round: assign to nearest centroid (broadcast), recompute means
    (posexplode -> keyed agg).  Iterative -> lineage truncated per round.
    Returns (centroid_id, cvec ARRAY<DOUBLE>).
    """
    seeds = (
        normed.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number()
            .over(
                Window.partitionBy(single_partition_key("vec_id")).orderBy(
                    "vec_id"
                )
            )
            .alias("centroid_id"),
            F.col("vec").alias("cvec"),
        )
        .transform(cut_lineage_eager)
    )
    cents = seeds
    for _ in range(iterations):
        assigned = _assign_nearest(normed, cents)
        cents = (
            assigned.select(
                "centroid_id", F.posexplode("vec").alias("dim", "val")
            )
            .groupBy("centroid_id", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("pairs")
            )
            .select(
                "centroid_id",
                F.transform(F.col("pairs"), lambda p: p["m"]).alias("cvec"),
            )
            .transform(cut_lineage_eager)
        )
    return cents


def _assign_nearest(normed: DataFrame, cents: DataFrame) -> DataFrame:
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = normed.crossJoin(F.broadcast(cents)).withColumn("__sim", dot)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "__sim", "cvec")
    )


def cosine_topk_ivf(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_lists: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: coarse k-means lists, probe the n_probe
    nearest lists per query instead of the whole corpus.

    The scale path for billion-vector search: candidate volume drops by
    ~n_lists/n_probe; recall vs brute force is validated in tests.
    Builds the index inline; for the build-once / query-many production
    shape use :func:`build_ivf_index` + :func:`cosine_topk_ivf_prebuilt`.
    """
    normed = with_norm(emb)
    cents = kmeans_centroids(normed, k=n_lists)
    assigned = _assign_nearest(normed, cents).transform(cut_lineage_eager)
    return _ivf_query(cents, assigned, n_queries, k, n_probe)


def build_ivf_index(emb: DataFrame, path: str, n_lists: int = 8) -> None:
    """Build and persist the IVF index: ``path/centroids`` (tiny) and
    ``path/assignments`` parquet PARTITIONED BY centroid_id — each
    coarse list is its own partition directory, so a query probing
    ``n_probe`` lists reads only those directories (partition pruning),
    the physical property that makes IVF sub-linear on disk as well as
    in compute.  Vectors are stored pre-normalized (vec + norm) so the
    query stage never rescans the raw embedding table.
    """
    normed = with_norm(emb)
    cents = kmeans_centroids(normed, k=n_lists)
    assigned = _assign_nearest(normed, cents)
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    (
        assigned.write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{path}/assignments")
    )


def load_ivf_index(spark: SparkSession, path: str):
    """(centroids, assignments) as written by :func:`build_ivf_index`."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/assignments"),
    )


def cosine_topk_ivf_prebuilt(
    spark: SparkSession,
    path: str,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_probe: int = 2,
) -> DataFrame:
    """Query a persisted IVF index (:func:`build_ivf_index`): identical
    results to the inline :func:`cosine_topk_ivf` for the same
    parameters, without re-running k-means or re-normalizing the
    corpus."""
    cents, assigned = load_ivf_index(spark, path)
    return _ivf_query(cents, assigned, n_queries, k, n_probe)


def _ivf_query(
    cents: DataFrame,
    assigned: DataFrame,
    n_queries: int,
    k: int,
    n_probe: int,
) -> DataFrame:
    queries = assigned.filter(F.col("vec_id") < n_queries)

    # probe lists: the n_probe nearest centroids per query vector
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        queries.drop("centroid_id")
        .crossJoin(F.broadcast(cents))
        .withColumn("__sim", dot)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_probe)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("vec").alias("q_vec"),
            F.col("norm").alias("q_norm"),
            "centroid_id",
        )
    )
    c = assigned.select(
        F.col("vec_id").alias("c_id"),
        F.col("vec").alias("c_vec"),
        F.col("norm").alias("c_norm"),
        "centroid_id",
    )
    pair_dot = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        c.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", pair_dot / _norm_den("q_norm", "c_norm"))
        .filter(F.col("cosine").isNotNull())  # zero vectors: no direction
    )
    w2 = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("c_id").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", F.round("cosine", 6).alias("cosine"), "rk")
    )


def _euclid2(u, c):
    """Squared Euclidean distance between two array<double> columns."""
    return F.aggregate(
        F.zip_with(u, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _near_dup_candidates(
    emb: DataFrame,
    threshold: float,
    n_cells: int,
    radius_quantile: float,
    normed: DataFrame | None = None,
) -> DataFrame:
    """Complete candidate-pair set for :func:`embedding_near_dup_pairs`
    (unordered ``(id_a, id_b)``, ``id_a < id_b``).  Factored out so
    tests can measure candidate VOLUME independently of the exact
    verification stage.  ``normed`` lets the caller share one
    (checkpointed) normalization instead of re-deriving it here."""
    if normed is None:
        normed = with_norm(emb)
    unit = normed.withColumn(
        # nullif: a zero vector can't be unit-normalized; NULL elements
        # propagate to NULL distances instead of an ANSI abort
        "uvec",
        F.transform(
            F.col("vec"), lambda x: x / F.nullif(F.col("norm"), F.lit(0.0))
        ),
    )
    cents = kmeans_centroids(
        unit.select("vec_id", F.col("uvec").alias("vec")), k=n_cells
    )
    # home assignment by min Euclidean distance (exact nearest cell)
    d_cell = F.sqrt(_euclid2(F.col("uvec"), F.col("cvec")))
    w_near = Window.partitionBy("vec_id").orderBy(
        F.col("__d").asc(), F.col("centroid_id").asc()
    )
    assigned = (
        unit.crossJoin(F.broadcast(cents))
        .withColumn("__d", d_cell)
        .withColumn("__rk", F.row_number().over(w_near))
        .filter(F.col("__rk") == 1)
    )
    # Per-cell radius at a QUANTILE, not the max: one planted outlier
    # in a cell would otherwise inflate the probe radius and drag every
    # vector into that cell's candidate set.  Members beyond the
    # quantile radius form an exact SPILL set handled pairwise.
    if radius_quantile >= 1.0:
        radius_agg = F.max("__d").alias("radius")
    else:
        radius_agg = F.percentile_approx(
            "__d", F.lit(radius_quantile), F.lit(10_000)
        ).alias("radius")
    radii = assigned.groupBy("centroid_id").agg(radius_agg)
    with_radius = assigned.join(F.broadcast(radii), "centroid_id")
    inliers = with_radius.filter(F.col("__d") <= F.col("radius"))
    spill = with_radius.filter(F.col("__d") > F.col("radius"))
    r = float((2.0 - 2.0 * threshold) ** 0.5)
    probes = (
        unit.crossJoin(F.broadcast(cents.join(radii, "centroid_id")))
        .withColumn("__d", d_cell)
        .filter(F.col("__d") <= F.col("radius") + F.lit(r))
        .select(F.col("vec_id").alias("id_b"), "centroid_id")
    )
    # Completeness: for a qualifying pair (x, y):
    #   x inlier in cell c => d(y, centroid_c) <= d(y, x) +
    #     d(x, centroid_c) <= r + radius_q(c), so y (inlier OR spill)
    #     probes c and the equi-join emits the pair;
    #   both spill => the spill x spill join emits the pair.
    # Mixed (inlier, spill) pairs are covered by the FIRST case — the
    # probes side is every vector, spill included — so the spill join
    # is only the quantile tail squared (tiny for genuine outliers),
    # never spill x corpus.  At a scale where even the tail is large,
    # recurse: re-cluster the spill set with its own cells.
    home = inliers.select(F.col("vec_id").alias("id_a"), "centroid_id")
    cell_cands = home.join(probes, "centroid_id").select("id_a", "id_b")
    spill_ids = spill.select(F.col("vec_id").alias("id_a"))
    spill_cands = (
        F.broadcast(spill_ids)
        .crossJoin(spill_ids.select(F.col("id_a").alias("id_b")))
        .select("id_a", "id_b")
    )
    return (
        cell_cands.union(spill_cands)
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.5,
    n_cells: int = 8,
    radius_quantile: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine >= t).

    The fifth dedup modality (exact / Jaccard / MinHash / SimHash /
    embedding-cosine), computed EXACTLY without the n² pair space via
    triangle-inequality cluster pruning:

      1. unit-normalize; cosine >= t  <=>  Euclidean distance on the
         unit sphere <= r = sqrt(2 - 2t);
      2. k-means cells over the unit vectors (deterministic Lloyd,
         :func:`kmeans_centroids`); per-cell radius = the
         ``radius_quantile`` of member distances to the centroid, so a
         handful of outliers cannot inflate the probe radius; members
         beyond the quantile form an exact spill set joined pairwise
         (linear in n — the spill side is broadcast);
      3. every vector PROBES each cell whose centroid is within
         r + radius(cell): for any qualifying pair (x, y) with x home
         in cell c and inside the quantile radius,
         d(y, centroid_c) <= d(y, x) + d(x, centroid_c) <= r + radius_c
         — so (home x probe) + (spill x all) is a COMPLETE candidate
         set (no recall loss, unlike sign-LSH);
      4. candidates verified with the exact cosine.

    All heavy joins are hash equi-joins on cell_id / vec_id; the only
    nested-loop is rows x n_cells centroids (metadata scale — the same
    IVF assignment idiom as :func:`cosine_topk_ivf`).  Candidate volume
    scales with cluster occupancy, not n², and is robust to planted
    outliers (tests/test_similarity_recall.py).

    The normalized frame feeds the Lloyd rounds (iterative), the
    assignment/probe stages and both verify-join sides — Catalyst
    re-executed the scan+normalize chain per consumer (10 executed
    scans, round-12 audit).  It is computed ONCE here, lazily
    checkpointed (1× table-scale — the waist trade: one
    materialization vs ~9 table re-reads at lake scale) and shared
    with the candidate stage.  Interleaved full-cost A/B at sf0.1:
    8.68 -> 7.08 s median-of-5, hash-identical.  Executor-loss caveat:
    see events_association_rules (relational.py).
    """
    normed = with_norm(emb).transform(cut_lineage)
    cands = _near_dup_candidates(
        emb, threshold, n_cells, radius_quantile, normed=normed
    )
    a = normed.select(
        F.col("vec_id").alias("id_a"),
        F.col("vec").alias("a_vec"),
        F.col("norm").alias("a_norm"),
    )
    b = normed.select(
        F.col("vec_id").alias("id_b"),
        F.col("vec").alias("b_vec"),
        F.col("norm").alias("b_norm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("a_vec"), F.col("b_vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cosine", dot / _norm_den("a_norm", "b_norm"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


ORACLE_EMBEDDING_NEAR_DUP = """WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.vec, b.vec) / (a.norm * b.norm), 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.vec, b.vec) / (a.norm * b.norm) >= 0.5"""


def embedding_norms(emb: DataFrame) -> DataFrame:
    """L2 norm per vector (JVM-side fold)."""
    normed = with_norm(emb)
    return normed.select("vec_id", F.round("norm", 6).alias("l2_norm"))


# ------------------------------------------------------------- oracles

ORACLE_COSINE_TOPK = f"""WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
),
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         list_dot_product(q.vec, c.vec) / (q.norm * c.norm) AS cosine
  FROM v q, v c
  -- cosine IS NOT NULL: drop zero-vector candidates exactly like the
  -- Spark side does, so a bucket with < k non-null candidates ranks
  -- the same row set in both engines
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
    AND list_dot_product(q.vec, c.vec) / (q.norm * c.norm) IS NOT NULL
),
ranked AS (
  SELECT q_id, c_id, cosine,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY cosine DESC, c_id ASC) AS BIGINT) AS rk
  FROM pairs
)
SELECT q_id, c_id, round(cosine, 6) AS cosine, rk FROM ranked WHERE rk <= {TOP_K}"""

ORACLE_EMBEDDING_NORMS = """SELECT vec_id,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm
FROM embeddings"""


# ------------------------------------------------------------------
# Exact hash oracles for the APPROXIMATE ANN queries (r8 verdict task
# 2).  The approximators are deterministic end to end — sin-derived
# hyperplanes (plan literals), deterministic Lloyd seeding/tie-breaks —
# so DuckDB can replicate bucket assignment exactly and then do the
# same exact rerank, turning the former rows-only rows into real
# hash-checked rows (the minhash-oracle technique, dedup.py).
#
# Cross-engine float safety is MEASURED, not hoped
# (tools/ann_oracle_margins.py): the minimum margin of every discrete
# decision — hyperplane sign, Lloyd assignment argmax, probe rank,
# top-k rank — is >= 5.4e-7 across sf0.001/0.01/0.1, while the
# blocked-BLAS vs sequential summation-order noise is <= 3.6e-15 (zero
# decision flips in either order).  Weight parity is bit-exact: DuckDB
# `fmod` keeps the divisor's sign convention for negatives, so the
# oracle uses `s - trunc(s)` which equals Python `math.fmod(s, 1.0)`
# bit-for-bit on all 8192 production weights (checked in
# tests/test_ann_oracles.py).


def _norms_cte() -> str:
    return """norms AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
)"""


def _lsh_oracle(
    planes: int = LSH_PLANES,
    tables: int = LSH_TABLES,
    probe_hamming: int = 1,
    n_queries: int = N_QUERIES,
    seed_base: int = 1,
    dim: int = EMB_DIM,
) -> str:
    """Generated DuckDB twin of :func:`cosine_topk_lsh`: same
    sin-derived hyperplanes, same bucket packing (bit p worth 2^p),
    same multiprobe XOR fan-out, same distinct candidate join, same
    exact rerank."""
    masks = [0] + [
        m for m in range(1, 2**planes) if bin(m).count("1") <= probe_hamming
    ]
    mask_rows = ", ".join(f"({m})" for m in masks)
    return f"""WITH {_norms_cte()},
hp AS (
  -- hyperplane weights, bit-equal to similarity._lsh_weight: DuckDB
  -- fmod flips sign for negative dividends, so frac via s - trunc(s)
  SELECT t, p, list(w ORDER BY j) AS wvec
  FROM (
    SELECT t, p, j, (s - trunc(s)) * 2.0 - 1.0 AS w
    FROM (
      SELECT t, p, j,
             sin((t * {planes} + {seed_base} + p) * 1000.0 + j) * 43758.5453 AS s
      FROM generate_series(0, {tables - 1}) ts(t),
           generate_series(0, {planes - 1}) ps(p),
           generate_series(0, {dim - 1}) js(j)
    )
  )
  GROUP BY t, p
),
sigs AS (
  SELECT n.vec_id, h.t,
         CAST(sum(CASE WHEN list_dot_product(n.vec, h.wvec) > 0
                       THEN 1 << h.p ELSE 0 END) AS BIGINT) AS bucket
  FROM norms n, hp h
  GROUP BY n.vec_id, h.t
),
probes AS (
  SELECT s.vec_id AS q_id, s.t, xor(s.bucket, m.mask) AS bucket
  FROM sigs s, (VALUES {mask_rows}) m(mask)
  WHERE s.vec_id < {n_queries}
),
cands AS (
  SELECT DISTINCT p.q_id, c.vec_id AS c_id
  FROM probes p JOIN sigs c ON c.t = p.t AND c.bucket = p.bucket
  WHERE c.vec_id != p.q_id
),
{_pairs_from_cands()}"""


def _pairs_from_cands() -> str:
    return f"""pairs AS (
  SELECT cd.q_id, cd.c_id,
         list_dot_product(q.vec, c.vec) / nullif(q.norm * c.norm, 0.0) AS cosine
  FROM cands cd
  JOIN norms q ON q.vec_id = cd.q_id
  JOIN norms c ON c.vec_id = cd.c_id
  WHERE list_dot_product(q.vec, c.vec) / nullif(q.norm * c.norm, 0.0) IS NOT NULL
),
ranked AS (
  SELECT q_id, c_id, cosine,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY cosine DESC, c_id ASC) AS BIGINT) AS rk
  FROM pairs
)
SELECT q_id, c_id, round(cosine, 6) AS cosine, rk FROM ranked WHERE rk <= {TOP_K}"""


def _ivf_oracle(
    n_lists: int = 8,
    n_probe: int = 2,
    iterations: int = 5,
    n_queries: int = N_QUERIES,
    dim: int = EMB_DIM,
) -> str:
    """Generated DuckDB twin of :func:`cosine_topk_ivf`: the Lloyd
    loop unrolled into ``iterations`` (assign, recompute-means) CTE
    pairs — deterministic seeding (first ``n_lists`` vec_ids) and the
    same argmax tie-break (sim DESC, centroid_id ASC), then the same
    probe-top-``n_probe`` candidate join and exact rerank.  A centroid
    that loses every member drops out of the recompute in BOTH engines
    (group-by omits empty groups)."""

    def assign_cte(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, vec, norm, centroid_id FROM (
    SELECT n.vec_id, n.vec, n.norm, c.centroid_id,
           row_number() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.vec, c.cvec) DESC,
                         c.centroid_id ASC) AS rk
    FROM norms n CROSS JOIN {cents} c
  ) WHERE rk = 1
)"""

    def means_cte(name: str, assigned: str) -> str:
        return f"""{name} AS (
  SELECT centroid_id, list(m ORDER BY dim) AS cvec
  FROM (
    SELECT a.centroid_id, g.i AS dim, avg(a.vec[g.i]) AS m
    FROM {assigned} a, generate_series(1, {dim}) g(i)
    GROUP BY a.centroid_id, g.i
  )
  GROUP BY centroid_id
)"""

    steps = [
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS centroid_id,
         vec AS cvec
  FROM norms ORDER BY vec_id LIMIT {n_lists}
)"""
    ]
    for it in range(1, iterations + 1):
        steps.append(assign_cte(f"a{it}", f"c{it - 1}"))
        steps.append(means_cte(f"c{it}", f"a{it}"))
    final_c = f"c{iterations}"
    steps.append(assign_cte("af", final_c))
    steps.append(
        f"""probes AS (
  SELECT vec_id AS q_id, centroid_id FROM (
    SELECT n.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.vec, c.cvec) DESC,
                         c.centroid_id ASC) AS rk
    FROM norms n CROSS JOIN {final_c} c
    WHERE n.vec_id < {n_queries}
  ) WHERE rk <= {n_probe}
)"""
    )
    steps.append(
        f"""cands AS (
  SELECT DISTINCT p.q_id, a.vec_id AS c_id
  FROM probes p JOIN af a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id != p.q_id
)"""
    )
    body = ",\n".join([_norms_cte()] + steps)
    return f"WITH {body},\n{_pairs_from_cands()}"


# ------------------------------------------------------------- registry

def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(_emb(spark, sf_dir))


def q_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry runs the PRODUCTION recall>=0.8 config (BASELINE.md)."""
    return cosine_topk_lsh(_emb(spark, sf_dir), **LSH_RECALL08)


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_norms(_emb(spark, sf_dir))


def q_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry runs the PRODUCTION recall>=0.8 config (BASELINE.md)."""
    return cosine_topk_ivf(_emb(spark, sf_dir), **IVF_RECALL08)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(_emb(spark, sf_dir))


def quantize_int8(emb: DataFrame) -> DataFrame:
    """Scalar int8 quantization per vector: q_i = round(v_i / s * 127)
    with per-vector scale s = max |v_i|.

    The storage/bandwidth workhorse for vector stores (4x smaller than
    float32, dot products in int arithmetic).  One map stage — scale
    from ``array_max(transform(abs))``, components via ``posexplode``;
    long output (vec_id, i, q, scale) so the driver's value-hash
    compares scalars, not engine-specific array renderings.  All-zero
    vectors quantize to q = 0 with scale 0.
    """
    vec = _as_double("embedding")
    scale = F.array_max(F.transform(vec, F.abs))
    return (
        emb.select("vec_id", vec.alias("vec"), scale.alias("scale"))
        .select(
            "vec_id",
            "scale",
            F.posexplode("vec").alias("i", "v"),
        )
        .select(
            "vec_id",
            (F.col("i") + 1).cast("bigint").alias("i"),
            F.when(F.col("scale") == 0.0, F.lit(0.0))
            .otherwise(F.round(F.col("v") / F.col("scale") * 127.0, 0))
            .cast("bigint")
            .alias("q"),
            F.round("scale", 6).alias("scale"),
        )
    )


ORACLE_QUANTIZE_INT8 = """WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS scale
  FROM embeddings
)
SELECT vec_id, CAST(i AS BIGINT) AS i,
       CAST(CASE WHEN scale = 0.0 THEN 0.0
                 ELSE round(vec[i] / scale * 127.0, 0) END AS BIGINT) AS q,
       round(scale, 6) AS scale
FROM v, unnest(generate_series(1, len(vec))) AS t(i)"""


def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantize_int8(_emb(spark, sf_dir))


QUERIES = {
    "ann_cosine_topk": (q_cosine_topk, ORACLE_COSINE_TOPK),
    # approximate vs BRUTE FORCE, but deterministic end to end — the
    # oracle replicates bucketing/Lloyd exactly, then reranks exactly
    # (margins measured in tools/ann_oracle_margins.py; r8 verdict 2)
    "ann_cosine_topk_lsh": (q_cosine_topk_lsh, _lsh_oracle(**LSH_RECALL08)),
    "ann_cosine_topk_ivf": (q_cosine_topk_ivf, _ivf_oracle(**IVF_RECALL08)),
    "embedding_norms": (q_embedding_norms, ORACLE_EMBEDDING_NORMS),
    "dedup_embedding_cosine": (q_embedding_near_dup, ORACLE_EMBEDDING_NEAR_DUP),
    "embedding_quantize_int8": (q_quantize_int8, ORACLE_QUANTIZE_INT8),
}


# ------------------------------------------------------------------
# Random projection (Johnson-Lindenstrauss dim reduction)

RP_IN_DIM = 64
RP_OUT_DIM = 8


def _rp_weight(i: int, j: int) -> float:
    """Deterministic engine-portable pseudo-random weight in [-1, 1):
    derived from md5 so Spark, DuckDB, and any future engine agree on
    the projection matrix without sharing library RNG state."""
    import hashlib

    h = hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()[:8]
    return round((int(h, 16) / 2**32) * 2 - 1, 6)


def random_projection(
    emb: DataFrame, out_dim: int = RP_OUT_DIM, in_dim: int = RP_IN_DIM
) -> DataFrame:
    """Project embeddings to ``out_dim`` dims with a fixed JL matrix.

    The cheap first stage of billion-vector pipelines (coarse
    clustering, dedup pre-filters, visualization): a dense matmul
    against a CONSTANT matrix.  Expressed as ``out_dim`` literal
    dot-product expressions over the array column — pure projection
    inside whole-stage codegen: no shuffle, no UDF, no join, and the
    64x8 matrix lives in the plan itself (no broadcast needed).  Term
    order is fixed left-to-right so the double-precision sum is
    bit-identical across engines (oracle-hash-safe).
    """
    cols = [F.col("vec_id")]
    for j in range(out_dim):
        term = None
        for i in range(in_dim):
            t = F.element_at("embedding", i + 1).cast("double") * F.lit(
                _rp_weight(i, j)
            )
            term = t if term is None else term + t
        cols.append(F.round(term, 6).alias(f"p_{j}"))
    return emb.select(*cols)


def _rp_oracle() -> str:
    outs = []
    for j in range(RP_OUT_DIM):
        terms = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * ({_rp_weight(i, j)})"
            for i in range(RP_IN_DIM)
        )
        outs.append(f"round({terms}, 6) AS p_{j}")
    return "SELECT vec_id, " + ", ".join(outs) + " FROM embeddings"


ORACLE_RANDOM_PROJECTION = _rp_oracle()


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return random_projection(_emb(spark, sf_dir))


QUERIES["embedding_random_projection"] = (
    q_random_projection,
    ORACLE_RANDOM_PROJECTION,
)


# ------------------------------------------------------------------
# Matryoshka truncation eval (MRL-style dimension-ablation retrieval)

MATRYOSHKA_DIM = 32  # keep the first half of the 64-dim embeddings


def matryoshka_overlap_eval(
    emb: DataFrame,
    trunc_dim: int = MATRYOSHKA_DIM,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> DataFrame:
    """Retrieval-quality eval for PREFIX-truncated embeddings
    (Matryoshka Representation Learning deployment question: how much
    top-k overlap survives serving vectors at half the dimension?).

    Runs exact cosine top-k twice — full vectors and ``slice(vec, 1,
    trunc_dim)`` — then reports ONE row: (trunc_dim, n_queries, k,
    mean_overlap) where overlap = |topk_full ∩ topk_trunc| / k per
    query, averaged.  A left join from the full top-k counts hits so
    queries with zero surviving neighbors still average in.

    Scale shape: both top-k subtrees are the existing
    :func:`cosine_topk` plan (broadcast query side, map-side dot
    products, per-query window); the overlap join is top-k-scale
    (n_queries × k rows).  No reference counterpart (no embedding
    surface in the reference); eval design per Kusupati et al.,
    "Matryoshka Representation Learning".
    """
    full = cosine_topk(emb, n_queries, k).select("q_id", "c_id")
    trunc_emb = emb.select(
        "vec_id", F.slice("embedding", 1, trunc_dim).alias("embedding")
    )
    trunc = (
        cosine_topk(trunc_emb, n_queries, k)
        .select("q_id", "c_id")
        .withColumn("__hit", F.lit(1))
    )
    per_q = (
        full.join(trunc, ["q_id", "c_id"], "left")
        .groupBy("q_id")
        .agg((F.sum(F.coalesce("__hit", F.lit(0))) / F.lit(float(k))).alias("overlap"))
    )
    return per_q.agg(
        F.lit(trunc_dim).cast("bigint").alias("trunc_dim"),
        F.count("*").cast("bigint").alias("n_queries"),
        F.lit(k).cast("bigint").alias("k"),
        F.round(F.avg("overlap"), 6).alias("mean_overlap"),
    )


def q_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return matryoshka_overlap_eval(_emb(spark, sf_dir))


def _topk_cte(vec_expr: str, alias: str) -> str:
    return f"""{alias}_v AS (
  SELECT vec_id, {vec_expr} AS vec,
         sqrt(list_dot_product({vec_expr}, {vec_expr})) AS norm
  FROM embeddings
),
{alias}_pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         list_dot_product(q.vec, c.vec) / (q.norm * c.norm) AS cosine
  FROM {alias}_v q, {alias}_v c
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
    AND list_dot_product(q.vec, c.vec) / (q.norm * c.norm) IS NOT NULL
),
{alias} AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           row_number() OVER (PARTITION BY q_id
                ORDER BY cosine DESC, c_id ASC) AS rk
    FROM {alias}_pairs
  ) WHERE rk <= {TOP_K}
)"""


ORACLE_MATRYOSHKA = (
    "WITH "
    + _topk_cte("embedding::DOUBLE[]", "full_k")
    + ",\n"
    + _topk_cte(
        f"list_slice(embedding::DOUBLE[], 1, {MATRYOSHKA_DIM})", "trunc_k"
    )
    + f""",
per_q AS (
  SELECT f.q_id,
         sum(CASE WHEN t.c_id IS NOT NULL THEN 1 ELSE 0 END) / {float(TOP_K)}
           AS overlap
  FROM full_k f
  LEFT JOIN trunc_k t ON f.q_id = t.q_id AND f.c_id = t.c_id
  GROUP BY f.q_id
)
SELECT CAST({MATRYOSHKA_DIM} AS BIGINT) AS trunc_dim,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST({TOP_K} AS BIGINT) AS k,
       round(avg(overlap), 6) AS mean_overlap
FROM per_q"""
)

QUERIES["embedding_matryoshka_eval"] = (q_matryoshka_eval, ORACLE_MATRYOSHKA)
