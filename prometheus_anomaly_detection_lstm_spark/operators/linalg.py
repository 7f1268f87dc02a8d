"""Distributed dense linear algebra over embedding columns.

The PCA / whitening precursor for an embedding corpus: the d x d
population covariance matrix, computed the way MLlib's RowMatrix does
it at scale — each partition reduces its rows to ONE d x d outer-
product partial (numpy ``X.T @ X`` over an Arrow batch), and only
those tiny partials shuffle.  For d=64 a partial is 32 KiB regardless
of partition row count, so the shuffle volume is #partitions * d**2
doubles — independent of corpus size; a 100-TB embedding table moves
megabytes.

One-pass moment formula (cov = E[xy] - E[x]E[y]) on float64 partials:
components are O(1) and the driver corpus is small, so cancellation is
well inside the 6-dp comparison; the two-pass centered variant (mean
broadcast, then centered partials) is the drop-in if a corpus with
huge common offsets ever needs it.

Reference parity: none — the reference has no linear-algebra surface;
this backs the ANN/dedup embedding ops (whitening, PCA re-ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_tables import load_table

#: embedding dimensionality of the testdata corpus.
DIM = 64


def _cov_partials(d: int):
    def gen(batches):
        import numpy as np
        import pandas as pd

        sxy = np.zeros((d, d), dtype=np.float64)
        sx = np.zeros(d, dtype=np.float64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            sxy += x.T @ x
            sx += x.sum(axis=0)
            n += x.shape[0]
        if n == 0:
            return
        ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1),
                             indexing="ij")
        yield pd.DataFrame(
            {
                "i": ii.ravel(),
                "j": jj.ravel(),
                "sxy": sxy.ravel(),
                "si": np.repeat(sx, d),
                "sj": np.tile(sx, d),
                "n": np.full(d * d, n, dtype=np.int64),
            }
        )

    return gen


def embedding_covariance(emb: DataFrame, d: int = DIM) -> DataFrame:
    """(i, j, cov): population covariance of embedding components
    (1-based indices).  See module docstring for the partials shape."""
    partials = emb.select("embedding").mapInPandas(
        _cov_partials(d),
        "i long, j long, sxy double, si double, sj double, n long",
    )
    return (
        partials.groupBy("i", "j")
        .agg(
            F.sum("sxy").alias("__sxy"),
            F.sum("si").alias("__si"),
            F.sum("sj").alias("__sj"),
            F.sum("n").alias("__n"),
        )
        .select(
            "i",
            "j",
            # + 0.0 canonicalizes IEEE -0.0 (either engine can produce
            # it on a rounded-to-zero negative covariance)
            (
                F.round(
                    (
                        F.col("__sxy")
                        - F.col("__si") * F.col("__sj") / F.col("__n")
                    )
                    / F.col("__n"),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


ORACLE_EMBEDDING_COVARIANCE = f"""WITH x AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS xi
  FROM embeddings, unnest(generate_series(1, {DIM})) AS t(i)
)
SELECT a.i AS i, b.i AS j, round(covar_pop(a.xi, b.xi), 6) + 0.0 AS cov
FROM x a
JOIN x b USING (vec_id)
GROUP BY 1, 2"""


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_covariance(load_table(spark, sf_dir, "embeddings"))


QUERIES = {
    "embedding_covariance": (
        q_embedding_covariance,
        ORACLE_EMBEDDING_COVARIANCE,
    ),
}


def pca_fit(emb: DataFrame, k: int = 8, d: int = DIM):
    """Fit top-k principal components from the DISTRIBUTED covariance.

    The heavy pass is embedding_covariance (constant shuffle volume);
    the eigendecomposition runs on the d x d matrix driver-side —
    np.linalg.eigh on 64 x 64 is microseconds, the canonical
    small-model/big-data split (same shape as MLlib's RowMatrix PCA).
    Components are sign-canonicalized (largest-|coefficient| entry
    positive) so the fit is deterministic.  Returns (components
    ndarray (k, d) row-major, eigenvalues ndarray (k,), mean (d,)).
    """
    import numpy as np

    rows = embedding_covariance(emb, d).collect()
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    mean_row = (
        emb.select(
            F.array(*[
                F.avg(F.element_at("embedding", i + 1)) for i in range(d)
            ]).alias("m")
        ).collect()[0]["m"]
    )
    import numpy as _np

    return comps, vals[order], _np.asarray(mean_row, dtype=float)


def pca_project(
    emb: DataFrame, components, mean=None, d: int = DIM
) -> DataFrame:
    """Map-only projection onto fitted components: each output
    coordinate is a literal dot-product expression compiled into
    whole-stage codegen (no UDF, no shuffle, no broadcast — the k x d
    matrix lives in the plan, same idiom as embedding_random_projection).
    Output: (vec_id, pc_1..pc_k)."""
    cols = [F.col("vec_id")]
    for r, comp in enumerate(components, start=1):
        expr = None
        for i, w in enumerate(comp, start=1):
            cen = F.element_at("embedding", i).cast("double")
            if mean is not None:
                cen = cen - float(mean[i - 1])
            term = cen * float(w)
            expr = term if expr is None else expr + term
        cols.append(F.round(expr, 6).alias(f"pc_{r}"))
    return emb.select(*cols)


def whiten_project(
    emb: DataFrame, components, eigenvalues, mean, d: int = DIM,
    eps: float = 1e-9,
) -> DataFrame:
    """PCA-whitening: the pca_project map with each component scaled by
    1/sqrt(eigenvalue) — the whitened coordinates have unit variance
    and zero cross-covariance (pinned in tests).  Scaling happens in
    the WEIGHTS (driver-side, k x d floats), so the executor-side plan
    is still a pure literal-dot-product projection: map-only, no UDF,
    no shuffle.  Output: (vec_id, wh_1..wh_k)."""
    import numpy as np

    # clamp before the sqrt: eigh on a covariance rebuilt from rounded
    # entries can return a trailing eigenvalue as a tiny NEGATIVE
    # number, and sqrt(negative + eps) would silently NaN the column
    scaled = np.asarray(components, dtype=float) / np.sqrt(
        np.maximum(np.asarray(eigenvalues, dtype=float), 0.0) + eps
    )[:, None]
    out = pca_project(emb, scaled, mean, d)
    return out.select(
        "vec_id",
        *[
            F.col(f"pc_{r}").alias(f"wh_{r}")
            for r in range(1, len(scaled) + 1)
        ],
    )


def q_embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only registry entry (eigh has no SQL twin): whitened top-8
    coordinates of the embedding corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps, vals, mean = pca_fit(emb, k=8)
    return whiten_project(emb, comps, vals, mean)


QUERIES["embedding_whiten"] = (q_embedding_whiten, None)


# ----------------------------------------------------- ridge regression

#: default L2 penalty for the registered probe query.
RIDGE_LAMBDA = 1.0


def _ridge_partials(d: int, label_col: str):
    def gen(batches):
        import numpy as np
        import pandas as pd

        xtx = np.zeros((d + 1, d + 1), dtype=np.float64)
        xty = np.zeros(d + 1, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            x = np.hstack([np.ones((x.shape[0], 1)), x])  # bias column
            y = pdf[label_col].to_numpy(dtype=np.float64)
            xtx += x.T @ x
            xty += x.T @ y
        if not xty.any() and not xtx.any():
            return
        ii, jj = np.meshgrid(
            np.arange(d + 1), np.arange(d + 1), indexing="ij"
        )
        yield pd.DataFrame(
            {
                "i": ii.ravel(),
                "j": jj.ravel(),
                "xtx": xtx.ravel(),
                "xty": np.repeat(xty, d + 1),
            }
        )

    return gen


def ridge_fit(
    emb: DataFrame,
    label_col: str = "label",
    d: int = DIM,
    lam: float = RIDGE_LAMBDA,
) -> DataFrame:
    """Closed-form distributed ridge regression (the linear-probe fit
    run over frozen embeddings): solve (XᵀX + λI)w = Xᵀy from
    per-partition normal-equation partials — the same
    shuffle-volume-independent-of-corpus-size shape as the covariance
    operator (each partition contributes ONE (d+1)² partial; a 100-TB
    table moves megabytes).  Bias column appended, unpenalized data
    convention kept simple: λ applies to all weights incl. bias
    (documented; set lam=0 for OLS).

    The (d+1)×(d+1) solve happens on the driver — d is model
    dimensionality, not data size.  Returns (dim, weight): dim 0 is
    the intercept, 1..d the coefficients.  numpy-pinned in tests;
    rows-only registry entry (no SQL twin for the solve)."""
    import numpy as np

    partials = emb.select("embedding", label_col).mapInPandas(
        _ridge_partials(d, label_col),
        "i long, j long, xtx double, xty double",
    )
    # xty[i] is replicated across every j of row i in the partial frame,
    # so one keyed aggregate sums both moments; the (i, 0) rows carry
    # the summed Xᵀy.
    rows = (
        partials.groupBy("i", "j")
        .agg(F.sum("xtx").alias("xtx"), F.sum("xty").alias("xty"))
        .collect()
    )
    xtx = np.zeros((d + 1, d + 1))
    xty = np.zeros(d + 1)
    for r in rows:
        xtx[r["i"], r["j"]] = r["xtx"]
        if r["j"] == 0:
            xty[r["i"]] = r["xty"]
    w = np.linalg.solve(xtx + lam * np.eye(d + 1), xty)
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(int(i), float(round(v, 6))) for i, v in enumerate(w)],
        "dim int, weight double",
    )


def q_embedding_ridge_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ridge_fit(load_table(spark, sf_dir, "embeddings"))


# iterable-free closed-form fit, but the SOLVE has no SQL twin ->
# rows-only driver check; numpy equality pinned in tests/test_linalg.py.
QUERIES["embedding_ridge_fit"] = (q_embedding_ridge_fit, None)


# --------------------------------------------- logistic regression (GD)

#: fixed full-batch GD schedule for the registered probe query —
#: deterministic by construction (no sampling, no early stop).
LOGREG_ITERS = 25
LOGREG_LR = 2.0
LOGREG_LAMBDA = 1e-3


def _logreg_grad_partials(d: int, label_col: str, w):
    """Per-partition gradient partial: g = Xᵀ(σ(Xw) − y), plus the
    partition's log-loss sum and row count.  Emits d+3 rows per
    partition — shuffle volume independent of corpus size."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        wv = np.asarray(w, dtype=np.float64)
        g = np.zeros(d + 1, dtype=np.float64)
        loss = 0.0
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            x = np.hstack([np.ones((x.shape[0], 1)), x])
            y = pdf[label_col].to_numpy(dtype=np.float64)
            z = x @ wv
            p = 1.0 / (1.0 + np.exp(-z))
            g += x.T @ (p - y)
            # numerically-stable log-loss: log(1+e^-|z|) + max(z,0) - z*y
            loss += float(
                np.sum(np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0) - z * y)
            )
            n += len(pdf)
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "i": list(range(d + 1)) + [-1, -2],
                "v": list(g) + [loss, float(n)],
            }
        )

    return gen


def logreg_fit(
    emb: DataFrame,
    label_col: str = "y",
    d: int = DIM,
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
    lam: float = LOGREG_LAMBDA,
):
    """Distributed binary logistic regression by full-batch gradient
    descent — the fasttext-shaped quality/domain classifier training
    step of LLM data pipelines, on frozen embedding features.

    Each iteration is ONE distributed pass: every partition contributes
    a (d+3)-row gradient/loss partial via Arrow ``mapInPandas`` (the
    same shuffle-volume-independent-of-corpus-size shape as the
    covariance/ridge operators — a 100-TB input moves kilobytes per
    iteration), summed by one keyed agg; the (d+1)-dim weight update
    runs on the driver (model-scale, not data-scale).  L2-penalized
    (bias included, like ridge here), constant step — deterministic
    given the schedule, so the numpy twin pins exactness in pytest.

    The input is CACHED across iterations — on a cluster that is the
    difference between scanning the corpus once vs ``iters`` times.
    Returns (weights ndarray, per-iteration mean-loss list).
    """
    import numpy as np

    feats = emb.select("embedding", label_col)
    feats.persist()
    try:
        w = np.zeros(d + 1, dtype=np.float64)
        losses = []
        for _ in range(iters):
            rows = (
                feats.mapInPandas(
                    _logreg_grad_partials(d, label_col, w), "i long, v double"
                )
                .groupBy("i")
                .agg(F.sum("v").alias("v"))
                .collect()
            )
            vals = {r["i"]: r["v"] for r in rows}
            g = np.array([vals[i] for i in range(d + 1)])
            # row count rides in the same partials (i = -2): no separate
            # count() pass over the corpus just to get the denominator
            n_total = vals[-2]
            losses.append(vals[-1] / n_total)
            w = w - lr * (g / n_total + lam * w)
        return w, losses
    finally:
        feats.unpersist()


def q_embedding_logreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe task: one-vs-rest on cluster 0 (deterministic intrinsic
    target — a single cluster of unit vectors is linearly separated
    from the rest by its centroid direction, so the fit converges:
    mean log-loss drops ~0.69 -> ~0.34 on the synthetic geometry)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "embedding", (F.col("label") == 0).cast("double").alias("y")
    )
    w, losses = logreg_fit(emb)
    spark_rows = [
        (int(i), float(round(v, 6))) for i, v in enumerate(w)
    ] + [(-1, float(round(losses[-1], 6)))]
    # dim -1 row carries the final mean log-loss (training telemetry).
    return spark.createDataFrame(spark_rows, "dim int, weight double")


# iterative GD has no SQL twin -> rows-only driver check; numpy
# equality + partitioning invariance pinned in tests/test_promql.py.
QUERIES["embedding_logreg_fit"] = (q_embedding_logreg_fit, None)
