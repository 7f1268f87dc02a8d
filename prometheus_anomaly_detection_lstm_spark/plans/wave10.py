"""Round-6 wave 10: econometrics and experiment-integrity operators —
price elasticity, cointegrated metric pairs, k-center coreset
selection, token burstiness, and the sample-ratio-mismatch guard.

Same scale discipline as wave 9: one keyed rollup touches raw data;
everything downstream runs at metadata/vocabulary scale.  No reference
counterpart (the reference is a fetch->scale->LSTM loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io_tables import load_table

QUERIES: dict = {}


# ------------------------------------------------- price elasticity

def q_orders_price_elasticity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-brand log-log demand curve: the OLS slope of ln(quantity)
    on ln(unit price) across line items is the brand's price
    elasticity estimate (unit price = extendedprice / quantity, the
    TPC-H convention).  One keyed rollup; regr_slope/intercept are
    algebraic aggregates with map-side combine."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    rows = (
        li.filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            F.log(F.col("l_quantity")).alias("lq"),
            F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "lp"
            ),
        )
    )
    return (
        rows.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(F.expr("regr_slope(lq, lp)"), 6).alias("elasticity"),
            F.round(F.expr("regr_intercept(lq, lp)"), 6).alias(
                "log_intercept"
            ),
            F.round(F.expr("regr_r2(lq, lp)"), 6).alias("r2"),
        )
        .filter(F.col("n_lines") >= 30)
    )


ORACLE_PRICE_ELASTICITY = """WITH rows_ AS (
  SELECT p_brand, ln(l_quantity) AS lq,
         ln(l_extendedprice / l_quantity) AS lp
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_quantity > 0 AND l_extendedprice > 0
)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
       round(regr_slope(lq, lp), 6) AS elasticity,
       round(regr_intercept(lq, lp), 6) AS log_intercept,
       round(regr_r2(lq, lp), 6) AS r2
FROM rows_
GROUP BY 1
HAVING count(*) >= 30"""

QUERIES["orders_price_elasticity"] = (
    q_orders_price_elasticity,
    ORACLE_PRICE_ELASTICITY,
)


# ------------------------------------------- cointegrated metric pairs

COINT_DF_CRIT = -3.37  # Engle-Granger 5% critical value (2 variables)


def q_metric_cointegration_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Engle-Granger cointegration scan over metric pairs: for every
    ordered series pair, OLS-fit y = alpha + beta x on the hour-aligned
    means (closed form from covariances), then Dickey-Fuller-test the
    RESIDUAL series.  A cointegrated pair moves together long-run —
    the redundant-metric / pairs-monitoring readout (alert on the
    SPREAD of a cointegrated pair instead of two noisy raw series).

    Plan: one hourly rollup, an hour-keyed self-join (pair space =
    #series^2 on the metadata-scale hourly frame), one aggregate per
    pair for the fit, one lag window + aggregate for the DF tau —
    everything after the rollup is series-pair cardinality."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type").alias("metric"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.avg("value").alias("y"))
    a = hourly.select(
        F.col("metric").alias("mx"), "hour", F.col("y").alias("x")
    )
    b = hourly.select(
        F.col("metric").alias("my"), "hour", F.col("y").alias("yv")
    )
    pairs = a.join(b, "hour").filter(F.col("mx") < F.col("my"))
    fit = pairs.groupBy("mx", "my").agg(
        F.count("*").alias("n"),
        (F.covar_pop("x", "yv") / F.expr("nullif(var_pop(x), 0D)")).alias(
            "beta"
        ),
        F.avg("yv").alias("myv"),
        F.avg("x").alias("mxv"),
    )
    resid = (
        pairs.join(F.broadcast(fit), ["mx", "my"])
        .withColumn(
            "r",
            F.col("yv")
            - (
                (F.col("myv") - F.col("beta") * F.col("mxv"))
                + F.col("beta") * F.col("x")
            ),
        )
        .select("mx", "my", "hour", "r")
    )
    w = Window.partitionBy("mx", "my").orderBy("hour")
    lagged = (
        resid.withColumn("rl", F.lag("r").over(w))
        .filter(F.col("rl").isNotNull())
        .withColumn("d", F.col("r") - F.col("rl"))
    )
    agg = lagged.groupBy("mx", "my").agg(
        F.count("*").cast("double").alias("n"),
        (F.covar_pop("rl", "d") * F.count("*")).alias("sxy"),
        (F.var_pop("rl") * F.count("*")).alias("sxx"),
        (F.var_pop("d") * F.count("*")).alias("syy"),
    )
    rho = F.col("sxy") / F.expr("nullif(sxx, 0D)")
    ssr = F.col("syy") - F.col("sxy") * F.col("sxy") / F.expr(
        "nullif(sxx, 0D)"
    )
    tau = rho / F.sqrt(
        ssr / (F.col("n") - 2) / F.expr("nullif(sxx, 0D)")
    )
    out = agg.join(
        F.broadcast(fit.select("mx", "my", "beta")), ["mx", "my"]
    )
    return out.select(
        F.col("mx").alias("metric_x"),
        F.col("my").alias("metric_y"),
        F.col("n").cast("bigint").alias("n_hours"),
        F.round("beta", 6).alias("beta"),
        F.round(tau, 6).alias("resid_df_tau"),
        (tau < COINT_DF_CRIT).cast("int").alias("cointegrated_5pct"),
    )


ORACLE_COINTEGRATION = f"""WITH hourly AS (
  SELECT event_type AS metric, date_trunc('hour', ts) AS hour,
         avg(value) AS y
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.metric AS mx, b.metric AS my, a.hour,
         a.y AS x, b.y AS yv
  FROM hourly a JOIN hourly b
    ON a.hour = b.hour AND a.metric < b.metric
), fit AS (
  SELECT mx, my,
         covar_pop(x, yv) / nullif(var_pop(x), 0) AS beta,
         avg(yv) AS myv, avg(x) AS mxv
  FROM pairs GROUP BY 1, 2
), resid AS (
  SELECT p.mx, p.my, p.hour,
         p.yv - ((f.myv - f.beta * f.mxv) + f.beta * p.x) AS r
  FROM pairs p JOIN fit f ON p.mx = f.mx AND p.my = f.my
), lagged AS (
  SELECT mx, my, r,
         lag(r) OVER (PARTITION BY mx, my ORDER BY hour) AS rl
  FROM resid
), d AS (
  SELECT mx, my, rl, r - rl AS d FROM lagged WHERE rl IS NOT NULL
), agg AS (
  SELECT mx, my, CAST(count(*) AS DOUBLE) AS n,
         covar_pop(rl, d) * count(*) AS sxy,
         var_pop(rl) * count(*) AS sxx,
         var_pop(d) * count(*) AS syy
  FROM d GROUP BY 1, 2
)
SELECT agg.mx AS metric_x, agg.my AS metric_y,
       CAST(agg.n AS BIGINT) AS n_hours,
       round(f.beta, 6) AS beta,
       round((sxy / nullif(sxx, 0))
             / sqrt((syy - sxy * sxy / nullif(sxx, 0)) / (n - 2)
                    / nullif(sxx, 0)), 6) AS resid_df_tau,
       CAST((sxy / nullif(sxx, 0))
            / sqrt((syy - sxy * sxy / nullif(sxx, 0)) / (n - 2)
                   / nullif(sxx, 0)) < {COINT_DF_CRIT} AS INT)
         AS cointegrated_5pct
FROM agg JOIN fit f ON agg.mx = f.mx AND agg.my = f.my"""

QUERIES["metric_cointegration_pairs"] = (
    q_metric_cointegration_pairs,
    ORACLE_COINTEGRATION,
)


# ------------------------------------------- k-center coreset rounds

KCENTER_K = 8


def q_embedding_kcenter_coreset(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Greedy k-center (farthest-point) coreset selection over the
    embedding corpus — the standard diversity-sampling baseline for
    training-data curation (each round adds the point FARTHEST from
    everything selected so far, so the coreset spreads over the data's
    extent instead of its density).

    Plan: the selected set stays tiny (k vectors) and rides the plan
    as literals; each round is one map-only distance projection + one
    1-row argmax collect (metadata-scale driver loop, the
    init_centroids idiom).  Distances are rounded to 9dp before the
    argmax with vec_id tie-break, so the selection SEQUENCE is
    bit-stable cross-engine."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )

    def d2(vec_col, center: list[float]):
        return F.aggregate(
            F.zip_with(
                vec_col,
                F.lit(center),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    first = emb.filter(F.col("vec_id") == 0).select("vec").collect()
    if not first:  # empty corpus: no rounds, typed empty result
        return emb.sparkSession.createDataFrame(
            [], "sel_round int, vec_id long, min_dist2 double"
        )
    selected = [(0, [float(v) for v in first[0]["vec"]], 0.0)]
    for _ in range(1, KCENTER_K):
        dmin = None
        for _, c, _ in selected:
            term = d2(F.col("vec"), c)
            dmin = term if dmin is None else F.least(dmin, term)
        cand = (
            emb.withColumn("dmin", F.round(dmin, 9))
            .orderBy(F.col("dmin").desc(), F.col("vec_id").asc())
            .limit(1)
            .collect()[0]
        )
        selected.append(
            (
                int(cand["vec_id"]),
                [float(v) for v in cand["vec"]],
                float(cand["dmin"]),
            )
        )
    return emb.sparkSession.createDataFrame(
        [
            (i, vid, round(dm, 6))
            for i, (vid, _, dm) in enumerate(selected)
        ],
        "sel_round int, vec_id long, min_dist2 double",
    )


def _oracle_kcenter() -> str:
    d2 = (
        "list_reduce(list_transform(list_zip({a}, {b}),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, x) -> acc + x)"
    )
    ctes = [
        """v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
)""",
        """s0 AS (
  SELECT vec_id, vec, 0.0::DOUBLE AS dm FROM v WHERE vec_id = 0
)""",
        """m0 AS (
  SELECT v.vec_id, v.vec,
         round(""" + d2.format(a="v.vec", b="s0.vec") + """, 9) AS dmin
  FROM v CROSS JOIN s0
)""",
    ]
    for i in range(1, KCENTER_K):
        prev_m = f"m{i - 1}"
        ctes.append(f"""s{i} AS (
  SELECT vec_id, vec, dmin AS dm FROM {prev_m}
  ORDER BY dmin DESC, vec_id ASC LIMIT 1
)""")
        if i < KCENTER_K - 1:
            ctes.append(f"""m{i} AS (
  SELECT m.vec_id, m.vec,
         least(m.dmin, round("""
                + d2.format(a="m.vec", b=f"s{i}.vec")
                + f""", 9)) AS dmin
  FROM {prev_m} m CROSS JOIN s{i}
)""")
    selects = ["SELECT 0 AS sel_round, vec_id, 0.0 AS min_dist2 FROM s0"] + [
        f"SELECT {i} AS sel_round, vec_id, round(dm, 6) AS min_dist2 FROM s{i}"
        for i in range(1, KCENTER_K)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


QUERIES["embedding_kcenter_coreset"] = (
    q_embedding_kcenter_coreset,
    _oracle_kcenter(),
)


# ------------------------------------------------- token burstiness

BURST_MIN_DF = 10
BURST_TOP_K = 25


def q_text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness (Church & Gale): variance-to-mean ratio of a
    token's per-document count, INCLUDING the zero-count documents —
    computed closed-form from (sum, sum of squares, N) so the
    vocabulary x documents zero matrix never materializes.  Bursty
    tokens (VMR >> 1) concentrate in few documents: boilerplate,
    templates, topical jargon — the cheap screen before the dup-span
    and hot-shingle passes.

    Plan: one (token, doc) count rollup, one vocabulary-scale token
    aggregate with the N-docs one-row broadcast, TakeOrdered top-K."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    tok = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.col("text")), "[^a-z]+")
        ).alias("token"),
    ).filter(F.length("token") >= 3)
    per_doc = tok.groupBy("token", "doc_id").agg(
        F.count("*").cast("double").alias("c")
    )
    stats = per_doc.groupBy("token").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    scored = stats.filter(F.col("df") >= BURST_MIN_DF).crossJoin(
        F.broadcast(n_docs)
    )
    mean = F.col("s") / F.col("n_docs")
    vmr = (F.col("ss") / F.col("n_docs") - mean * mean) / mean
    return (
        scored.select(
            "token",
            "df",
            F.col("s").cast("bigint").alias("total_count"),
            F.round(vmr, 6).alias("burstiness_vmr"),
        )
        .orderBy(F.col("burstiness_vmr").desc(), F.col("token").asc())
        .limit(BURST_TOP_K)
    )


ORACLE_BURSTINESS = f"""WITH n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
), tok AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(token)
  WHERE length(t.token) >= 3
), per_doc AS (
  SELECT token, doc_id, CAST(count(*) AS DOUBLE) AS c
  FROM tok GROUP BY 1, 2
), stats AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df,
         sum(c) AS s, sum(c * c) AS ss
  FROM per_doc GROUP BY 1
)
SELECT token, df, CAST(s AS BIGINT) AS total_count,
       round((ss / n.n_docs - (s / n.n_docs) * (s / n.n_docs))
             / (s / n.n_docs), 6) AS burstiness_vmr
FROM stats CROSS JOIN n
WHERE df >= {BURST_MIN_DF}
ORDER BY burstiness_vmr DESC, token ASC
LIMIT {BURST_TOP_K}"""

QUERIES["text_burstiness"] = (q_text_burstiness, ORACLE_BURSTINESS)


# ------------------------------------------- sample-ratio mismatch

SRM_CHI2_CRIT = 3.841  # chi-square 5%, df=1


def q_events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard for the A/B assignment: chi-square
    test that the user split actually lands 50/50.  SRM is the single
    most common silent invalidator of experiment readouts (broken
    bucketing, bot filtering applied per-arm, redirect loss) — every
    experimentation platform runs this before showing ANY metric.
    One distinct-user rollup; the test is a two-cell chi-square."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    users = ev.select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "user_id"
    ).distinct()
    counts = users.groupBy().agg(
        F.count(F.when(F.col("variant") == 0, 1)).cast("double").alias(
            "n0"
        ),
        F.count(F.when(F.col("variant") == 1, 1)).cast("double").alias(
            "n1"
        ),
    )
    # nullif guards the empty-assignment case (ANSI div-by-zero)
    exp = F.expr("nullif((n0 + n1) / 2, 0D)")
    mid = (F.col("n0") + F.col("n1")) / 2
    chi2 = (F.col("n0") - mid) ** 2 / exp + (F.col("n1") - mid) ** 2 / exp
    return counts.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > SRM_CHI2_CRIT).cast("int").alias("srm_detected"),
    )


ORACLE_SRM = f"""WITH u AS (
  SELECT DISTINCT CAST(user_id % 2 AS INT) AS variant, user_id
  FROM events
), c AS (
  SELECT CAST(count(CASE WHEN variant = 0 THEN 1 END) AS DOUBLE) AS n0,
         CAST(count(CASE WHEN variant = 1 THEN 1 END) AS DOUBLE) AS n1
  FROM u
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       round(pow(n0 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2)
           + pow(n1 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2), 6) AS chi2,
       CAST(pow(n0 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2)
          + pow(n1 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2)
          > {SRM_CHI2_CRIT} AS INT) AS srm_detected
FROM c"""

QUERIES["events_ab_srm_check"] = (q_events_ab_srm_check, ORACLE_SRM)
