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
    # hourly is METADATA-scale (series x hours) but both self-join
    # sides, the fit agg and the residual join all chained back to the
    # corpus rollup — Catalyst re-executed it per consumer (6 executed
    # scans, round-12 audit).  One lazy checkpoint of the tiny frame.
    # Executor-loss caveat: see events_association_rules (relational.py).
    hourly = ev.groupBy(
        F.col("event_type").alias("metric"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.avg("value").alias("y")).transform(cut_lineage)
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


# ------------------------------------- variance-shift GLR localization

VGLR_HALF = 24  # hours per side


def q_metric_glr_variance_change(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Variance-shift LOCALIZATION per series: the two-sample normal
    likelihood-ratio statistic for a VARIANCE change at every hourly
    boundary — the complement of metric_glr_changepoint, which only
    sees the mean.  Instability onset (jitter, oscillation, load
    thrash) moves the second moment long before the mean drifts.

        -2 ln L = n1 ln(s2_pool / s2_pre) + n2 ln(s2_pool / s2_post),
        s2_pool = (n1 s2_pre + n2 s2_post) / (n1 + n2)   (MLE vars)

    Same plan shape as the mean GLR: hourly rollup, two bounded frames
    on one per-series window exchange, argmax per series."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type").alias("metric"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.avg("value").alias("y"))
    w_pre = (
        Window.partitionBy("metric")
        .orderBy("hour")
        .rowsBetween(-VGLR_HALF, -1)
    )
    w_post = (
        Window.partitionBy("metric")
        .orderBy("hour")
        .rowsBetween(0, VGLR_HALF - 1)
    )
    framed = (
        hourly.withColumn("n1", F.count("y").over(w_pre))
        .withColumn("v1", F.var_pop("y").over(w_pre))
        .withColumn("n2", F.count("y").over(w_post))
        .withColumn("v2", F.var_pop("y").over(w_post))
        .filter(
            (F.col("n1") == VGLR_HALF)
            & (F.col("n2") == VGLR_HALF)
            & (F.col("v1") > 0)
            & (F.col("v2") > 0)
        )
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    pool = (n1 * F.col("v1") + n2 * F.col("v2")) / (n1 + n2)
    stat = n1 * F.log(pool / F.col("v1")) + n2 * F.log(
        pool / F.col("v2")
    )
    scored = framed.withColumn("stat", F.round(stat, 6))
    w_top = Window.partitionBy("metric").orderBy(
        F.col("stat").desc(), F.col("hour").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w_top))
        .filter(F.col("rk") == 1)
        .select(
            "metric",
            F.col("hour").alias("change_hour"),
            F.round("v1", 6).alias("var_pre"),
            F.round("v2", 6).alias("var_post"),
            F.col("stat").alias("vglr_stat"),
        )
    )


ORACLE_GLR_VARIANCE = f"""WITH hourly AS (
  SELECT event_type AS metric, date_trunc('hour', ts) AS hour,
         avg(value) AS y
  FROM events GROUP BY 1, 2
), framed AS (
  SELECT metric, hour,
         count(y) OVER pre AS n1, var_pop(y) OVER pre AS v1,
         count(y) OVER post AS n2, var_pop(y) OVER post AS v2
  FROM hourly
  WINDOW pre AS (PARTITION BY metric ORDER BY hour
                 ROWS BETWEEN {VGLR_HALF} PRECEDING AND 1 PRECEDING),
         post AS (PARTITION BY metric ORDER BY hour
                  ROWS BETWEEN CURRENT ROW AND {VGLR_HALF - 1} FOLLOWING)
), ok AS (
  SELECT * FROM framed
  WHERE n1 = {VGLR_HALF} AND n2 = {VGLR_HALF} AND v1 > 0 AND v2 > 0
), scored AS (
  SELECT metric, hour, v1, v2,
         round(n1 * ln(((n1 * v1 + n2 * v2) / (n1 + n2)) / v1)
             + n2 * ln(((n1 * v1 + n2 * v2) / (n1 + n2)) / v2), 6)
           AS stat
  FROM ok
), top AS (
  SELECT *, row_number() OVER (PARTITION BY metric
             ORDER BY stat DESC, hour ASC) AS rk
  FROM scored
)
SELECT metric, hour AS change_hour,
       round(v1, 6) AS var_pre, round(v2, 6) AS var_post,
       stat AS vglr_stat
FROM top WHERE rk = 1"""

QUERIES["metric_glr_variance_change"] = (
    q_metric_glr_variance_change,
    ORACLE_GLR_VARIANCE,
)


# ------------------------------------- sample n-gram coverage eval

COV_NGRAM = 3


def q_corpus_sample_ngram_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How much corpus DIVERSITY does the deterministic ~5% hash
    sample keep?  Reports distinct-3-gram coverage (what fraction of
    the full corpus's distinct 3-grams appear in the sample) and
    mass coverage (fraction of total 3-gram OCCURRENCES whose gram is
    sample-covered) — the eval a data-curation pipeline runs before
    trusting a sampled study.  Distinct coverage is the diversity
    number; mass coverage is always higher because frequent grams are
    caught by any sample (their gap is the long-tail loss).

    Plan: one gram explode + per-gram aggregate carrying total count
    and a sample-presence flag (conditional max) — vocabulary-scale;
    the readout is a one-row reduction."""
    from ..operators.corpus import SAMPLE_RATE_HEX, _md5_hex

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    in_sample = (
        F.substring(_md5_hex("doc_id"), 1, 6) < F.lit(SAMPLE_RATE_HEX)
    ).cast("int")
    toks = docs.select(
        "doc_id", in_sample.alias("s"), F.split("text", " ").alias("ws")
    ).filter(F.size("ws") >= COV_NGRAM)
    grams = toks.select(
        "s",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.size("ws") - F.lit(COV_NGRAM - 1)
                ),
                lambda i: F.concat_ws(
                    " ", F.slice("ws", i, COV_NGRAM)
                ),
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy("gram").agg(
        F.count("*").alias("cnt"),
        F.max("s").alias("covered"),
    )
    return per_gram.agg(
        F.count("*").cast("bigint").alias("distinct_grams"),
        F.sum("covered").cast("bigint").alias("covered_grams"),
        F.round(
            F.sum("covered") / F.count("*").cast("double"), 6
        ).alias("distinct_coverage"),
        F.round(
            F.sum(F.col("cnt") * F.col("covered"))
            / F.sum("cnt").cast("double"),
            6,
        ).alias("mass_coverage"),
    )


from ..operators.corpus import SAMPLE_RATE_HEX as _SRH
from ..functions.checkpoint import cut_lineage

ORACLE_SAMPLE_COVERAGE = f"""WITH toks AS (
  SELECT doc_id,
         CAST(substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) < '{_SRH}'
              AS INT) AS s,
         string_split(text, ' ') AS ws
  FROM documents
  WHERE len(string_split(text, ' ')) >= {COV_NGRAM}
), grams AS (
  SELECT s, array_to_string(list_slice(ws, i, i + {COV_NGRAM - 1}), ' ') AS gram
  FROM toks, unnest(generate_series(1, len(ws) - {COV_NGRAM - 1})) AS t(i)
), per_gram AS (
  SELECT gram, count(*) AS cnt, max(s) AS covered
  FROM grams GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS distinct_grams,
       CAST(sum(covered) AS BIGINT) AS covered_grams,
       round(sum(covered) / CAST(count(*) AS DOUBLE), 6)
         AS distinct_coverage,
       round(sum(cnt * covered) / CAST(sum(cnt) AS DOUBLE), 6)
         AS mass_coverage
FROM per_gram"""

QUERIES["corpus_sample_ngram_coverage"] = (
    q_corpus_sample_ngram_coverage,
    ORACLE_SAMPLE_COVERAGE,
)


# ------------------------------------- inter-source overlap matrix

OVL_NGRAM = 8


def q_text_source_overlap_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inter-SOURCE duplication matrix: for every ordered source pair,
    the count of shared distinct 8-gram fingerprints and the
    containment of the smaller-listed side — which datasets copy from
    which (mirrors, scrapes, shared boilerplate) BEFORE doc-level
    dedup mixes them.  The inter-dataset twin of the per-doc
    containment operator.

    Plan: gram explode -> distinct (source, md5 fingerprint) — the
    inverted-index discipline: the self-join runs on the fingerprint
    key, so only co-occurring fingerprints pair; per-source totals
    broadcast (source cardinality) for the containment shares."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.split("text", " ").alias("ws")
    ).filter(F.size("ws") >= OVL_NGRAM)
    fps = toks.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.size("ws") - F.lit(OVL_NGRAM - 1)
                ),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("ws", i, OVL_NGRAM)).cast(
                        "binary"
                    )
                ),
            )
        ).alias("fp"),
    ).distinct()
    totals = fps.groupBy("source").agg(F.count("*").alias("n_fp"))
    pairs = (
        fps.alias("a")
        .join(
            fps.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    ta = totals.select(
        F.col("source").alias("source_a"), F.col("n_fp").alias("n_a")
    )
    tb = totals.select(
        F.col("source").alias("source_b"), F.col("n_fp").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(F.col("n_common") / F.col("n_a"), 6).alias(
                "containment_a"
            ),
            F.round(F.col("n_common") / F.col("n_b"), 6).alias(
                "containment_b"
            ),
        )
    )


ORACLE_SOURCE_OVERLAP = f"""WITH toks AS (
  SELECT source, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= {OVL_NGRAM}
), fps AS (
  SELECT DISTINCT source,
         md5(array_to_string(list_slice(ws, i, i + {OVL_NGRAM - 1}), ' '))
           AS fp
  FROM toks, unnest(generate_series(1, len(ws) - {OVL_NGRAM - 1})) AS t(i)
), totals AS (
  SELECT source, count(*) AS n_fp FROM fps GROUP BY 1
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM fps a JOIN fps b
    ON a.fp = b.fp AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_common,
       round(n_common / CAST(ta.n_fp AS DOUBLE), 6) AS containment_a,
       round(n_common / CAST(tb.n_fp AS DOUBLE), 6) AS containment_b
FROM pairs
JOIN totals ta ON pairs.source_a = ta.source
JOIN totals tb ON pairs.source_b = tb.source"""

QUERIES["text_source_overlap_matrix"] = (
    q_text_source_overlap_matrix,
    ORACLE_SOURCE_OVERLAP,
)
