"""Wave-5 plans: resampling, corpus keywords, attribution, Bloom scrub.

Engine-completeness surface beyond the reference
(vpuhoff/prometheus-anomaly-detection-lstm preprocesses metrics with a
fixed pandas chain — preprocess_data.py — and has none of these):

- ``metric_resample_interpolate``: linear interpolation of every series
  onto a regular hourly grid — the resampling step a metrics store runs
  before cross-series math (PromQL's evaluation-grid semantics, done as
  a batch operator).
- ``text_log_odds_keywords``: per-language distinctive terms via
  log-odds ratio with an informative Dirichlet prior (Monroe et al.
  2008, "Fightin' Words") — the standard corpus-comparison statistic.
- ``events_attribution``: last-touch revenue attribution — each
  purchase credits the user's most recent preceding non-purchase event
  type; the classic marketing-funnel readout.
- ``corpus_bloom_decontaminate``: the benchmark scrub re-planned as a
  Bloom-prefiltered join — answer-identical to
  :func:`..operators.corpus.decontaminate` (same oracle), but the
  corpus-side n-gram stream is cut to Bloom candidates BEFORE any join.

Scale notes (100 TB):

- Resample: everything is per-series — the sample collapse, the grid
  generation (one row per series feeds ``sequence``), and both carry
  windows share ONE hashpartitioning(metric) exchange; parallelism
  grows with label cardinality and no global sort exists anywhere.
- Keywords: token explode reduces map-side into a (lang, token) keyed
  aggregate; every later frame is vocabulary-scale (independent of
  corpus row count), so the joins and the per-lang rank window cost
  O(|vocab|) no matter how large the corpus.
- Attribution: one hashpartitioning(user_id) exchange for the
  carry-forward window; the channel rollup is metadata-scale.
- Bloom scrub: the benchmark set is fixed-size (a benchmark), so its
  bit positions collect to the driver and ship as a literal bitset —
  the corpus-side membership test is a map-only projection (two JVM
  hashes + bit tests), and only surviving candidate grams enter the
  exact verify join.  False positives cannot leak into the answer: the
  exact join re-checks every candidate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import ntz_epoch_seconds
from ..io_tables import load_table
from ..operators.corpus import DECON_BENCH_MOD, DECON_NGRAM

QUERIES: dict = {}

#: resample grid step (seconds) — hourly, the chart/alerting cadence.
GRID_STEP = 3600
#: Dirichlet prior mass for the log-odds keywords (Monroe et al. a0).
KEYWORD_PRIOR = 100.0
#: minimum corpus count for a token to be scored at all.
KEYWORD_MIN_COUNT = 10
#: distinctive terms kept per language.
KEYWORD_TOP_K = 5
#: Bloom sizing: bits per benchmark n-gram (k=2 hashes -> ~11% fpp;
#: the exact verify join removes every false positive).
BLOOM_BITS_PER_KEY = 16
BLOOM_HASHES = 2


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> (metric, ts, value) sample stream (same adapter as
    operators/promql._samples: event_type is the series label)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("metric"), "ts", "value"
    )


# --------------------------------------------- resample + interpolation

def resample_interpolate(s: DataFrame, step: int = GRID_STEP) -> DataFrame:
    """Linear interpolation of each series onto a regular ``step`` grid.

    Duplicate timestamps collapse to their mean first (so the bracketing
    samples are well-defined), then grid points and samples merge into
    one per-series ordered stream: a forward carry window supplies the
    previous (ts, value) sample, a backward one the next, and the grid
    value is the exact sample on a hit or the linear blend otherwise.
    Grid bounds are ceil(min)/floor(max), so both brackets always
    exist.  All three window passes reuse the same
    hashpartitioning(metric) exchange.
    """
    pts = (
        s.select("metric", ntz_epoch_seconds("ts").alias("e"), "value")
        .groupBy("metric", "e")
        .agg(F.avg("value").alias("val"))
    )
    bounds = pts.groupBy("metric").agg(
        (F.ceil(F.min("e") / step) * step).cast("long").alias("g0"),
        (F.floor(F.max("e") / step) * step).cast("long").alias("g1"),
    )
    grid = bounds.filter(F.col("g0") <= F.col("g1")).select(
        "metric",
        F.explode(F.expr(f"sequence(g0, g1, {step})")).alias("ge"),
    )
    unioned = pts.select(
        "metric", "e", F.lit(0).alias("is_grid"), "val"
    ).unionByName(
        grid.select(
            "metric",
            F.col("ge").cast("double").alias("e"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("double").alias("val"),
        )
    )
    fwd = (
        Window.partitionBy("metric")
        .orderBy("e", "is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # The next-sample carry is a RUNNING frame over the reversed sort,
    # NOT a [current, unboundedFollowing] frame: Spark re-evaluates
    # unbounded-FOLLOWING aggregates from scratch at every row (O(n²)
    # per series — measured 48 s on 100k samples where this form takes
    # under a second).  Descending (e, is_grid) keeps the tie rule
    # identical: an equal-epoch sample still sorts outside the grid
    # row's frame, so exact hits resolve through the forward carry.
    bwd = (
        Window.partitionBy("metric")
        .orderBy(F.desc("e"), F.desc("is_grid"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sample_e = F.when(F.col("val").isNotNull(), F.col("e"))
    interp = F.when(F.col("pe") == F.col("e"), F.col("pv")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (F.col("e") - F.col("pe"))
        / (F.col("ne") - F.col("pe"))
    )
    return (
        unioned.select(
            "metric",
            "e",
            "is_grid",
            F.last("val", ignorenulls=True).over(fwd).alias("pv"),
            F.last(sample_e, ignorenulls=True).over(fwd).alias("pe"),
            F.last("val", ignorenulls=True).over(bwd).alias("nv"),
            F.last(sample_e, ignorenulls=True).over(bwd).alias("ne"),
        )
        .filter(F.col("is_grid") == 1)
        .select(
            "metric",
            F.col("e").cast("long").alias("grid_epoch"),
            F.round(interp, 6).alias("value_interp"),
        )
    )


def q_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample_interpolate(_series(spark, sf_dir))


ORACLE_RESAMPLE = f"""WITH s AS (
  SELECT event_type AS metric, epoch(ts) AS e, avg(value) AS val
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT metric,
         CAST(ceil(min(e) / {GRID_STEP}) * {GRID_STEP} AS BIGINT) AS g0,
         CAST(floor(max(e) / {GRID_STEP}) * {GRID_STEP} AS BIGINT) AS g1
  FROM s GROUP BY 1
),
g AS (
  SELECT metric, CAST(u.ge AS DOUBLE) AS e
  FROM b, unnest(generate_series(g0, g1, {GRID_STEP})) AS u(ge)
  WHERE g0 <= g1
),
u AS (
  SELECT metric, e, 0 AS is_grid, val FROM s
  UNION ALL
  SELECT metric, e, 1 AS is_grid, NULL AS val FROM g
),
w AS (
  SELECT metric, e, is_grid,
    last_value(val IGNORE NULLS) OVER (
      PARTITION BY metric ORDER BY e, is_grid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN val IS NOT NULL THEN e END IGNORE NULLS) OVER (
      PARTITION BY metric ORDER BY e, is_grid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pe,
    first_value(val IGNORE NULLS) OVER (
      PARTITION BY metric ORDER BY e, is_grid
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN val IS NOT NULL THEN e END IGNORE NULLS) OVER (
      PARTITION BY metric ORDER BY e, is_grid
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ne
  FROM u
)
SELECT metric, CAST(e AS BIGINT) AS grid_epoch,
       round(CASE WHEN pe = e THEN pv
                  ELSE pv + (nv - pv) * (e - pe) / (ne - pe) END,
             6) AS value_interp
FROM w WHERE is_grid = 1"""

QUERIES["metric_resample_interpolate"] = (q_resample_interpolate, ORACLE_RESAMPLE)


# ------------------------------------------------ log-odds keywords

#: word tokens only (the keyword statistic is about vocabulary, not
#: punctuation) — lowercased a-z runs.
WORD_RE = "[a-z]+"


def log_odds_keywords(
    docs: DataFrame,
    a0: float = KEYWORD_PRIOR,
    min_count: int = KEYWORD_MIN_COUNT,
    top_k: int = KEYWORD_TOP_K,
) -> DataFrame:
    """Per-language distinctive terms: log-odds ratio, informative
    Dirichlet prior (Monroe et al. 2008).

    For token w in language l vs the REST of the corpus r:

        a_w   = a0 * y_w / n                     (corpus-shaped prior)
        d     = ln((y_lw + a_w) / (n_l + a0 - y_lw - a_w))
              - ln((y_rw + a_w) / (n_r + a0 - y_rw - a_w))
        z     = d / sqrt(1/(y_lw + a_w) + 1/(y_rw + a_w))

    The token explode map-reduces into ONE (lang, token) keyed
    aggregate; every subsequent frame (per-token totals, per-lang
    totals, the rank window) is vocabulary-scale, so corpus size only
    affects the first aggregate's map side.
    """
    toks = docs.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), F.lit(0))
        ).alias("token"),
    )
    # lazily checkpointed: FOUR consumers read lt (t, l, n and the
    # join's left side) and Catalyst otherwise re-executes the
    # corpus-wide explode+agg per consumer (round-11 audit; the
    # association-rules precedent).  The materialized frame is
    # (lang x token) vocabulary-scale — tiny next to the corpus.
    # Executor-loss caveat: see events_association_rules (relational.py)
    # — preemptible deployments should use reliable checkpoint().
    lt = toks.groupBy("lang", "token").agg(
        F.count("*").cast("double").alias("y_lt")
    ).transform(cut_lineage)
    t = lt.groupBy("token").agg(F.sum("y_lt").alias("y_t"))
    l = lt.groupBy("lang").agg(F.sum("y_lt").alias("n_l"))
    n = lt.agg(F.sum("y_lt").alias("n"))
    j = (
        lt.join(t, "token")
        .join(l, "lang")
        .crossJoin(F.broadcast(n))
        .filter(F.col("y_t") >= min_count)
    )
    a_t = F.lit(a0) * F.col("y_t") / F.col("n")
    y_rt = F.col("y_t") - F.col("y_lt")
    n_r = F.col("n") - F.col("n_l")
    d = F.log(
        (F.col("y_lt") + a_t) / (F.col("n_l") + F.lit(a0) - F.col("y_lt") - a_t)
    ) - F.log((y_rt + a_t) / (n_r + F.lit(a0) - y_rt - a_t))
    z = d / F.sqrt(1.0 / (F.col("y_lt") + a_t) + 1.0 / (y_rt + a_t))
    scored = j.select(
        "lang",
        "token",
        F.col("y_lt").cast("long").alias("lang_count"),
        F.round(z, 6).alias("log_odds_z"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("log_odds_z"), F.asc("token")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("lang", "token", "lang_count", "log_odds_z",
                F.col("rk").cast("long").alias("rk"))
    )


def q_log_odds_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return log_odds_keywords(load_table(spark, sf_dir, "documents"))


ORACLE_KEYWORDS = f"""WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS token
  FROM documents
),
lt AS (
  SELECT lang, token, CAST(count(*) AS DOUBLE) AS y_lt
  FROM toks GROUP BY 1, 2
),
t AS (SELECT token, sum(y_lt) AS y_t FROM lt GROUP BY 1),
l AS (SELECT lang, sum(y_lt) AS n_l FROM lt GROUP BY 1),
n AS (SELECT sum(y_lt) AS n FROM lt),
j AS (
  SELECT lt.lang, lt.token, y_lt, y_t, n_l, n,
         {KEYWORD_PRIOR} * y_t / n AS a_t
  FROM lt JOIN t USING (token) JOIN l USING (lang) CROSS JOIN n
  WHERE y_t >= {KEYWORD_MIN_COUNT}
),
scored AS (
  SELECT lang, token, CAST(y_lt AS BIGINT) AS lang_count,
    round((ln((y_lt + a_t) / (n_l + {KEYWORD_PRIOR} - y_lt - a_t))
         - ln((y_t - y_lt + a_t) / (n - n_l + {KEYWORD_PRIOR} - (y_t - y_lt) - a_t)))
      / sqrt(1.0 / (y_lt + a_t) + 1.0 / (y_t - y_lt + a_t)), 6) AS log_odds_z
  FROM j
),
rk AS (
  SELECT lang, token, lang_count, log_odds_z,
         row_number() OVER (PARTITION BY lang
                            ORDER BY log_odds_z DESC, token ASC) AS rk
  FROM scored
)
SELECT lang, token, lang_count, log_odds_z, CAST(rk AS BIGINT) AS rk
FROM rk WHERE rk <= {KEYWORD_TOP_K}"""

QUERIES["text_log_odds_keywords"] = (q_log_odds_keywords, ORACLE_KEYWORDS)


# ------------------------------------------------- last-touch attribution

def last_touch_attribution(ev: DataFrame) -> DataFrame:
    """Last-touch revenue attribution: each purchase credits the
    user's most recent PRECEDING non-purchase event type; purchases
    with no prior touch are 'direct'.

    One hashpartitioning(user_id) exchange carries the
    last-non-purchase (type, ts) forward; the per-channel rollup is
    metadata-scale (|event types| rows).
    """
    e = ntz_epoch_seconds("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type") != "purchase"
    touch_type = F.last(
        F.when(is_touch, F.col("event_type")), ignorenulls=True
    ).over(w)
    touch_e = F.last(F.when(is_touch, e), ignorenulls=True).over(w)
    purchases = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            "value",
            touch_type.alias("__touch"),
            (e - touch_e).alias("__latency"),
        )
        .filter(F.col("event_type") == "purchase")
    )
    return (
        purchases.groupBy(
            F.coalesce(F.col("__touch"), F.lit("direct")).alias("channel")
        )
        .agg(
            F.count("*").alias("purchases"),
            F.round(F.sum("value"), 2).alias("attributed_revenue"),
            F.round(F.avg("__latency"), 2).alias("avg_latency_s"),
        )
    )


def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return last_touch_attribution(load_table(spark, sf_dir, "events"))


ORACLE_ATTRIBUTION = """WITH w AS (
  SELECT user_id, event_id, ts, event_type, value,
    last_value(CASE WHEN event_type != 'purchase' THEN event_type END
               IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch,
    epoch(ts) - last_value(CASE WHEN event_type != 'purchase'
                                THEN epoch(ts) END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS latency
  FROM events
)
SELECT COALESCE(touch, 'direct') AS channel,
       count(*) AS purchases,
       round(sum(value), 2) AS attributed_revenue,
       round(avg(latency), 2) AS avg_latency_s
FROM w WHERE event_type = 'purchase'
GROUP BY 1"""

QUERIES["events_attribution"] = (q_last_touch_attribution, ORACLE_ATTRIBUTION)


# -------------------------------------------- Bloom-prefiltered scrub

def _gram_stream(docs: DataFrame, n: int) -> DataFrame:
    """Distinct (doc_id, gram) word n-grams — the SAME helper the
    inverted-index decontaminate uses, so the two plans can never
    drift apart on tokenization."""
    from ..operators.corpus import gram_stream

    return gram_stream(docs, n)


def _bloom_position_sql(i: int, m_mask: int) -> str:
    """The i-th Bloom bit position of `gram`, as a Spark SQL expression.

    Double hashing over the two JVM hash families Spark exposes
    (xxhash64 + murmur3), each masked into [0, m) BEFORE combining so
    the sum can never overflow a long (ANSI-safe).  The SAME expression
    computes the benchmark-side positions (collected once) and the
    corpus-side membership test, so no hash function is ever
    reimplemented driver-side.
    """
    return (
        f"(((xxhash64(gram) & {m_mask}) + "
        f"{i} * (cast(hash(gram) as bigint) & {m_mask})) & {m_mask})"
    )


def _bloom_positions(m_mask: int, k: int = BLOOM_HASHES):
    """Column form of :func:`_bloom_position_sql` for the k hashes."""
    return [F.expr(_bloom_position_sql(i, m_mask)) for i in range(k)]


def _bloom_candidates(
    docs: DataFrame,
    n: int = DECON_NGRAM,
    bench_mod: int = DECON_BENCH_MOD,
) -> tuple[DataFrame, DataFrame]:
    """(candidate non-benchmark grams surviving the Bloom test,
    distinct benchmark grams) — split out so tests can measure the
    prefilter's candidate volume directly."""
    grams = _gram_stream(docs, n)
    is_bench = F.col("doc_id") % bench_mod == 0
    bench = grams.filter(is_bench).select("gram").distinct()

    # benchmark bit positions: computed by the SAME Catalyst
    # expressions the corpus test uses, collected once (benchmark-sized
    # driver work, like broadcasting any dimension).
    n_bench = bench.count()
    m = 1 << max(10, math.ceil(math.log2(max(1, n_bench) * BLOOM_BITS_PER_KEY)))
    mask = m - 1
    pos_rows = bench.select(
        F.array(*_bloom_positions(mask)).alias("ps")
    ).collect()
    bits = [0] * (m // 64)
    for row in pos_rows:
        for p in row["ps"]:
            bits[p >> 6] |= 1 << (p & 63)
    # two's-complement into signed 64-bit for the LongType literal
    signed = [b - (1 << 64) if b >= (1 << 63) else b for b in bits]
    bitset = F.array(*[F.lit(b).cast("long") for b in signed])

    cand = grams.filter(~is_bench).withColumn("__bs", bitset)
    for i in range(BLOOM_HASHES):
        p = _bloom_position_sql(i, mask)
        cand = cand.filter(
            F.expr(
                f"(shiftright(element_at(__bs, cast({p} div 64 as int) + 1),"
                f" cast({p} % 64 as int)) & 1) = 1"
            )
        )
    return cand.drop("__bs"), bench


def bloom_decontaminate(
    docs: DataFrame,
    n: int = DECON_NGRAM,
    bench_mod: int = DECON_BENCH_MOD,
) -> DataFrame:
    """Benchmark decontamination, Bloom-prefiltered: answer-identical to
    :func:`..operators.corpus.decontaminate`, but the corpus n-gram
    stream is cut to Bloom candidates BEFORE the verify join.

    The benchmark set is fixed-size (it is a benchmark), so its Bloom
    bit positions collect to the driver once and ship to every executor
    as a literal long[] bitset — at 100 TB the corpus side pays two JVM
    hashes and two bit tests per gram (map-only, whole-stage codegen)
    and only the surviving ~fpp fraction enters the exact join, whose
    equi-match on the real gram text removes every false positive.
    """
    cand, bench = _bloom_candidates(docs, n, bench_mod)
    return (
        cand.join(bench, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bloom_decontaminate(load_table(spark, sf_dir, "documents"))


# answer-identical to the inverted-index plan -> identical oracle.
from ..operators.corpus import ORACLE_DECONTAMINATE as _ORACLE_DECON
from ..functions.checkpoint import cut_lineage

QUERIES["corpus_bloom_decontaminate"] = (q_bloom_decontaminate, _ORACLE_DECON)


# ------------------------------------------------ frequent path mining

#: minimum occurrences for a length-3 path to be reported.
PATH_MIN_SUPPORT = 5


def frequent_paths(ev: DataFrame, min_support: int = PATH_MIN_SUPPORT) -> DataFrame:
    """Frequent length-3 event sequences per user (the PrefixSpan-style
    sequential-pattern stage behind funnel discovery, one level deeper
    than ``user_path_transitions``'s bigrams).

    Two leads on the SAME user_id window share one exchange; the
    trigram rollup is bounded-key (|event_types|³ — metadata scale at
    any SF).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    ).filter(F.col("s3").isNotNull())
    return (
        seq.groupBy("s1", "s2", "s3")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_support)
    )


def q_frequent_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return frequent_paths(load_table(spark, sf_dir, "events"))


ORACLE_FREQUENT_PATHS = f"""WITH s AS (
  SELECT event_type AS s1,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS s2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS s3
  FROM events
)
SELECT s1, s2, s3, count(*) AS n
FROM s WHERE s3 IS NOT NULL
GROUP BY 1, 2, 3 HAVING count(*) >= {PATH_MIN_SUPPORT}"""

QUERIES["events_frequent_paths"] = (q_frequent_paths, ORACLE_FREQUENT_PATHS)


# ---------------------------------------------- open-order backlog curve

def backlog_daily(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Open-order backlog over time via the boundary-event trick: each
    order contributes +1 at its order date and -1 the day after its
    last shipment — NO interval join ever materializes.  The running sum
    over per-day deltas is the backlog curve at every boundary day
    (stepwise-constant between boundaries).

    Scale shape: the close-date rollup shuffles on l_orderkey (the
    orders join reuses that exchange), the day rollup is
    bounded-cardinality (|distinct days| ~ 2.5k for TPC-H), and the
    final running window orders THAT metadata-scale frame — the classic
    way to count overlapping intervals at 100 TB without an
    interval/range join.
    """
    closes = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    spans = orders.select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    ).join(closes, "l_orderkey")
    deltas = spans.select(
        F.to_date("o_orderdate").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.date_add(F.to_date("last_ship"), 1).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("d"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        # ISO string, not DATE: the two engines' drivers materialize
        # DATE differently (python date vs datetime64), so the stable
        # cross-engine surface is the formatted day.
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.sum("d").over(w).cast("long").alias("backlog"),
    )


def q_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return backlog_daily(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


ORACLE_BACKLOG = """WITH closes AS (
  SELECT l_orderkey, max(l_shipdate) AS last_ship
  FROM lineitem GROUP BY 1
),
spans AS (
  SELECT o.o_orderdate, c.last_ship
  FROM orders o JOIN closes c ON o.o_orderkey = c.l_orderkey
),
deltas AS (
  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM spans
  UNION ALL
  SELECT CAST(last_ship AS DATE) + 1 AS day, -1 AS delta FROM spans
),
daily AS (SELECT day, sum(delta) AS d FROM deltas GROUP BY 1)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(sum(d) OVER (ORDER BY day
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
FROM daily"""

QUERIES["orders_backlog_daily"] = (q_backlog_daily, ORACLE_BACKLOG)


# ---------------------------------------------- data-quality constraints

def quality_checks(
    orders: DataFrame,
    customer: DataFrame,
    lineitem: DataFrame,
    events: DataFrame,
) -> DataFrame:
    """Declarative data-quality constraint suite (the Deequ pattern):
    each check is one aggregate row (check, violations, total, passed)
    and the report is their union.

    Check shapes and their scale behavior:
    - referential integrity: LEFT ANTI equi-join, counts only the
      orphan side — shuffles on the key like any join, output one row;
    - uniqueness: count vs count(distinct) in one aggregate;
    - range / completeness: conditional counts, map-side partial aggs.
    Every subtree reduces to a one-row frame before the union, so the
    report costs one pass over each table regardless of SF.
    """
    def row(name: str, viol, total):
        return (
            F.lit(name).alias("check"),
            viol.cast("long").alias("violations"),
            total.cast("long").alias("total"),
            (viol == 0).cast("long").alias("passed"),
        )

    ref_cust = (
        orders.join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count("*").alias("v"))
        .crossJoin(F.broadcast(orders.agg(F.count("*").alias("t"))))
        .select(*row("orders.custkey_in_customer", F.col("v"), F.col("t")))
    )
    ref_ord = (
        lineitem.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count("*").alias("v"))
        .crossJoin(F.broadcast(lineitem.agg(F.count("*").alias("t"))))
        .select(*row("lineitem.orderkey_in_orders", F.col("v"), F.col("t")))
    )
    uniq = orders.agg(
        F.count("*").alias("t"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("v"),
    ).select(*row("orders.orderkey_unique", F.col("v"), F.col("t")))
    qty_range = lineitem.agg(
        F.count("*").alias("t"),
        F.sum(
            (
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
            ).cast("long")
        ).alias("v"),
    ).select(*row("lineitem.quantity_in_1_50", F.col("v"), F.col("t")))
    complete = events.agg(
        F.count("*").alias("t"),
        F.sum(F.col("value").isNull().cast("long")).alias("v"),
    ).select(*row("events.value_not_null", F.col("v"), F.col("t")))
    nonneg = orders.agg(
        F.count("*").alias("t"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("v"),
    ).select(*row("orders.totalprice_positive", F.col("v"), F.col("t")))
    return (
        ref_cust.unionByName(ref_ord)
        .unionByName(uniq)
        .unionByName(qty_range)
        .unionByName(complete)
        .unionByName(nonneg)
    )


def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_checks(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "events"),
    )


ORACLE_QUALITY = """SELECT 'orders.custkey_in_customer' AS check,
  (SELECT count(*) FROM orders o LEFT JOIN customer c
     ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS violations,
  (SELECT count(*) FROM orders) AS total,
  CAST((SELECT count(*) FROM orders o LEFT JOIN customer c
     ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) = 0
   AS BIGINT) AS passed
UNION ALL
SELECT 'lineitem.orderkey_in_orders',
  (SELECT count(*) FROM lineitem l LEFT JOIN orders o
     ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL),
  (SELECT count(*) FROM lineitem),
  CAST((SELECT count(*) FROM lineitem l LEFT JOIN orders o
     ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) = 0
   AS BIGINT)
UNION ALL
SELECT 'orders.orderkey_unique',
  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders),
  (SELECT count(*) FROM orders),
  CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) = 0
   AS BIGINT)
UNION ALL
SELECT 'lineitem.quantity_in_1_50',
  (SELECT count(*) FILTER (l_quantity < 1 OR l_quantity > 50) FROM lineitem),
  (SELECT count(*) FROM lineitem),
  CAST((SELECT count(*) FILTER (l_quantity < 1 OR l_quantity > 50)
        FROM lineitem) = 0 AS BIGINT)
UNION ALL
SELECT 'events.value_not_null',
  (SELECT count(*) FILTER (value IS NULL) FROM events),
  (SELECT count(*) FROM events),
  CAST((SELECT count(*) FILTER (value IS NULL) FROM events) = 0 AS BIGINT)
UNION ALL
SELECT 'orders.totalprice_positive',
  (SELECT count(*) FILTER (o_totalprice <= 0) FROM orders),
  (SELECT count(*) FROM orders),
  CAST((SELECT count(*) FILTER (o_totalprice <= 0) FROM orders) = 0
   AS BIGINT)"""

QUERIES["table_quality_checks"] = (q_quality_checks, ORACLE_QUALITY)


# ------------------------------------- point-in-time feature snapshot

#: trailing feature horizon (seconds) — 7 days.
PIT_HORIZON = 604800


def pointintime_features(ev: DataFrame, horizon: int = PIT_HORIZON) -> DataFrame:
    """Point-in-time-correct feature snapshot at every purchase: the
    user's trailing-``horizon`` event counts and spend STRICTLY BEFORE
    the purchase instant — the feature-store primitive that prevents
    label leakage (a training row must never see its own label's
    moment or anything after it).

    One hashpartitioning(user_id) exchange; all four features are
    conditional sums over the SAME bounded RANGE frame (range upper
    bound -1 excludes the purchase second itself, identically in both
    engines).  At 100 TB the frame is bounded by the horizon, so state
    per row is O(events-in-horizon), never O(history).
    """
    e = ntz_epoch_seconds("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__e"))
        .rangeBetween(-horizon, -1)
    )
    base = ev.select(
        "user_id", "event_id", "event_type", "value", e.alias("__e")
    )
    cnt = lambda t: F.sum((F.col("event_type") == t).cast("long")).over(w)
    spend = F.sum(
        F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
            0.0
        )
    ).over(w)
    return (
        base.select(
            "user_id",
            "event_id",
            "event_type",
            F.coalesce(cnt("click"), F.lit(0)).alias("n_clicks_7d"),
            F.coalesce(cnt("view"), F.lit(0)).alias("n_views_7d"),
            F.coalesce(cnt("error"), F.lit(0)).alias("n_errors_7d"),
            F.round(F.coalesce(spend, F.lit(0.0)), 2).alias("spend_7d"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "event_id", "n_clicks_7d", "n_views_7d",
            "n_errors_7d", "spend_7d",
        )
    )


def q_pointintime_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return pointintime_features(load_table(spark, sf_dir, "events"))


ORACLE_PIT = f"""WITH b AS (
  SELECT user_id, event_id, event_type, value,
         -- floor, not CAST: DuckDB CAST-to-BIGINT ROUNDS while Spark's
         -- cast('long') truncates; with fractional-second timestamps a
         -- .5+ second would shift the frame boundary by one second
         CAST(floor(epoch(ts)) AS BIGINT) AS e
  FROM events
),
w AS (
  SELECT user_id, event_id, event_type,
    CAST(COALESCE(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             OVER f, 0) AS BIGINT) AS n_clicks_7d,
    CAST(COALESCE(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             OVER f, 0) AS BIGINT) AS n_views_7d,
    CAST(COALESCE(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             OVER f, 0) AS BIGINT) AS n_errors_7d,
    round(COALESCE(sum(CASE WHEN event_type = 'purchase' THEN value
                            ELSE 0.0 END) OVER f, 0.0), 2) AS spend_7d
  FROM b
  WINDOW f AS (PARTITION BY user_id ORDER BY e
               RANGE BETWEEN {PIT_HORIZON} PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, n_clicks_7d, n_views_7d, n_errors_7d, spend_7d
FROM w WHERE event_type = 'purchase'"""

QUERIES["events_pointintime_features"] = (q_pointintime_features, ORACLE_PIT)


# ------------------------------------------------ churn label generation

#: churn horizon (days): no order in the dataset's final N days.
CHURN_DAYS = 90


def churn_labels(orders: DataFrame, days: int = CHURN_DAYS) -> DataFrame:
    """Training-label generation: a customer is 'churned' if their last
    order predates the dataset horizon minus ``days``.

    The horizon is a ONE-ROW max aggregate broadcast into a map-only
    comparison over the per-customer rollup — one o_custkey exchange,
    no date logic on the driver.
    """
    last = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order")
    )
    horizon = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("max_day")
    )
    return (
        last.crossJoin(F.broadcast(horizon))
        .select(
            "o_custkey",
            F.date_format("last_order", "yyyy-MM-dd").alias("last_order_day"),
            (
                F.col("last_order") < F.date_sub(F.col("max_day"), days)
            ).cast("long").alias("churned"),
        )
    )


def q_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return churn_labels(load_table(spark, sf_dir, "orders"))


ORACLE_CHURN = f"""WITH last AS (
  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_order
  FROM orders GROUP BY 1
),
h AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_day FROM orders)
SELECT o_custkey, strftime(last_order, '%Y-%m-%d') AS last_order_day,
       CAST(last_order < max_day - {CHURN_DAYS} AS BIGINT) AS churned
FROM last, h"""

QUERIES["orders_churn_labels"] = (q_churn_labels, ORACLE_CHURN)


# -------------------------------------------- JSON key profiling

def props_key_profile(ev: DataFrame) -> DataFrame:
    """Schema inference over a semi-structured JSON column: per key,
    how often it appears, its distinct-value count, and how many values
    parse as numbers — the drift detector a 100-TB event pipeline runs
    when upstream teams own the payload.

    ``from_json`` to ``map<string,string>`` keeps the parse JVM-side
    (one codegen projection), the explode is map-only, and the only
    shuffle is the keyed aggregate on the (small) key space.
    """
    kv = ev.select(
        F.explode(
            F.from_json(F.col("props"), "map<string,string>")
        ).alias("key", "val")
    )
    return kv.groupBy("key").agg(
        F.count("*").alias("n"),
        F.countDistinct("val").alias("n_distinct"),
        F.sum(
            F.expr("try_cast(val AS double)").isNotNull().cast("long")
        ).alias("n_numeric"),
    )


def q_props_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return props_key_profile(load_table(spark, sf_dir, "events"))


ORACLE_PROPS_PROFILE = """WITH kv AS (
  SELECT u.k AS key,
         json_extract_string(props, '$.' || u.k) AS val
  FROM events, unnest(json_keys(props)) AS u(k)
)
SELECT key, count(*) AS n,
       count(DISTINCT val) AS n_distinct,
       CAST(count(*) FILTER (try_cast(val AS DOUBLE) IS NOT NULL)
            AS BIGINT) AS n_numeric
FROM kv GROUP BY 1"""

QUERIES["events_props_key_profile"] = (
    q_props_key_profile,
    ORACLE_PROPS_PROFILE,
)


# ------------------------------------------------ DAU / WAU engagement

def dau_wau(ev: DataFrame) -> DataFrame:
    """Daily/weekly active users + stickiness (DAU/WAU) per day.

    A rolling COUNT(DISTINCT) window is not expressible in either
    engine, so the scalable shape is contribution fan-out: each
    (user, active day) pair — already deduplicated, the small frame —
    explodes to the <= 7 observation days it supports, and WAU is an
    ordinary distinct count per observation day.  The fan-out is
    bounded (x7) and happens AFTER the dedup, so the heavy stream is
    never multiplied; both aggregates shuffle on bounded keys.
    """
    day_users = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = day_users.groupBy("day").agg(
        F.count("*").cast("long").alias("dau")
    )
    contrib = day_users.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6))")
        ).alias("obs_day"),
    ).distinct()
    wau = contrib.groupBy("obs_day").agg(
        F.count("*").cast("long").alias("wau")
    )
    return (
        dau.join(wau, dau.day == wau.obs_day)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return dau_wau(load_table(spark, sf_dir, "events"))


ORACLE_DAU_WAU = """WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1),
contrib AS (
  SELECT DISTINCT user_id, CAST(u.d AS DATE) AS obs_day
  FROM du, unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS u(d)
),
wau AS (SELECT obs_day, CAST(count(*) AS BIGINT) AS wau
        FROM contrib GROUP BY 1)
SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau, wau,
       round(dau * 1.0 / wau, 6) AS stickiness
FROM dau JOIN wau ON dau.day = wau.obs_day"""

QUERIES["events_dau_wau"] = (q_dau_wau, ORACLE_DAU_WAU)
