"""Extended operator coverage beyond the reference surface.

Temporal operators a production metrics/training-data platform needs
that neither the reference nor plain TPC-H exercises: sessionization,
as-of alignment, NaN accounting, corpus vocabulary statistics, and
element-wise aggregation over embedding vectors.  All pure Catalyst,
each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import single_partition_key
from ..io_tables import load_table
from ..operators import fill
from ..plans import pipeline as P
from ..functions.checkpoint import cut_lineage

SESSION_GAP_MIN = 30


def q_nan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-column NULL accounting on the aligned wide frame
    (preprocess_data.py:44, :72-74)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wide = P.wide_frame(spark, sf_dir)
    return fill.nan_counts(wide, P.METRICS)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-min silence starts a new session.

    lag + cumulative-sum-of-boundaries per user — the standard Spark
    sessionization idiom (one shuffle on user_id).  Output: per-session
    (user_id, session_id, n_events, start/end).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    from ..functions import ntz_epoch_seconds

    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # TZ-independent epoch seconds (calendar-field arithmetic): matches
    # DuckDB's epoch(ts), fractional part included, under ANY session
    # TZ — the cast-through-TIMESTAMP form silently depended on the
    # UTC pin above (advisor finding class).
    ts_sec = ntz_epoch_seconds("ts")
    gap = ts_sec - F.lag(ts_sec).over(w_user)
    new_sess = (
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    )
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess)
        .over(w_user.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


ORACLE_SESSIONIZE = f"""WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY 1, 2"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of alignment: for each 'error' event, the most recent 'click'
    at-or-before it (global time order).

    Spark lacks a native as-of join; the scalable formulation is the
    same bucket + broadcast-carry shape as fill.ffill_bfill_scalable:
    (1) per-day latest click (tiny summary, one row per day);
    (2) running carry over the summary = latest click STRICTLY BEFORE
        each day (metadata-scale window, deliberately one partition);
    (3) per-row running last(click_ts) PARTITIONED BY day, seeded with
        the broadcast carry for errors preceding their day's first
        click.  Identical to the global-window answer, no global sort.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    tagged = (
        ev.filter(F.col("event_type").isin("click", "error"))
        .select(
            "event_id",
            "ts",
            "event_type",
            F.when(F.col("event_type") == "click", F.col("ts")).alias(
                "click_ts"
            ),
        )
        .withColumn("__day", F.to_date("ts"))
    )
    summary = tagged.groupBy("__day").agg(
        F.max("click_ts").alias("__day_last_click")
    )
    # metadata-scale (~#days rows): constant partition key is deliberate
    w_prev = (
        Window.partitionBy(single_partition_key("__day"))
        .orderBy("__day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summary.select(
        "__day",
        F.last("__day_last_click", ignorenulls=True)
        .over(w_prev)
        .alias("__carry"),
    )
    w_day = (
        Window.partitionBy("__day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = tagged.join(F.broadcast(carry), "__day").withColumn(
        "last_click_ts",
        F.coalesce(
            F.last("click_ts", ignorenulls=True).over(w_day),
            F.col("__carry"),
        ),
    )
    return out.filter(F.col("event_type") == "error").select(
        "event_id", "ts", "last_click_ts"
    )


ORACLE_ASOF_JOIN = """WITH tagged AS (
  SELECT event_id, ts, event_type,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts
  FROM events WHERE event_type IN ('click', 'error')
),
r AS (
  SELECT event_id, ts, event_type,
         last_value(click_ts IGNORE NULLS) OVER (
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
  FROM tagged
)
SELECT event_id, ts, last_click_ts FROM r WHERE event_type = 'error'"""


def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer revenue over order time (cumsum window)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 6).alias("running_revenue"),
    )


ORACLE_RUNNING_REVENUE = """SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS running_revenue
FROM orders"""


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct cardinality per event type (count-distinct shuffle)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


ORACLE_DISTINCT_USERS = """SELECT event_type,
       count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY 1"""


def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: document frequency + total count per word,
    top level of any token-frequency pipeline (explode -> two-level agg)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    return words.groupBy("word").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count("*").alias("total_count"),
    )


ORACLE_VOCAB_STATS = """SELECT word,
       count(DISTINCT doc_id) AS doc_freq, count(*) AS total_count
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY 1"""


def q_embedding_mean_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label (posexplode -> keyed agg) —
    the centroid step of IVF index builds / k-means."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(F.avg(F.col("v").cast("double")), 6).alias("mean_v")
    ).select(F.col("label").cast("bigint").alias("label"), F.col("dim").cast("bigint").alias("dim"), "mean_v")


ORACLE_EMBEDDING_MEAN_BY_LABEL = """SELECT CAST(label AS BIGINT) AS label,
       CAST(dim - 1 AS BIGINT) AS dim,
       round(avg(v), 6) AS mean_v
FROM (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings
)
GROUP BY 1, 2"""


def q_events_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x event-type count matrix (pivot flavor #2)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("hour", F.hour("ts").cast("bigint"))
        .groupBy("hour")
        .pivot("event_type", P.METRICS)
        .agg(F.count(F.lit(1)))
        .na.fill(0, P.METRICS)
    )


ORACLE_EVENTS_HOURLY_PIVOT = (
    "SELECT CAST(hour(ts) AS BIGINT) AS hour,\n"
    + ",\n".join(
        f"       coalesce(count(*) FILTER (WHERE event_type = '{m}'), 0) AS {m}"
        for m in P.METRICS
    )
    + "\nFROM events GROUP BY 1"
)


def q_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing rolling mean/min/max features over the filled metrics
    frame — day-bucketed backward windows, no global sort."""
    from ..operators.windows import rolling_features

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = P.wide_frame(spark, sf_dir)
    df = fill.ffill_bfill_scalable(P.with_calendar(df), P.METRICS)
    # day_counts injection (the anomaly-family lever, round-12): the
    # chain over the pivot is row-preserving (calendar + fill are
    # projections/windows), so bucket_assign's three summary subtrees
    # read the shallow raw-events aggregate instead of re-executing
    # pivot->fill three times (scans 8 -> 5 measured by the audit —
    # the fill's own summary consumers keep the remaining rescans).
    out = rolling_features(
        df.select("ts", *P.METRICS),
        P.METRICS,
        10,
        day_counts=P.pivot_day_counts(spark, sf_dir),
    )
    cols = [F.col("ts")]
    for m in P.METRICS:
        cols += [
            F.round(f"{m}_mean", 6).alias(f"{m}_mean"),
            F.col(f"{m}_min"),
            F.col(f"{m}_max"),
        ]
    return out.select(*cols)


def _rolling_oracle() -> str:
    from ..oracles import pipeline_prefix

    cols = []
    for m in P.METRICS:
        frame = "OVER (ORDER BY ts ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)"
        cols += [
            f"round(avg({m}) {frame}, 6) AS {m}_mean",
            f"min({m}) {frame} AS {m}_min",
            f"max({m}) {frame} AS {m}_max",
        ]
    return (
        pipeline_prefix("filled")
        + "\nSELECT ts, "
        + ", ".join(cols)
        + " FROM filled"
    )


RANGE_JOIN_DAYS = 7


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (point-in-interval) join: how many urgent-order promotion
    windows cover each lineitem's ship date.

    Spark plans a raw BETWEEN join as a broadcast nested loop —
    O(points x intervals), dead at scale.  The scale-safe formulation
    bucketizes: explode each interval to the calendar days it can
    intersect, equi-join points on their day (hash join, pushdown-able)
    and apply the exact bounds as a post-filter.  Interval length
    bounds the explosion factor (8 rows per interval here); the join
    only ever touches (point, interval) pairs sharing a day.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr(f"INTERVAL {RANGE_JOIN_DAYS} DAYS")).alias("e"),
    )
    # cover every day the half-open interval [s, e) can intersect; the
    # exact predicate below removes the boundary overshoot
    iv_days = iv.withColumn(
        "__day",
        F.explode(F.sequence(F.to_date("s"), F.to_date("e"))),
    )
    pts = li.select("l_orderkey", "l_linenumber", "l_shipdate").withColumn(
        "__day", F.to_date("l_shipdate")
    )
    return (
        pts.join(iv_days, "__day")
        .filter(
            (F.col("l_shipdate") >= F.col("s"))
            & (F.col("l_shipdate") < F.col("e"))
        )
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("n_covering"))
    )


ORACLE_RANGE_JOIN = f"""WITH iv AS (
  SELECT o_orderkey, o_orderdate AS s,
         o_orderdate + INTERVAL {RANGE_JOIN_DAYS} DAY AS e
  FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT l.l_orderkey, l.l_linenumber, CAST(count(*) AS BIGINT) AS n_covering
FROM lineitem l JOIN iv ON l.l_shipdate >= iv.s AND l.l_shipdate < iv.e
GROUP BY 1, 2"""


QUERIES = {
    "nan_counts": (q_nan_counts, None),  # oracle set at import bottom
    "range_join_interval_counts": (q_range_join, ORACLE_RANGE_JOIN),
    "rolling_features": (q_rolling_features, None),  # oracle set at bottom
    "sessionize": (q_sessionize, ORACLE_SESSIONIZE),
    "asof_join": (q_asof_join, ORACLE_ASOF_JOIN),
    "running_revenue": (q_running_revenue, ORACLE_RUNNING_REVENUE),
    "distinct_users": (q_distinct_users, ORACLE_DISTINCT_USERS),
    "vocab_stats": (q_vocab_stats, ORACLE_VOCAB_STATS),
    "embedding_mean_by_label": (
        q_embedding_mean_by_label,
        ORACLE_EMBEDDING_MEAN_BY_LABEL,
    ),
    "events_hourly_pivot": (q_events_hourly_pivot, ORACLE_EVENTS_HOURLY_PIVOT),
}


def _nan_counts_oracle() -> str:
    from ..oracles import pipeline_prefix

    cols = ", ".join(
        f"CAST(count(*) - count({m}) AS BIGINT) AS {m}" for m in P.METRICS
    )
    return pipeline_prefix("wide") + f"\nSELECT {cols} FROM wide"


def q_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup cascade (continuous-aggregate pattern):
    minute -> hour -> day, each level aggregating the PREVIOUS level so
    the raw table is scanned exactly once.  Output: the union of all
    three resolutions tagged by grain."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    # minute is time-grid scale (|minutes x event_types|) with three
    # consumers (its own union branch + the hour cascade feeding the
    # day cascade) — unchecked, Catalyst re-executes the raw-events
    # aggregation per consumer (3 executed scans, round-12 audit), so
    # the docstring's "scanned exactly once" only holds with this lazy
    # checkpoint.  Blocks live on executors only (executor loss =>
    # recompute impossible); use reliable checkpointing on preemptible
    # clusters.
    minute = (
        ev.groupBy(
            F.date_trunc("minute", "ts").alias("bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .transform(cut_lineage)
    )
    hour = (
        minute.groupBy(
            F.date_trunc("hour", "bucket").alias("bucket"), "event_type"
        )
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    day = (
        hour.groupBy(
            F.date_trunc("day", "bucket").alias("bucket"), "event_type"
        )
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    out = (
        minute.withColumn("grain", F.lit("minute"))
        .unionByName(hour.withColumn("grain", F.lit("hour")))
        .unionByName(day.withColumn("grain", F.lit("day")))
    )
    return out.select(
        "grain",
        "bucket",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round("sv", 6).alias("sum_value"),
    )


ORACLE_MULTIRES_ROLLUP = """WITH minute AS (
  SELECT date_trunc('minute', ts) AS bucket, event_type,
         count(*) AS n, sum(value) AS sv
  FROM events GROUP BY 1, 2
),
hour AS (
  SELECT date_trunc('hour', bucket) AS bucket, event_type,
         sum(n) AS n, sum(sv) AS sv
  FROM minute GROUP BY 1, 2
),
day AS (
  SELECT date_trunc('day', bucket) AS bucket, event_type,
         sum(n) AS n, sum(sv) AS sv
  FROM hour GROUP BY 1, 2
)
SELECT 'minute' AS grain, bucket, event_type, CAST(n AS BIGINT) AS n,
       round(sv, 6) AS sum_value FROM minute
UNION ALL
SELECT 'hour', bucket, event_type, CAST(n AS BIGINT), round(sv, 6) FROM hour
UNION ALL
SELECT 'day', bucket, event_type, CAST(n AS BIGINT), round(sv, 6) FROM day"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: per user, did signup -> click -> purchase occur
    in temporal order?  Stage timestamps via conditional min-aggregation,
    ordering enforced by comparison — one shuffle on user_id."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    reached_click = (
        F.col("t_signup").isNotNull()
        & F.col("t_click").isNotNull()
        & (F.col("t_click") > F.col("t_signup"))
    )
    reached_purchase = reached_click & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") > F.col("t_click")
    )
    per_user = stages.select(
        "user_id",
        F.col("t_signup").isNotNull().cast("int").alias("s1"),
        reached_click.cast("int").alias("s2"),
        reached_purchase.cast("int").alias("s3"),
    )
    return per_user.agg(
        F.sum("s1").cast("bigint").alias("n_signup"),
        F.sum("s2").cast("bigint").alias("n_signup_click"),
        F.sum("s3").cast("bigint").alias("n_signup_click_purchase"),
    )


ORACLE_FUNNEL = """WITH stages AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY 1
),
flags AS (
  SELECT
    CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS s1,
    CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
              AND t_click > t_signup THEN 1 ELSE 0 END AS s2,
    CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
              AND t_click > t_signup AND t_purchase IS NOT NULL
              AND t_purchase > t_click THEN 1 ELSE 0 END AS s3
  FROM stages
)
SELECT CAST(sum(s1) AS BIGINT) AS n_signup,
       CAST(sum(s2) AS BIGINT) AS n_signup_click,
       CAST(sum(s3) AS BIGINT) AS n_signup_click_purchase
FROM flags"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min-subquery — suppliers whose account
    balance equals the minimum within their nation."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    supp = load_table(spark, sf_dir, "supplier")
    mins = supp.groupBy("s_nationkey").agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        supp.join(F.broadcast(mins), "s_nationkey")
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "s_suppkey",
            F.col("s_nationkey").cast("bigint").alias("s_nationkey"),
            "s_acctbal",
        )
    )


ORACLE_MIN_COST_SUPPLIER = """SELECT s_suppkey,
       CAST(s_nationkey AS BIGINT) AS s_nationkey, s_acctbal
FROM supplier s
WHERE s_acctbal = (
  SELECT min(s2.s_acctbal) FROM supplier s2
  WHERE s2.s_nationkey = s.s_nationkey
)"""


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long melt (the inverse of the alignment pivot): stack()
    keeps it a single JVM-side projection, no shuffle at all."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wide = P.wide_frame(spark, sf_dir)
    stack = ", ".join(f"'{m}', {m}" for m in P.METRICS)
    return wide.selectExpr(
        "ts", f"stack({len(P.METRICS)}, {stack}) AS (metric, value)"
    ).filter(F.col("value").isNotNull())


def _unpivot_oracle() -> str:
    from ..oracles import pipeline_prefix

    arms = "\nUNION ALL\n".join(
        f"SELECT ts, '{m}' AS metric, {m} AS value FROM wide WHERE {m} IS NOT NULL"
        for m in P.METRICS
    )
    return pipeline_prefix("wide") + "\n" + arms


def q_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations the reference never needed (SURVEY §2.4): users
    who clicked AND purchased (intersect semantics) vs clicked but
    NEVER purchased (except semantics), tagged and unioned.

    Physical shape (round-12 scan-audit fix): the textbook
    intersect/subtract formulation scanned events FOUR times (each set
    op re-reads both filtered branches) and shuffled each; the same
    set semantics fold into ONE filtered scan + ONE partial-aggregating
    groupBy — per user, did-click / did-buy flags, then the segment is
    a projection.  INTERSECT/EXCEPT DISTINCT semantics are preserved
    exactly: the aggregate is per-user (distinct by construction) and
    a user whose click count merely exceeds their purchase count still
    lands in click_and_buy, as EXCEPT DISTINCT requires."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("c"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("b"),
        )
        .filter(F.col("c") == 1)
        .select(
            "user_id",
            F.when(F.col("b") == 1, F.lit("click_and_buy"))
            .otherwise(F.lit("click_no_buy"))
            .alias("segment"),
        )
    )


ORACLE_USER_SET_OPS = """SELECT user_id, 'click_and_buy' AS segment
FROM (SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT user_id, 'click_no_buy' AS segment
FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase')"""


QUERIES["nan_counts"] = (q_nan_counts, _nan_counts_oracle())
QUERIES["unpivot_metrics"] = (q_unpivot_metrics, _unpivot_oracle())
QUERIES["user_set_ops"] = (q_user_set_ops, ORACLE_USER_SET_OPS)
QUERIES["funnel"] = (q_funnel, ORACLE_FUNNEL)
QUERIES["min_cost_supplier"] = (q_min_cost_supplier, ORACLE_MIN_COST_SUPPLIER)
QUERIES["multires_rollup"] = (q_multires_rollup, ORACLE_MULTIRES_ROLLUP)
QUERIES["rolling_features"] = (q_rolling_features, _rolling_oracle())


def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property extraction (the log-enrichment
    step of every event pipeline): pull ``$.k`` out of the ``props``
    JSON string JVM-side (get_json_object — no Python, no UDF), bucket
    it, and aggregate.  The JSON parse is a per-row projection inside
    whole-stage codegen; the only shuffle is the final keyed agg.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.withColumn("k_bucket", (k % 10).cast("bigint"))
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.avg(k.cast("double")), 6).alias("avg_k"),
        )
    )


ORACLE_EVENTS_JSON_EXTRACT = """SELECT
       CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_bucket,
       count(*) AS n,
       round(avg(value), 6) AS avg_value,
       round(avg(CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS DOUBLE)), 6) AS avg_k
FROM events
GROUP BY 1"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: cohort = ISO week of a user's
    first event; one row per (cohort_week, weeks_since) with the count
    of distinct users still active.

    Two keyed shuffles, both on bounded keys: (1) groupBy user_id for
    first-seen (map-side partial min), (2) groupBy the ~weeks^2/2
    cohort matrix.  The first-seen frame re-joins events on user_id —
    at 100 TB the user dimension is large, so the join is left
    unhinted for AQE to pick shuffle vs broadcast at runtime size.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            ).cast("bigint").alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


ORACLE_RETENTION_COHORTS = """WITH ev AS (
  SELECT user_id, date_trunc('week', ts) AS week FROM events
), first AS (
  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
)
SELECT cohort_week,
       CAST(datediff('day', cohort_week, week) // 7 AS BIGINT) AS weeks_since,
       count(DISTINCT ev.user_id) AS n_users
FROM ev JOIN first ON ev.user_id = first.user_id
GROUP BY 1, 2"""


QUERIES["events_json_extract"] = (q_events_json_extract, ORACLE_EVENTS_JSON_EXTRACT)
QUERIES["retention_cohorts"] = (q_retention_cohorts, ORACLE_RETENTION_COHORTS)


def q_user_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence bigram analysis (the Markov-transition summary
    behind funnel/session models): for each (from_type, to_type) pair
    of CONSECUTIVE events by the same user, the transition count and
    mean seconds between them.

    One shuffle on user_id feeds the lag window; the bigram agg is a
    bounded-key (|event_types|²) shuffle — metadata scale at any SF.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    from ..functions import ntz_epoch_seconds

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_sec = ntz_epoch_seconds("ts")  # TZ-independent (advisor class)
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
        (ts_sec - F.lag(ts_sec).over(w)).alias("gap_s"),
    ).filter(F.col("from_type").isNotNull())
    return seq.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("gap_s"), 6).alias("avg_gap_s"),
    )


ORACLE_USER_PATH_TRANSITIONS = """WITH seq AS (
  SELECT user_id,
         event_type AS to_type,
         lag(event_type) OVER w AS from_type,
         epoch(ts) - epoch(lag(ts) OVER w) AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT from_type, to_type, count(*) AS n, round(avg(gap_s), 6) AS avg_gap_s
FROM seq WHERE from_type IS NOT NULL
GROUP BY 1, 2"""


QUERIES["user_path_transitions"] = (
    q_user_path_transitions,
    ORACLE_USER_PATH_TRANSITIONS,
)


def q_metric_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric linear trend (least-squares slope/intercept) — the
    drift-detection summary a metrics platform computes continuously.

    Closed-form regression as two-moment aggregates
    (slope = covar_pop / var_pop), one bounded-key shuffle.  The time
    axis is centered on a FIXED anchor and expressed in DAYS so the
    moments are well-conditioned (raw epoch seconds ~1.7e9 would put
    the covariance into catastrophic-cancellation territory and the
    two engines' streaming co-moment updates would diverge in the last
    ulps).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from ..functions import ntz_epoch_seconds

    ev = load_table(spark, sf_dir, "events")
    # TZ-independent epoch (the cast chain is session-TZ-dependent)
    x = (ntz_epoch_seconds("ts") - F.lit(1704067200.0)) / 86400.0
    d = ev.select("event_type", x.alias("x"), F.col("value").alias("y"))
    # nullif: a single-event (or single-instant) series has var_pop 0 —
    # ANSI Spark would abort on 0/0 where DuckDB yields NULL
    slope = F.covar_pop("x", "y") / F.nullif(F.var_pop("x"), F.lit(0.0))
    return d.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("intercept"),
    )


ORACLE_METRIC_TREND_SLOPES = """WITH d AS (
  SELECT event_type,
         (epoch(ts) - 1704067200.0) / 86400.0 AS x,
         value AS y
  FROM events
)
SELECT event_type, count(*) AS n,
       round(covar_pop(x, y) / var_pop(x), 6) AS slope_per_day,
       round(avg(y) - (covar_pop(x, y) / var_pop(x)) * avg(x), 6) AS intercept
FROM d GROUP BY event_type"""


QUERIES["metric_trend_slopes"] = (
    q_metric_trend_slopes,
    ORACLE_METRIC_TREND_SLOPES,
)


def q_metric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the aligned metric columns — the
    redundancy screen run before training on a metric set (two highly
    correlated inputs add parameters, not signal; the reference's
    config hand-picks its 7 metrics, this measures that choice).

    One aggregate computes all C(5,2) correlations map-side over the
    shared wide frame — no joins, no extra shuffle beyond the pivot's.
    NULL-row handling matches corr() in both engines (pairwise-complete
    rows only).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wide = P.wide_frame(spark, sf_dir)
    pairs = [
        (a, b)
        for i, a in enumerate(P.METRICS)
        for b in P.METRICS[i + 1 :]
    ]
    # nanvl -> NULL: Spark's corr returns NaN on a zero-variance input
    # while DuckDB returns NULL; canonicalize to NULL so a degenerate
    # (constant) metric can't diverge the oracle comparison.
    aggs = [
        F.nanvl(F.round(F.corr(a, b), 6), F.lit(None).cast("double")).alias(
            f"{a}__{b}"
        )
        for a, b in pairs
    ]
    row = wide.agg(*aggs)
    stack = ", ".join(f"'{a}', '{b}', {a}__{b}" for a, b in pairs)
    return row.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (metric_a, metric_b, corr)"
    )


def _metric_correlations_oracle() -> str:
    from ..oracles import pipeline_prefix

    pairs = [
        (a, b)
        for i, a in enumerate(P.METRICS)
        for b in P.METRICS[i + 1 :]
    ]
    arms = "\nUNION ALL\n".join(
        f"SELECT '{a}' AS metric_a, '{b}' AS metric_b, "
        f"round(corr({a}, {b}), 6) AS corr FROM wide"
        for a, b in pairs
    )
    return pipeline_prefix("wide") + "\n" + arms


QUERIES["metric_correlations"] = (
    q_metric_correlations,
    _metric_correlations_oracle(),
)


def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS beside the rollup/cube entries: the
    hand-picked lattice ((metric), (metric, day), ()) with per-column
    GROUPING() flags — the shape BI layers emit when the full cube is
    too wide.  One shuffle; Spark expands the sets map-side (Expand
    node) exactly like rollup/cube, so the cost is #sets partial
    aggregates, not #sets scans."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # day is a TRUNCATED TIMESTAMP, not a DATE: the driver's hash
    # canonicalizes datetime64 columns but Spark DATE arrives in pandas
    # as python-date objects, so a DATE column would hash differently
    # between the engines even with identical values.
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("metric"),
        F.date_trunc("DAY", "ts").alias("day"),
        "value",
    )
    return (
        ev.groupingSets(
            [["metric"], ["metric", "day"], []], "metric", "day"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_v"),
            F.grouping("metric").cast("int").alias("g_metric"),
            F.grouping("day").cast("int").alias("g_day"),
        )
    )


ORACLE_EVENTS_GROUPING_SETS = """SELECT
  event_type AS metric, date_trunc('day', ts) AS day,
  CAST(count(*) AS BIGINT) AS n,
  round(sum(value), 6) AS sum_v,
  CAST(grouping(event_type) AS INT) AS g_metric,
  CAST(grouping(date_trunc('day', ts)) AS INT) AS g_day
FROM events
GROUP BY GROUPING SETS ((event_type), (event_type, date_trunc('day', ts)), ())"""


QUERIES["events_grouping_sets"] = (
    q_events_grouping_sets,
    ORACLE_EVENTS_GROUPING_SETS,
)


PAGERANK_D = 0.85
PAGERANK_ITERS = 3


def q_event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the user-journey transition graph (which event
    types are central to user paths) — the iterative-graph-algorithm
    shape on DataFrames: edges stay DISTRIBUTED, the rank vector is a
    node-cardinality frame broadcast into each iteration's join, so one
    iteration = broadcast-join + bounded-key aggregate and the edge set
    is never collected.  Fixed iteration count unrolls into one DAG —
    no driver loop over data, only over plan construction.

    Node count rides a one-row broadcast (no driver-side count job).
    Rank mass: nodes without in-edges keep the teleport term via the
    right-join + coalesce; dangling mass is not redistributed (all
    event types have out-edges in this graph; documented convention).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(
        F.count("*").cast("double").alias("n")
    )
    w_out = Window.partitionBy("from_type")
    # edges is VOCABULARY-scale (event_type x event_type) but derives
    # from the corpus-wide lag+agg chain — each of the unrolled
    # iterations' inflow joins re-executed that chain (19 executed
    # scans of events, round-12 audit).  One lazy checkpoint of the
    # tiny frame truncates all of them: scans 19 -> 1.  Executor-loss
    # caveat: see events_association_rules (relational.py).
    edges = cnt.select(
        F.col("from_type").alias("f"),
        F.col("to_type").alias("t"),
        (F.col("n") / F.sum("n").over(w_out)).alias("p"),
    ).transform(cut_lineage)
    nodes = (
        edges.select(F.col("f").alias("node"))
        .union(edges.select(F.col("t").alias("node")))
        .distinct()
    )
    nn = nodes.agg(F.count("*").cast("double").alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("r")
    )
    for _ in range(PAGERANK_ITERS):
        inflow = (
            edges.join(
                F.broadcast(ranks.withColumnRenamed("node", "f")), "f"
            )
            .groupBy(F.col("t").alias("node"))
            .agg(F.sum(F.col("p") * F.col("r")).alias("v"))
        )
        ranks = (
            nodes.join(F.broadcast(inflow), "node", "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.lit(1.0 - PAGERANK_D) / F.col("n_nodes")
                    + F.lit(PAGERANK_D) * F.coalesce("v", F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks.select("node", F.round("r", 6).alias("rank"))


def _pagerank_oracle() -> str:
    d = PAGERANK_D
    prev = "r0"
    iters = []
    for i in range(1, PAGERANK_ITERS + 1):
        iters.append(f"""r{i} AS (
  SELECT nd.node,
         {1.0 - d!r} / (SELECT n_nodes FROM nn)
           + {d!r} * coalesce(s.v, 0) AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.t AS node, sum(e.p * {prev}.r) AS v
    FROM edges e JOIN {prev} ON e.f = {prev}.node GROUP BY e.t) s
  USING (node))""")
        prev = f"r{i}"
    joined_iters = ",\n".join(iters)
    return f"""WITH seq AS (
  SELECT event_type AS to_type, lag(event_type) OVER w AS from_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), cnt AS (
  SELECT from_type AS f, to_type AS t, count(*)::DOUBLE AS n
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
), edges AS (
  SELECT f, t, n / sum(n) OVER (PARTITION BY f) AS p FROM cnt
), nodes AS (
  SELECT f AS node FROM cnt UNION SELECT t FROM cnt
), nn AS (
  SELECT count(*)::DOUBLE AS n_nodes FROM nodes
), r0 AS (
  SELECT node, 1.0 / (SELECT n_nodes FROM nn) AS r FROM nodes
), {joined_iters}
SELECT node, round(r, 6) AS rank FROM {prev}"""


QUERIES["event_pagerank"] = (q_event_pagerank, _pagerank_oracle())


def q_scd2_user_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-Type-2 dimension build: per user, collapse the run-length
    history of a derived attribute (value band) into validity intervals
    [valid_from, valid_to), open interval (NULL valid_to) for the
    current state — the merge-into-dimension shape every warehouse
    pipeline runs.

    Gaps-and-islands on the rn-difference key; both windows partition
    by user_id so parallelism scales with user cardinality and the
    island aggregate reuses the same hash distribution (one exchange
    total).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 20, "low")
        .when(F.col("value") < 100, "mid")
        .otherwise("high")
    )
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_ub = Window.partitionBy("user_id", "band").orderBy("ts", "event_id")
    runs = ev.select(
        "user_id",
        "ts",
        "event_id",
        band.alias("band"),
    ).withColumn(
        "island",
        F.row_number().over(w_u) - F.row_number().over(w_ub),
    )
    iv = runs.groupBy("user_id", "band", "island").agg(
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("last_seen"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    # island tiebreak: two bands can start at the SAME instant (ts
    # tie) — without it lead() is nondeterministic and the two engines
    # can legitimately disagree; island is derived from the event_id
    # order, so it is deterministic on both sides
    w_iv = Window.partitionBy("user_id").orderBy("valid_from", "island")
    return iv.select(
        "user_id",
        "band",
        "valid_from",
        F.lead("valid_from").over(w_iv).alias("valid_to"),
        "n_events",
    )


ORACLE_SCD2_USER_BANDS = """WITH runs AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value < 20 THEN 'low'
              WHEN value < 100 THEN 'mid'
              ELSE 'high' END AS band
  FROM events
), isl AS (
  SELECT user_id, ts, band,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, band
                              ORDER BY ts, event_id) AS island
  FROM runs
), iv AS (
  SELECT user_id, band, island,
         min(ts) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_events
  FROM isl GROUP BY 1, 2, 3
)
SELECT user_id, band, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, island)
         AS valid_to,
       n_events
FROM iv"""


QUERIES["scd2_user_bands"] = (q_scd2_user_bands, ORACLE_SCD2_USER_BANDS)


def q_events_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-rank surface: percent_rank / cume_dist over value
    (standard tie semantics) and ntile(4) over the tie-broken total
    order — per-metric windows, so partition count grows with series
    cardinality (same scale axis as the PromQL family)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("metric"),
        F.col("event_id").alias("seq"),
        "value",
    )
    w_val = Window.partitionBy("metric").orderBy("value")
    w_uni = Window.partitionBy("metric").orderBy("value", "seq")
    return ev.select(
        "metric",
        "seq",
        F.round(F.percent_rank().over(w_val), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_val), 6).alias("cume_dist"),
        F.ntile(4).over(w_uni).cast("bigint").alias("quartile"),
    )


ORACLE_EVENTS_RANK_FUNCTIONS = """SELECT
  event_type AS metric, event_id AS seq,
  round(percent_rank() OVER (PARTITION BY event_type ORDER BY value), 6)
    AS pct_rank,
  round(cume_dist() OVER (PARTITION BY event_type ORDER BY value), 6)
    AS cume_dist,
  CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
    AS BIGINT) AS quartile
FROM events"""


QUERIES["events_rank_functions"] = (
    q_events_rank_functions,
    ORACLE_EVENTS_RANK_FUNCTIONS,
)
