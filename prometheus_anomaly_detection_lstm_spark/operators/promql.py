"""PromQL range-vector semantics as native batch operators.

The reference never computes rates itself — its config pushes
`rate(windows_cpu_time_total[1m])` etc. to the Prometheus server
(config.yaml:17-25, data_collector.py:41-48) and ingests the result.
A full engine replacement must also cover the deployment where raw
counter samples land in the lake and the rate/aggregation step runs
IN the engine.  This module implements the core PromQL function
families over a long sample stream (ts, metric, value, seq):

- ``counter_rate``: per-series counter semantics — monotonic increase
  with Prometheus reset handling (a counter that goes DOWN restarted;
  the post-reset sample value IS its increase), aggregated to tumbling
  buckets: increase, per-second rate, reset count, and irate (the
  last instantaneous delta in the bucket).
- ``gauge_over_time``: the *_over_time family for gauges — avg/min/
  max/exact-p95/delta per tumbling bucket.

Semantics note: PromQL's rate() extrapolates a range vector to the
window edges (an approximation bound to its pull model).  The batch
twins here compute the EXACT increase from every consecutive-sample
delta that lands in the bucket — deterministic, oracle-checkable, and
what you actually want offline.  Resets follow PromQL exactly.

Scale notes (100 TB): the only wide operation is one lag() window
partitioned BY SERIES — at production scale the partition key is the
full series labelset (cardinality: millions of series, each bounded by
samples-per-retention), so parallelism grows with the data; no global
window anywhere.  The per-bucket aggregate reuses the same (metric)
hash distribution, and last-sample selection is max_by inside the
aggregate — no second shuffle, no join.  A single pathological
hot series is handled by ``counter_rate(..., hot_series=True)``
(:func:`_with_deltas_hot`): the lag window day-buckets with a broadcast
carry — operators/fill.py's pattern — so parallelism becomes
#series x #days instead of #series; answer-identical, equality-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import ntz_epoch_seconds
from ..io_tables import load_table
from ..functions.checkpoint import cut_lineage

#: tumbling bucket width for the registered queries (seconds).
BUCKET_S = 600


def _long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> (ts, metric, value, seq) sample stream (same adapter
    as plans/pipeline.events_long: event_type is the series label)."""
    return load_table(spark, sf_dir, "events").select(
        "ts",
        F.col("event_type").alias("metric"),
        "value",
        F.col("event_id").alias("seq"),
    )


def _with_deltas(
    samples: DataFrame, series_cols: tuple[str, ...] = ("metric",)
) -> DataFrame:
    """Append per-sample lag-derived columns: __inc (PromQL increase
    contribution), __reset, __dt (seconds since previous sample).

    ``series_cols`` is the series identity — the full labelset in
    production (Prometheus series = metric name + every label pair),
    which is exactly what makes the lag window scale: partition count
    grows with label cardinality.  ``__dt`` derives from
    ``ntz_epoch_seconds`` (calendar-field arithmetic), so it is correct
    under ANY session timezone — direct library callers no longer need
    the q_* wrappers' UTC pin (round-3 advisor finding).
    """
    w = Window.partitionBy(*series_cols).orderBy("ts", "seq")
    ts_sec = ntz_epoch_seconds("ts")
    prev_v = F.lag("value").over(w)
    inc = (
        F.when(prev_v.isNull(), F.lit(None).cast("double"))
        .when(F.col("value") >= prev_v, F.col("value") - prev_v)
        .otherwise(F.col("value"))  # reset: counter restarted from 0
    )
    return (
        samples.withColumn("__inc", inc)
        .withColumn(
            "__reset", F.when(F.col("value") < prev_v, 1).otherwise(0)
        )
        .withColumn("__dt", ts_sec - F.lag(ts_sec).over(w))
    )


def _with_deltas_hot(
    samples: DataFrame, series_cols: tuple[str, ...] = ("metric",)
) -> DataFrame:
    """Hot-series twin of :func:`_with_deltas`: the lag window is
    partitioned by (series, DAY) with a broadcast cross-day carry — the
    ``operators/fill.ffill_bfill_scalable`` pattern applied to lag().

    Why: the plain per-series window serializes a single pathological
    series (one counter with billions of samples at 100 TB runs its
    entire lag on one task).  Here each (series, day) slice is its own
    task; the day's FIRST sample takes its predecessor from a
    metadata-scale carry table (per-(series, day) last sample, lagged
    one day) joined broadcast.  Result is COLUMN-IDENTICAL to
    ``_with_deltas`` (equality pinned in tests/test_promql.py); cost is
    one tiny summary aggregate + a broadcast join, no extra full-data
    exchange — the pivot from "parallelism = #series" to
    "parallelism = #series x #days".
    """
    ts_sec = ntz_epoch_seconds("ts")
    with_day = samples.withColumn("__pday", F.to_date("ts"))
    w_day = Window.partitionBy(*series_cols, "__pday").orderBy("ts", "seq")
    day_last = with_day.groupBy(*series_cols, "__pday").agg(
        F.max_by(
            F.struct(F.col("value").alias("v"), ts_sec.alias("e")),
            F.struct(F.col("ts").alias("t"), F.col("seq").alias("s")),
        ).alias("__l")
    )
    w_carry = Window.partitionBy(*series_cols).orderBy("__pday")
    carry = day_last.select(
        *series_cols,
        "__pday",
        F.lag("__l.v").over(w_carry).alias("__carry_v"),
        F.lag("__l.e").over(w_carry).alias("__carry_e"),
    )
    joined = with_day.join(
        F.broadcast(carry), [*series_cols, "__pday"], "left"
    )
    prev_v = F.coalesce(F.lag("value").over(w_day), F.col("__carry_v"))
    prev_e = F.coalesce(F.lag(ts_sec).over(w_day), F.col("__carry_e"))
    inc = (
        F.when(prev_v.isNull(), F.lit(None).cast("double"))
        .when(F.col("value") >= prev_v, F.col("value") - prev_v)
        .otherwise(F.col("value"))
    )
    return (
        joined.withColumn("__inc", inc)
        .withColumn(
            "__reset", F.when(F.col("value") < prev_v, 1).otherwise(0)
        )
        .withColumn("__dt", ts_sec - prev_e)
        .drop("__pday", "__carry_v", "__carry_e")
    )


def counter_rate(
    samples: DataFrame,
    bucket_s: int = BUCKET_S,
    series_cols: tuple[str, ...] = ("metric",),
    hot_series: bool = False,
) -> DataFrame:
    """Counter increase / rate / irate per (series, tumbling bucket).

    Output: (*series_cols, w_start, n_samples, n_resets, increase,
    rate_per_s, irate_per_s).  irate divides the bucket's LAST
    consecutive-sample delta by its time gap (null-safe on zero gaps);
    selected via max_by inside the aggregate — no extra shuffle.

    ``hot_series=True`` swaps the per-series lag window for the
    day-bucketed carry variant (:func:`_with_deltas_hot`) — same
    answer, parallelism no longer bounded by series cardinality; use
    when one series dominates sample volume.
    """
    deltas = (_with_deltas_hot if hot_series else _with_deltas)(
        samples, series_cols
    )
    last = F.expr(
        "max_by(named_struct('inc', __inc, 'dt', __dt), "
        "named_struct('t', ts, 's', seq))"
    )
    return (
        deltas.groupBy(
            *series_cols,
            F.window("ts", f"{bucket_s} seconds").start.alias("w_start"),
        )
        .agg(
            F.count("*").alias("n_samples"),
            F.sum("__reset").cast("bigint").alias("n_resets"),
            F.round(F.sum("__inc"), 6).alias("increase"),
            F.round(F.sum("__inc") / F.lit(float(bucket_s)), 6).alias(
                "rate_per_s"
            ),
            last.alias("__last"),
        )
        .withColumn(
            "irate_per_s",
            F.round(
                F.col("__last.inc") / F.expr("nullif(__last.dt, 0D)"), 6
            ),
        )
        .drop("__last")
    )


def gauge_over_time(samples: DataFrame, bucket_s: int = BUCKET_S) -> DataFrame:
    """The *_over_time family for gauges per (metric, tumbling bucket):
    avg/min/max, exact interpolated p95, and delta (last minus first
    sample by (ts, seq) order) — all inside ONE aggregate."""
    first_v = F.expr("min_by(value, named_struct('t', ts, 's', seq))")
    last_v = F.expr("max_by(value, named_struct('t', ts, 's', seq))")
    return (
        samples.groupBy(
            "metric",
            F.window("ts", f"{bucket_s} seconds").start.alias("w_start"),
        )
        .agg(
            F.count("*").alias("n_samples"),
            F.round(F.avg("value"), 6).alias("avg_v"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
            F.round(F.expr("percentile(value, 0.95D)"), 6).alias("p95_v"),
            F.round(last_v - first_v, 6).alias("delta_v"),
        )
    )


#: finite `le` boundaries for the synthesized histogram series (the
#: +Inf bucket is implicit as index len(LE)).  Spans the testdata value
#: distribution (p25=14.6, p99=224) so every bucket is populated.
LE = [10.0, 25.0, 50.0, 100.0, 250.0]


def histogram_quantile(
    samples: DataFrame, q: float = 0.9, bucket_s: int = BUCKET_S
) -> DataFrame:
    """PromQL ``histogram_quantile(q, rate(..._bucket[w]))`` — batch twin.

    Two stages, ONE hash distribution: (1) bucket every sample into its
    cumulative-histogram ``le`` slot (the _bucket series a Prometheus
    client would export); (2) per (metric, window): find the slot where
    the cumulative count crosses ``q * total`` and interpolate linearly
    inside it — exactly PromQL's estimator, including the two edge
    rules (crossing in the +Inf slot returns the highest finite
    boundary; crossing in the first slot interpolates from 0).

    Scale: the bucket-count aggregate, the cumulative window, and the
    crossing-slot min_by all cluster on (metric, w_start) — Catalyst
    plans a single exchange, and every window partition is at most
    len(LE)+1 rows, so there is no skew surface at all.
    """
    idx = F.lit(len(LE))
    for i in range(len(LE) - 1, -1, -1):
        idx = F.when(F.col("value") <= LE[i], i).otherwise(idx)
    counts = (
        samples.select(
            "metric",
            F.window("ts", f"{bucket_s} seconds").start.alias("w_start"),
            idx.alias("__idx"),
        )
        .groupBy("metric", "w_start", "__idx")
        .agg(F.count("*").alias("__cnt"))
    )
    wk = Window.partitionBy("metric", "w_start").orderBy("__idx")
    wall = wk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = (
        counts.withColumn(
            "__cum",
            F.sum("__cnt").over(wk.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("__total", F.sum("__cnt").over(wall))
        .withColumn("__rank", F.lit(q) * F.col("__total"))
    )
    crossing = (
        ranked.filter(F.col("__cum") >= F.col("__rank"))
        .groupBy("metric", "w_start")
        .agg(
            F.expr(
                "min_by(named_struct("
                "'idx', __idx, 'cnt', __cnt, 'cum', __cum, 'rank', __rank,"
                "'total', __total), __idx)"
            ).alias("__c")
        )
        .select("metric", "w_start", "__c.*")
    )
    lo = F.element_at(
        F.lit(LE + [0.0]), F.when(F.col("idx") > 0, F.col("idx")).otherwise(
            len(LE) + 1
        )
    )  # LE[idx-1] for idx>=1, else the appended 0.0 sentinel
    hi = F.element_at(F.lit(LE), F.col("idx") + 1)
    est = F.when(F.col("idx") >= len(LE), F.lit(LE[-1])).otherwise(
        lo
        + (hi - lo)
        * (F.col("rank") - (F.col("cum") - F.col("cnt")))
        / F.col("cnt")
    )
    return crossing.select(
        "metric",
        "w_start",
        F.col("total").cast("bigint").alias("n_samples"),
        F.round(est, 6).alias(f"p{int(q * 100)}_est"),
    )


# ------------------------------------------------------------- registry

def q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return counter_rate(_long(spark, sf_dir))


def q_gauge_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return gauge_over_time(_long(spark, sf_dir))


ORACLE_COUNTER_RATE = f"""WITH s AS (
  SELECT event_type AS metric, ts, value, event_id AS seq,
         lag(value) OVER w AS pv,
         epoch(ts) - epoch(lag(ts) OVER w) AS dt
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), e AS (
  SELECT metric, ts, seq, dt,
         CASE WHEN pv IS NULL THEN NULL
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         CASE WHEN value < pv THEN 1 ELSE 0 END AS is_reset,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start
  FROM s
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY metric, w_start ORDER BY ts DESC, seq DESC) AS rn
  FROM e
)
SELECT metric, w_start,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(is_reset) AS BIGINT) AS n_resets,
       round(sum(inc), 6) AS increase,
       round(sum(inc) / {BUCKET_S}.0, 6) AS rate_per_s,
       round(max(CASE WHEN rn = 1 THEN inc / nullif(dt, 0) END), 6)
         AS irate_per_s
FROM r
GROUP BY 1, 2"""


ORACLE_GAUGE_OVER_TIME = f"""WITH e AS (
  SELECT event_type AS metric, ts, value, event_id AS seq,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start
  FROM events
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY metric, w_start
                            ORDER BY ts, seq) AS rn_a,
         row_number() OVER (PARTITION BY metric, w_start
                            ORDER BY ts DESC, seq DESC) AS rn_d
  FROM e
)
SELECT metric, w_start,
       CAST(count(*) AS BIGINT) AS n_samples,
       round(avg(value), 6) AS avg_v,
       round(min(value), 6) AS min_v,
       round(max(value), 6) AS max_v,
       round(quantile_cont(value, 0.95), 6) AS p95_v,
       round(max(CASE WHEN rn_d = 1 THEN value END)
             - max(CASE WHEN rn_a = 1 THEN value END), 6) AS delta_v
FROM r
GROUP BY 1, 2"""


def q_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return histogram_quantile(_long(spark, sf_dir))


def _histogram_quantile_oracle(q: float = 0.9) -> str:
    le_list = "[" + ", ".join(str(v) for v in LE) + "]"
    case = " ".join(
        f"WHEN value <= {v} THEN {i}" for i, v in enumerate(LE)
    )
    return f"""WITH e AS (
  SELECT event_type AS metric,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start,
         CASE {case} ELSE {len(LE)} END AS idx
  FROM events
), c AS (
  SELECT metric, w_start, idx, count(*) AS cnt FROM e GROUP BY 1, 2, 3
), r AS (
  SELECT *,
         sum(cnt) OVER (PARTITION BY metric, w_start ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY metric, w_start) AS total
  FROM c
)
SELECT metric, w_start, CAST(total AS BIGINT) AS n_samples,
       round(CASE WHEN idx >= {len(LE)} THEN {LE[-1]}
             ELSE (CASE WHEN idx = 0 THEN 0.0
                        ELSE ({le_list})[idx] END)
                  + (({le_list})[idx + 1]
                     - CASE WHEN idx = 0 THEN 0.0
                            ELSE ({le_list})[idx] END)
                    * ({q} * total - (cum - cnt)) / cnt
             END, 6) AS p{int(q * 100)}_est
FROM r
WHERE cum >= {q} * total
QUALIFY row_number() OVER (PARTITION BY metric, w_start ORDER BY idx) = 1"""


QUERIES = {
    "promql_counter_rate": (q_counter_rate, ORACLE_COUNTER_RATE),
    "promql_gauge_over_time": (q_gauge_over_time, ORACLE_GAUGE_OVER_TIME),
    "promql_histogram_quantile": (
        q_histogram_quantile,
        _histogram_quantile_oracle(),
    ),
}


def topk_series_by_rate(
    samples: DataFrame, k: int = 3, bucket_s: int = BUCKET_S
) -> DataFrame:
    """PromQL ``topk(k, rate(m[w]))`` — the k hottest series per
    bucket, ranked by counter rate.

    Pure composition: the counter_rate subtree (one exchange) feeds a
    rank window partitioned by bucket — partition size = #series per
    bucket, the aggregated frame, never raw samples.  Ties broken by
    metric name for cross-engine determinism.
    """
    rates = counter_rate(samples, bucket_s).filter(
        F.col("rate_per_s").isNotNull()
    )
    w = Window.partitionBy("w_start").orderBy(
        F.col("rate_per_s").desc(), F.col("metric")
    )
    return (
        rates.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("w_start", "rank", "metric", "rate_per_s")
    )


def q_topk_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return topk_series_by_rate(_long(spark, sf_dir))


ORACLE_TOPK_SERIES = f"""WITH s AS (
  SELECT event_type AS metric, ts, value, event_id AS seq,
         lag(value) OVER w AS pv
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), e AS (
  SELECT metric,
         CASE WHEN pv IS NULL THEN NULL
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start
  FROM s
), r AS (
  SELECT metric, w_start, round(sum(inc) / {BUCKET_S}.0, 6) AS rate_per_s
  FROM e GROUP BY 1, 2
  HAVING sum(inc) IS NOT NULL
)
SELECT w_start,
       CAST(row_number() OVER (PARTITION BY w_start
            ORDER BY rate_per_s DESC, metric) AS BIGINT) AS rank,
       metric, rate_per_s
FROM r
QUALIFY rank <= 3"""


QUERIES["promql_topk_series"] = (q_topk_series, ORACLE_TOPK_SERIES)


def q_rate_by_labelset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rate() with a FULL labelset series identity: the series key is
    (metric, label) where the label is pulled from the props JSON
    JVM-side (get_json_object, whole-stage codegen) — the production
    Prometheus model, where label cardinality (not metric count) is
    what the lag window's parallelism scales with.  5 metrics x 10
    label buckets = 50 series on the testdata."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    samples = ev.select(
        "ts",
        F.col("event_type").alias("metric"),
        (F.get_json_object(F.col("props"), "$.k").cast("bigint") % 10)
        .cast("bigint")
        .alias("label"),
        "value",
        F.col("event_id").alias("seq"),
    )
    return counter_rate(samples, series_cols=("metric", "label"))


ORACLE_RATE_BY_LABELSET = f"""WITH s AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         ts, value, event_id AS seq
  FROM events
), l AS (
  SELECT metric, label, ts, seq,
         lag(value) OVER w AS pv, value,
         epoch(ts) - epoch(lag(ts) OVER w) AS dt
  FROM s
  WINDOW w AS (PARTITION BY metric, label ORDER BY ts, seq)
), e AS (
  SELECT metric, label, ts, seq, dt,
         CASE WHEN pv IS NULL THEN NULL
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         CASE WHEN value < pv THEN 1 ELSE 0 END AS is_reset,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start
  FROM l
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY metric, label, w_start ORDER BY ts DESC, seq DESC) AS rn
  FROM e
)
SELECT metric, label, w_start,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(is_reset) AS BIGINT) AS n_resets,
       round(sum(inc), 6) AS increase,
       round(sum(inc) / {BUCKET_S}.0, 6) AS rate_per_s,
       round(max(CASE WHEN rn = 1 THEN inc / nullif(dt, 0) END), 6)
         AS irate_per_s
FROM r
GROUP BY 1, 2, 3"""


QUERIES["promql_rate_by_labelset"] = (q_rate_by_labelset, ORACLE_RATE_BY_LABELSET)


def rate_anomaly_flags(
    samples: DataFrame, z: float = 3.0, bucket_s: int = BUCKET_S
) -> DataFrame:
    """The reference's whole premise, composed over NATIVE rate():
    flag buckets whose counter rate deviates more than ``z`` population
    standard deviations from the series mean — rate() -> per-series
    moments -> z-score, all on the aggregated frame (one rate subtree,
    one tiny per-series moment aggregate joined back broadcast-size).

    The reference scores a learned reconstruction (ml/); this is the
    statistical baseline every monitoring stack runs first, and the
    z-score feeds the same threshold/flag operators (P7/P8).
    """
    rates = counter_rate(samples, bucket_s).filter(
        F.col("rate_per_s").isNotNull()
    )
    moments = rates.groupBy(F.col("metric").alias("__m")).agg(
        F.avg("rate_per_s").alias("__mu"),
        F.stddev_pop("rate_per_s").alias("__sigma"),
    )
    zcol = (F.col("rate_per_s") - F.col("__mu")) / F.expr(
        "nullif(__sigma, 0D)"
    )
    return (
        rates.join(moments, rates.metric == F.col("__m"))
        .select(
            "metric",
            "w_start",
            "rate_per_s",
            F.round(zcol, 6).alias("z_score"),
            F.when(F.abs(zcol) > z, 1).otherwise(0).cast("bigint")
            .alias("is_anomaly"),
        )
    )


def q_rate_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return rate_anomaly_flags(_long(spark, sf_dir))


ORACLE_RATE_ANOMALY = f"""WITH s AS (
  SELECT event_type AS metric, ts, value, event_id AS seq,
         lag(value) OVER w AS pv
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), e AS (
  SELECT metric,
         CASE WHEN pv IS NULL THEN NULL
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start
  FROM s
), r AS (
  SELECT metric, w_start, round(sum(inc) / {BUCKET_S}.0, 6) AS rate_per_s
  FROM e GROUP BY 1, 2
  HAVING sum(inc) IS NOT NULL
), m AS (
  SELECT metric, avg(rate_per_s) AS mu, stddev_pop(rate_per_s) AS sigma
  FROM r GROUP BY 1
)
SELECT r.metric, w_start, rate_per_s,
       round((rate_per_s - mu) / nullif(sigma, 0), 6) AS z_score,
       CAST(CASE WHEN abs((rate_per_s - mu) / nullif(sigma, 0)) > 3.0
                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM r JOIN m ON r.metric = m.metric"""


QUERIES["promql_rate_anomaly"] = (q_rate_anomaly_flags, ORACLE_RATE_ANOMALY)


def bucket_span(samples: DataFrame, bucket_s: int) -> DataFrame:
    """One-column frame of EVERY ``bucket_s`` window start between the
    first and last observed sample — the expected-time spine shared by
    the absent()-family operators.  A one-row bounds aggregate exploded
    through sequence(); cost is the bucket count, not the sample
    volume."""
    bounds = samples.select(
        F.window("ts", f"{bucket_s} seconds").start.alias("__w")
    ).agg(F.min("__w").alias("__lo"), F.max("__w").alias("__hi"))
    return bounds.select(
        F.explode(
            F.expr(f"sequence(__lo, __hi, interval {bucket_s} seconds)")
        ).alias("w_start")
    )


def absent_buckets(samples: DataFrame, bucket_s: int = BUCKET_S) -> DataFrame:
    """PromQL ``absent()`` for batch: every (series, bucket) slot inside
    the corpus' observed time range with NO sample — the missing-data
    alert surface (scrape outages, dead exporters).

    Shape: observed slots is a distinct aggregate; the expected grid is
    #series x sequence(lo, hi) exploded from a one-row bounds aggregate
    (broadcast); missing = grid LEFT ANTI observed.  Work is
    proportional to the GRID (series x buckets — the alert surface
    itself), not the sample volume; the anti-join is a hash equi-join
    on (metric, w_start).
    """
    # observed is grid-scale (distinct (metric, w_start)) and fully
    # determines the other two inputs: the series list is its distinct
    # metrics and the bounds are min/max over its w_start (the window
    # start is monotone in ts, so min/max over distinct slots equal
    # bucket_span's min/max over per-sample starts).  Unchecked, the
    # three derivations re-scanned the sample table once each
    # (3 executed scans, round-12 audit); one lazy checkpoint makes
    # this a single pass.  Executor-local blocks — recompute
    # impossible on executor loss; use reliable checkpointing when
    # executors are preemptible.
    observed = (
        samples.select(
            "metric",
            F.window("ts", f"{bucket_s} seconds").start.alias("w_start"),
        )
        .distinct()
        .transform(cut_lineage)
    )
    series = observed.select("metric").distinct()
    span = (
        observed.agg(F.min("w_start").alias("__lo"), F.max("w_start").alias("__hi"))
        .select(
            F.explode(
                F.expr(f"sequence(__lo, __hi, interval {bucket_s} seconds)")
            ).alias("w_start")
        )
    )
    grid = series.crossJoin(F.broadcast(span))
    return grid.join(observed, ["metric", "w_start"], "left_anti")


def q_absent_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return absent_buckets(_long(spark, sf_dir))


ORACLE_ABSENT = f"""WITH e AS (
  SELECT event_type AS metric,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(w_start) AS lo, max(w_start) AS hi FROM e
), grid AS (
  SELECT m.metric, g.w_start
  FROM (SELECT DISTINCT metric FROM e) m,
       (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds),
                                      INTERVAL '{BUCKET_S} seconds'))
          AS w_start) g
)
SELECT metric, w_start
FROM grid ANTI JOIN e USING (metric, w_start)"""


QUERIES["promql_absent"] = (q_absent_buckets, ORACLE_ABSENT)


def deriv_predict(
    samples: DataFrame, horizon_s: int = 300, bucket_s: int = BUCKET_S
) -> DataFrame:
    """PromQL ``deriv()`` + ``predict_linear()`` per (series, bucket):
    least-squares slope of a gauge, and the linear forecast
    ``horizon_s`` past the bucket end.

    One aggregate computes the co-moments; the time axis is re-based to
    seconds-into-bucket (covar/var are translation-invariant, so the
    slope is unchanged while the arithmetic stays in [0, bucket_s)
    instead of squaring epoch-scale numbers — the same precision trick
    as metric_trend_slopes, here with a per-window constant shift).
    predict_linear anchors at the bucket's LAST sample (max_by in the
    same aggregate) — no second pass, no join.
    """
    w_start = F.window("ts", f"{bucket_s} seconds").start.alias("w_start")
    based = samples.select(
        "metric",
        w_start,
        "value",
        "ts",
        "seq",
    ).withColumn(
        "__t",
        ntz_epoch_seconds("ts") - ntz_epoch_seconds("w_start"),
    )
    slope = F.covar_pop("value", "__t") / F.expr(
        "nullif(var_pop(__t), 0D)"
    )
    last = F.expr(
        "max_by(named_struct('v', value, 't', __t), "
        "named_struct('t', ts, 's', seq))"
    )
    return (
        based.groupBy("metric", "w_start")
        .agg(
            F.count("*").alias("n_samples"),
            slope.alias("__slope"),
            last.alias("__last"),
        )
        .select(
            "metric",
            "w_start",
            "n_samples",
            F.round("__slope", 6).alias("slope_per_s"),
            F.round(
                F.col("__last.v")
                + F.col("__slope")
                * (F.lit(float(bucket_s + horizon_s)) - F.col("__last.t")),
                6,
            ).alias("predicted"),
        )
    )


def q_deriv_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return deriv_predict(_long(spark, sf_dir))


ORACLE_DERIV_PREDICT = f"""WITH b AS (
  SELECT event_type AS metric, ts, value, event_id AS seq,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start,
         epoch(ts) - epoch(time_bucket(INTERVAL '{BUCKET_S} seconds', ts))
           AS t
  FROM events
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY metric, w_start ORDER BY ts DESC, seq DESC) AS rn
  FROM b
)
SELECT metric, w_start,
       CAST(count(*) AS BIGINT) AS n_samples,
       round(covar_pop(value, t) / nullif(var_pop(t), 0), 6) AS slope_per_s,
       round(max(CASE WHEN rn = 1 THEN value END)
             + (covar_pop(value, t) / nullif(var_pop(t), 0))
               * ({BUCKET_S + 300}.0 - max(CASE WHEN rn = 1 THEN t END)),
             6) AS predicted
FROM r
GROUP BY 1, 2"""


QUERIES["promql_deriv_predict"] = (q_deriv_predict, ORACLE_DERIV_PREDICT)


# --------------------------------------------------- changes() / resets()

def changes_resets(
    samples: DataFrame,
    bucket_s: int = BUCKET_S,
    series_cols: tuple[str, ...] = ("metric",),
) -> DataFrame:
    """PromQL ``changes()`` and ``resets()`` per (series, tumbling
    bucket): the number of times the value CHANGED between consecutive
    samples, and the number of counter resets (value decreases).

    Rides the same per-series lag chain as :func:`counter_rate`
    (:func:`_with_deltas`'s exchange shape), so the full-data shuffle
    count stays one; a sample whose predecessor sits in the previous
    bucket still counts — PromQL's range-vector semantics over a
    window that spans the boundary.
    """
    w = Window.partitionBy(*series_cols).orderBy("ts", "seq")
    prev_v = F.lag("value").over(w)
    changed = F.when(
        prev_v.isNotNull() & (F.col("value") != prev_v), 1
    ).otherwise(0)
    reset = F.when(
        prev_v.isNotNull() & (F.col("value") < prev_v), 1
    ).otherwise(0)
    return (
        samples.select(
            *series_cols,
            F.window("ts", f"{bucket_s} seconds").start.alias("w_start"),
            changed.alias("__chg"),
            reset.alias("__rst"),
        )
        .groupBy(*series_cols, "w_start")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum("__chg").cast("bigint").alias("changes"),
            F.sum("__rst").cast("bigint").alias("resets"),
        )
    )


def q_changes_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return changes_resets(_long(spark, sf_dir))


ORACLE_CHANGES_RESETS = f"""WITH s AS (
  SELECT event_type AS metric, ts, value, event_id AS seq,
         lag(value) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id) AS pv
  FROM events
)
SELECT metric,
       time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CASE WHEN pv IS NOT NULL AND value != pv
                     THEN 1 ELSE 0 END) AS BIGINT) AS changes,
       CAST(sum(CASE WHEN pv IS NOT NULL AND value < pv
                     THEN 1 ELSE 0 END) AS BIGINT) AS resets
FROM s
GROUP BY 1, 2"""

QUERIES["promql_changes_resets"] = (q_changes_resets, ORACLE_CHANGES_RESETS)


# ------------------------------------------------------------- EWMA

EWMA_ALPHA = 0.3
EWMA_K = 60  # truncation horizon: (1-0.3)^60 ~ 5e-10 << round(6) noise


def metric_ewma(
    samples: DataFrame,
    alpha: float = EWMA_ALPHA,
    k: int = EWMA_K,
    series_cols: tuple[str, ...] = ("metric",),
) -> DataFrame:
    """Per-series exponentially weighted moving average — the smoother
    behind alerting baselines (Holt-style level term).

    Defined as the K-TERM truncated EWMA: a left fold of
    ``acc*(1-alpha) + alpha*x`` over the last ``k`` samples in (ts,
    seq) order, seeded with the oldest sample in the frame.  With the
    default (alpha=0.3, k=60) the truncation error is (1-alpha)^k ~
    5e-10 — below the 6-decimal output rounding — while keeping the
    operator a bounded sliding frame instead of an unbounded
    recursion: every row costs O(k), any partition split point gives
    identical results, and the shuffle is the same one per-series
    exchange as the PromQL lag family.  ``collect_list`` over a
    running ROWS frame preserves frame order in both engines, so the
    fold is deterministic cross-engine.
    """
    w = (
        Window.partitionBy(*series_cols)
        .orderBy("ts", "seq")
        .rowsBetween(-(k - 1), 0)
    )
    window_vals = F.collect_list("value").over(w)
    folded = F.aggregate(
        F.slice(window_vals, 2, k),
        F.element_at(window_vals, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + F.lit(alpha) * x,
    )
    return samples.select(
        *series_cols,
        "ts",
        "seq",
        "value",
        F.round(folded, 6).alias("ewma"),
    )


def q_metric_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return metric_ewma(_long(spark, sf_dir))


ORACLE_METRIC_EWMA = f"""WITH s AS (
  SELECT event_type AS metric, ts, event_id AS seq, value,
         list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {EWMA_K - 1} PRECEDING AND CURRENT ROW) AS vals
  FROM events
)
SELECT metric, ts, seq, value,
       round(list_reduce(vals,
             (acc, x) -> acc * {1.0 - EWMA_ALPHA} + {EWMA_ALPHA} * x),
             6) AS ewma
FROM s"""

QUERIES["metric_ewma"] = (q_metric_ewma, ORACLE_METRIC_EWMA)


# --------------------------------------- subquery composition + episodes

SUBQ_INNER_S = 60  # inner rate() resolution
SUBQ_OUTER_S = 600  # outer *_over_time window


def subquery_max_rate(
    samples: DataFrame,
    inner_s: int = SUBQ_INNER_S,
    outer_s: int = SUBQ_OUTER_S,
) -> DataFrame:
    """PromQL subquery semantics: ``max_over_time(rate(m[1m])[10m:1m])``
    (+ sum_over_time and sample count) — the inner function evaluated
    at a fine step, the outer aggregation over a coarser window.

    Pure composition: the inner frame IS :func:`counter_rate` at
    ``inner_s`` buckets; the outer pass is one more keyed aggregate on
    the same (metric) hash distribution, so the subquery costs ONE
    extra metadata-scale aggregate over the inner result — never a
    second pass over raw samples.
    """
    inner = counter_rate(samples, inner_s).filter(
        F.col("rate_per_s").isNotNull()
    )
    return (
        inner.groupBy(
            "metric",
            F.window("w_start", f"{outer_s} seconds").start.alias("w_start"),
        )
        .agg(
            F.count("*").alias("n_inner"),
            F.round(F.max("rate_per_s"), 6).alias("max_rate"),
            # sum_over_time, not avg: an average of exactly-6dp inner
            # rates lands on .5 at the 7th decimal for ~0.2% of
            # windows, where Spark's and DuckDB's round() tie-break
            # differently; the SUM of 6dp decimals stays a 6dp decimal
            # — no tie surface (same class of fix as the money-sum
            # rounding note in the repo's oracle conventions).
            F.round(F.sum("rate_per_s"), 6).alias("sum_rate"),
        )
    )


def q_subquery_max_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return subquery_max_rate(_long(spark, sf_dir))


ORACLE_SUBQUERY_MAX_RATE = f"""WITH s AS (
  SELECT event_type AS metric, ts, value, event_id AS seq,
         lag(value) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id) AS pv
  FROM events
), e AS (
  SELECT metric,
         CASE WHEN pv IS NULL THEN NULL
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         time_bucket(INTERVAL '{SUBQ_INNER_S} seconds', ts) AS iw
  FROM s
), r AS (
  SELECT metric, iw, round(sum(inc) / {SUBQ_INNER_S}.0, 6) AS rate_per_s
  FROM e GROUP BY 1, 2
  HAVING sum(inc) IS NOT NULL
)
SELECT metric,
       time_bucket(INTERVAL '{SUBQ_OUTER_S} seconds', iw) AS w_start,
       CAST(count(*) AS BIGINT) AS n_inner,
       round(max(rate_per_s), 6) AS max_rate,
       round(sum(rate_per_s), 6) AS sum_rate
FROM r
GROUP BY 1, 2"""

QUERIES["promql_subquery_max_rate"] = (
    q_subquery_max_rate,
    ORACLE_SUBQUERY_MAX_RATE,
)


def alert_episodes(
    samples: DataFrame, z: float = 3.0, bucket_s: int = BUCKET_S
) -> DataFrame:
    """Merge consecutive anomalous rate buckets into alert EPISODES per
    series — the Alertmanager-style "for:"-duration view of
    :func:`rate_anomaly_flags` (one alert per incident, not one per
    bucket).

    Island key = bucket_index − rank, with the rank window PARTITIONED
    BY METRIC — unlike the flagship pipeline's single-partition
    episode merge (alert volume there), this scales with series
    cardinality exactly like every other operator in this module: the
    anomalous-bucket subset of each series merges independently.
    Output per episode: first/last bucket, bucket count, peak |z|.
    """
    flags = rate_anomaly_flags(samples, z, bucket_s).filter(
        F.col("is_anomaly") == 1
    )
    idx = (ntz_epoch_seconds("w_start") / F.lit(float(bucket_s))).cast(
        "bigint"
    )
    w = Window.partitionBy("metric").orderBy("w_start")
    grp = idx - F.row_number().over(w)
    return (
        flags.withColumn("__g", grp)
        .groupBy("metric", "__g")
        .agg(
            F.min("w_start").alias("first_w"),
            F.max("w_start").alias("last_w"),
            F.count("*").alias("n_buckets"),
            F.round(F.max(F.abs(F.col("z_score"))), 6).alias("peak_abs_z"),
        )
        .drop("__g")
    )


def q_alert_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # z tuned so episodes BIND on the testdata (z=3 flags are sparse
    # singletons; 1.5 produces multi-bucket runs at sf0.01)
    return alert_episodes(_long(spark, sf_dir), z=1.5)


ORACLE_ALERT_EPISODES = f"""WITH s AS (
  SELECT event_type AS metric, ts, value, event_id AS seq,
         lag(value) OVER w AS pv
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), e AS (
  SELECT metric,
         CASE WHEN pv IS NULL THEN NULL
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start
  FROM s
), r AS (
  SELECT metric, w_start, round(sum(inc) / {BUCKET_S}.0, 6) AS rate_per_s
  FROM e GROUP BY 1, 2
  HAVING sum(inc) IS NOT NULL
), m AS (
  SELECT metric, avg(rate_per_s) AS mu, stddev_pop(rate_per_s) AS sigma
  FROM r GROUP BY 1
), flagged AS (
  SELECT r.metric, w_start,
         round((rate_per_s - mu) / nullif(sigma, 0), 6) AS z_score
  FROM r JOIN m ON r.metric = m.metric
  WHERE abs((rate_per_s - mu) / nullif(sigma, 0)) > 1.5
), islands AS (
  SELECT *,
         CAST(epoch(w_start) / {BUCKET_S} AS BIGINT)
           - row_number() OVER (PARTITION BY metric ORDER BY w_start) AS g
  FROM flagged
)
SELECT metric,
       min(w_start) AS first_w,
       max(w_start) AS last_w,
       CAST(count(*) AS BIGINT) AS n_buckets,
       round(max(abs(z_score)), 6) AS peak_abs_z
FROM islands GROUP BY metric, g"""

QUERIES["promql_alert_episodes"] = (q_alert_episodes, ORACLE_ALERT_EPISODES)


# ------------------------------------------------------ offset modifier

OFFSET_S = 86400  # compare each bucket against the same bucket 1 day ago


def rate_offset_delta(
    samples: DataFrame,
    offset_s: int = OFFSET_S,
    bucket_s: int = BUCKET_S,
) -> DataFrame:
    """PromQL ``offset`` modifier composition:
    ``rate(m[10m]) / rate(m[10m] offset 1d)`` (+ absolute delta) — the
    day-over-day regression check behind most capacity alerts.

    The offset side is the SAME rate frame shifted by a constant:
    self-equi-join on (metric, w_start + offset) — hash join on the
    bucket key, both sides the already-aggregated per-bucket frame
    (metadata scale relative to raw samples), reusing one rate subtree
    in two roles.  Buckets with no counterpart a day earlier drop
    (inner join = PromQL vector matching).
    """
    rates = counter_rate(samples, bucket_s).filter(
        F.col("rate_per_s").isNotNull()
    )
    cur = rates.select("metric", "w_start", "rate_per_s")
    prev = rates.select(
        "metric",
        (
            F.col("w_start") + F.expr(f"INTERVAL {offset_s} SECONDS")
        ).alias("w_start"),
        F.col("rate_per_s").alias("rate_prev"),
    )
    ratio = F.col("rate_per_s") / F.expr("nullif(rate_prev, 0D)")
    return (
        cur.join(prev, ["metric", "w_start"])
        .select(
            "metric",
            "w_start",
            "rate_per_s",
            "rate_prev",
            F.round(F.col("rate_per_s") - F.col("rate_prev"), 6).alias(
                "delta"
            ),
            F.round(ratio, 6).alias("ratio"),
        )
    )


def q_rate_offset_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return rate_offset_delta(_long(spark, sf_dir))


ORACLE_RATE_OFFSET = f"""WITH s AS (
  SELECT event_type AS metric, ts, value, event_id AS seq,
         lag(value) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id) AS pv
  FROM events
), e AS (
  SELECT metric,
         CASE WHEN pv IS NULL THEN NULL
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start
  FROM s
), r AS (
  SELECT metric, w_start, round(sum(inc) / {BUCKET_S}.0, 6) AS rate_per_s
  FROM e GROUP BY 1, 2
  HAVING sum(inc) IS NOT NULL
)
SELECT cur.metric, cur.w_start, cur.rate_per_s,
       prev.rate_per_s AS rate_prev,
       round(cur.rate_per_s - prev.rate_per_s, 6) AS delta,
       round(cur.rate_per_s / nullif(prev.rate_per_s, 0), 6) AS ratio
FROM r cur
JOIN r prev
  ON cur.metric = prev.metric
 AND prev.w_start + INTERVAL '{OFFSET_S} seconds' = cur.w_start"""

QUERIES["promql_rate_offset_delta"] = (q_rate_offset_delta, ORACLE_RATE_OFFSET)


# -------------------------------------------- series-collapse sum by()

def q_sum_by_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sum by (metric) (rate(m{label=...}[10m]))`` — the most common
    PromQL idiom: per-LABELSET rates aggregated back up to the metric.

    The per-series lag/rate runs at full labelset identity (the
    q_rate_by_labelset series key), then ONE more keyed aggregate
    collapses the label dimension.  The collapse reuses the
    (metric, label) hash distribution's metric prefix — only the
    already-aggregated per-(series, bucket) frame moves, never raw
    samples; output cardinality is #metrics x #buckets.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    samples = ev.select(
        "ts",
        F.col("event_type").alias("metric"),
        (F.get_json_object(F.col("props"), "$.k").cast("bigint") % 10)
        .cast("bigint")
        .alias("label"),
        "value",
        F.col("event_id").alias("seq"),
    )
    rates = counter_rate(samples, series_cols=("metric", "label")).filter(
        F.col("rate_per_s").isNotNull()
    )
    return rates.groupBy("metric", "w_start").agg(
        F.count("*").cast("bigint").alias("n_series"),
        # sum of exactly-6dp per-series rates: 6dp-closed, no tie surface
        F.round(F.sum("rate_per_s"), 6).alias("sum_rate_per_s"),
        F.round(F.max("rate_per_s"), 6).alias("max_series_rate"),
    )


ORACLE_SUM_BY_RATE = f"""WITH s AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         ts, value, event_id AS seq
  FROM events
), l AS (
  SELECT metric, label, value,
         lag(value) OVER (PARTITION BY metric, label
                          ORDER BY ts, seq) AS pv,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start
  FROM s
), r AS (
  SELECT metric, label, w_start,
         round(sum(CASE WHEN pv IS NULL THEN NULL
                        WHEN value >= pv THEN value - pv
                        ELSE value END) / {BUCKET_S}.0, 6) AS rate_per_s
  FROM l GROUP BY 1, 2, 3
  HAVING sum(CASE WHEN pv IS NULL THEN NULL
                  WHEN value >= pv THEN value - pv
                  ELSE value END) IS NOT NULL
)
SELECT metric, w_start,
       CAST(count(*) AS BIGINT) AS n_series,
       round(sum(rate_per_s), 6) AS sum_rate_per_s,
       round(max(rate_per_s), 6) AS max_series_rate
FROM r
GROUP BY 1, 2"""

QUERIES["promql_sum_by_rate"] = (q_sum_by_rate, ORACLE_SUM_BY_RATE)


# ------------------------------------------- cardinality diagnostics

def q_series_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric series-cardinality report — the diagnostics every
    Prometheus operator runs when storage explodes: how many distinct
    labelsets does each metric carry, how many samples, and how
    concentrated is the volume (top labelset's share).

    One pre-aggregate keyed on (metric, label) — the same distribution
    as the rate family — then a per-metric rollup of the per-series
    counts; exact distinct via the two-level aggregate, no
    count_distinct shuffle of raw samples.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    per_series = (
        ev.select(
            F.col("event_type").alias("metric"),
            (F.get_json_object(F.col("props"), "$.k").cast("bigint") % 10)
            .cast("bigint")
            .alias("label"),
        )
        .groupBy("metric", "label")
        .agg(F.count("*").alias("n"))
    )
    return per_series.groupBy("metric").agg(
        F.count("*").cast("bigint").alias("n_series"),
        F.sum("n").cast("bigint").alias("n_samples"),
        F.round(F.max("n") / F.sum("n"), 6).alias("top_series_share"),
    )


ORACLE_SERIES_CARDINALITY = """WITH per AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         count(*) AS n
  FROM events
  GROUP BY 1, 2
)
SELECT metric,
       CAST(count(*) AS BIGINT) AS n_series,
       CAST(sum(n) AS BIGINT) AS n_samples,
       round(max(n) * 1.0 / sum(n), 6) AS top_series_share
FROM per
GROUP BY 1"""

QUERIES["promql_series_cardinality"] = (
    q_series_cardinality,
    ORACLE_SERIES_CARDINALITY,
)


# ------------------------------------------------- time-weighted average

def time_weighted_avg(
    samples: DataFrame,
    bucket_s: int = BUCKET_S,
    series_cols: tuple[str, ...] = ("metric",),
) -> DataFrame:
    """Time-weighted average per (series, tumbling bucket) — the
    irregular-sampling gauge average (TimescaleDB ``time_weight``):
    trapezoidal integral of the value over time divided by covered
    time, so a gauge sampled 1x/min and 1x/sec in the same bucket is
    not biased toward the chatty interval the way PromQL's sample-mean
    ``avg_over_time`` is.

    Each consecutive-sample segment contributes
    ``(v_prev + v) / 2 * dt`` attributed to the bucket holding the
    segment's END sample (documented convention — segments are not
    split at bucket boundaries, matching the exact-increase convention
    of :func:`counter_rate`).  Same single per-series exchange as the
    whole lag family.
    """
    w = Window.partitionBy(*series_cols).orderBy("ts", "seq")
    ts_sec = ntz_epoch_seconds("ts")
    prev_v = F.lag("value").over(w)
    dt = ts_sec - F.lag(ts_sec).over(w)
    seg = (prev_v + F.col("value")) / 2.0 * dt
    return (
        samples.select(
            *series_cols,
            F.window("ts", f"{bucket_s} seconds").start.alias("w_start"),
            seg.alias("__seg"),
            dt.alias("__dt"),
        )
        .groupBy(*series_cols, "w_start")
        .agg(
            F.count("__dt").cast("bigint").alias("n_segments"),
            F.round(
                F.sum("__seg") / F.expr("nullif(sum(__dt), 0D)"), 6
            ).alias("twa"),
        )
        .filter(F.col("n_segments") > 0)
    )


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return time_weighted_avg(_long(spark, sf_dir))


ORACLE_TIME_WEIGHTED_AVG = f"""WITH s AS (
  SELECT event_type AS metric, ts, value, event_id AS seq,
         lag(value) OVER w AS pv,
         epoch(ts) - epoch(lag(ts) OVER w) AS dt
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), e AS (
  SELECT metric,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start,
         (pv + value) / 2.0 * dt AS seg, dt
  FROM s
)
SELECT metric, w_start,
       CAST(count(dt) AS BIGINT) AS n_segments,
       round(sum(seg) / nullif(sum(dt), 0), 6) AS twa
FROM e
GROUP BY 1, 2
HAVING count(dt) > 0"""

QUERIES["promql_time_weighted_avg"] = (
    q_time_weighted_avg,
    ORACLE_TIME_WEIGHTED_AVG,
)


# -------------------------------------------- Holt linear-trend smoothing

HOLT_ALPHA = 0.3  # level smoothing factor (PromQL sf)
HOLT_BETA = 0.1  # trend smoothing factor (PromQL tf)
HOLT_K = 120  # truncation horizon (spectral radius < 1-beta => ~1e-6)


def holt_smoothing(
    samples: DataFrame,
    alpha: float = HOLT_ALPHA,
    beta: float = HOLT_BETA,
    k: int = HOLT_K,
    series_cols: tuple[str, ...] = ("metric",),
) -> DataFrame:
    """Per-series Holt linear-trend smoothing — the batch twin of
    PromQL's ``double_exponential_smoothing(v[w], sf, tf)``:

        s_t = alpha*x_t + (1-alpha)*(s_{t-1} + b_{t-1})
        b_t = beta*(s_t - s_{t-1}) + (1-beta)*b_{t-1}

    Defined (like :func:`metric_ewma`) as the K-TERM truncated fold over
    the last ``k`` samples in (ts, seq) order, seeded with
    (s=first value in frame, b=0) — a bounded sliding frame, so any
    partition split gives identical results and the only exchange is
    the family's per-series hash.  The two-state recursion folds a
    STRUCT accumulator; the DuckDB oracle replicates the identical fold
    over ``list_transform(vals, x -> struct(s := x, b := 0))`` so the
    sequence of float ops matches bit-for-bit.
    """
    w = (
        Window.partitionBy(*series_cols)
        .orderBy("ts", "seq")
        .rowsBetween(-(k - 1), 0)
    )
    vals = F.collect_list("value").over(w)
    seed = F.struct(F.element_at(vals, 1).alias("s"), F.lit(0.0).alias("b"))

    def step(acc, x):
        s2 = F.lit(alpha) * x + F.lit(1.0 - alpha) * (acc["s"] + acc["b"])
        b2 = F.lit(beta) * (s2 - acc["s"]) + F.lit(1.0 - beta) * acc["b"]
        return F.struct(s2.alias("s"), b2.alias("b"))

    folded = F.aggregate(F.slice(vals, 2, k), seed, step)
    return samples.select(
        *series_cols,
        "ts",
        "seq",
        "value",
        F.round(folded["s"], 6).alias("level"),
        F.round(folded["b"], 6).alias("trend"),
    )


def holt_smoothing_hourly(
    samples: DataFrame,
    alpha: float = HOLT_ALPHA,
    beta: float = HOLT_BETA,
    k: int = HOLT_K,
    series_cols: tuple[str, ...] = ("metric",),
) -> DataFrame:
    """Holt linear-trend smoothing over the HOURLY ROLLUP — the scale
    form of :func:`holt_smoothing` and the registry's shipped plan.

    The per-sample form keeps a K=120 collect_list frame on EVERY raw
    row — measured as the costliest per-row operator in the registry
    (BASELINE.md).  The monitoring question it answers ("level and
    trend of this series") does not need per-sample granularity: this
    form first collapses samples to per-(series, hour) means (ONE
    map-combined keyed aggregate — the same rollup discipline as
    metric_holt_winters), then runs the identical two-state truncated
    fold over the hour-cardinality frame.  Fold work drops from
    N_samples x K to N_hours x K; the raw-sample form stays available
    for bounded inputs (streaming tail windows, alert lookbacks).

    The hourly mean is rounded to 9dp in BOTH engines before the fold
    (the metric_sax_symbols discipline) so a 1-ulp sum-order difference
    cannot diverge through the recursion.
    """
    hourly = (
        samples.groupBy(
            *series_cols, F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(F.round(F.avg("value"), 9).alias("value"))
    )
    w = (
        Window.partitionBy(*series_cols)
        .orderBy("hour")
        .rowsBetween(-(k - 1), 0)
    )
    vals = F.collect_list("value").over(w)
    seed = F.struct(F.element_at(vals, 1).alias("s"), F.lit(0.0).alias("b"))

    def step(acc, x):
        s2 = F.lit(alpha) * x + F.lit(1.0 - alpha) * (acc["s"] + acc["b"])
        b2 = F.lit(beta) * (s2 - acc["s"]) + F.lit(1.0 - beta) * acc["b"]
        return F.struct(s2.alias("s"), b2.alias("b"))

    folded = F.aggregate(F.slice(vals, 2, k), seed, step)
    return hourly.select(
        *series_cols,
        "hour",
        "value",
        F.round(folded["s"], 6).alias("level"),
        F.round(folded["b"], 6).alias("trend"),
    )


def q_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return holt_smoothing_hourly(_long(spark, sf_dir))


#: constants interpolated via repr so both engines parse the exact same
#: doubles (1-alpha is computed in PYTHON, not re-derived in SQL).  The
#: accumulator is a 2-element LIST [level, trend], not a struct:
#: DuckDB 1.0.0 miscomputes duplicated subexpressions inside
#: struct_pack within list_reduce lambdas (minimal repro: fold
#: (acc, x) -> struct(s := acc.s + x.s, b := (acc.s + x.s) + acc.b)
#: over [1,2,3] yields b=12 instead of 9); the list form evaluates
#: correctly and matches the Spark struct fold value-for-value.
ORACLE_HOLT = f"""WITH r AS (
  SELECT event_type AS metric, date_trunc('hour', ts) AS hour,
         round(avg(value), 9) AS value
  FROM events
  GROUP BY 1, 2
), s AS (
  SELECT metric, hour, value,
         list(value) OVER (PARTITION BY metric ORDER BY hour
           ROWS BETWEEN {HOLT_K - 1} PRECEDING AND CURRENT ROW) AS vals
  FROM r
), h AS (
  SELECT metric, hour, value,
         list_reduce(
           list_transform(vals, x -> [x, 0.0::DOUBLE]),
           (acc, x) -> [
             {HOLT_ALPHA!r}::DOUBLE * x[1]
               + {1.0 - HOLT_ALPHA!r}::DOUBLE * (acc[1] + acc[2]),
             {HOLT_BETA!r}::DOUBLE
               * (({HOLT_ALPHA!r}::DOUBLE * x[1]
                   + {1.0 - HOLT_ALPHA!r}::DOUBLE * (acc[1] + acc[2]))
                  - acc[1])
               + {1.0 - HOLT_BETA!r}::DOUBLE * acc[2]]) AS hw
  FROM s
)
SELECT metric, hour, value,
       round(hw[1], 6) AS level, round(hw[2], 6) AS trend
FROM h"""

QUERIES["promql_holt_smoothing"] = (q_holt_smoothing, ORACLE_HOLT)


# -------------------------------------------- seasonal-profile baseline

SEASONAL_Z = 3.0


def seasonal_anomaly(
    samples: DataFrame,
    z_cut: float = SEASONAL_Z,
    series_cols: tuple[str, ...] = ("metric",),
) -> DataFrame:
    """Seasonal-profile anomaly baseline: per (series, hour-of-day)
    mean/std_pop profile, then every sample scored as a z-score against
    its seasonal slot; rows with |z| >= z_cut are flagged.  The
    statistical sibling of the LSTM detector (same premise as the
    reference: learn "normal for this time", alert on deviation) and
    the classic first-line production baseline.

    Scale: the profile is one hash aggregate (#series x 24 rows —
    metadata scale), broadcast back onto the sample stream, so the
    scoring pass is map-only; no per-series window at all.
    """
    prof = (
        samples.groupBy(*series_cols, F.hour("ts").alias("__h"))
        .agg(
            F.avg("value").alias("__m"),
            F.stddev_pop("value").alias("__s"),
        )
    )
    z = (F.col("value") - F.col("__m")) / F.expr("nullif(__s, 0D)")
    return (
        samples.withColumn("__h", F.hour("ts"))
        .join(F.broadcast(prof), [*series_cols, "__h"])
        .withColumn("__z", z)
        .filter(F.abs(F.col("__z")) >= z_cut)
        .select(
            *series_cols,
            "ts",
            "seq",
            "value",
            F.round("__z", 6).alias("z"),
        )
    )


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return seasonal_anomaly(_long(spark, sf_dir))


ORACLE_SEASONAL = f"""WITH prof AS (
  SELECT event_type AS metric, hour(ts) AS h,
         avg(value) AS m, stddev_pop(value) AS s
  FROM events GROUP BY 1, 2
), z AS (
  SELECT e.event_type AS metric, e.ts, e.event_id AS seq, e.value,
         (e.value - p.m) / nullif(p.s, 0) AS z
  FROM events e
  JOIN prof p ON e.event_type = p.metric AND hour(e.ts) = p.h
)
SELECT metric, ts, seq, value, round(z, 6) AS z
FROM z WHERE abs(z) >= {SEASONAL_Z!r}"""

QUERIES["metric_seasonal_anomaly"] = (q_seasonal_anomaly, ORACLE_SEASONAL)


# ------------------------------------------ label manipulation family

def q_label_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL's label-manipulation trio on the full-labelset stream —
    label_replace (regex capture from an existing label), label_join
    (concatenate labels into one), clamp(v, lo, hi) — composed into a
    relabeled per-series summary.  All pure codegen string/math
    expressions; the only exchange is the final keyed aggregate, and
    relabeling happens BEFORE it so the aggregate keys on the new
    identity (the recording-rule pattern)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        F.col("event_type").alias("metric"),
        (F.get_json_object(F.col("props"), "$.k").cast("bigint") % 10)
        .cast("bigint")
        .alias("label"),
        "value",
    )
    relabeled = s.select(
        # label_replace(env, "$1", metric, "^(click|view)$") -> 'ui'
        F.when(
            F.regexp_extract("metric", r"^(click|view)$", 1) != "",
            F.lit("ui"),
        )
        .otherwise(F.lit("backend"))
        .alias("env"),
        # label_replace(short, "$1", metric, "^(..)") — capture group
        F.regexp_extract("metric", r"^(..)", 1).alias("short"),
        # label_join(series_id, ":", metric, label)
        F.concat_ws(":", "metric", F.col("label").cast("string")).alias(
            "series_id"
        ),
        # clamp(value, 0, 100)
        F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(100.0)).alias(
            "clamped"
        ),
    )
    return relabeled.groupBy("env", "short", "series_id").agg(
        F.count("*").alias("n_samples"),
        F.round(F.sum("clamped"), 6).alias("sum_clamped"),
    )


ORACLE_LABEL_OPS = """WITH s AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         value
  FROM events
), r AS (
  SELECT CASE WHEN regexp_extract(metric, '^(click|view)$', 1) <> ''
              THEN 'ui' ELSE 'backend' END AS env,
         regexp_extract(metric, '^(..)', 1) AS short,
         metric || ':' || CAST(label AS VARCHAR) AS series_id,
         least(greatest(value, 0.0), 100.0) AS clamped
  FROM s
)
SELECT env, short, series_id, count(*) AS n_samples,
       round(sum(clamped), 6) AS sum_clamped
FROM r GROUP BY 1, 2, 3"""

QUERIES["promql_label_ops"] = (q_label_ops, ORACLE_LABEL_OPS)


# ------------------------------------------------ vector matching (/)

def vector_match_ratio(
    samples: DataFrame,
    num_metric: str = "error",
    den_metric: str = "click",
    bucket_s: int = BUCKET_S,
) -> DataFrame:
    """PromQL binary-operator vector matching:
    ``rate(num[w]) / rate(den[w])`` joined ON the shared identity
    (here the time bucket; with labelsets, the match labels) — the
    error-ratio / cache-hit-ratio recording-rule shape.

    Both sides come from ONE pass of the shared rate frame (the
    aggregate computes every metric's rate; the two selectors are
    filters over it), so the join inputs are bucket-scale aggregates —
    metadata-sized at any SF — and PromQL's "no match -> no result"
    semantics fall out of the inner join.  NULL ratio on a zero
    denominator (PromQL yields +Inf; SQL NULL is the cross-engine
    representable twin — documented divergence).
    """
    rates = counter_rate(samples, bucket_s)
    num = rates.filter(F.col("metric") == num_metric).select(
        "w_start", F.col("rate_per_s").alias("num_rate")
    )
    den = rates.filter(F.col("metric") == den_metric).select(
        "w_start", F.col("rate_per_s").alias("den_rate")
    )
    return num.join(den, "w_start").select(
        "w_start",
        "num_rate",
        "den_rate",
        F.round(
            F.when(F.col("den_rate") != 0, F.col("num_rate") / F.col("den_rate")),
            6,
        ).alias("ratio"),
    )


def q_vector_match_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return vector_match_ratio(_long(spark, sf_dir))


ORACLE_VECTOR_MATCH = f"""WITH s AS (
  SELECT event_type AS metric, ts, value, event_id AS seq,
         lag(value) OVER w AS pv
  FROM events
  WHERE event_type IN ('error', 'click')
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), e AS (
  SELECT metric,
         CASE WHEN pv IS NULL THEN NULL
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         time_bucket(INTERVAL '{BUCKET_S} seconds', ts) AS w_start
  FROM s
), r AS (
  SELECT metric, w_start, round(sum(inc) / {BUCKET_S}.0, 6) AS rate_per_s
  FROM e GROUP BY 1, 2
)
SELECT n.w_start, n.rate_per_s AS num_rate, d.rate_per_s AS den_rate,
       round(CASE WHEN d.rate_per_s != 0
                  THEN n.rate_per_s / d.rate_per_s END, 6) AS ratio
FROM r n JOIN r d ON n.w_start = d.w_start
WHERE n.metric = 'error' AND d.metric = 'click'"""

QUERIES["promql_vector_match_ratio"] = (
    q_vector_match_ratio,
    ORACLE_VECTOR_MATCH,
)
