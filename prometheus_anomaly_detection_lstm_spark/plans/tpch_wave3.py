"""Third (final) wave of TPC-H-shaped relational queries.

Completes the TPC-H shape inventory: with relational.py (Q1/3/5/6),
tpch_more.py (Q4/7/10/14/16/18/19/22) and extended.min_cost_supplier
(the Q2 correlated-min shape), this module adds Q8/9/11/12/13/15/17/20/21
so every one of the 22 classic access patterns has a registered,
oracle-checked twin:

- Q8   two-role dimension (nation joined on BOTH supplier and customer
       paths) feeding a conditional market-share ratio per year
- Q9   profit rollup by (nation, year) across a 5-way join
- Q11  group-by + global scalar threshold (HAVING vs a scalar subquery)
- Q12  fact-fact join with CASE bucket counts per category
- Q13  left outer join with an ON-clause predicate, then a distribution
       over the per-key counts (double aggregation)
- Q15  aggregate, then join against the aggregate's own max (top-1 by
       scalar subquery, tie-safe)
- Q17  correlated per-part average (aggregate-then-join), scalar output
- Q20  nested semi-join chain (suppliers shipping enough of the
       targeted parts)
- Q21  exists / not-exists self-join on the fact table, expressed as
       one per-order aggregate instead of two correlated subqueries

The driver's testdata lacks partsupp / ps_supplycost / l_shipmode /
l_commitdate / l_receiptdate, so Q9/11/12/20/21 re-target predicates to
existing columns (profit uses p_retailprice as the cost proxy; "late"
is l_shipdate > o_orderdate + N days; "ship mode" is l_returnflag) —
the SHAPES Catalyst must plan (join graphs, correlation structure,
aggregate placement) are intact.  Reference parity: the reference
engine (vpuhoff/prometheus-anomaly-detection-lstm) has no relational surface at all —
this module is engine-completeness work, not reference parity.

Scale notes (100 TB): every fact-fact join here shuffles on its join
key at most once and reuses that exchange for the follow-on aggregate
where possible; dimension sides (part 2k rows, supplier 100, nation 25,
customer 1.5k per sf0.01) are either force-broadcast (fixed-size
nation) or left unhinted so AQE size-gates them at runtime; all
predicates sit on base columns so pushdown reaches the parquet scans.
Q21's classic formulation is two correlated EXISTS subqueries = two
extra self-joins of lineitem; the one-pass per-order aggregate below
computes both quantifiers in a single shuffle — the shape you want when
lineitem is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------------------------- Q8

def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share.

    nation plays TWO roles (customer-side region membership and
    supplier-side share attribution) — same double-dimension pattern as
    Q7 but feeding a conditional ratio.  Fact-fact shuffle joins on
    l_orderkey; all dimension joins broadcast (nation/region fixed
    size, part/supplier/customer AQE-gated).
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # customer-side nation restricted to the target region
    n_cust = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


ORACLE_TPCH_Q8 = """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_2'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
GROUP BY 1"""


# ------------------------------------------------------------------- Q9

def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by (supplier nation, year).

    No partsupp/ps_supplycost in the testdata, so cost is proxied by
    0.5 * p_retailprice * l_quantity — the expression keeps the
    part-join dependency the original's supplycost term forces.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 6).alias("sum_profit"))
    )


ORACLE_TPCH_Q9 = """SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.5 * p_retailprice * l_quantity), 6) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2"""


# ------------------------------------------------------------------ Q11

def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value with a global scalar threshold.

    partsupp is proxied by lineitem shipped volume for suppliers in the
    target nation.  The HAVING-vs-scalar-subquery correlation becomes a
    broadcast of the one-row global total — the per-part aggregate is
    computed ONCE and reused for both sides (Catalyst plans the reused
    subtree; the scalar side collapses to a single-row exchange).
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    scoped = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("__value")
    )
    total = per_part.agg(
        F.sum("__value").alias("__total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("__value") > 0.001 * F.col("__total"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round("__value", 6).alias("value"),
        )
    )


ORACLE_TPCH_Q11 = """WITH scoped AS (
  SELECT l_partkey, l_extendedprice * l_quantity AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT l_partkey AS ps_partkey, round(sum(v), 6) AS value
FROM scoped
GROUP BY l_partkey
HAVING sum(v) > 0.001 * (SELECT sum(v) FROM scoped)"""


# ------------------------------------------------------------------ Q12

def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority bucket counts per ship mode.

    l_shipmode/commitdate/receiptdate don't exist in the testdata:
    "mode" is l_returnflag in ('A','R'), "late" is shipped >= 90 days
    after the order date, receipt year pinned to 1997.  One fact-fact
    join, CASE buckets folded map-side into the final aggregate.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.year("l_shipdate") == 1997)
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_TPCH_Q12 = """SELECT l_returnflag AS ship_mode,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND year(l_shipdate) = 1997
  AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
GROUP BY 1"""


# ------------------------------------------------------------------ Q13

def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution.

    LEFT OUTER join with the predicate in the ON clause (filtering
    orders BEFORE the join — a WHERE would silently drop the
    zero-order customers the query exists to count), per-customer
    count, then a second aggregation over the counts.  The second agg's
    input is one row per customer — tiny — so the distribution step is
    a near-free reshuffle.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


ORACLE_TPCH_Q13 = """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count"""


# ------------------------------------------------------------------ Q15

def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier by quarterly revenue.

    The revenue rollup is computed once; its max is a one-row broadcast
    joined back (the view + scalar-subquery structure of the original).
    Tie-safe: equality against the max keeps all argmax suppliers, same
    as the SQL.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
    )
    top = revenue.agg(F.max("__rev").alias("__max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("__rev") == F.col("__max_rev"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("__rev", 6).alias("total_revenue"),
        )
    )


ORACLE_TPCH_Q15 = """WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(total_rev, 6) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)"""


# ------------------------------------------------------------------ Q17

def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue (scalar output).

    Correlated per-part average as aggregate-then-join.  Spark-first
    ordering: lineitem is semi-joined to the brand's parts FIRST, so
    the per-part average aggregates only the brand's rows — at 100 TB
    that's the difference between aggregating the whole fact table and
    ~brand-fraction of it.  The original's correlated subquery scans
    all lines of each part, but the average only feeds comparisons for
    the brand's parts, so restricting first is answer-identical.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#16")
    li = _t(spark, sf_dir, "lineitem").join(
        part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("__lim")
    )
    return (
        li.join(avg_q, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


ORACLE_TPCH_Q17 = """SELECT round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#16'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )"""


# ------------------------------------------------------------------ Q20

def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain.

    Suppliers in the target nation who shipped > 50 units of 'red%'
    parts during 1996 (partsupp availability proxied by shipped
    volume).  parts -> per-(supplier, part) rollup -> threshold ->
    distinct suppliers -> left-semi into supplier: each step shrinks
    the keyset, and the final semi-join is a broadcast.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1996)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    shipped = (
        li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 50.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(shipped, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


ORACLE_TPCH_Q20 = """SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND year(l_shipdate) = 1996
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 50.0
  )"""


# ------------------------------------------------------------------ Q21

def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept orders waiting.

    Classic form: lineitem l1 with EXISTS (another supplier in the
    order) AND NOT EXISTS (another supplier ALSO late) — two correlated
    self-joins of the fact table.  Spark-first: ONE per-order aggregate
    computes both quantifiers (distinct suppliers, distinct late
    suppliers), then late lines join that summary — a single shuffle on
    o_orderkey where the textbook plan needs three.  "Late" is
    l_shipdate > o_orderdate + 30 days (no commit/receipt dates in the
    testdata); orders restricted to status 'F' as in the original.
    Counts LINES (not orders): a supplier with two late lines in one
    qualifying order counts twice, matching the SQL's count(*) over l1.
    """
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    flags = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "o_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ).alias("__late"),
        )
    )
    per_order = flags.groupBy("o_orderkey").agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(F.when(F.col("__late"), F.col("l_suppkey"))).alias(
            "__n_late"
        ),
    )
    qualifying = (
        flags.filter(F.col("__late"))
        .join(
            per_order.filter(
                (F.col("__n_supp") > 1) & (F.col("__n_late") == 1)
            ).select("o_orderkey"),
            "o_orderkey",
        )
    )
    return (
        qualifying.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "numwait")
    )


ORACLE_TPCH_Q21 = """SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_0'
  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY s_suppkey, s_name"""


QUERIES = {
    "tpch_q8": (q_tpch_q8, ORACLE_TPCH_Q8),
    "tpch_q9": (q_tpch_q9, ORACLE_TPCH_Q9),
    "tpch_q11": (q_tpch_q11, ORACLE_TPCH_Q11),
    "tpch_q12": (q_tpch_q12, ORACLE_TPCH_Q12),
    "tpch_q13": (q_tpch_q13, ORACLE_TPCH_Q13),
    "tpch_q15": (q_tpch_q15, ORACLE_TPCH_Q15),
    "tpch_q17": (q_tpch_q17, ORACLE_TPCH_Q17),
    "tpch_q20": (q_tpch_q20, ORACLE_TPCH_Q20),
    "tpch_q21": (q_tpch_q21, ORACLE_TPCH_Q21),
}


# ------------------------------------------------------------- CUBE

def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping
    combinations in one pass (rollup_agg covers the hierarchical
    subset; this is the full lattice).  Same single-shuffle expand
    strategy — each input row fans out to its grouping sets map-side,
    one exchange on the padded keys."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.count("*").alias("n"),
        F.grouping_id().cast("bigint").alias("gid"),
    )


ORACLE_CUBE_AGG = """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       count(*) AS n,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)"""


QUERIES["cube_agg"] = (q_cube_agg, ORACLE_CUBE_AGG)
