"""Second wave of TPC-H-shaped relational queries (Q10/Q14/Q16/Q18/Q19/Q22).

The reference engine's relational surface stops at simple aligns and
unions (SURVEY §2.3-§2.5); this module widens the engine's proven join/
aggregation repertoire with the classic TPC-H access patterns the first
wave (relational.py: Q1/Q3/Q5/Q6) didn't cover:

- Q10  fact-fact-dim join funnel with a selective date window
- Q14  join + conditional aggregation into one scalar ratio
- Q16  distinct-count aggregation over a join (expand + two-phase agg)
- Q18  aggregate-then-join (HAVING on a fact rollup feeding the join)
- Q19  disjunctive multi-block predicate across a join (OR of ANDs)
- Q22  scalar subquery + anti-join (customers w/o recent orders)

Adapted to the driver's testdata schema where it lacks TPC-H columns
(no partsupp/phone/shipmode/commitdate): predicates are re-targeted to
existing columns while keeping each query's SHAPE - the part Catalyst
has to plan - intact.

Scale notes (100 TB): every query here shuffles on a join/group key at
most twice; dimension sides are left unhinted so AQE broadcast-gates
them at runtime size (nation at 25 rows is hint-broadcast); all
predicates sit on base columns so pushdown reaches the parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------------------------ Q10

def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer.

    lineitem|orders fact-fact shuffle join, customer unhinted (AQE
    broadcast-gates), nation force-broadcast (25 rows at any SF).
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1996-07-01 00:00:00'"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


ORACLE_TPCH_Q10 = """SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name"""


# ------------------------------------------------------------------ Q14

def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — join + CASE aggregation
    collapsing to one scalar (testdata p_type is a single word, so the
    LIKE 'PROMO%' of stock Q14 becomes equality)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-07-01 00:00:00'"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        # part is SF-proportional: unhinted, AQE decides broadcast
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_TPCH_Q14 = """SELECT round(
         100.0 * sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0.0 END)
         / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'"""


# ------------------------------------------------------------------ Q16

def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier-count per part attribute group.

    Stock Q16 walks partsupp; the testdata has no partsupp, so the
    part->supplier relation is derived from lineitem — same plan shape:
    join then COUNT(DISTINCT) (Catalyst expands to a two-phase
    partial/final aggregate keyed on group+suppkey, no row explosion).
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_TPCH_Q16 = """SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
GROUP BY p_brand, p_type, p_size"""


# ------------------------------------------------------------------ Q18

def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — aggregate the fact FIRST
    (groupBy orderkey + HAVING), then join the survivors to orders and
    customer.  The orderkey rollup and the orders join share a key, so
    the pre-aggregation shuffle is reused by the join (one exchange on
    l_orderkey); the tiny survivor set then broadcast-joins upward.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 6).alias("total_qty"))
        .filter(F.col("total_qty") > 260)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


ORACLE_TPCH_Q18 = """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       o_totalprice, total_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 6) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 260) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey"""


# ------------------------------------------------------------------ Q19

def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive blocks across a join.

    The brand membership (p_brand IN ...) is factored out of the OR so
    it pushes down to the part scan; the residual OR-of-ANDs evaluates
    post-join inside whole-stage codegen.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    q = F.col("l_quantity")
    s = F.col("p_size")
    b = F.col("p_brand")
    blocks = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(10, 30) & q.between(10, 35))
        | ((b == "Brand#3") & s.between(20, 50) & q.between(20, 50))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(blocks)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_TPCH_Q19 = """SELECT round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)"""


# ------------------------------------------------------------------ Q22

def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + anti-join.

    Stock Q22 keys on phone country codes the testdata lacks; the
    adapted predicate keeps the plan shape: a one-row global aggregate
    broadcast into the filter, then a LEFT ANTI against recent orders,
    then a small group-by.  (Every sf0.01 customer has SOME order, so
    the anti-join side is date-restricted to stay non-vacuous.)
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '2001-01-01 00:00:00'")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("c_nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
    )


ORACLE_TPCH_Q22 = """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       count(*) AS numcust,
       round(sum(c_acctbal), 6) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c_nationkey"""


QUERIES = {
    "tpch_q10": (q_tpch_q10, ORACLE_TPCH_Q10),
    "tpch_q14": (q_tpch_q14, ORACLE_TPCH_Q14),
    "tpch_q16": (q_tpch_q16, ORACLE_TPCH_Q16),
    "tpch_q18": (q_tpch_q18, ORACLE_TPCH_Q18),
    "tpch_q19": (q_tpch_q19, ORACLE_TPCH_Q19),
    "tpch_q22": (q_tpch_q22, ORACLE_TPCH_Q22),
}


# ------------------------------------------------------------------- Q7

def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipping between two nations — the same
    dimension (nation) participates TWICE under different join keys
    (supplier's nation vs customer's nation), with a cross-pair filter
    and a per-(pair, year) aggregate.

    nation is fixed 25 rows at any SF -> both copies force-broadcast;
    the facts chain through l_orderkey/l_suppkey/o_custkey hash joins
    with the nationkey IN-filters pushed into the supplier and customer
    scans.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(1, 2)
    )
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 2)
    )
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nk"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_TPCH_Q7 = """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE s_nationkey IN (1, 2) AND c_nationkey IN (1, 2)
  AND s_nationkey <> c_nationkey
GROUP BY 1, 2, 3"""


QUERIES["tpch_q7"] = (q_tpch_q7, ORACLE_TPCH_Q7)


# ------------------------------------------------------------------- Q4

def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated subquery folded into a
    LEFT SEMI join, then a bounded-key aggregate.

    Stock Q4 tests commitdate < receiptdate (columns the testdata
    lacks); the adapted predicate — a lineitem shipped > 30 days after
    the order date — keeps the correlated-EXISTS shape: the semi join
    carries the non-equi time condition alongside the orderkey equality,
    deduplicates by construction (no DISTINCT stage), and the priority
    rollup is a 5-key agg.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORACLE_TPCH_Q4 = """SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority"""


QUERIES["tpch_q4"] = (q_tpch_q4, ORACLE_TPCH_Q4)
