"""Additional TPC-H-pattern queries adapted to the fixture schema
(the fixtures omit some TPC-H columns — commitdate, shipmode, mfgr —
so each query keeps the PATTERN that matters for the optimizer:
nation-pair volume, market share, disjunctive predicates, correlated
average subqueries, large-order IN+HAVING, absent-relation checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.queries.registry import query

from parquet_to_sql_spark.queries.relational import (  # shared — do not fork
    DISC_PRICE,
    _sql,
)



_Q7 = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         {DISC_PRICE} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                       AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_nation_volume", tags=("tpch", "join", "aggregation"), oracle=_Q7)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 pattern: bidirectional nation-pair trade volume by
    year. Both nation joins broadcast; the OR-of-pairs predicate is
    evaluated post-join on broadcast rows, never shuffling lineitem."""
    return _sql(spark, sf_dir, _Q7,
                ("supplier", "lineitem", "orders", "customer", "nation"))


_Q8 = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         {DISC_PRICE} AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                        AND TIMESTAMP '1996-12-31 00:00:00'
) all_nations
GROUP BY o_year
"""


@query("q8_market_share", tags=("tpch", "join", "aggregation"), oracle=_Q8)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 pattern: one nation's revenue share of a filtered
    market, per year — conditional aggregation over an 8-way join.
    The decimal volumes keep both SUMs exact, so the final double
    division is engine-identical."""
    return _sql(spark, sf_dir, _Q8,
                ("part", "lineitem", "orders", "customer", "nation", "region", "supplier"))


_Q12 = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_totalprice <= 150000 THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@query("q12_priority_shipping", tags=("tpch", "join", "conditional-agg"), oracle=_Q12)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 pattern: CASE-conditional counting inside a join
    aggregate."""
    return _sql(spark, sf_dir, _Q12, ("orders", "lineitem"))


_Q14 = f"""
SELECT CAST(100.00 AS DOUBLE)
       * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE}
                       ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
       / CAST(SUM({DISC_PRICE}) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


@query("q14_promo_effect", tags=("tpch", "join", "conditional-agg"), oracle=_Q14)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 pattern: promo revenue share (conditional decimal sums
    -> one double division)."""
    return _sql(spark, sf_dir, _Q14, ("lineitem", "part"))


_Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_small_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


@query("q17_small_quantity", tags=("tpch", "correlated-subquery"), oracle=_Q17)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 pattern: correlated average subquery (lines below 20%
    of the part's mean quantity). Catalyst decorrelates it into an
    aggregate+join — no per-row subquery execution."""
    return _sql(spark, sf_dir, _Q17, ("lineitem", "part"))


_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice, o_orderdate,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 200)
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice, o_orderdate
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@query("q18_large_orders", tags=("tpch", "in-subquery", "having"), oracle=_Q18)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 pattern: IN over a HAVING aggregate (large-volume
    orders), rewritten by Catalyst to a semi join on the aggregate."""
    return _sql(spark, sf_dir, _Q18, ("customer", "orders", "lineitem"))


_Q19 = f"""
SELECT CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
       AND l_quantity >= 20 AND l_quantity <= 40)
"""


@query("q19_disjunctive", tags=("tpch", "disjunctive-filter"), oracle=_Q19)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 pattern: OR-of-conjunct predicates across the join —
    the classic test that the optimizer pushes the common join key and
    keeps the disjunction as a post-join filter."""
    return _sql(spark, sf_dir, _Q19, ("lineitem", "part"))


_Q22 = """
SELECT SUBSTRING(c_name, 10, 2) AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY cntrycode
"""


@query("q22_global_sales", tags=("tpch", "anti-join", "scalar-subquery"), oracle=_Q22)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 pattern: above-average customers with no orders
    (scalar subquery + anti join)."""
    return _sql(spark, sf_dir, _Q22, ("customer", "orders"))


_Q2 = """
SELECT p_size, p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice = (
  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_size = part.p_size)
ORDER BY p_size, p_partkey
"""


@query("q2_min_per_group", tags=("tpch", "correlated-subquery"), oracle=_Q2)
def q2_min_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern: rows matching a correlated per-group minimum
    (cheapest part per size). Catalyst decorrelates to an aggregate
    joined back — one pass over part, no per-row subquery."""
    return _sql(spark, sf_dir, _Q2, ("part",))


_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({DISC_PRICE}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("q15_top_supplier", tags=("tpch", "cte", "scalar-subquery"), oracle=_Q15)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 pattern: CTE revenue view + scalar MAX subquery over
    it (the CTE is evaluated once; decimal-exact revenue makes the
    MAX comparison engine-identical)."""
    return _sql(spark, sf_dir, _Q15, ("lineitem", "supplier"))


_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@query("q16_supplier_cnt", tags=("tpch", "not-in-subquery", "distinct"), oracle=_Q16)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 pattern: NOT IN exclusion subquery + COUNT(DISTINCT)
    over a filtered join (null-aware anti join in the plan)."""
    return _sql(spark, sf_dir, _Q16, ("lineitem", "part", "supplier"))


_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@query("q13_customer_distribution", tags=("tpch", "double-aggregation"), oracle=_Q13)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 pattern: count-of-counts histogram (outer join ->
    per-customer aggregate -> distribution aggregate). Two cascaded
    aggregations, the second over a tiny domain."""
    return _sql(spark, sf_dir, _Q13, ("customer", "orders"))


_Q9 = f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         {DISC_PRICE}
           - CAST(0.10 AS DECIMAL(3,2))
             * CAST(p_retailprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2)) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
"""


@query("q9_product_profit", tags=("tpch", "join", "aggregation"), oracle=_Q9)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 pattern: profit per (supplier nation, year) for parts
    matching a LIKE filter. The fixtures have no partsupp, so supply
    cost is surrogated as 10% of p_retailprice — the JOIN SHAPE (part
    LIKE-filter fans a 5-way join grouped by nation x year) is what
    the pattern pins. part/supplier/nation broadcast; lineitem never
    shuffles before the final group-by."""
    return _sql(spark, sf_dir, _Q9,
                ("part", "lineitem", "supplier", "orders", "nation"))


_Q11 = """
SELECT l_partkey AS ps_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
FROM (
  SELECT l_partkey,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(l_quantity AS DECIMAL(12,2)) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
) x
GROUP BY l_partkey
HAVING SUM(val) > (
  SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2)))
         * CAST(0.001 AS DECIMAL(6,4))
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
)
"""


@query("q11_value_concentration", tags=("tpch", "subquery", "having"), oracle=_Q11)
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 pattern: per-part traded value inside one nation,
    HAVING-filtered against a SCALAR SUBQUERY (0.1% of the nation's
    total) — the fraction-of-global-aggregate shape. The subquery
    plans as its own tiny aggregate broadcast into the HAVING filter;
    exact decimal sums on both engines make the threshold comparison
    bit-stable."""
    return _sql(spark, sf_dir, _Q11, ("lineitem", "supplier", "nation"))


_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE '%rod%'
      )
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > CAST(50 AS DECIMAL(12,2))
  )
"""


@query("q20_excess_shippers", tags=("tpch", "subquery", "nested-in"), oracle=_Q20)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 pattern: nested IN subqueries — suppliers (in one
    nation) whose shipped volume of LIKE-matched parts since a date
    exceeds a threshold. Plans as two semi-joins: part-list broadcast
    into the lineitem aggregate, then the qualifying supplier set
    semi-joined against the (broadcast) supplier dimension."""
    return _sql(spark, sf_dir, _Q20, ("supplier", "nation", "lineitem", "part"))


_Q21 = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
"""


@query("q21_waiting_suppliers", tags=("tpch", "exists", "correlated"), oracle=_Q21)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 pattern: the hardest correlation shape — for each
    late line, EXISTS another supplier's line in the same order AND
    NOT EXISTS another supplier's line that was ALSO late (fixtures
    lack commit/receipt dates, so 'late' = shipped >90 days after the
    order date, correlated through the outer order). Spark plans the
    pair as a left-semi plus a left-anti join on l_orderkey — both
    shuffle-partitioned on the same key as the main join, so AQE
    stacks them without extra exchanges."""
    return _sql(spark, sf_dir, _Q21, ("supplier", "lineitem", "orders", "nation"))


@query(
    "sub_relational_division",
    tags=("subquery", "division"),
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM (SELECT DISTINCT o_orderpriority AS pr FROM orders) p
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c_custkey AND o.o_orderpriority = p.pr
      )
    )
    """,
)
def sub_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — customers with orders in EVERY priority
    class — in its classic double-NOT-EXISTS form on the oracle side,
    and as the scalable count-matching rewrite on the Spark side: a
    distinct-count per customer equi-compared against the (broadcast)
    1-row universe count.  The rewrite is the 100 TB formulation:
    two aggregations and one broadcast instead of a nested correlated
    anti-join per candidate row."""
    import pyspark.sql.functions as F

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    universe = orders.agg(
        F.countDistinct("o_orderpriority").alias("n_all")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_pr")
    )
    # LEFT join + coalesce(n_pr, 0) so the empty-divisor case keeps
    # division's vacuous-truth semantics (no priorities exist => every
    # customer qualifies), matching the double-NOT-EXISTS oracle
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .crossJoin(F.broadcast(universe))
        .filter(F.coalesce(F.col("n_pr"), F.lit(0)) == F.col("n_all"))
        .select("c_custkey", "c_name")
    )
