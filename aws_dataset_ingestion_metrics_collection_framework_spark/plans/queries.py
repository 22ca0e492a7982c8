"""Query registry: every implemented operator exposed as a (spark, sf_dir) →
DataFrame callable plus (where SQL-expressible) an equivalent DuckDB oracle.

This is the correctness surface of the engine (SURVEY §2 inventory + the
training-data-pipeline extensions). Numeric determinism rules used
throughout so Spark and DuckDB hash-match bit-for-bit:

- money sums go through DECIMAL with *explicit* scales at every step (both
  engines compute exact decimals, final CAST AS DOUBLE is deterministic);
- double sums/averages of 2-decimal inputs are ROUND(x, 6) — the true value
  is a multiple of 10^-2 (or a rational with non-decimal denominator), never
  at a rounding boundary, so both engines round identically;
- top-k orderings always carry a unique tie-break key;
- timestamps stay native (UTC session) or are formatted with identical
  patterns on both sides.
"""

from __future__ import annotations

import json
import math
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import METRIC_DEFS_SCHEMA, load_table, register_tables
from ..dsl.loader import DefinitionSet, definitions_to_dataframes
from ..functions.keys import (
    alarm_name_col,
    alarm_unique_id_col,
    parse_alarm_name,
    unique_id_col,
    widget_title_col,
)
from ..operators import behavior as BH
from ..operators import cdc as CDC
from ..operators import curation as CU
from ..operators import dashboards as DB
from ..operators import dedup as D
from ..operators import diagnostics as DIAG
from ..operators import dq as DQ
from ..operators import graph as G
from ..operators import metrics as M
from ..operators import sessions as SS
from ..operators import similarity as SIM
from ..operators import sla_eval as SLA
from ..operators import temporal as T
from ..operators import textops as TX
from ..operators import weighting as WGT
from ..operators.business import business_metrics_distributed

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _par(*thunks):
    """Run independent Spark ACTIONS concurrently from driver threads
    (optimization guide §2.6: actions are only sequential because driver
    code calls them sequentially — submitting independent actions together
    lets the next job's tasks back-fill workers freed by the previous
    job's tail, and overlaps the per-action driver planning/submission
    latency, which the job census of the multi-action contract faces
    measured at ~half their wall time: sharded_ivfpq_ann ran 198 jobs
    summing 22.8 s of task time inside a 49 s first-run wall).

    Each thunk must be an independent action (no thunk consumes another's
    output), so execution order cannot change any computed value; results
    return in thunk order. Spark's scheduler is FIFO across driver
    threads, py4j is thread-safe, and concurrent first-computation of a
    shared lazy localCheckpoint is block-locked by the BlockManager —
    still, faces materialize shared builds eagerly BEFORE fanning out so
    no build is raced. Pool size is capped at 6 in-flight jobs: enough to
    fill the tail without fighting for executors (guide §2.6). NOTE:
    nested pools multiply — a thunk that itself calls a parallel builder
    (e.g. build_sharded_ivfpq_index: a 2-pool whose shard branch opens a
    4-pool) can put cap x inner-cap jobs in flight; keep fan-outs shallow
    and don't stack _par inside _par."""
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(thunks), 6)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]

# --------------------------------------------------------------------------
# Shared SQL texts (run verbatim on Spark AND DuckDB — the reference's
# BusinessMetric surface is arbitrary SQL, ref:glue/business_metrics.py:39)
# --------------------------------------------------------------------------

_DISC_PRICE = (
    "CAST((CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2))) AS DECIMAL(18,4))"
)
_CHARGE = (
    f"CAST(({_DISC_PRICE} * CAST(1 + CAST(l_tax AS DECIMAL(12,2)) AS DECIMAL(12,2))) "
    "AS DECIMAL(22,6))"
)

Q01_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({_CHARGE}) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

Q03_SQL = f"""
SELECT
  l_orderkey,
  CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

Q05_SQL = f"""
SELECT
  n_name,
  CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""

Q06_SQL = """
SELECT
  CAST(SUM(CAST((CAST(l_extendedprice AS DECIMAL(12,2)) *
       CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

Q10_SQL = f"""
SELECT
  c_custkey,
  c_name,
  CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
  c_acctbal,
  n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND c_nationkey = n_nationkey
  AND l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

# TPC-H-shaped queries adapted to the driver's slimmed columns; chosen for
# their distinct relational shapes: EXISTS semi-join (q04), NOT IN anti-join
# + COUNT DISTINCT (q16), scalar subquery + NOT EXISTS anti-join (q22).
Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (9, 14, 19, 23, 36, 45, 49, 3)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE CAST(s_acctbal AS DECIMAL(12,2)) < 0.00
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 20
"""

Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(12,2)) > (
    SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(16,6))
    FROM customer WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0.00
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""

# --------------------------------------------------------------------------
# Remaining TPC-H-shaped corpus (r2): the driver's tables are slimmed (no
# partsupp, no l_commitdate/l_receiptdate/l_shipmode, no comment columns), so
# each query keeps its ORIGINAL relational shape — the thing the user-SQL
# surface (S1/A4/J4, ref:glue/business_metrics.py:39) must support — with
# predicates adapted to the available columns:
#   q02 correlated scalar MIN subquery per outer row      q07 nation-pair CASE
#   q08 share-of-group via conditional aggregation        q09 like + multi-join
#   q11 HAVING vs global-fraction scalar subquery         q12 conditional counts
#   q13 outer-join + double grouping (distribution)       q14 promo share
#   q15 CTE reused in scalar subquery (top supplier)      q17 correlated AVG
#   q18 IN (grouped HAVING subquery)                      q19 OR-of-ANDs ranges
#   q20 nested IN chains with grouped HAVING              q21 EXISTS + NOT EXISTS
# Determinism: every money aggregate goes through the explicit DECIMAL chain;
# doubles only after exact sums; unique ORDER BY tie-breaks before LIMIT.

Q02_SQL = """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part, lineitem, supplier, nation, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND p_size = 15 AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  AND CAST(l_extendedprice AS DECIMAL(12,2)) = (
    SELECT MIN(CAST(l2.l_extendedprice AS DECIMAL(12,2)))
    FROM lineitem l2, supplier s2, nation n2, region r2
    WHERE p_partkey = l2.l_partkey AND s2.s_suppkey = l2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

Q07_SQL = f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
         {_DISC_PRICE} AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

Q08_SQL = f"""
SELECT o_year,
       100.0 * CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         {_DISC_PRICE} AS volume, n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
    AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
    AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

Q09_SQL = f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         {_DISC_PRICE} AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
    AND s_nationkey = n_nationkey AND p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

Q11_SQL = """
SELECT s_nationkey, CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM supplier
WHERE s_acctbal > 0
GROUP BY s_nationkey
HAVING CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) >
  (SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) * 0.04
   FROM supplier WHERE s_acctbal > 0)
ORDER BY total_bal DESC, s_nationkey
"""

Q12_SQL = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

Q14_SQL = f"""
SELECT 100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE}
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
              / CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""

Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""

Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""

Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""

Q19_SQL = f"""
SELECT CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey AND (
    (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
 OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
 OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))
"""

Q20_SQL = """
SELECT s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 40)
  AND s_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_name IN ('NATION_1','NATION_2','NATION_3'))
ORDER BY s_name
"""

Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
  AND s_nationkey = n_nationkey
  AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

# Analytic-window corpus (§2.6): ROW_NUMBER top-n, frame-bounded moving
# average + LAG delta, DENSE_RANK within groups — all verbatim on both
# engines. The moving-average window is a single global sort, but over the
# per-day AGGREGATE (thousands of rows at any corpus size), never raw facts.
WINDOW_TOPN_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
  FROM orders
) ranked WHERE rn <= 3
"""

WINDOW_MOVING_AVG_SQL = """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY o_orderdate
)
SELECT d, rev,
       ROUND(AVG(rev) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS rev_ma7,
       ROUND(rev - COALESCE(LAG(rev, 1) OVER (ORDER BY d), rev), 6) AS rev_delta
FROM daily
"""

WINDOW_RANK_SQL = """
SELECT n_name, r_name, total_bal,
       CAST(DENSE_RANK() OVER (
         PARTITION BY r_name ORDER BY total_bal DESC, n_name) AS INTEGER) AS rnk
FROM (
  SELECT n_name, r_name, CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
  FROM customer JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  GROUP BY n_name, r_name
) t
"""

# ROLLUP reachable through the user-SQL surface (SURVEY §2.4 note: grouping
# sets/cube/rollup come via A4 user SQL, Catalyst-native). GROUPING() guards
# distinguish the rollup NULLs from data NULLs for the hash compare.
ROLLUP_SQL = """
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""

# Distribution analytics: the window functions the rank corpus lacked.
# NTILE buckets, PERCENT_RANK and CUME_DIST run identically in both
# engines for a TOTAL order (ties broken by n_name).
WINDOW_DISTRIBUTION_SQL = """
SELECT n_name, r_name, total_bal,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM (
  SELECT n_name, r_name,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
  FROM customer JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  GROUP BY n_name, r_name
) t
WINDOW w AS (PARTITION BY r_name ORDER BY total_bal DESC, n_name)
ORDER BY r_name, total_bal DESC, n_name
"""

# GROUPING SETS with grouping_id: the explicit-sets surface beyond
# ROLLUP/CUBE — (flag,status), (flag), (status) but NOT the grand total,
# which neither ROLLUP nor CUBE can express alone; GROUPING() disambiguates
# real NULL keys from aggregation rows.
GROUPING_SETS_SQL = """
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER)
    AS grp_id,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                        (l_linestatus))
ORDER BY returnflag, linestatus, grp_id
"""

# Set operations beyond UNION ALL: INTERSECT and EXCEPT (both DISTINCT
# forms — identical semantics both engines): customers with orders in 1995
# AND 1996, minus any with a returned line.
SET_OPS_SQL = """
SELECT c_custkey FROM (
  SELECT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
  INTERSECT
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  EXCEPT
  SELECT o_custkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R' AND l_quantity >= 49
) t
ORDER BY c_custkey
"""

# RANGE frames with a calendar-interval bound: the trailing-7-day window
# that ROWS frames cannot express (row counts are not time). Both engines
# accept the identical `RANGE BETWEEN INTERVAL 7 DAY PRECEDING` phrase.
WINDOW_RANGE_INTERVAL_SQL = """
SELECT user_id, event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
       ROUND(SUM(value) OVER w, 6) AS sum_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""

CUBE_SQL = """
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
  COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""

# Business-metric scalar corpus (A4 contract: each subquery → one scalar).
_BUSINESS_SCALARS = {
    "lineitem_count": "SELECT COUNT(*) FROM lineitem",
    "active_customers": "SELECT COUNT(DISTINCT o_custkey) FROM orders",
    "max_order_price": "SELECT CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) FROM orders",
    "total_quantity": "SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) FROM lineitem",
    "event_rows": "SELECT COUNT(*) FROM events",
}

BUSINESS_SCALARS_SQL = " UNION ALL ".join(
    f"SELECT '{name}' AS name, CAST(({q}) AS DOUBLE) AS value"
    for name, q in _BUSINESS_SCALARS.items()
)


def _sql_query(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        return spark.sql(sql)

    return run


# --------------------------------------------------------------------------
# Statistic engine queries (A1/W1/J1/A3/C1 — DataFrame implementations)
# --------------------------------------------------------------------------

_DAY_DEFS = [
    ("click", "Sum"),
    ("view", "Average"),
    ("purchase", "Maximum"),
    ("error", "SampleCount"),
    ("signup", "Minimum"),
]


def _events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        F.lit("App/Events").alias("namespace"),
        F.col("event_type").alias("name"),
        F.lit(None).cast("string").alias("dimensions"),
        "ts",
        "value",
    )


def _day_defs_df(spark: SparkSession, stats=None) -> DataFrame:
    stats = stats or _DAY_DEFS
    rows = [
        (
            "App/Events", et, "day", 86400, stat, None, None,
            "events", None, "dash", "123412341234", None, None, None,
        )
        for et, stat in stats
    ]
    return spark.createDataFrame(rows, METRIC_DEFS_SCHEMA)


def q_metrics_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = M.scrape_metrics(
        _events_raw(spark, sf_dir),
        _day_defs_df(spark),
        "day",
        account_id="123412341234",
        region="us-east-1",
        collection_time=F.lit("2026-01-01 00:00:00").cast("timestamp"),
        value_cast="double",
    )
    return out.select(
        "collectiontime", "namespace", "name", "period", "frequency", "statistic",
        "accountid", "metrictimestamp",
        F.round("metricvalue", 6).alias("metricvalue"),
        "id", "label", "region", "year", "month", "day", "hour",
    )


METRICS_DAY_ORACLE = """
WITH defs(name, statistic) AS (
  VALUES ('click','Sum'),('view','Average'),('purchase','Maximum'),
         ('error','SampleCount'),('signup','Minimum')
),
agg AS (
  SELECT event_type AS name, date_trunc('day', ts) AS ws,
         SUM(value) AS s, AVG(value) AS a, MIN(value) AS mn, MAX(value) AS mx,
         CAST(COUNT(value) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
)
SELECT
  '2026-01-01T00:00:00+00:00' AS collectiontime,
  'App/Events' AS namespace,
  agg.name AS name,
  86400 AS period,
  'day' AS frequency,
  d.statistic AS statistic,
  '123412341234' AS accountid,
  strftime(agg.ws, '%Y-%m-%dT%H:%M:%S+00:00') AS metrictimestamp,
  ROUND(CASE d.statistic WHEN 'Sum' THEN s WHEN 'Average' THEN a
        WHEN 'Maximum' THEN mx WHEN 'Minimum' THEN mn
        WHEN 'SampleCount' THEN c END, 6) AS metricvalue,
  lower(regexp_replace('App/Events' || agg.name || 'day', '\\W+', '', 'g')) AS id,
  agg.name AS label,
  'us-east-1' AS region,
  CAST(year(agg.ws) AS SMALLINT) AS year,
  CAST(month(agg.ws) AS SMALLINT) AS month,
  CAST(day(agg.ws) AS SMALLINT) AS day,
  CAST(hour(agg.ws) AS SMALLINT) AS hour
FROM agg JOIN defs d ON d.name = agg.name
"""


def q_metrics_day_p50(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = M.scrape_metrics(
        _events_raw(spark, sf_dir),
        _day_defs_df(spark, [("purchase", "p50")]),
        "day",
        collection_time=F.lit("2026-01-01 00:00:00").cast("timestamp"),
        value_cast="double",
    )
    return out.select(
        "name", "statistic", "metrictimestamp", F.round("metricvalue", 6).alias("metricvalue")
    )


METRICS_DAY_P50_ORACLE = """
SELECT 'purchase' AS name, 'p50' AS statistic,
       strftime(date_trunc('day', ts), '%Y-%m-%dT%H:%M:%S+00:00') AS metrictimestamp,
       ROUND(quantile_cont(value, 0.5), 6) AS metricvalue
FROM events WHERE event_type = 'purchase' GROUP BY date_trunc('day', ts)
"""


def q_metrics_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute-frequency scrape (the third reference cadence) over one day of
    purchase events — W1 tumbling minute windows + F1/J1 on period=60."""
    raw = _events_raw(spark, sf_dir).filter(
        (F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp"))
    )
    defs = spark.createDataFrame(
        [("App/Events", "purchase", "minute", 60, "Sum", None, None,
          "events", None, "dash", "123412341234", None, None, None)],
        METRIC_DEFS_SCHEMA,
    )
    out = M.scrape_metrics(
        raw, defs, "minute",
        collection_time=F.lit("2026-01-01 00:00:00").cast("timestamp"),
        value_cast="double",
    )
    return out.select(
        "name", "period", "frequency", "metrictimestamp",
        F.round("metricvalue", 6).alias("metricvalue"), "id",
        "year", "month", "day", "hour",
    )


METRICS_MINUTE_ORACLE = """
SELECT 'purchase' AS name, 60 AS period, 'minute' AS frequency,
       strftime(date_trunc('minute', ts), '%Y-%m-%dT%H:%M:%S+00:00') AS metrictimestamp,
       ROUND(SUM(value), 6) AS metricvalue,
       'appeventspurchaseminute' AS id,
       CAST(2024 AS SMALLINT) AS year, CAST(1 AS SMALLINT) AS month,
       CAST(3 AS SMALLINT) AS day,
       CAST(hour(date_trunc('minute', ts)) AS SMALLINT) AS hour
FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-04 00:00:00'
GROUP BY date_trunc('minute', ts)
"""


def _events_raw_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        F.lit("App/Events").alias("namespace"),
        F.col("event_type").alias("name"),
        F.to_json(
            F.struct((F.col("user_id") % 3).cast("string").alias("UserShard"))
        ).alias("dimensions"),
        "ts",
        "value",
    )


def _hour_dims_defs_df(spark: SparkSession) -> DataFrame:
    rows = [
        (
            "App/Events", et, "hour", 3600, "Sum", None,
            json.dumps({"UserShard": str(s)}),
            "events", None, "dash", "123412341234", None, None, None,
        )
        for et, _ in _DAY_DEFS
        for s in range(3)
    ]
    return spark.createDataFrame(rows, METRIC_DEFS_SCHEMA)


def q_metrics_hour_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 with dimensions: raw events carry to_json dims; defs carry
    json.dumps dims (different spacing) — the canonical unique_id matches
    them anyway (C1)."""
    out = M.scrape_metrics(
        _events_raw_dims(spark, sf_dir),
        _hour_dims_defs_df(spark),
        "hour",
        collection_time=F.lit("2026-01-01 00:00:00").cast("timestamp"),
        value_cast="double",
    )
    return out.select(
        "name", "dimensions", "statistic", "metrictimestamp",
        F.round("metricvalue", 6).alias("metricvalue"), "id",
    )


METRICS_HOUR_DIMS_ORACLE = """
SELECT
  event_type AS name,
  '{"UserShard": "' || CAST(user_id % 3 AS VARCHAR) || '"}' AS dimensions,
  'Sum' AS statistic,
  strftime(date_trunc('hour', ts), '%Y-%m-%dT%H:%M:%S+00:00') AS metrictimestamp,
  ROUND(SUM(value), 6) AS metricvalue,
  lower(regexp_replace('App/Events' || event_type || 'hour' || 'UserShard' ||
        CAST(user_id % 3 AS VARCHAR), '\\W+', '', 'g')) AS id
FROM events
GROUP BY event_type, user_id % 3, date_trunc('hour', ts)
"""


def q_metrics_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = q_metrics_day(spark, sf_dir)
    return M.latest_datapoint(day)


METRICS_LATEST_ORACLE = """
WITH m AS ({day})
SELECT id,
       arg_max(metricvalue, metrictimestamp) AS metricvalue,
       max(metrictimestamp) AS metrictimestamp
FROM m GROUP BY id
""".format(day=METRICS_DAY_ORACLE)

# --------------------------------------------------------------------------
# SLA evaluation queries (W3/W4/C13/A6)
# --------------------------------------------------------------------------

_SLA_SCHEMA = (
    "sla_id string, series_id string, threshold double, comparison_operator string, "
    "datapoints_to_alarm int, evaluation_periods int, treat_missing_data string, period int"
)


def _daily_click_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return ev.groupBy(F.window("ts", "86400 seconds").alias("w")).agg(
        F.sum("value").alias("value")
    ).select(F.lit("clicks_day").alias("series_id"), F.col("w.start").alias("ws"), "value")


def q_sla_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = _daily_click_series(spark, sf_dir)
    slas = spark.createDataFrame(
        [("sla_clicks", "clicks_day", 6000.005, "GREATER_THAN_THRESHOLD", 2, 3,
          "NOT_BREACHING", 86400)],
        _SLA_SCHEMA,
    )
    out = SLA.evaluate_slas(series, slas)
    return out.select(
        "sla_id", "ws", F.round("value", 6).alias("value"), "breach", "statevalue"
    )


SLA_DAILY_ORACLE = """
WITH s AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws, SUM(value) AS v
  FROM events WHERE event_type = 'click' GROUP BY 1
),
b AS (
  SELECT ws, v, (v > 6000.005) AS breach FROM s
)
SELECT 'sla_clicks' AS sla_id, ws, ROUND(v, 6) AS value, breach,
       CASE WHEN SUM(CASE WHEN breach THEN 1 ELSE 0 END)
                 OVER (ORDER BY ws ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2
            THEN 'ALARM' ELSE 'OK' END AS statevalue
FROM b
"""


def q_sla_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = _daily_click_series(spark, sf_dir)
    slas = spark.createDataFrame(
        [("sla_clicks", "clicks_day", 6000.005, "GREATER_THAN_THRESHOLD", 2, 3,
          "NOT_BREACHING", 86400)],
        _SLA_SCHEMA,
    )
    out = SLA.state_transitions(SLA.evaluate_slas(series, slas))
    return out.select("sla_id", "ws", "prev_state", "statevalue")


SLA_TRANSITIONS_ORACLE = """
WITH states AS ({daily}),
lagged AS (
  SELECT sla_id, ws, lag(statevalue) OVER (ORDER BY ws) AS prev_state, statevalue
  FROM states
)
SELECT * FROM lagged WHERE prev_state IS NULL OR prev_state <> statevalue
""".format(daily=SLA_DAILY_ORACLE)


def q_sla_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute-level signup sums on one day — real gaps exercise
    treat_missing_data=NOT_BREACHING grid synthesis (W3/W5)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "signup")
            & (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-06 00:00:00").cast("timestamp"))
        )
    )
    series = ev.groupBy(F.window("ts", "60 seconds").alias("w")).agg(
        F.sum("value").alias("value")
    ).select(F.lit("signup_min").alias("series_id"), F.col("w.start").alias("ws"), "value")
    slas = spark.createDataFrame(
        [("sla_gap", "signup_min", 150.005, "GREATER_THAN_THRESHOLD", 1, 1,
          "NOT_BREACHING", 60)],
        _SLA_SCHEMA,
    )
    out = SLA.evaluate_slas(series, slas)
    return out.select("sla_id", "ws", F.round("value", 6).alias("value"), "statevalue")


SLA_GAP_FILL_ORACLE = """
WITH s AS (
  SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS ws, SUM(value) AS v
  FROM events
  WHERE event_type = 'signup'
    AND ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-06 00:00:00'
  GROUP BY 1
),
bounds AS (SELECT min(ws) AS lo, max(ws) AS hi FROM s),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS ws FROM bounds
)
SELECT 'sla_gap' AS sla_id, g.ws AS ws, ROUND(s.v, 6) AS value,
       CASE WHEN s.v > 150.005 THEN 'ALARM' ELSE 'OK' END AS statevalue
FROM grid g LEFT JOIN s ON s.ws = g.ws
"""

def q_sla_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/S8 — alert payloads for ALARM-entering transitions of the daily
    click SLA (m=1/n=1 so states flip and produce several alerts)."""
    series = _daily_click_series(spark, sf_dir)
    slas = spark.createDataFrame(
        [("sla_clicks", "clicks_day", 3300.005, "GREATER_THAN_THRESHOLD", 1, 1,
          "NOT_BREACHING", 86400)],
        _SLA_SCHEMA,
    )
    trans = SLA.state_transitions(SLA.evaluate_slas(series, slas))
    meta = spark.createDataFrame(
        [("sla_clicks", "click sla", "clicks moved", "SEV 3", True,
          "click", "day", "web", "ref-1")],
        "sla_id string, details string, short_description string, severity string, "
        "sns_enabled boolean, metric_name string, frequency string, "
        "dimension_value string, reference_id string",
    )
    return SLA.build_alerts(trans, meta)


SLA_ALERTS_ORACLE = """
WITH s AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws, SUM(value) AS v
  FROM events WHERE event_type = 'click' GROUP BY 1
),
st AS (
  SELECT ws, CASE WHEN v > 3300.005 THEN 'ALARM' ELSE 'OK' END AS statevalue FROM s
),
tr AS (
  SELECT ws, statevalue, lag(statevalue) OVER (ORDER BY ws) AS prev_state FROM st
)
SELECT 'sla_clicks' AS sla_id, ws, statevalue, TRUE AS sns_enabled,
       '{"details":"click sla","short_description":"clicks moved caused by CloudWatch Alarm in '
       || statevalue ||
       ' state","impact":"SEV 3","unique_id":"web-click-day","alarm_origin":"Data Governance","reference_id":"ref-1"}'
       AS payload
FROM tr
WHERE (prev_state IS NULL OR prev_state <> statevalue)
  AND statevalue IN ('ALARM', 'INSUFFICIENT_DATA')
"""


def q_sla_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full S3/J2/F9 scrape: per-event-type daily SLAs evaluated over events,
    latest state per alarm, name-derived J2 join back to metric defs for
    metadata, §1.3 slas-row projection."""
    from ..operators import sla_table as ST

    ev = load_table(spark, sf_dir, "events")
    series = (
        ev.groupBy(F.col("event_type"), F.window("ts", "86400 seconds").alias("w"))
        .agg(F.sum("value").alias("value"))
        .select(F.col("event_type").alias("series_id"), F.col("w.start").alias("ws"), "value")
    )
    types = [et for (et, _) in _DAY_DEFS]
    slas = spark.createDataFrame(
        [(f"sla_{et}", et, 1200.005, "GREATER_THAN_THRESHOLD", 1, 1, "NOT_BREACHING", 86400)
         for et in types],
        _SLA_SCHEMA,
    )
    evaluated = SLA.evaluate_slas(series, slas)
    latest = evaluated.groupBy("sla_id").agg(
        F.max_by("statevalue", "ws").alias("statevalue"),
        F.max_by("statereason", "ws").alias("statereason"),
        F.max("ws").alias("ws"),
    )

    defs = spark.createDataFrame(
        [("App/Events", et, "day", 86400, "Sum", json.dumps({"team": "data"}),
          json.dumps({"EventType": et}),
          "events", None, "dash", "123412341234", None, None, None)
         for et in types],
        METRIC_DEFS_SCHEMA,
    )
    sla_meta = defs.select(
        "namespace", "name", "frequency", "period", "statistic", "dimensions", "account",
        F.lit(1200.005).alias("threshold"),
        F.lit("GREATER_THAN_THRESHOLD").alias("comparison_operator"),
        F.lit("NOT_BREACHING").alias("treat_missing_data"),
        F.concat(F.lit("sla_"), F.col("name")).alias("sla_id"),
    )
    alarms = ST.build_alarm_registry(sla_meta).join(latest, "sla_id")
    return ST.scrape_sla_table(
        alarms,
        defs,
        account_id="123412341234",
        collection_time=F.lit("2026-01-01 00:00:00").cast("timestamp"),
    )


SLA_TABLE_ORACLE = """
WITH s AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws, SUM(value) AS v
  FROM events GROUP BY 1, 2
),
latest AS (
  SELECT event_type,
         arg_max(CASE WHEN v > 1200.005 THEN 'ALARM' ELSE 'OK' END, ws) AS statevalue,
         arg_max(CASE WHEN v > 1200.005 THEN 1 ELSE 0 END, ws) AS breaches
  FROM s GROUP BY 1
),
named AS (
  SELECT event_type, statevalue,
         'Threshold Crossed: ' || breaches ||
         ' out of the last 1 datapoints were greater than the threshold (1200.005) (1 datapoints for ALARM)'
           AS statereason,
         lower(replace('App/Events-' || event_type || '-day-EventType-' || event_type || '-', '/', '')) AS aid
  FROM latest
)
SELECT
  'arn:aws:cloudwatch:us-east-1:123412341234:alarm:data-gov-' || aid || 'SLA-Alarm-us-east-1' AS alarmarn,
  'data-gov-' || aid || 'SLA-Alarm-us-east-1' AS alarmname,
  'App/Events' AS metricnamespace,
  event_type AS metricname,
  86400 AS metricperiod,
  'day' AS metricfrequency,
  'Sum' AS metricstatistic,
  CAST(1200.005 AS FLOAT) AS threshold,
  'GREATER_THAN_THRESHOLD' AS "comparisonOperator",
  'NOT_BREACHING' AS treatmissingdata,
  statevalue,
  statereason,
  '123412341234' AS accountid,
  '{"team": "data"}' AS metadata,
  'us-east-1' AS region,
  CAST(2026 AS SMALLINT) AS year, CAST(1 AS SMALLINT) AS month,
  CAST(1 AS SMALLINT) AS day, CAST(0 AS SMALLINT) AS hour,
  '2026-01-01T00:00:00+00:00' AS collectiontime
FROM named
"""


# --------------------------------------------------------------------------
# Derived keys (C1-C4) + alarm-name round trip (J2/J3 parsing)
# --------------------------------------------------------------------------


def q_derived_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    types = (
        load_table(spark, sf_dir, "events").select(F.col("event_type").alias("name")).distinct()
    )
    dims = F.array(F.struct(F.lit("EventType").alias("name"), F.col("name").alias("value")))
    ns, freq = F.lit("App/Events"), F.lit("hour")
    aid = alarm_unique_id_col(ns, F.col("name"), freq, dims)
    return types.select(
        "name",
        unique_id_col(ns, F.col("name"), freq, dims).alias("unique_id"),
        aid.alias("alarm_unique_id"),
        widget_title_col(F.col("name"), freq, dims).alias("widget_title"),
        alarm_name_col(aid, F.lit("us-east-1")).alias("alarm_name"),
    )


DERIVED_KEYS_ORACLE = """
WITH t AS (SELECT DISTINCT event_type AS name FROM events),
k AS (
  SELECT name,
    lower(regexp_replace('App/Events' || name || 'hour' || 'EventType' || name,
          '\\W+', '', 'g')) AS unique_id,
    lower(replace('App/Events' || '-' || name || '-' || 'hour' || '-' ||
          'EventType' || '-' || name || '-', '/', '')) AS alarm_unique_id,
    lower(replace(name || ' per hour-' || name, '/', '')) AS widget_title
  FROM t
)
SELECT name, unique_id, alarm_unique_id, widget_title,
       'data-gov-' || alarm_unique_id || 'SLA-Alarm-us-east-1' AS alarm_name
FROM k
"""


def q_alarm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = q_derived_keys(spark, sf_dir).select("alarm_name")
    parts = parse_alarm_name(F.col("alarm_name"))
    return names.select(
        "alarm_name",
        parts["metric_name"].alias("metric_name"),
        parts["frequency"].alias("frequency"),
        parts["dimension_value"].alias("dimension_value"),
        parts["alarm_key"].alias("alarm_key"),
    )


ALARM_ROUNDTRIP_ORACLE = """
WITH k AS ({keys}),
p AS (
  SELECT alarm_name, string_split(split_part(alarm_name, '-SLA', 1), '-') AS parts
  FROM k
)
SELECT alarm_name,
       parts[4] AS metric_name,
       parts[5] AS frequency,
       array_to_string(parts[7:], '-') AS dimension_value,
       array_to_string(parts[3:], '-') AS alarm_key
FROM p
""".format(keys=DERIVED_KEYS_ORACLE)

# --------------------------------------------------------------------------
# Definitions flattening (S9/S11 — loader output vs literal golden row)
# --------------------------------------------------------------------------


def _defs(spark: SparkSession):
    ds = DefinitionSet(accounts=["123412341234"], root=os.path.join(REPO_ROOT, "definitions"))
    return definitions_to_dataframes(spark, ds)


def q_metric_defs_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _defs(spark)[0]


METRIC_DEFS_FLAT_ORACLE = """
SELECT
  'AWS/Lambda' AS namespace, 'Invocations' AS name, 'day' AS frequency,
  86400 AS period, 'Sum' AS statistic,
  '{"Thing": "foobar"}' AS metadata,
  '{"FunctionName": "hello_world"}' AS dimensions,
  'test_category' AS metric_set, CAST(NULL AS VARCHAR) AS sla_set,
  'test_dashboard_category' AS dashboard, '123412341234' AS account,
  CAST(NULL AS VARCHAR) AS dataset, CAST(NULL AS VARCHAR) AS reference_datasets,
  CAST(NULL AS VARCHAR) AS query
"""


def q_sla_defs_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _defs(spark)[1]


def q_metric_defs_multi_account(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-account landscape (VERDICT r1 missing #1): the account registry
    (accounts_config.json, ref:accounts/accounts.py shape) drives flattening
    of EVERY streamer account's definitions into one defs table with an
    ``account`` column, joined (broadcast) back to the registry for the
    governance ``central`` column — no per-account jobs."""
    from ..dsl.accounts import AccountRegistry

    reg = AccountRegistry(path=os.path.join(REPO_ROOT, "definitions", "accounts_config.json"))
    ds = DefinitionSet(accounts=reg.all_streamers(), root=os.path.join(REPO_ROOT, "definitions"))
    defs, _ = definitions_to_dataframes(spark, ds)
    return defs.join(F.broadcast(reg.to_dataframe(spark)), "account").select(
        "central", "account", "namespace", "name", "frequency",
        F.col("period").cast("int").alias("period"), "statistic",
        "metadata", "dimensions", "metric_set", "dashboard",
    )


METRIC_DEFS_MULTI_ACCOUNT_ORACLE = """
SELECT * FROM (VALUES
  ('123412341234', '123412341234', 'AWS/Lambda', 'Invocations', 'day', 86400,
   'Sum', '{"Thing": "foobar"}', '{"FunctionName": "hello_world"}',
   'test_category', 'test_dashboard_category'),
  ('123412341234', '567856785678', 'AWS/Lambda', 'Errors', 'hour', 3600,
   'Sum', '{"Team": "member"}', '{"FunctionName": "member_fn"}',
   'member_category', 'member_dashboard')
) AS t(central, account, namespace, name, frequency, period, statistic,
       metadata, dimensions, metric_set, dashboard)
"""


SLA_DEFS_FLAT_ORACLE = """
SELECT
  CAST(NULL AS VARCHAR) AS ticket, 1 AS threshold,
  'LESS_THAN_OR_EQUAL_TO_THRESHOLD' AS comparison_operator,
  1 AS datapoints_to_alarm, 1 AS evaluation_periods,
  'NOT_BREACHING' AS treat_missing_data, 'SEV 5' AS severity,
  'test_sla' AS short_description, 'test_sla' AS details,
  'AWS/Lambda' AS metric_namespace, 'Invocations' AS metric_name,
  'test_category' AS metric_set,
  '{"Thing": "foobar"}' AS metric_metadata,
  '{"FunctionName": "hello_world"}' AS metric_dimensions,
  '123412341234' AS account
"""

# --------------------------------------------------------------------------
# Dedup / text / similarity / session / multimodal queries
# --------------------------------------------------------------------------


def q_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_stats(load_table(spark, sf_dir, "documents"), ["text"])


DEDUP_EXACT_STATS_ORACLE = """
WITH g AS (SELECT text, COUNT(*) AS n FROM documents GROUP BY text)
SELECT CAST(SUM(n) AS BIGINT) AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
       CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_removable
FROM g
"""


def q_dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load_table(spark, sf_dir, "documents"), ["text"], "doc_id")


DEDUP_EXACT_KEEP_ORACLE = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count FROM documents GROUP BY text
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIMARY exact-similarity join (VERDICT r1 #4): PPJoin-filtered prefix
    index — prefix + length + positional filters, then exact verification.
    Identical results to the plain inverted-index join, sub-quadratic join
    volume; the plain variant stays declared as ``ngram_jaccard_allpairs``."""
    out = D.ngram_jaccard_pairs_prefix(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=3, threshold=0.8
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_ngram_jaccard_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain inverted-index all-pairs join — the verification baseline
    (Σ|posting|² join volume; fine at moderate scale, not the corpus path)."""
    out = D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=3, threshold=0.8
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ cardinality sketch contract: approx_count_distinct must land
    within 5% of the exact distinct count (it is configured at 2% rsd).
    Same recall-style oracle pattern as lsh_ann/ivf_ann: the checkable
    scalar is exact, the sketch is gated, both hashed."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    ).select(
        "exact_users",
        (
            (F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users"))
            <= 0.05
        ).alias("within_5pct"),
    )


APPROX_DISTINCT_ORACLE = """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users, TRUE AS within_5pct
FROM events
"""


def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL/GK-style quantile sketch contract: percentile_approx (mergeable,
    the streaming percentile path) within 1% relative error of the exact
    interpolated median, which itself cross-checks DuckDB's quantile_cont."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("exact_p50"),
        F.expr("percentile_approx(value, 0.5, 10000)").alias("approx_p50"),
    ).select(
        "exact_p50",
        (
            F.abs(F.col("approx_p50") - F.col("exact_p50")) / F.col("exact_p50") <= 0.01
        ).alias("within_1pct"),
    )


APPROX_QUANTILE_ORACLE = """
SELECT ROUND(quantile_cont(value, 0.5), 6) AS exact_p50, TRUE AS within_1pct
FROM events
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUP assignment: PPJoin pairs closed into connected
    components (hash-to-min DataFrame loop, operators/graph.py), every doc
    mapped to its cluster's min doc_id. Oracled against a DuckDB recursive
    CTE over the identical edge set — the transitive closure itself is
    checked, not just the pair list."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs_prefix(docs, "doc_id", "text", k=3, threshold=0.8)
    comp = G.connected_components(
        docs.select("doc_id"), pairs.select("id_a", "id_b"), id_col="doc_id"
    )
    return comp.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_rep")
    )


NGRAM_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
),
e AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
  FROM e a
  JOIN e b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN e c ON c.doc_id = a.doc_id AND c.i = a.i + 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT id_a, id_b,
       ROUND(CAST(inter AS DOUBLE) / (na.n + nb.n - inter), 6) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.8
"""

# Transitive closure of the exact-Jaccard pairs: same shingle/pair CTEs as
# NGRAM_JACCARD_ORACLE, then a recursive reachability fixpoint (UNION dedup
# terminates on cycles) — min reachable id == component representative.
DEDUP_CLUSTERS_ORACLE = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
),
e AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
  FROM e a
  JOIN e b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN e c ON c.doc_id = a.doc_id AND c.i = a.i + 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
pairs AS (
  SELECT id_a, id_b FROM common
  JOIN sizes na ON na.doc_id = id_a
  JOIN sizes nb ON nb.doc_id = id_b
  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.8
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT edges.dst, reach.r FROM edges JOIN reach ON reach.id = edges.src
)
SELECT id AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY id
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document — distributed tf/df aggregation with
    broadcast corpus size; ranking on rounded scores for cross-engine
    determinism."""
    return TX.tf_idf_top_terms(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=5
    )


TFIDF_TOP_TERMS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
),
terms AS (SELECT doc_id, lower(unnest(t)) AS term FROM toks),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.term AS term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         ROUND(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN nd
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= 5
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 32-token chunks, 8-token overlap — map-only
    (tokenize → explode starts → slice), zero shuffle at any corpus size."""
    return TX.chunk_documents(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        chunk_tokens=32, overlap=8,
    )


CHUNK_DOCUMENTS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
),
starts AS (
  SELECT doc_id, t, unnest(range(0, len(t), 24)) AS s
  FROM toks WHERE len(t) > 0
)
SELECT doc_id,
       CAST(s / 24 AS INTEGER) AS chunk_id,
       CAST(len(list_slice(t, s + 1, s + 32)) AS INTEGER) AS n_chunk_tokens,
       array_to_string(list_slice(t, s + 1, s + 32), ' ') AS chunk_text
FROM starts
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics: duplicate-2-gram ratios per doc."""
    return TX.repetition_stats(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


REPETITION_STATS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
),
e AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks
),
g AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS g
  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
c AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g GROUP BY doc_id, g)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_2grams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_2grams,
       ROUND(COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 6) AS distinct_ratio,
       ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 6) AS top_2gram_frac
FROM c GROUP BY doc_id
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = TX.token_stats(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(
        "doc_id", "n_tokens", "n_distinct_tokens", "n_chars",
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
    )


TOKEN_STATS_ORACLE = """
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
  CAST(len(t) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
  CAST(length(text) AS BIGINT) AS n_chars,
  ROUND(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
        / greatest(len(t), 1), 6) AS avg_token_len,
  ROUND(CAST(len(list_filter(t, x -> list_contains(
        ['the','a','of','and','to','in','is','that','it','for'], lower(x))))
        AS DOUBLE) / greatest(len(t), 1), 6) AS stopword_ratio,
  ROUND(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
        / greatest(length(text), 1), 6) AS punct_ratio
FROM toks
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = TX.token_stats(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    return TX.quality_score(stats).select("doc_id", F.round("quality", 6).alias("quality"))


TEXT_QUALITY_ORACLE = """
WITH s AS ({stats})
SELECT doc_id, ROUND(
    (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1.0 ELSE 0.3 END) * 0.3
  + least(CAST(n_distinct_tokens AS DOUBLE) / greatest(n_tokens, 1) * 2.0, 1.0) * 0.3
  + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.4 END) * 0.2
  + (CASE WHEN avg_token_len >= 2.0 AND avg_token_len <= 12.0 THEN 1.0 ELSE 0.5 END) * 0.2
, 6) AS quality
FROM s
""".format(stats="""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
  len(t) AS n_tokens,
  len(list_distinct(t)) AS n_distinct_tokens,
  CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / greatest(len(t), 1)
    AS avg_token_len,
  CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
    / greatest(length(text), 1) AS punct_ratio
FROM toks
""")


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.language_id(load_table(spark, sf_dir, "documents"), "doc_id", "text")


LANGUAGE_ID_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_transform(
           list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                       x -> x <> ''), x -> lower(x)) AS t
  FROM documents
),
hits AS (
  SELECT doc_id,
    len(list_filter(t, x -> list_contains(['der','die','das','und','ist','ein','eine','zu','mit','von'], x))) AS h_de,
    len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS h_en,
    len(list_filter(t, x -> list_contains(['el','la','de','y','es','un','una','que','en','los'], x))) AS h_es,
    len(list_filter(t, x -> list_contains(['le','la','de','et','est','un','une','que','dans','les'], x))) AS h_fr
  FROM toks
),
best AS (
  SELECT doc_id,
    CASE
      WHEN (h_fr, 'fr') >= (h_es, 'es') AND (h_fr, 'fr') >= (h_en, 'en')
           AND (h_fr, 'fr') >= (h_de, 'de') THEN h_fr
      WHEN (h_es, 'es') >= (h_en, 'en') AND (h_es, 'es') >= (h_de, 'de') THEN h_es
      WHEN (h_en, 'en') >= (h_de, 'de') THEN h_en
      ELSE h_de END AS hits,
    CASE
      WHEN (h_fr, 'fr') >= (h_es, 'es') AND (h_fr, 'fr') >= (h_en, 'en')
           AND (h_fr, 'fr') >= (h_de, 'de') THEN 'fr'
      WHEN (h_es, 'es') >= (h_en, 'en') AND (h_es, 'es') >= (h_de, 'de') THEN 'es'
      WHEN (h_en, 'en') >= (h_de, 'de') THEN 'en'
      ELSE 'de' END AS lang
  FROM hits
)
SELECT doc_id,
       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS predicted_lang,
       CAST(hits AS INTEGER) AS stopword_hits
FROM best
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.brute_force_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)
    return out.select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")


COSINE_TOPK_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos_raw
  FROM q, c WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine, rank
FROM ranked WHERE rank <= 5
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (r6 — ``similarity.mine_hard_negatives``, the
    contrastive-retrieval data-prep step): each query's labeled positive
    is its exact nearest neighbor; the output is the 5 most-similar
    corpus items BEYOND it (dense re-rank after the positive/self
    exclusion). The oracle recomputes the full exact ranking and shifts
    past rank 1 — the overfetch + anti-join + re-rank chain must land on
    exactly those rows."""
    from ..operators.similarity import brute_force_topk, mine_hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    positives = brute_force_topk(q, emb, k=1).select(
        "query_id", F.col("neighbor_id").alias("vec_id")
    )
    out = mine_hard_negatives(
        q.select(F.col("vec_id").alias("query_id"), "embedding"),
        emb, positives, k=5,
    )
    return out.orderBy("query_id", "neg_rank")


HARD_NEGATIVES_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
           AS cos_raw
  FROM q, c WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine,
       rank - 1 AS neg_rank
FROM ranked WHERE rank BETWEEN 2 AND 6
ORDER BY query_id, neg_rank
"""


def q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = SIM.cosine_similarity(F.col("va"), F.col("vb"))
    return pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine")).filter(
        F.col("cosine") >= 0.5
    )


COSINE_PAIRS_ORACLE = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.e, b.e) /
             (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6)
         AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.e, b.e) /
      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.5
"""


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native ``session_window`` aggregation (gap-close semantics:
    a session ends ``gap`` after its LAST event) — the built-in counterpart
    of the lag+cumsum sessionizer, and the one that runs identically under
    Structured Streaming with a watermark."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    return (
        ev.groupBy("user_id", F.session_window("ts", "1800 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("value_sum"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


SESSION_WINDOW_ORACLE = """
WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS ns
  FROM events WHERE user_id < 200
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 1800 SECOND AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS value_sum
FROM s GROUP BY user_id, sid
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = SS.session_stats(ev, gap_seconds=1800)
    return out.select(
        "user_id", "session_id", "session_start", "session_end", "n_events",
        F.round("value_sum", 6).alias("value_sum"),
    )


SESSIONIZE_ORACLE = """
WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR CAST(floor(epoch(ts)) AS BIGINT)
                      - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM e
)
SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS value_sum
FROM s GROUP BY user_id, session_id
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the most recent prior (inclusive)
    purchase value for the same user. Union+window formulation — one
    sort-shuffle of |L|+|R| rows, no range-join explosion — checked against
    DuckDB's native ASOF LEFT JOIN. Right side pre-aggregated to unique
    (user, ts) per the determinism contract."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = T.as_of_join(clicks, purchases, on="user_id", value_cols=["purchase_value"])
    return out.select(
        "event_id", "user_id", "ts",
        F.round("purchase_value_asof", 6).alias("purchase_value"),
        "asof_ts",
    )


ASOF_JOIN_ORACLE = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, ts, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id, l.ts,
       ROUND(r.purchase_value, 6) AS purchase_value,
       r.ts AS asof_ts
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/containment join: event values histogrammed against a boundary
    dimension via value >= lo AND value < hi. The boundary side is forced
    broadcast → map-side BroadcastNestedLoopJoin (the scalable containment
    plan), then a rollup per bucket."""
    ev = load_table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1000000.0)],
        "bucket string, lo double, hi double",
    )
    joined = T.range_bucket_join(ev, buckets, value_col="value")
    return (
        joined.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("value_sum"),
        )
        .select("bucket", "n", "value_sum")
    )


RANGE_BUCKET_ORACLE = """
WITH buckets(bucket, lo, hi) AS (
  VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1000000.0)
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
FROM events LEFT JOIN buckets ON value >= lo AND value < hi
GROUP BY bucket
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over real container bytes: synthesize a valid 8-bit
    grayscale PNG per document (pixel values a closed-form formula of
    doc_id), then run the stdlib PNG decoder (IHDR + zlib-inflate IDAT +
    scanline unfilter) inside Arrow ``mapInPandas``. The oracle recomputes
    width/height/mean-luma from the generation formula — so the decode must
    invert the encode bit-for-bit to match. n_bytes is excluded from the
    projection because zlib stream length is not SQL-predictable."""
    from ..operators.multimodal import extract_image_features, synthesize_media

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    media = synthesize_media(docs, kind="image")
    out = extract_image_features(media)  # fake=False: real PNG decode
    return out.select(
        "media_id", "width", "height", F.round("mean_luma", 6).alias("mean_luma")
    )


MULTIMODAL_ORACLE = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h FROM documents
), xs AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w-1)) AS x FROM dims
), xy AS (
  SELECT doc_id, w, h, x, unnest(generate_series(0, h-1)) AS y FROM xs
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       ROUND(AVG(CAST((doc_id + 31*x + 17*y) % 256 AS DOUBLE)) / 255.0, 6) AS mean_luma
FROM xy GROUP BY doc_id, w, h
"""


def q_image_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + RESIZE through the real pipeline: synthesize a valid PNG per
    document, decode its luma plane and nearest-neighbor-downsample to 2×2
    inside one Arrow stage (full-res pixels never leave the worker). The
    oracle replays the integer-exact sampling — cell (x,y) reads source
    pixel (x*w//2, y*h//2) of the generation formula."""
    from ..operators.multimodal import extract_image_thumbnails, synthesize_media

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    media = synthesize_media(docs, kind="image")
    out = extract_image_thumbnails(media, size=2)
    return out.select(
        "media_id", F.posexplode("thumb").alias("cell", "luma")
    )


IMAGE_THUMBNAILS_ORACLE = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h FROM documents
), cells AS (
  SELECT doc_id, w, h, i AS cell,
         (i % 2) AS tx, (i // 2) AS ty
  FROM dims, UNNEST(range(0, 4)) r(i)
)
SELECT doc_id AS media_id,
       CAST(cell AS INTEGER) AS cell,
       CAST((doc_id + 31 * ((tx * w) // 2) + 17 * ((ty * h) // 2)) % 256
            AS INTEGER) AS luma
FROM cells
"""


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode over real container bytes: synthesize a valid PCM
    s16le mono WAV per document (sample count from text length, sample
    values a closed-form formula of doc_id), then run the stdlib RIFF/WAVE
    decoder (chunk walk, fmt parse, int16 RMS) inside Arrow ``mapInPandas``.
    The oracle recomputes rate/duration/size/RMS from the generation
    formula; integer sum-of-squares stays < 2^53 so the RMS is
    bit-reproducible across engines."""
    from ..operators.multimodal import extract_audio_features, synthesize_media

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.length("text") % 500 + 10).cast("int").alias("n_samples"),
    )
    media = synthesize_media(docs, kind="audio")
    out = extract_audio_features(media)  # fake=False: real WAV decode
    return out.select(
        "media_id", "sample_rate", F.round("duration_s", 6).alias("duration_s"),
        "n_bytes", F.round("rms", 6).alias("rms"),
    )


AUDIO_FEATURES_ORACLE = """
WITH s AS (
  SELECT doc_id, length(text) % 500 + 10 AS n FROM documents
), samp AS (
  SELECT doc_id, n, unnest(generate_series(0, n-1)) AS i FROM s
)
SELECT doc_id AS media_id,
       CAST(16000 AS INTEGER) AS sample_rate,
       ROUND(CAST(n AS DOUBLE) / 16000.0, 6) AS duration_s,
       CAST(44 + 2*n AS BIGINT) AS n_bytes,
       ROUND(sqrt(SUM(POW(CAST((doc_id*31 + i*7) % 2001 - 1000 AS DOUBLE), 2)) / n)
             / 32768.0, 6) AS rms
FROM samp GROUP BY doc_id, n
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-path frame extraction (r5, replacing the earlier
    synthetic index fan-out): synthesize an animated GIF89a per document
    (2 + id%4 full-canvas frames behind Graphic Control Extensions, frame
    pixels a closed-form formula), decode + composite EVERY frame inside
    the Arrow stage, sample every 2nd, and emit per-frame facts. The
    oracle recomputes frame indices, dimensions and per-frame mean luma
    from the generation formula — the multi-frame LZW decode and canvas
    compositing must invert the encode exactly. The metadata-driven
    sampler (`sample_frames`) remains available for payloads the engine
    cannot decode; this query pins the decodable path."""
    from ..operators.multimodal import extract_video_frames, synthesize_media

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.lit(2) + F.col("doc_id") % 4).cast("int").alias("n_frames"),
    )
    media = synthesize_media(docs, kind="video")
    out = extract_video_frames(media, every_nth=2)
    return out.select(
        "media_id", "frame_idx", "n_frames", "width", "height",
        F.round("mean_luma", 6).alias("mean_luma"),
    )


FRAME_SAMPLE_ORACLE = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h,
         2 + doc_id % 4 AS nf
  FROM documents
), fr AS (
  SELECT doc_id, w, h, nf, unnest(generate_series(0, nf - 1, 2)) AS f
  FROM dims
), xs AS (
  SELECT doc_id, w, h, nf, f, unnest(generate_series(0, w - 1)) AS x FROM fr
), xy AS (
  SELECT doc_id, w, h, nf, f, x, unnest(generate_series(0, h - 1)) AS y FROM xs
)
SELECT doc_id AS media_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(nf AS INTEGER) AS n_frames,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       ROUND(AVG(CAST((doc_id + 31*x + 17*y + 97*f) % 256 AS DOUBLE)) / 255.0, 6)
         AS mean_luma
FROM xy GROUP BY doc_id, f, nf, w, h
"""


# ---- sketch/LSH queries, oracled semantically (VERDICT r1 #1):
# minhash/simhash/fingerprint emit values an independent DuckDB formulation
# reproduces exactly; ANN queries emit per-query recall vs the brute-force
# oracle as a driver-checkable row set.


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard. With 16 bands × 4
    rows the per-pair miss probability at j=0.8 is (1-0.8⁴)¹⁶ ≈ 2e-4, and
    hashes are seed-deterministic — the emitted set equals the exact
    all-pairs result, so the exact-Jaccard SQL is a full oracle."""
    out = D.minhash_dedup_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.8
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the md5-derived 60-bit signature —
    bit-for-bit reproducible in DuckDB, so bucketing+verification is checked
    end-to-end against a quadratic SQL reformulation.

    max_hamming=3 is the published web-dedup design point (Manku et al.,
    WWW'07): 4 pigeonhole blocks of 15 bits → 32k bucket values, so bucket
    sizes stay tiny and the candidate join is linear-ish. (The previous
    d=8 setting banded into 6-bit blocks — 64 bucket values — which on this
    corpus's small synthetic vocabulary produced near-quadratic candidate
    volume and 83k output pairs at sf0.1; d=3 keeps 512 true pairs there,
    13 at sf0.01 — non-vacuous at every driver scale.)"""
    return D.simhash_near_dup_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        max_hamming=3, hash_fn="md5",
    )


SIMHASH_PAIRS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                            x -> x <> '')) AS t
  FROM documents
),
h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS v FROM toks),
votes AS (
  SELECT doc_id, i, SUM(((v >> i) & 1) * 2 - 1) AS vote
  FROM h, range(60) r(i) GROUP BY doc_id, i
),
sig AS (
  SELECT doc_id, SUM(CASE WHEN vote > 0 THEN (1::BIGINT << i) ELSE 0 END) AS sig
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.fingerprint(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", hash_fn="md5"
    )


FINGERPRINT_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
),
e AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks
),
grams AS (
  SELECT a.doc_id,
         a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || f.w AS g
  FROM e a
  JOIN e b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN e c ON c.doc_id = a.doc_id AND c.i = a.i + 2
  JOIN e d ON d.doc_id = a.doc_id AND d.i = a.i + 3
  JOIN e f ON f.doc_id = a.doc_id AND f.i = a.i + 4
),
mins AS (
  SELECT t.doc_id,
         ('0x' || substr(md5(array_to_string(t.t, ' ')), 1, 15))::BIGINT AS content_hash,
         MIN(('0x' || substr(md5(COALESCE(g.g, array_to_string(t.t, ' '))), 1, 15))::BIGINT)
           AS min_gram_hash
  FROM toks t LEFT JOIN grams g ON g.doc_id = t.doc_id
  GROUP BY t.doc_id, t.t
)
SELECT doc_id, content_hash, min_gram_hash FROM mins
"""


def q_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN checked by per-query recall@5 against the exact
    brute-force top-k (the already-oracled ``cosine_topk``). Every query must
    recover ≥ 80% of its true top-5 — with 16 independent 2-plane tables the
    per-neighbor miss probability is < 1e-3 even at cosine ≈ 0.3, so the
    deterministic-seeded run passes with wide margin."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ann = SIM.lsh_ann_topk(queries, emb, k=5, n_planes=2, n_tables=16, scorer="hof")
    brute = SIM.brute_force_topk(queries, emb, k=5)
    hits = (
        brute.alias("b")
        .join(
            ann.alias("a"),
            (F.col("b.query_id") == F.col("a.query_id"))
            & (F.col("b.neighbor_id") == F.col("a.neighbor_id")),
            "left",
        )
        .groupBy(F.col("b.query_id").alias("query_id"))
        .agg((F.count(F.col("a.neighbor_id")) / F.count(F.lit(1))).alias("recall5"))
    )
    return hits.select("query_id", (F.col("recall5") >= 0.8).alias("recall_ok"))


LSH_ANN_ORACLE = """
SELECT DISTINCT vec_id AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (the GPT-3/PaLM exact n-gram recipe): flag
    training documents sharing ≥1 word n-gram with any benchmark document.
    The 1% doc_id%100==0 slice plays the benchmark; n=4 because this
    corpus's 31-word synthetic vocabulary makes longer exact runs
    vanishingly rare (real pipelines use 8-13; the parameter is free) —
    at sf0.01 it flags 11 of 495 train docs, a non-vacuous check of the
    gram explode + semi-join + re-attach shape."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 100 != 0)
    bench = docs.filter(F.col("doc_id") % 100 == 0)
    return D.decontaminate(train, bench, id_col="doc_id", text_col="text", n=4)


DECONTAMINATE_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(ts) >= 4 THEN array_to_string(list_slice(ts, i, i+3), ' ')
              ELSE array_to_string(ts, ' ') END AS gram
  FROM tok, UNNEST(range(1, greatest(len(ts)-2, 2))) r(i)
),
hits AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT * FROM grams WHERE doc_id % 100 <> 0) t
  JOIN (SELECT DISTINCT gram FROM grams WHERE doc_id % 100 = 0) b USING (gram)
)
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 100 <> 0) d
LEFT JOIN hits h USING (doc_id)
"""


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide block-level dedup (CCNet/RefinedWeb line-dedup adapted to
    20-token blocks): repeats of a block anywhere in the corpus are dropped
    (first occurrence by (doc_id, idx) wins) and documents reassembled.
    Text column is excluded from the projection only to keep the compare
    hash small — n_blocks/n_kept pin the drop decisions, and the pytest
    golden checks rebuilt text verbatim."""
    out = TX.dedup_paragraphs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", block_tokens=20
    )
    return out.select("doc_id", "n_blocks", "n_kept")


PARAGRAPH_DEDUP_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS ts
  FROM documents
),
blocks AS (
  SELECT doc_id, i AS idx, array_to_string(list_slice(ts, i*20+1, i*20+20), ' ') AS block
  FROM tok, UNNEST(range(0, CAST(ceil(len(ts)/20.0) AS BIGINT))) r(i)
  WHERE array_to_string(list_slice(ts, i*20+1, i*20+20), ' ') <> ''
),
kept AS (
  SELECT doc_id, idx,
         ROW_NUMBER() OVER (PARTITION BY block ORDER BY doc_id, idx) AS rn
  FROM blocks
)
SELECT doc_id,
       COUNT(*) AS n_blocks,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM kept
GROUP BY doc_id
"""


def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 2% validation split over the documents table (md5
    cross-engine hash variant so DuckDB reproduces every assignment; the
    xxhash64 variant is the scale default). Counts per split are oracled
    alongside every per-doc assignment."""
    out = TX.train_val_split(
        load_table(spark, sf_dir, "documents"), "doc_id",
        val_fraction=0.02, seed=42, hash_fn="md5",
    )
    return out.select("doc_id", "split")


TRAIN_VAL_SPLIT_ORACLE = """
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 15))::BIGINT
                 % 10000 < 200
            THEN 'val' ELSE 'train' END AS split
FROM documents
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LM training: shard documents by id hash, order
    within shard, cut packs at 512-token budget-aligned prefix offsets.
    Offset-bucket packing is a pure window expression (see
    operators/textops.pack_sequences for why reset-after-cut greedy is
    deliberately not used); md5 shard hash so DuckDB replays the identical
    shard assignment."""
    out = TX.pack_sequences(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        budget=512, shards=8, hash_fn="md5",
    )
    return out.select("doc_id", "shard", "n_tokens", "pack_id", "pack_pos")


PACK_SEQUENCES_ORACLE = """
WITH base AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8
              AS INTEGER) AS shard,
         len(list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                         x -> x <> '')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS c
  FROM base
)
SELECT doc_id, shard, n_tokens,
       CAST((c - n_tokens) // 512 AS BIGINT) AS pack_id,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY shard, (c - n_tokens) // 512
           ORDER BY doc_id) - 1 AS INTEGER) AS pack_pos
FROM cum
"""


def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (Xie et al., NeurIPS'23): score every
    document by the hashed-bigram log-likelihood ratio toward the English
    slice (lang='en' plays the target domain). md5-bucketed features so
    DuckDB replays every bucket assignment; weight rounded to 6 decimals
    (sum-order stability)."""
    return WGT.importance_weights(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        F.col("lang") == "en", n_max=2, buckets=256, alpha=1.0, hash_fn="md5",
    )


IMPORTANCE_WEIGHTS_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS ts
  FROM documents
),
uni AS (
  SELECT doc_id, ts[i] AS g FROM tok, UNNEST(range(1, len(ts)+1)) r(i)
),
bi AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
  FROM tok, UNNEST(range(1, greatest(len(ts), 1))) r(i)
),
feats AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(g), 1, 15))::BIGINT % 256 AS INTEGER) AS bucket
  FROM (SELECT doc_id, g FROM uni UNION ALL SELECT doc_id, g FROM bi)
),
rc AS (SELECT bucket, COUNT(*) AS cr FROM feats GROUP BY bucket),
tc AS (
  SELECT bucket, COUNT(*) AS ct
  FROM feats JOIN documents USING (doc_id) WHERE lang = 'en'
  GROUP BY bucket
),
ratios AS (
  SELECT bucket,
         ln((ct + 1.0) / (SUM(ct) OVER () + 256.0))
       - ln((cr + 1.0) / (SUM(cr) OVER () + 256.0)) AS log_ratio
  FROM (
    SELECT g.bucket, COALESCE(rc.cr, 0) AS cr, COALESCE(tc.ct, 0) AS ct
    FROM (SELECT CAST(i AS INTEGER) AS bucket FROM range(256) r(i)) g
    LEFT JOIN rc USING (bucket) LEFT JOIN tc USING (bucket)
  )
),
scored AS (
  SELECT doc_id, COUNT(*) AS n_grams, ROUND(SUM(log_ratio), 6) AS weight
  FROM feats JOIN ratios USING (bucket)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_grams, 0) AS n_grams,
       COALESCE(s.weight, 0.0) AS weight
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot over the events changelog: latest version per user by
    (ts, event_id), 'error' rows acting as tombstones (a later non-error
    event resurrects the user — MERGE semantics). One max_by shuffle, no
    window sort."""
    ev = load_table(spark, sf_dir, "events")
    snap = CDC.upsert_latest(
        ev, ["user_id"], ["ts", "event_id"],
        delete_predicate=F.col("event_type") == "error",
    )
    return snap.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_op"),
        F.col("value").alias("last_value"),
    )


UPSERT_LATEST_ORACLE = """
WITH latest AS (
  SELECT user_id, ts, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, ts AS last_ts, event_type AS last_op, value AS last_value
FROM latest
WHERE rn = 1 AND event_type <> 'error'
"""


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 dimension view of the events changelog: per-version validity
    intervals [valid_from, valid_to) per user, (ts, event_id) ordering."""
    ev = load_table(spark, sf_dir, "events")
    out = CDC.scd2_history(ev, ["user_id"], ["ts", "event_id"])
    return out.select("user_id", "event_id", "valid_from", "valid_to", "is_current")


SCD2_HISTORY_ORACLE = """
SELECT user_id, event_id,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
         AS is_current
FROM events
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff of two CDC snapshots of the events changelog: the
    'old' snapshot is built from a changelog missing one event in five
    (event_id % 5 == 0 withheld — simulating late arrivals), the 'new'
    one from the complete log; both apply error-tombstones. The diff
    reports which users appeared, disappeared (a late tombstone became
    latest), or changed content — with column-level blame."""
    ev = load_table(spark, sf_dir, "events")
    tomb = F.col("event_type") == "error"
    old = CDC.upsert_latest(
        ev.filter(F.col("event_id") % 5 != 0),
        ["user_id"], ["ts", "event_id"], delete_predicate=tomb,
    )
    new = CDC.upsert_latest(
        ev, ["user_id"], ["ts", "event_id"], delete_predicate=tomb,
    )
    return CDC.table_diff(
        old, new, ["user_id"], ["event_type", "value"]
    ).orderBy("user_id")


SNAPSHOT_DIFF_ORACLE = """
WITH old_snap AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_id % 5 <> 0
  ) WHERE rn = 1 AND event_type <> 'error'
),
new_snap AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1 AND event_type <> 'error'
)
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       CASE WHEN o.user_id IS NULL OR n.user_id IS NULL THEN ''
            ELSE concat_ws(',',
              CASE WHEN o.event_type IS DISTINCT FROM n.event_type
                   THEN 'event_type' END,
              CASE WHEN o.value IS DISTINCT FROM n.value
                   THEN 'value' END)
       END AS changed_cols
FROM old_snap o FULL OUTER JOIN new_snap n ON o.user_id = n.user_id
WHERE o.user_id IS NULL OR n.user_id IS NULL
   OR o.event_type IS DISTINCT FROM n.event_type
   OR o.value IS DISTINCT FROM n.value
ORDER BY 1
"""


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-40 deterministic uniform sample per event_type (the
    reservoir-sampling contract without reservoir state): two-phase
    hash-threshold prefilter + exact candidate ranking, md5 variant so
    DuckDB reproduces the identical sample."""
    ev = load_table(spark, sf_dir, "events")
    return CU.group_sample(
        ev.select("event_type", "event_id", "user_id"),
        "event_id", ["event_type"], 40, hash_fn="md5",
    ).orderBy("event_type", "sample_rank")


GROUP_SAMPLE_ORACLE = """
WITH h AS (
  SELECT event_type, event_id, user_id,
         ('0x' || substr(md5('gsamp:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS hh
  FROM events
),
r AS (
  SELECT event_type, event_id, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY hh, event_id) AS sample_rank
  FROM h
)
SELECT event_type, event_id, user_id, CAST(sample_rank AS INTEGER) AS sample_rank
FROM r WHERE sample_rank <= 40
ORDER BY event_type, sample_rank
"""


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join of 32-char document title prefixes at Levenshtein
    distance ≤ 2 (typo'd-title entity resolution) — q-gram count-filtered
    candidates + exact verify; equals the brute all-pairs oracle."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.lower(F.substring("text", 1, 32)).alias("title")
    )
    return D.edit_distance_pairs(
        t, "doc_id", "title", max_dist=2, q=5
    ).orderBy("id_a", "id_b")


FUZZY_JOIN_ORACLE = """
WITH t AS (SELECT doc_id, lower(substr(text, 1, 32)) AS s FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
FROM t a JOIN t b ON b.doc_id > a.doc_id
                 AND abs(length(a.s) - length(b.s)) <= 2
WHERE levenshtein(a.s, b.s) <= 2
ORDER BY 1, 2
"""


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized daily rollup maintained incrementally: history
    (ts < Jan 15) and the new increment (ts >= Jan 15) are aggregated to
    mergeable partial states SEPARATELY, merged, then finalized — and the
    result must equal a one-shot full recompute exactly (the algebraic
    merge property that makes O(increment) refresh safe at 100 TB)."""
    from ..operators import rollup as RU

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    hist = RU.rollup_partials(
        ev.filter(F.col("ts") < cut), ["event_type"], "ts", "value"
    )
    inc = RU.rollup_partials(
        ev.filter(F.col("ts") >= cut), ["event_type"], "ts", "value"
    )
    return RU.finalize_rollup(RU.merge_rollup(hist, inc)).orderBy(
        "event_type", "window_start"
    )


INCREMENTAL_ROLLUP_ORACLE = """
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       COUNT(value) AS cnt,
       ROUND(SUM(value), 6) AS vsum,
       MIN(value) AS vmin,
       MAX(value) AS vmax,
       ROUND(SUM(value) / COUNT(value), 6) AS vavg
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC normalization over titles deliberately salted with decomposed
    accents (e + combining acute) and a ligature: the combining pair must
    compose (length shrinks by one), the ligature must survive (NFC keeps
    compatibility forms) — matched byte-for-byte by DuckDB nfc_normalize."""
    docs = load_table(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.lit("Café "),
            F.substring("text", 1, 20),
            F.lit(" ﬁle"),
        ).alias("title"),
    )
    out = TX.normalize_unicode(salted, ["title"], form="NFC")
    return out.select(
        "doc_id",
        "title",
        F.length("title").alias("n_chars_norm"),
    ).orderBy("doc_id")


UNICODE_NORMALIZE_ORACLE = """
SELECT doc_id,
       nfc_normalize('Cafe' || chr(769) || ' ' || substr(text, 1, 20)
                     || ' ' || chr(64257) || 'le') AS title,
       length(nfc_normalize('Cafe' || chr(769) || ' ' || substr(text, 1, 20)
                            || ' ' || chr(64257) || 'le')) AS n_chars_norm
FROM documents
ORDER BY doc_id
"""


def q_compression_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal over the corpus.

    Oracled (r6): DEFLATE is not SQL-expressible, so the oracle is an
    INDEPENDENT single-process implementation — ``_compression_signals_
    oracle`` reads the same parquet driver-locally (DuckDB scan + Python
    zlib, no Spark) and embeds the expected rows as a VALUES literal;
    the gate then proves the distributed Arrow ``mapInPandas`` path
    reproduces the sequential computation bit-for-bit. Ordering/bounds
    contracts additionally pinned by tests/test_curation.py."""
    docs = load_table(spark, sf_dir, "documents")
    return CU.compression_signals(docs, "doc_id", "text").orderBy("doc_id")


def _compression_signals_oracle(sf_dir: str | None = None) -> str:
    """Generate the compression_signals oracle as a VALUES literal.

    The independent computation: DuckDB parquet scan → per-doc Python
    ``zlib.compress(utf8, 6)`` in one sequential process (the driver's
    oracle side runs no Spark). Uses the sf dir the driver gates on
    (sf0.01; override via SPARK_GRAFT_ORACLE_SF_DIR for local sweeps at
    other scales). zlib output for (input, level) is deterministic for a
    given zlib build, and both sides run the same interpreter's zlib."""
    import os as _os
    import zlib as _zlib

    import duckdb as _duckdb

    d = sf_dir or _os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    con = _duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{d}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    con.close()
    vals = []
    for doc_id, t in rows:
        raw = (t or "").encode("utf-8")
        comp = len(_zlib.compress(raw, 6)) if raw else 0
        ratio = repr(round(comp / len(raw), 6)) if raw else "NULL"
        vals.append(f"({doc_id},{len(raw)},{comp},{ratio})")
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id,"
        " CAST(n_bytes AS BIGINT) AS n_bytes,"
        " CAST(n_compressed AS BIGINT) AS n_compressed,"
        " CAST(compression_ratio AS DOUBLE) AS compression_ratio\n"
        "FROM (VALUES " + ",".join(vals)
        + ") AS t(doc_id, n_bytes, n_compressed, compression_ratio)\n"
        "ORDER BY doc_id"
    )


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture sampling over documents (en 60% / zh 15% / fr 10%
    / es 10% / de 5% of output characters): binding-group cap + exact
    integer keep-rates + deterministic md5 sampling, reproduced
    row-for-row by the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    out = CU.mix_corpus(
        docs, "doc_id", "lang", "n_chars",
        {"en": 600_000, "zh": 150_000, "fr": 100_000,
         "es": 100_000, "de": 50_000},
    )
    return out.select("doc_id", "lang", "n_chars", "rate_ppm").orderBy("doc_id")


CORPUS_MIX_ORACLE = """
WITH w(lang, share) AS (
  VALUES ('en', 600000), ('zh', 150000), ('fr', 100000),
         ('es', 100000), ('de', 50000)
),
t AS (
  SELECT lang, SUM(n_chars) AS tt FROM documents
  WHERE lang IN (SELECT lang FROM w) GROUP BY lang
),
c AS (
  SELECT t.lang, tt, share,
         (tt // share) * 1000000 + ((tt % share) * 1000000) // share AS cap
  FROM t JOIN w USING (lang)
),
b AS (SELECT MIN(cap) AS bb FROM c),
r AS (
  SELECT lang,
         LEAST(1000000, (bb // tt) * share + ((bb % tt) * share) // tt)
           AS rate_ppm
  FROM c, b
)
SELECT d.doc_id, d.lang, d.n_chars, CAST(r.rate_ppm AS BIGINT) AS rate_ppm
FROM documents d JOIN r USING (lang)
WHERE ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      % 1000000 < rate_ppm
ORDER BY doc_id
"""


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous LPA over a block-structured synthetic
    graph (6 blocks of 10 nodes, two intra-block out-edges per node,
    symmetrized): like `pagerank`, an ITERATIVE algorithm held to a
    hash-exact contract — the oracle unrolls the same 3 voting rounds
    (count-desc / label-asc argmax) as SQL CTEs."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    block = F.col("doc_id") - (F.col("doc_id") % 10)
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(*[block + ((F.col("doc_id") * 7 + 3 * k) % 10) for k in (1, 2)])
        ).alias("dst"),
    )
    return G.label_propagation(edges, iterations=3).orderBy("id")


def _label_propagation_oracle(iterations: int = 3) -> str:
    ctes = [
        "e0 AS (SELECT doc_id AS src, "
        "unnest([(doc_id - doc_id % 10) + (doc_id * 7 + 3) % 10, "
        "(doc_id - doc_id % 10) + (doc_id * 7 + 6) % 10]) AS dst "
        "FROM documents WHERE doc_id < 60)",
        "edges AS (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0))",
        "nodes AS (SELECT DISTINCT src AS id FROM edges "
        "UNION SELECT DISTINCT dst FROM edges)",
        "l0 AS (SELECT id, id AS lab FROM nodes)",
    ]
    for i in range(iterations):
        ctes.append(
            f"l{i + 1} AS (SELECT n.id, COALESCE(w.new_lab, p.lab) AS lab "
            f"FROM nodes n JOIN l{i} p USING (id) LEFT JOIN ("
            "SELECT id, lab AS new_lab FROM ("
            "SELECT e.dst AS id, p2.lab, "
            "ROW_NUMBER() OVER (PARTITION BY e.dst "
            "ORDER BY COUNT(*) DESC, p2.lab ASC) AS rn "
            f"FROM edges e JOIN l{i} p2 ON e.src = p2.id "
            "GROUP BY e.dst, p2.lab) WHERE rn = 1) w USING (id))"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, lab AS label FROM l{iterations} ORDER BY id"
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: the 1-in-4 'new batch' slice of
    documents classified against the other three quarters as the existing
    corpus — exact (slim hash join + text compare) and near (cross band
    join at the recall~1 design point, exact Jaccard verify at t=0.8)
    paths; oracle recomputes exact matches and ALL cross-slice Jaccard
    pairs from scratch."""
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 4 == 0)
    base = docs.filter(F.col("doc_id") % 4 != 0)
    return D.incremental_dedup(new, base, "doc_id", "text").orderBy("doc_id")


INCREMENTAL_DEDUP_ORACLE = """
WITH newdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
basedocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0),
exact AS (
  SELECT n.doc_id, MIN(b.doc_id) AS exact_match
  FROM newdocs n JOIN basedocs b ON n.text = b.text
  GROUP BY n.doc_id
),
toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
),
e AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
  FROM e a
  JOIN e b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN e c ON c.doc_id = a.doc_id AND c.i = a.i + 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.s = y.s
  WHERE x.doc_id % 4 = 0 AND y.doc_id % 4 <> 0
  GROUP BY 1, 2
),
near0 AS (
  SELECT id_a, id_b,
         CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jac
  FROM common
  JOIN sizes na ON na.doc_id = id_a
  JOIN sizes nb ON nb.doc_id = id_b
  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.8
),
near AS (SELECT id_a AS doc_id, MIN(id_b) AS near_match FROM near0 GROUP BY 1),
nearj AS (
  SELECT n.doc_id, n.near_match, ROUND(j.jac, 6) AS near_jaccard
  FROM near n JOIN near0 j ON j.id_a = n.doc_id AND j.id_b = n.near_match
)
SELECT d.doc_id,
       CASE WHEN e2.exact_match IS NOT NULL THEN 'exact_dup'
            WHEN nj.near_match IS NOT NULL THEN 'near_dup'
            ELSE 'fresh' END AS status,
       COALESCE(e2.exact_match, nj.near_match) AS match_id,
       CASE WHEN e2.exact_match IS NULL THEN nj.near_jaccard END AS jaccard
FROM newdocs d
LEFT JOIN exact e2 USING (doc_id)
LEFT JOIN nearj nj USING (doc_id)
ORDER BY doc_id
"""


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution join over events: every (view → purchase) pair per user
    within 30 minutes — the batch face of the stream-stream event-time
    join (`streaming/joins.attribution_join`; stream ≡ batch pinned by
    test_streaming_joins)."""
    from ..streaming.joins import attribution_join

    ev = load_table(spark, sf_dir, "events")
    trig = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    resp = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = attribution_join(trig, resp, "user_id", within_seconds=1800)
    return out.select(
        "user_id",
        F.col("t_event_id").alias("view_id"),
        F.col("r_event_id").alias("purchase_id"),
        F.col("t_ts").alias("view_ts"),
        F.col("r_ts").alias("purchase_ts"),
    ).orderBy("user_id", "view_id", "purchase_id")


ATTRIBUTION_ORACLE = """
SELECT t.user_id,
       t.event_id AS view_id,
       r.event_id AS purchase_id,
       t.ts AS view_ts,
       r.ts AS purchase_ts
FROM events t JOIN events r
  ON t.user_id = r.user_id
 AND t.event_type = 'view' AND r.event_type = 'purchase'
 AND t.ts <= r.ts AND r.ts < t.ts + INTERVAL 1800 SECONDS
ORDER BY 1, 2, 3
"""


def q_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization of events.user_id — tokens must keep the
    per-user aggregation working (count per token equals count per raw
    user), checked by aggregating on the TOKEN in both engines."""
    ev = load_table(spark, sf_dir, "events")
    tok = CU.pseudonymize(
        ev.select("user_id", "event_type"), ["user_id"], secret="rot-2024Q1"
    )
    return (
        tok.groupBy(F.col("user_id").alias("user_token"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_token")
    )


PSEUDONYMIZE_ORACLE = """
SELECT substr(sha256('rot-2024Q1:' || CAST(user_id AS VARCHAR)), 1, 16)
         AS user_token,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
ORDER BY 1
"""


def q_embedding_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding normalization both ways — unit-L2 per vector (map-only
    left-fold sum of squares mirrored by DuckDB list_reduce) and
    per-dimension z-score (2^20-quantized integer sums → identical double
    chains, the char_entropy discipline) — outputs as micro-unit BIGINT
    vectors serialized to one canonical comma-joined string per row so the
    comparison is integer-exact AND the driver's pandas canonicalizer can
    hash it (list cells are unhashable)."""
    from ..operators.similarity import l2_normalize, zscore_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    u = F.transform(
        F.col("unit"), lambda x: F.round(x * 1_000_000).cast("bigint")
    )
    zu = F.transform(
        F.col("zvec"), lambda x: F.round(x * 1_000_000).cast("bigint")
    )
    return (
        l2_normalize(emb, "vec_id", "embedding")
        .join(zscore_embeddings(emb, "vec_id", "embedding"), "vec_id")
        .select(
            "vec_id",
            F.round("norm", 6).alias("norm"),
            F.concat_ws(",", u).alias("unit_u"),
            F.concat_ws(",", zu).alias("z_u"),
        )
        .orderBy("vec_id")
    )


EMBEDDING_NORM_ORACLE = """
WITH sq AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS xs
  FROM embeddings
),
l2 AS (
  SELECT vec_id,
         sqrt(list_reduce(list_prepend(0.0, xs), (acc, x) -> acc + x)) AS nrm,
         embedding
  FROM sq
),
uarr AS (
  SELECT vec_id, ROUND(nrm, 6) AS norm,
         CASE WHEN nrm > 0 THEN
           list_transform(embedding,
                          x -> CAST(ROUND(CAST(x AS DOUBLE) / nrm * 1000000)
                                    AS BIGINT))
         ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS unit_u
  FROM l2
),
pos AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         unnest(embedding) AS x
  FROM embeddings
),
posd AS (
  SELECT vec_id, d,
         CAST(ROUND(CAST(x AS DOUBLE) * 1048576) AS BIGINT) AS xi
  FROM pos
),
grid AS (
  SELECT d, COUNT(*) AS n, SUM(xi) AS s, SUM(xi * xi) AS ss
  FROM posd GROUP BY d
),
stats AS (
  SELECT d,
         CAST(s AS DOUBLE) / n AS mean,
         sqrt(greatest(CAST(ss AS DOUBLE) / n
              - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0.0)) AS std
  FROM grid
),
z AS (
  SELECT vec_id, d,
         CASE WHEN std > 0
              THEN (CAST(xi AS DOUBLE) - mean) / std ELSE 0.0 END AS zv
  FROM posd JOIN stats USING (d)
),
zarr AS (
  SELECT vec_id,
         list(CAST(ROUND(zv * 1000000) AS BIGINT) ORDER BY d) AS z_u
  FROM z GROUP BY vec_id
)
SELECT u.vec_id, u.norm,
       array_to_string(u.unit_u, ',') AS unit_u,
       array_to_string(zarr.z_u, ',') AS z_u
FROM uarr u JOIN zarr USING (vec_id)
ORDER BY u.vec_id
"""


def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON payload lifecycle over events: build a deterministic
    nested payload (meta struct + vals array) from each row, parse it
    back with an EXPLICIT schema, flatten the struct, explode the array
    — the oracle reconstructs every output by plain column arithmetic,
    so the whole parse/flatten/explode chain must invert the build."""
    from ..functions.jsonops import flatten_structs, parse_json_column

    ev = load_table(spark, sf_dir, "events")
    payload = F.concat(
        F.lit('{"meta":{"k":'),
        F.get_json_object("props", "$.k"),
        F.lit(',"tag":"t'),
        (F.col("user_id") % 5).cast("string"),
        F.lit('"},"vals":['),
        (F.col("event_id") % 7).cast("string"),
        F.lit(","),
        (F.col("event_id") % 11).cast("string"),
        F.lit("]}"),
    )
    df = ev.select("event_id", payload.alias("payload"))
    good, _bad = parse_json_column(
        df, "payload",
        "struct<meta: struct<k: bigint, tag: string>, vals: array<bigint>>",
    )
    flat = flatten_structs(good.select("event_id", "parsed"))
    # no orderBy: the correctness gate compares order-insensitively, and a
    # global sort of the exploded rows would be the query's dominant cost
    return flat.select(
        "event_id",
        F.col("parsed_meta_k").alias("meta_k"),
        F.col("parsed_meta_tag").alias("meta_tag"),
        F.posexplode("parsed_vals").alias("pos", "val"),
    )


JSON_FLATTEN_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS meta_k,
       't' || CAST(user_id % 5 AS VARCHAR) AS meta_tag,
       CAST(p - 1 AS INTEGER) AS pos,
       CASE WHEN p = 1 THEN event_id % 7 ELSE event_id % 11 END AS val
FROM events, UNNEST([1, 2]) AS u(p)
ORDER BY event_id, pos
"""


def q_rollup_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram percentiles: per (event_type, day), p50/p95
    estimated from a fixed 200-bin [0,4000) histogram state built as TWO
    increments and MERGED — the oracle recomputes from the full data in
    one shot, so the split/merge must be invisible (bin counts are
    integers; the interpolation is one shared double chain)."""
    from ..operators import rollup as RU

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    lo, hi, bins = 0.0, 4000.0, 200
    a = RU.histogram_state(
        ev.filter(F.col("ts") < cut), ["event_type"], "ts", "value",
        lo=lo, hi=hi, bins=bins,
    )
    b = RU.histogram_state(
        ev.filter(F.col("ts") >= cut), ["event_type"], "ts", "value",
        lo=lo, hi=hi, bins=bins,
    )
    st = RU.merge_histograms(a, b)
    st = RU.percentile_from_histogram(st, 50, lo=lo, hi=hi)
    st = RU.percentile_from_histogram(st, 95, lo=lo, hi=hi)
    return st.select("event_type", "window_start", "p50", "p95").orderBy(
        "event_type", "window_start"
    )


ROLLUP_PERCENTILE_ORACLE = """
WITH binned AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         CASE WHEN value < 0 THEN 0 WHEN value >= 4000 THEN 201
              ELSE CAST(FLOOR(value / 20.0) AS INTEGER) + 1 END AS b,
         COUNT(*) AS c
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2, 3
),
tot AS (SELECT event_type, window_start, SUM(c) AS n FROM binned GROUP BY 1, 2),
cum AS (
  SELECT event_type, window_start, b, c,
         SUM(c) OVER (PARTITION BY event_type, window_start ORDER BY b) AS cc
  FROM binned
),
t AS (
  SELECT event_type, window_start,
         (n * 50 + 99) // 100 AS t50,
         (n * 95 + 99) // 100 AS t95
  FROM tot
),
x50 AS (
  SELECT c.event_type, c.window_start, MIN(c.b) AS b
  FROM cum c JOIN t USING (event_type, window_start)
  WHERE c.cc >= t.t50 GROUP BY 1, 2
),
e50 AS (
  SELECT x.event_type, x.window_start,
         CASE WHEN x.b = 0 THEN 0.0 WHEN x.b = 201 THEN 4000.0
              ELSE 0.0 + (x.b - 1
                + CASE WHEN c.c > 0
                       THEN CAST(t.t50 - (c.cc - c.c) AS DOUBLE) / c.c
                       ELSE 0.0 END) * 20.0
         END AS p50
  FROM x50 x
  JOIN cum c ON c.event_type = x.event_type
            AND c.window_start = x.window_start AND c.b = x.b
  JOIN t ON t.event_type = x.event_type AND t.window_start = x.window_start
),
x95 AS (
  SELECT c.event_type, c.window_start, MIN(c.b) AS b
  FROM cum c JOIN t USING (event_type, window_start)
  WHERE c.cc >= t.t95 GROUP BY 1, 2
),
e95 AS (
  SELECT x.event_type, x.window_start,
         CASE WHEN x.b = 0 THEN 0.0 WHEN x.b = 201 THEN 4000.0
              ELSE 0.0 + (x.b - 1
                + CASE WHEN c.c > 0
                       THEN CAST(t.t95 - (c.cc - c.c) AS DOUBLE) / c.c
                       ELSE 0.0 END) * 20.0
         END AS p95
  FROM x95 x
  JOIN cum c ON c.event_type = x.event_type
            AND c.window_start = x.window_start AND c.b = x.b
  JOIN t ON t.event_type = x.event_type AND t.window_start = x.window_start
)
SELECT e50.event_type, e50.window_start,
       ROUND(e50.p50, 6) AS p50, ROUND(e95.p95, 6) AS p95
FROM e50 JOIN e95 ON e95.event_type = e50.event_type
                 AND e95.window_start = e50.window_start
ORDER BY 1, 2
"""


def q_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly flags over events (per event_type ×
    hour-of-day slot, z > 3 against the slot's own mean/stddev) — the
    integer-quantized stat chain reproduced exactly by the oracle."""
    ev = load_table(spark, sf_dir, "events")
    out = DIAG.seasonal_outliers(ev, ["event_type"], "ts", "value", k=3.0)
    return out.select(
        "event_id", "event_type", "season_slot",
        "seasonal_mean", "seasonal_std", "is_outlier",
    ).orderBy("event_id")


SEASONAL_OUTLIERS_ORACLE = """
WITH base AS (
  SELECT event_id, event_type, hour(ts) AS season_slot,
         CAST(ROUND(CAST(value AS DOUBLE) * 1024) AS BIGINT) AS xi
  FROM events
),
grid AS (
  SELECT event_type, season_slot, COUNT(*) AS n,
         SUM(xi) AS s, SUM(xi * xi) AS ss
  FROM base WHERE xi IS NOT NULL
  GROUP BY 1, 2
),
stats AS (
  SELECT event_type, season_slot,
         CAST(s AS DOUBLE) / n AS m,
         sqrt(greatest(CAST(ss AS DOUBLE) / n
              - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0.0)) AS sd
  FROM grid
)
SELECT b.event_id, b.event_type, b.season_slot,
       ROUND(m / 1024, 6) AS seasonal_mean,
       ROUND(sd / 1024, 6) AS seasonal_std,
       CASE WHEN sd > 0 THEN ABS(CAST(xi AS DOUBLE) - m) / sd > 3.0
            ELSE ABS(CAST(xi AS DOUBLE) - m) > 0 END AS is_outlier
FROM base b JOIN stats USING (event_type, season_slot)
ORDER BY event_id
"""


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detection per event_type series (slack 0.5σ,
    threshold 5σ) — the max(0, ·) recursion as two window functions over
    INTEGER units, so the running sums are order-free and the oracle's
    window chain lands bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    out = DIAG.cusum_changepoints(
        ev, ["event_type"], "ts", "value", ["ts", "event_id"],
    )
    return out.select(
        "event_id", "event_type", "cusum_hi", "cusum_lo", "is_changepoint"
    ).orderBy("event_id")


CUSUM_ORACLE = """
WITH base AS (
  SELECT event_id, event_type, ts,
         CAST(ROUND(CAST(value AS DOUBLE) * 1024) AS BIGINT) AS xi
  FROM events
),
st AS (
  SELECT event_type, COUNT(xi) AS n, SUM(xi) AS s, SUM(xi * xi) AS ss
  FROM base GROUP BY 1
),
st2 AS (
  SELECT event_type, n, s,
         sqrt(greatest(CAST(ss AS DOUBLE) / n
              - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0.0)) AS sd
  FROM st
),
st3 AS (
  SELECT event_type, n, s, sd,
         CAST(ROUND(0.5 * sd * n * 1024) AS BIGINT) AS slack_u,
         CAST(ROUND(5.0 * sd * n * 1024) AS BIGINT) AS h_u
  FROM st2
),
j AS (
  SELECT b.event_id, b.event_type, b.ts, n, sd, slack_u, h_u,
         (b.xi * n - s) * 1024 AS dev_u
  FROM base b JOIN st3 USING (event_type)
),
wsum AS (
  SELECT *,
    SUM(dev_u - slack_u) OVER
      (PARTITION BY event_type ORDER BY ts, event_id) AS p_hi,
    SUM(-dev_u - slack_u) OVER
      (PARTITION BY event_type ORDER BY ts, event_id) AS p_lo
  FROM j
),
wmin AS (
  SELECT *,
    MIN(p_hi) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS mh,
    MIN(p_lo) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS ml
  FROM wsum
)
SELECT event_id, event_type,
  ROUND(CAST(p_hi - LEAST(0, mh) AS DOUBLE)
        / ((CASE WHEN sd > 0 THEN sd ELSE 1.0 END) * n * 1024), 6) AS cusum_hi,
  ROUND(CAST(p_lo - LEAST(0, ml) AS DOUBLE)
        / ((CASE WHEN sd > 0 THEN sd ELSE 1.0 END) * n * 1024), 6) AS cusum_lo,
  CASE WHEN sd > 0
       THEN (p_hi - LEAST(0, mh)) > h_u OR (p_lo - LEAST(0, ml)) > h_u
       ELSE FALSE END AS is_changepoint
FROM wmin
ORDER BY event_id
"""


def q_topk_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 events by value per event_type via the bin-count
    threshold prefilter (only ~k + one bin's rows per group reach the
    sort) — must equal the naive full-sort window verbatim."""
    ev = load_table(spark, sf_dir, "events")
    out = CU.top_k_by_value(
        ev.select("event_id", "event_type", "value"),
        ["event_type"], "value", 5, tiebreak_col="event_id",
    )
    return out.orderBy("event_type", "rank")


TOPK_VALUE_ORACLE = """
SELECT event_id, event_type, value, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rank
  FROM events WHERE value IS NOT NULL
)
WHERE rank <= 5
ORDER BY event_type, rank
"""


def q_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge over synthetic 97-bucket clusters of documents
    (cluster formation itself is oracled separately by `dedup_clusters`):
    longest text wins, chars sum, language = first non-null by smallest
    doc_id, source = min — each rule deterministic and reproduced in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    clustered = docs.withColumn("cluster", F.col("doc_id") % 97)
    out = D.golden_records(
        clustered, "cluster", "doc_id",
        {"text": "longest", "n_chars": "sum", "lang": "first_non_null",
         "source": "min"},
    )
    return out.select(
        "cluster", "n_members", "text", "n_chars", "lang", "source"
    ).orderBy("cluster")


GOLDEN_RECORDS_ORACLE = """
WITH c AS (SELECT *, doc_id % 97 AS cluster FROM documents),
longest AS (
  SELECT cluster, text FROM (
    SELECT cluster, text,
           ROW_NUMBER() OVER (PARTITION BY cluster
                              ORDER BY length(text) DESC, text DESC) AS rn
    FROM c WHERE text IS NOT NULL
  ) WHERE rn = 1
),
firstlang AS (
  SELECT cluster, lang FROM (
    SELECT cluster, lang,
           ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY doc_id) AS rn
    FROM c WHERE lang IS NOT NULL
  ) WHERE rn = 1
),
aggs AS (
  SELECT cluster, COUNT(*) AS n_members,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         MIN(source) AS source
  FROM c GROUP BY cluster
)
SELECT a.cluster, a.n_members, l.text, a.n_chars, f.lang, a.source
FROM aggs a
LEFT JOIN longest l USING (cluster)
LEFT JOIN firstlang f USING (cluster)
ORDER BY a.cluster
"""


def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe splitting: hash the GROUP key (source domain) instead
    of the row id, so every document of a domain lands on the same side —
    near-duplicate family members can never straddle the train/val
    boundary. Output proves it: one (source, split) row per source."""
    docs = load_table(spark, sf_dir, "documents")
    out = TX.train_val_split(
        docs, "source", val_fraction=0.2, hash_fn="md5"
    )
    return (
        out.groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


GROUP_SPLIT_ORACLE = """
SELECT source,
       CASE WHEN ('0x' || substr(md5(source || '#42'), 1, 15))::BIGINT
                 % 10000 < 2000
            THEN 'val' ELSE 'train' END AS split,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
ORDER BY 1
"""


def q_hashed_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed document embeddings (16-dim, bigram shingles, md5
    variant): sign-hashed shingle counts, L2-normalized — reproduced
    bit-for-bit by DuckDB (integer accumulations; the only doubles are
    the final normalize, an identical chain both sides). Output as
    micro-unit BIGINT vectors serialized to one comma-joined string per
    row (driver's pandas hash cannot canonicalize list cells)."""
    from ..operators.similarity import hashed_doc_embeddings

    docs = load_table(spark, sf_dir, "documents")
    emb = hashed_doc_embeddings(
        docs, "doc_id", "text", dim=16, shingle_k=2, hash_fn="md5"
    )
    return emb.select(
        "doc_id",
        F.concat_ws(
            ",",
            F.transform(
                "embedding", lambda x: F.round(x * 1_000_000).cast("bigint")
            ),
        ).alias("emb_u"),
    ).orderBy("doc_id")


HASHED_EMBEDDINGS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
),
e AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w AS s
  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
hv AS (
  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS hv FROM sh
),
contrib AS (
  SELECT doc_id, CAST(hv % 16 AS INTEGER) AS d,
         CASE WHEN (hv // 16) % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM hv
),
sums AS (SELECT doc_id, d, SUM(sgn) AS w FROM contrib GROUP BY 1, 2),
grid AS (
  SELECT doc_id, CAST(i AS INTEGER) AS d
  FROM (SELECT DISTINCT doc_id FROM documents), range(16) r(i)
),
dense AS (
  SELECT g.doc_id, g.d, COALESCE(s.w, 0) AS w
  FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.d = g.d
),
nrm AS (
  SELECT doc_id, sqrt(CAST(SUM(w * w) AS DOUBLE)) AS n
  FROM dense GROUP BY 1
)
SELECT d.doc_id,
       array_to_string(
         list(CAST(ROUND(CASE WHEN n > 0 THEN w / n ELSE 0.0 END * 1000000)
                   AS BIGINT) ORDER BY d.d), ',') AS emb_u
FROM dense d JOIN nrm ON nrm.doc_id = d.doc_id
GROUP BY d.doc_id, n
ORDER BY d.doc_id
"""


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 PMI collocations over the corpus (min pair count 5): one
    log of a ratio of exact integer counts per pair — identical IEEE
    chain both engines; ranked on the rounded score with pair tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.pmi_collocations(docs, "doc_id", "text", min_count=5, top_n=40)


PMI_COLLOCATIONS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_transform(
           list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                       x -> x <> ''),
           x -> lower(x)) AS t
  FROM documents
),
uni AS (
  SELECT w, COUNT(*) AS cw FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
),
bi AS (
  SELECT w1, w2, COUNT(*) AS cxy FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM toks, UNNEST(range(1, greatest(len(t), 1))) r(i)
  ) GROUP BY w1, w2 HAVING COUNT(*) >= 5
),
tot AS (
  SELECT (SELECT SUM(cw) FROM uni) AS n,
         (SELECT SUM(greatest(len(t) - 1, 0)) FROM toks) AS b
)
SELECT w1, w2, cxy,
       ROUND(ln(CAST(cxy AS DOUBLE) * n * n / (b * u1.cw * u2.cw)), 6) AS pmi
FROM bi
JOIN uni u1 ON u1.w = bi.w1
JOIN uni u2 ON u2.w = bi.w2
CROSS JOIN tot
ORDER BY pmi DESC, w1, w2
LIMIT 40
"""


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the block-structured synthetic graph
    (6 blocks × 10 nodes, three intra-block chords per node): the engine
    runs degree-ordered compact-forward; the oracle counts a<b<c
    triangles directly — every triangle found exactly once either way."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    block = F.col("doc_id") - (F.col("doc_id") % 10)
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[block + ((F.col("doc_id") * 7 + 3 * k) % 10) for k in (1, 2, 3)]
            )
        ).alias("dst"),
    )
    return G.triangle_counts(edges).orderBy("id")


TRIANGLES_ORACLE = """
WITH e0 AS (
  SELECT doc_id AS src,
         unnest([(doc_id - doc_id % 10) + (doc_id * 7 + 3) % 10,
                 (doc_id - doc_id % 10) + (doc_id * 7 + 6) % 10,
                 (doc_id - doc_id % 10) + (doc_id * 7 + 9) % 10]) AS dst
  FROM documents WHERE doc_id < 60
),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM e0
    UNION ALL SELECT dst, src FROM e0
  ) WHERE a <> b
),
canon AS (SELECT a, b FROM und WHERE a < b),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM canon e1
  JOIN canon e2 ON e2.a = e1.b
  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
),
pern AS (
  SELECT id, COUNT(*) AS n FROM (
    SELECT unnest([a, b, c]) AS id FROM tri
  ) GROUP BY id
),
nodes AS (SELECT DISTINCT a AS id FROM und)
SELECT nodes.id, COALESCE(pern.n, 0) AS n_triangles
FROM nodes LEFT JOIN pern USING (id)
ORDER BY nodes.id
"""


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift between the first half of January's event values and the
    rest (10 bins on [0, 4000) + under/overflow): per-bin terms plus the
    slot=-1 total — exact integer bin counts, identical p/q log chain."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    out = DQ.psi_drift(
        ev.filter(F.col("ts") < cut),
        ev.filter(F.col("ts") >= cut),
        "value", lo=0.0, hi=4000.0, bins=10,
    )
    return out.orderBy("slot")


PSI_DRIFT_ORACLE = """
WITH base AS (
  SELECT CASE WHEN value < 0 THEN 0 WHEN value >= 4000 THEN 11
              ELSE CAST(FLOOR(value / 400.0) AS INTEGER) + 1 END AS slot,
         COUNT(*) AS base_n
  FROM events WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-15'
  GROUP BY 1
),
cur AS (
  SELECT CASE WHEN value < 0 THEN 0 WHEN value >= 4000 THEN 11
              ELSE CAST(FLOOR(value / 400.0) AS INTEGER) + 1 END AS slot,
         COUNT(*) AS cur_n
  FROM events WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-15'
  GROUP BY 1
),
grid AS (SELECT CAST(i AS INTEGER) AS slot FROM range(12) r(i)),
j AS (
  SELECT g.slot, COALESCE(base_n, 0) AS base_n, COALESCE(cur_n, 0) AS cur_n
  FROM grid g LEFT JOIN base USING (slot) LEFT JOIN cur USING (slot)
),
t AS (SELECT SUM(base_n) AS tb, SUM(cur_n) AS tc FROM j),
terms AS (
  SELECT slot, base_n, cur_n,
         ROUND((greatest(base_n / tb, 0.0001)
                - greatest(cur_n / tc, 0.0001))
               * ln(greatest(base_n / tb, 0.0001)
                    / greatest(cur_n / tc, 0.0001)), 6) AS psi_term
  FROM j, t
)
SELECT slot, base_n, cur_n, psi_term FROM terms
UNION ALL
SELECT -1, CAST(SUM(base_n) AS BIGINT), CAST(SUM(cur_n) AS BIGINT),
       ROUND(SUM(psi_term), 6)
FROM terms
ORDER BY slot
"""


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the query {dup, query, sort} over documents ('dup'
    is ~30× rarer than the others — its idf must dominate): exact counts,
    identical Okapi chain, rounded-score/id total order."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.bm25_rank(
        docs, "doc_id", "text", ["dup", "query", "sort"], top_n=20
    )


BM25_SEARCH_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_transform(
           list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                       x -> x <> ''),
           x -> lower(x)) AS t
  FROM documents
),
base AS (SELECT doc_id, t, len(t) AS dl FROM toks),
tot AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM base),
hits AS (
  SELECT doc_id, dl, w, COUNT(*) AS tf FROM (
    SELECT doc_id, dl, unnest(t) AS w FROM base
  ) WHERE w IN ('dup', 'query', 'sort')
  GROUP BY doc_id, dl, w
),
dfreq AS (SELECT w, COUNT(*) AS df FROM hits GROUP BY w),
scored AS (
  SELECT doc_id,
         ROUND(SUM(
           ln((n - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * 2.2)
           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
         ), 6) AS score
  FROM hits JOIN dfreq USING (w) CROSS JOIN tot
  GROUP BY doc_id
)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id
LIMIT 20
"""


def q_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KMV distinct-count state: distinct users per (event_type,
    day) from a k=64 sketch built as TWO increments and merged — the
    oracle recomputes the sketch one-shot (k smallest of a union equals
    the union of part-wise k smallest, exactly), then both apply the
    same estimator."""
    from ..operators import rollup as RU

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    a = RU.distinct_state(
        ev.filter(F.col("ts") < cut), ["event_type"], "ts", "user_id", k=64
    )
    b = RU.distinct_state(
        ev.filter(F.col("ts") >= cut), ["event_type"], "ts", "user_id", k=64
    )
    st = RU.merge_distinct_state(a, b, k=64)
    return RU.finalize_distinct(st, k=64).orderBy("event_type", "window_start")


DISTINCT_ROLLUP_ORACLE = """
WITH d AS (
  SELECT DISTINCT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
topk AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, window_start
                                 ORDER BY h) AS rn
    FROM d
  ) WHERE rn <= 64
),
st AS (
  SELECT event_type, window_start, COUNT(*) AS n_sketch,
         MAX(CASE WHEN rn = 64 THEN h END) AS hk
  FROM topk GROUP BY 1, 2
)
SELECT event_type, window_start,
       CAST(n_sketch AS INTEGER) AS n_sketch,
       ROUND(CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
                  ELSE 63.0 * 1152921504606846976 / CAST(hk AS DOUBLE)
             END, 6) AS est_distinct
FROM st
ORDER BY 1, 2
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional exactly-50 sample of documents ∝ n_chars
    (Efraimidis–Spirakis exponential keys on the deterministic md5
    uniform): the oracle recomputes the identical keys and takes the
    same top-50."""
    docs = load_table(spark, sf_dir, "documents")
    out = CU.weighted_sample(docs, "doc_id", "n_chars", 50)
    return out.select("doc_id", "n_chars", "sample_rank").orderBy("sample_rank")


WEIGHTED_SAMPLE_ORACLE = """
WITH keyed AS (
  SELECT doc_id, n_chars,
         ln((CAST(('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              AS DOUBLE) + 0.5) / 1152921504606846976.0) / n_chars AS k
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, n_chars, CAST(rnk AS INTEGER) AS sample_rank FROM (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS rnk
  FROM keyed
) WHERE rnk <= 50
ORDER BY rnk
"""


def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of event_type vs 6-hour day-band: one
    contingency aggregation, exact integer cells, shared (O−E)²/E chain."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day_band", F.floor(F.hour("ts") / 6).cast("int")
    )
    return DIAG.chi_square_independence(ev, "event_type", "day_band")


CHI_SQUARE_ORACLE = """
WITH cells AS (
  SELECT event_type AS a, CAST(FLOOR(hour(ts) / 6) AS INTEGER) AS b,
         COUNT(*) AS o
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
ra AS (SELECT a, SUM(o) AS r FROM cells GROUP BY a),
cb AS (SELECT b, SUM(o) AS c FROM cells GROUP BY b),
tot AS (
  SELECT SUM(o) AS n, COUNT(DISTINCT a) AS na, COUNT(DISTINCT b) AS nb
  FROM cells
)
SELECT ROUND(SUM((o - CAST(r AS DOUBLE) * c / n)
                 * (o - CAST(r AS DOUBLE) * c / n)
                 / (CAST(r AS DOUBLE) * c / n)), 6) AS chi2,
       CAST(MAX((na - 1) * (nb - 1)) AS BIGINT) AS dof,
       CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(MAX(na) AS BIGINT) AS n_a,
       CAST(MAX(nb) AS BIGINT) AS n_b
FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
"""


def q_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over (value, hour, day-of-month)
    derived from events — exact quantized sums, double chain from
    identical integers (the overflow-safe variant)."""
    ev = load_table(spark, sf_dir, "events").select(
        "value",
        F.hour("ts").cast("double").alias("hour_of_day"),
        F.dayofmonth("ts").cast("double").alias("day_of_month"),
    )
    return DIAG.correlation_matrix(
        ev, ["value", "hour_of_day", "day_of_month"]
    ).orderBy("col_x", "col_y")


CORRELATIONS_ORACLE = """
WITH q AS (
  SELECT CAST(ROUND(CAST(value AS DOUBLE) * 1024) AS BIGINT) AS x,
         CAST(ROUND(CAST(hour(ts) AS DOUBLE) * 1024) AS BIGINT) AS y,
         CAST(ROUND(CAST(dayofmonth(ts) AS DOUBLE) * 1024) AS BIGINT) AS z
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
),
s AS (
  SELECT COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
         SUM(x*x) AS ssx, SUM(y*y) AS ssy, SUM(z*z) AS ssz,
         SUM(x*y) AS sxy, SUM(x*z) AS sxz, SUM(y*z) AS syz
  FROM q
)
SELECT col_x, col_y, n, r FROM (
  SELECT 'value' AS col_x, 'hour_of_day' AS col_y, n,
         ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(ssx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(ssy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
  FROM s
  UNION ALL
  SELECT 'value', 'day_of_month', n,
         ROUND((CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(ssx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(ssz AS DOUBLE)
                         - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 6)
  FROM s
  UNION ALL
  SELECT 'hour_of_day', 'day_of_month', n,
         ROUND((CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(ssy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(ssz AS DOUBLE)
                         - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 6)
  FROM s
)
ORDER BY col_x, col_y
"""


def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions over per-user event sequences
    ((ts, event_id) total order): exact counts, one shared division."""
    ev = load_table(spark, sf_dir, "events")
    return BH.transition_matrix(
        ev, "user_id", "ts", "event_type", ["ts", "event_id"]
    ).orderBy("from_state", "to_state")


TRANSITION_MATRIX_ORACLE = """
WITH seq AS (
  SELECT event_type AS from_state,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_state
  FROM events
),
pairs AS (
  SELECT from_state, to_state, COUNT(*) AS n_transitions
  FROM seq WHERE to_state IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT from_state, SUM(n_transitions) AS t FROM pairs GROUP BY 1)
SELECT p.from_state, p.to_state, p.n_transitions,
       ROUND(p.n_transitions / t.t, 6) AS p
FROM pairs p JOIN tot t USING (from_state)
ORDER BY p.from_state, p.to_state
"""


def q_alert_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst suppression over error events per user (30-minute chained
    gaps): one kept alert per flapping episode, with burst ids."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    out = BH.suppress_repeats(
        ev.select("user_id", "ts", "event_id"),
        ["user_id"], "ts", within_seconds=1800, order_cols=["ts", "event_id"],
    )
    return out.select("user_id", "event_id", "ts", "burst_id").orderBy(
        "user_id", "burst_id"
    )


ALERT_SUPPRESS_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id,
         epoch(ts) - LAG(epoch(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS gap
  FROM events WHERE event_type = 'error'
),
marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS st
  FROM e
),
runs AS (
  SELECT *,
         CAST(SUM(st) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS BIGINT)
           AS burst_id
  FROM marked
)
SELECT user_id, event_id, ts, burst_id
FROM runs WHERE st = 1
ORDER BY user_id, burst_id
"""


def q_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword-count estimate (whitespace tokens + GPT-2-style
    piece regex + chars-per-subword ceiling) over the PII-augmented corpus
    — the augmentation injects emails/phones/IPs so digit runs and
    punctuation pieces actually occur (the raw synthetic text is
    letters-only, which would make n_pieces == n_ws_tokens vacuously)."""
    return TX.token_estimate(
        _pii_augmented(load_table(spark, sf_dir, "documents")), "doc_id", "text"
    )


def _token_estimate_oracle() -> str:
    return f"""
WITH aug AS ({_PII_AUG_SQL}),
p AS (
  SELECT doc_id,
         regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS ps,
         len(list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                         x -> x <> '')) AS nws
  FROM aug
)
SELECT doc_id,
       CAST(nws AS BIGINT) AS n_ws_tokens,
       CAST(len(ps) AS BIGINT) AS n_pieces,
       CAST(COALESCE(list_sum(list_transform(ps,
            x -> CAST(ceil(length(x) / 4.0) AS BIGINT))), 0) AS BIGINT)
         AS est_subwords
FROM p
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row key-skew summary over events.user_id — the evidence a
    salting / AQE-skew-join decision reads. Exact percentiles both sides
    (the count table is one row per key)."""
    return DIAG.skew_report(load_table(spark, sf_dir, "events"), ["user_id"])


SKEW_REPORT_ORACLE = """
WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT)   AS n_rows,
       CAST(MAX(n) AS BIGINT)   AS max_count,
       ROUND(AVG(n), 6)         AS avg_count,
       ROUND(MAX(n) / AVG(n), 6) AS skew_factor,
       quantile_cont(n, 0.5)    AS p50_count,
       quantile_cont(n, 0.99)   AS p99_count
FROM c
"""


def q_key_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heaviest event keys with row shares (unique user_id
    tie-break keeps the LIMIT deterministic on both engines)."""
    return DIAG.key_histogram(
        load_table(spark, sf_dir, "events"), ["user_id"], top_n=20
    )


KEY_HISTOGRAM_ORACLE = """
WITH c AS (SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id),
t AS (SELECT SUM(n_rows) AS tt FROM c)
SELECT user_id, CAST(n_rows AS BIGINT) AS n_rows,
       ROUND(CAST(n_rows AS DOUBLE) / tt, 6) AS row_share
FROM c, t
ORDER BY n_rows DESC, user_id
LIMIT 20
"""


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series outlier flags over events (per-event_type value
    series, modified-z-score MAD rule, k=3.5) — the broken-feed detector
    threshold alarms miss. Exact medians both sides."""
    out = DIAG.mad_outliers(
        load_table(spark, sf_dir, "events"), ["event_type"], "value", k=3.5
    )
    return out.select(
        "event_id", "event_type", "value",
        F.round("series_median", 6).alias("series_median"),
        F.round("series_mad", 6).alias("series_mad"),
        "is_outlier",
    )


MAD_OUTLIERS_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, m, ABS(e.value - m) AS d
  FROM events e JOIN med USING (event_type)
),
mad AS (SELECT event_type, quantile_cont(d, 0.5) AS md FROM dev GROUP BY event_type)
SELECT event_id, event_type, value,
       ROUND(m, 6) AS series_median,
       ROUND(md, 6) AS series_mad,
       CASE WHEN md > 0 THEN d / md > 3.5 ELSE d > 0 END AS is_outlier
FROM dev JOIN mad USING (event_type)
"""


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational pivot (wide per-user event-type counts) — the one GROUP
    BY shape the SQL corpus lacked; explicit value list keeps the output
    schema static (never let pivot scan for values at 100 TB)."""
    types = ["click", "view", "purchase", "signup", "error"]
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", types).count().na.fill(0)
    return wide.select(
        "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in types]
    )


PIVOT_EVENTS_ORACLE = """
SELECT user_id,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS n_click,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS n_view,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchase,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS n_signup,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS n_error
FROM events GROUP BY user_id
"""


def q_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode over real JFIF bytes: synthesize a valid
    grayscale baseline JPEG per document (8×8 blocks constant by a
    closed-form formula, quant table all-ones — AC exactly zero, integer DC
    survives q=1 quantization, so the lossy format round-trips BIT-EXACT;
    see operators/jpeg.py), then run the full entropy decode (Annex-K
    Huffman tables, DC prediction, dequantize, IDCT) inside Arrow
    ``mapInPandas``. The oracle recomputes width/height/mean-luma from the
    block formula — the Huffman/DCT pipeline must invert the encode
    exactly to match."""
    from ..operators.multimodal import extract_image_features, synthesize_media

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    media = synthesize_media(docs, kind="jpeg")
    out = extract_image_features(media)
    return out.select(
        "media_id", "width", "height", F.round("mean_luma", 6).alias("mean_luma")
    )


def q_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive-JPEG (SOF2) decode round trip (r6): the same
    closed-form block-constant pattern as `jpeg_features`, but serialized
    as a 4-scan progressive file — DC first pass at Al=1 + DC bit-plane
    refinement, AC band first pass + refinement with EOB-run coding over
    a custom EOBn-capable Huffman table (operators/jpeg.py Annex G
    machinery). The decoder must accumulate coefficients across all four
    scans and still invert the encode bit-exactly, so the SAME formula
    oracle as the baseline fixture applies verbatim; pHash planted-dup
    detection over progressive fixtures is pinned in tests/test_jpeg.py."""
    from ..operators.multimodal import extract_image_features, synthesize_media

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    media = synthesize_media(docs, kind="jpeg_progressive")
    out = extract_image_features(media)
    return out.select(
        "media_id", "width", "height", F.round("mean_luma", 6).alias("mean_luma")
    )


JPEG_FEATURES_ORACLE = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 7 AS bw, 4 + doc_id % 4 AS bh,
         ((doc_id + 12345) * 2654435761) % 4294967296 AS m
  FROM documents
), bxs AS (
  SELECT doc_id, bw, bh, m, unnest(generate_series(0, bw-1)) AS bx FROM dims
), bxy AS (
  SELECT doc_id, bw, bh, m, bx, unnest(generate_series(0, bh-1)) AS by FROM bxs
)
SELECT doc_id AS media_id,
       CAST(8 * bw AS INTEGER) AS width,
       CAST(8 * bh AS INTEGER) AS height,
       ROUND(AVG(CAST(
         (doc_id + (m % 256) * bx + ((m // 256) % 256) * by
                 + ((m // 65536) % 256) * bx * by) % 256
         AS DOUBLE)) / 255.0, 6) AS mean_luma
FROM bxy GROUP BY doc_id, bw, bh
"""


def q_exif_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF round trip over real JPEG payloads: synthesize an APP1/Exif
    segment per document (fields closed-form in doc_id, byte order
    alternating II/MM by parity) spliced into a valid baseline JPEG, then
    parse it back with the TIFF-IFD walker — all inside Arrow stages; the
    oracle reconstructs every field from doc_id arithmetic alone."""
    from ..operators.exif import extract_exif, synthesize_exif_media

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    media = synthesize_exif_media(docs)
    return extract_exif(media).orderBy("media_id")


EXIF_METADATA_ORACLE = """
SELECT doc_id AS media_id,
       'Cam' || CAST(doc_id % 3 AS VARCHAR) AS make,
       'M-' || CAST(doc_id % 5 AS VARCHAR) AS model,
       CAST(doc_id % 8 + 1 AS INTEGER) AS orientation,
       '2024:01:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
         || ' ' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
         || ':00:00' AS datetime,
       '2024:01:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
         || ' ' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
         || ':00:00' AS datetime_original,
       CAST(8 * (4 + doc_id % 7) AS BIGINT) AS pixel_x,
       CAST(8 * (4 + doc_id % 4) AS BIGINT) AS pixel_y
FROM documents
ORDER BY doc_id
"""


def q_image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection end to end over REAL baseline JPEGs:
    synthesize a valid JFIF per document (every 25th document REUSES its
    predecessor's image — the planted duplicates), DCT-pHash each inside
    the Arrow decode stage (full JPEG entropy decode feeding the hash),
    and band the 64-bit hashes through the generic hamming_pairs join.
    Exactly the planted pairs at distance 0 must emerge at EVERY sf.

    JPEG fixtures are used (r5) because their hash-mixed block patterns
    span ~2^24 classes — the earlier linear-ramp PNG fixtures produced
    same-dimension images differing by a constant luma offset, which
    pHash treats as identical BY DESIGN (brightness invariance), breaking
    the planted contract at sf0.1 with accidental distance-0 pairs. PNG /
    BMP pHash dispatch stays pinned by tests/test_phash.py goldens.

    Oracled (r6) by GROUND TRUTH rather than reimplementation: the 2-D
    DCT itself is not SQL-expressible, but the planted-duplicate design
    makes the EXPECTED OUTPUT closed-form — exactly the (doc_id-1,
    doc_id) pairs at distance 0 for doc_id % 25 == 1, and nothing else
    (the hash-mixed block patterns measured 0 accidental collisions
    across 5000 ids; see synth_jpeg_bytes). A wrong decode, resize, DCT,
    median or banding step either loses a planted pair or admits a
    spurious one — both break the hash match. pytest goldens
    (tests/test_phash.py, tests/test_jpeg.py) additionally pin hash
    determinism and near-dup tolerance."""
    from ..operators.multimodal import extract_image_phash, synthesize_media

    seeds = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 25 == 1, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id")).alias("seed"),
    )
    synth = synthesize_media(
        seeds.select(F.col("seed").alias("media_id")).distinct(), kind="jpeg"
    )
    media = seeds.join(synth, seeds["seed"] == synth["media_id"]).select(
        F.col("doc_id").alias("media_id"), "payload"
    )
    hashed = extract_image_phash(media)
    return D.hamming_pairs(
        hashed.filter(F.col("phash").isNotNull()), "media_id", "phash",
        max_hamming=0,
    )


IMAGE_PHASH_PAIRS_ORACLE = """
SELECT doc_id - 1 AS id_a, doc_id AS id_b, CAST(0 AS INTEGER) AS hamming
FROM documents
WHERE doc_id % 25 = 1 AND doc_id >= 1
ORDER BY id_a
"""


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join, grid-bucketed (the join Spark cross-products
    when written naively): event activity intervals [ts, ts + value s)
    against ±60 s error windows, matched per user. Micros both sides;
    ROUND before the long cast (Spark truncates double→long, DuckDB
    rounds — round() first makes them agree)."""
    ev = load_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; the session is pinned UTC, so the instant cast
    # is exact and unix_micros matches DuckDB's epoch_us
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    left = ev.select(
        "user_id", "event_id", us.alias("s"),
        (us + F.round(F.col("value") * 1_000_000).cast("long")).alias("e"),
    )
    right = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id",
        (us - 60_000_000).alias("s"), (us + 60_000_000).alias("e"),
    )
    return T.interval_overlap_join(
        left, right,
        l_id="event_id", l_start="s", l_end="e",
        r_id="event_id", r_start="s", r_end="e",
        bucket_width=300_000_000, by=["user_id"],
    )


INTERVAL_OVERLAP_ORACLE = """
WITH ev AS (
  SELECT * FROM (
    SELECT event_id, user_id, epoch_us(ts) AS s,
           epoch_us(ts) + CAST(ROUND(value * 1000000) AS BIGINT) AS e
    FROM events
  ) WHERE s < e  -- pin half-open semantics: zero-length intervals overlap nothing,
                 -- matching the operator's s < e filter (temporal.py)
),
err AS (
  SELECT event_id, user_id,
         epoch_us(ts) - 60000000 AS s, epoch_us(ts) + 60000000 AS e
  FROM events WHERE event_type = 'error'
)
SELECT ev.user_id,
       ev.event_id AS event_id_l, err.event_id AS event_id_r,
       ev.s AS s_l, ev.e AS e_l, err.s AS s_r, err.e AS e_r
FROM ev JOIN err
  ON ev.user_id = err.user_id AND ev.s < err.e AND err.s < ev.e
"""


def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness/cardinality profile of the events table —
    one aggregation pass, exact distincts (the oracle-checkable contract;
    `exact=False` swaps in HLL for the 100 TB path)."""
    return DQ.profile_table(load_table(spark, sf_dir, "events"), exact=True)


_DQ_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

DQ_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       ROUND(CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / greatest(COUNT(*), 1), 6) AS null_ratio,
       COUNT(DISTINCT {c}) AS n_distinct
FROM events"""
    for c in _DQ_PROFILE_COLS
)


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite: four row predicates in one pass over events, a
    uniqueness check, and lineitem→orders referential integrity. The
    'core_event_types_only' check FAILS by design (error events exist) —
    pass/fail rows must both flow, a suite that can only say yes checks
    nothing."""
    ev = load_table(spark, sf_dir, "events")
    rows = DQ.check_constraints(ev, {
        "event_id_not_null": F.col("event_id").isNotNull(),
        "value_in_range": (F.col("value") >= 0) & (F.col("value") <= 1000),
        "known_event_type": F.col("event_type").isin(
            "click", "view", "purchase", "signup", "error"),
        "core_event_types_only": F.col("event_type").isin(
            "click", "view", "purchase", "signup"),
    })
    uniq = DQ.check_unique(ev, ["event_id"])
    ref = DQ.check_referential(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        [("l_orderkey", "o_orderkey")],
    )
    return rows.unionByName(uniq).unionByName(ref)


DQ_CHECKS_ORACLE = """
SELECT 'event_id_not_null' AS "check",
       CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       COUNT(*) AS n_rows,
       SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) = 0 AS passed
FROM events
UNION ALL
SELECT 'value_in_range',
       CAST(SUM(CASE WHEN NOT COALESCE(value >= 0 AND value <= 1000, FALSE)
                     THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*),
       SUM(CASE WHEN NOT COALESCE(value >= 0 AND value <= 1000, FALSE)
                THEN 1 ELSE 0 END) = 0
FROM events
UNION ALL
SELECT 'known_event_type',
       CAST(SUM(CASE WHEN event_type NOT IN
                ('click','view','purchase','signup','error')
                OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*),
       SUM(CASE WHEN event_type NOT IN ('click','view','purchase','signup','error')
                OR event_type IS NULL THEN 1 ELSE 0 END) = 0
FROM events
UNION ALL
SELECT 'core_event_types_only',
       CAST(SUM(CASE WHEN event_type NOT IN ('click','view','purchase','signup')
                OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*),
       SUM(CASE WHEN event_type NOT IN ('click','view','purchase','signup')
                OR event_type IS NULL THEN 1 ELSE 0 END) = 0
FROM events
UNION ALL
SELECT 'unique(event_id)',
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT),
       COUNT(*),
       COUNT(*) = COUNT(DISTINCT event_id)
FROM events
UNION ALL
SELECT 'references(l_orderkey)',
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*),
       SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest-completion signup→click→purchase funnel over the events
    table (t_{i+1} = first step-i+1 event strictly after t_i; partial
    completions keep nulls)."""
    ev = load_table(spark, sf_dir, "events")
    return BH.funnel(ev, "user_id", "ts", "event_type",
                     ["signup", "click", "purchase"])


FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
       CASE WHEN s3.t3 IS NOT NULL THEN 3
            WHEN s2.t2 IS NOT NULL THEN 2
            ELSE 1 END AS completed_steps
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over events: distinct cohort users active
    per (first-event ISO week, week offset)."""
    return BH.cohort_retention(load_table(spark, sf_dir, "events"), "user_id", "ts")


COHORT_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, wk) / 7 AS INTEGER) AS week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM active JOIN firsts USING (user_id)
GROUP BY cohort_week, week_offset
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space dedup end to end (SemDeDup shape): LSH-partitioned
    cosine pairs → connected components → per-group representative, total
    (vec_id, cluster_rep, keep) assignment. Same slice/parameters as
    ``cosine_pairs_lsh`` (16 tables × 2 planes ⇒ per-pair miss ≈ 3e-4, so
    the LSH pair set equals the exact one and the DuckDB recursive-CTE
    closure over the exact crossJoin pairs is a true oracle of the whole
    pipeline, not just the pair stage)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 250)
    return D.semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.4, n_planes=2, n_tables=16,
        scorer="hof",
    )


SEMANTIC_DEDUP_ORACLE = """
WITH RECURSIVE v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id < 250
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.e, b.e) /
        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6)
        >= 0.4
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT vec_id, vec_id FROM v
  UNION
  SELECT edges.dst, reach.r FROM edges JOIN reach ON reach.id = edges.src
)
SELECT id AS vec_id, MIN(r) AS cluster_rep, (MIN(r) = id) AS keep
FROM reach GROUP BY id
"""


def q_semantic_dedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup on the SHIPPED SCALE PATH — ``n_planes='auto'`` (the
    occupancy law that fixed the measured 28×/decade within-bucket blowup
    at fixed planes; SCALE.md r9e). The registered ``semantic_dedup``
    face pins 2 planes × 16 tables so the exact-closure oracle holds;
    auto sizing deliberately sheds moderate-cosine candidates, so THIS
    face uses the corpus-size-free PLANTED-TWIN contract instead: every
    corpus vector gets a bit-identical twin (same buckets at any plane
    count), threshold 0.999999 makes twin pairs the ONLY edges (testdata
    has no duplicate embeddings), and each twin must resolve to its
    original as cluster representative with keep=false — pipeline
    (bucketize → verify → connected components → rep election) attested
    end to end under auto sizing."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", "embedding")
    )
    twins = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    out = D.semantic_dedup(
        emb.unionByName(twins), "vec_id", "embedding",
        threshold=0.999999, n_planes="auto", n_tables=2, scorer="hof",
    )
    return out.filter(F.col("vec_id") >= 1_000_000).select(
        "vec_id",
        (
            (F.col("cluster_rep") == F.col("vec_id") - 1_000_000)
            & (~F.col("keep"))
        ).alias("twin_clustered"),
    )


SEMANTIC_DEDUP_AUTO_ORACLE = """
SELECT vec_id + 1000000 AS vec_id, TRUE AS twin_clustered
FROM embeddings WHERE vec_id < 200
"""


# --------------------------------------------------------------------------
# Dashboard report generation (step 8 — F5 dedup, C1/C3 derivations)
# --------------------------------------------------------------------------


def _dash_defs_df(spark: SparkSession) -> DataFrame:
    rows = [
        ("App/Events", et, "day", 86400, "Sum", None,
         json.dumps({"FunctionName": f"fn_{et}", "S3Bucket": "ignored"}),
         "events", None, dash, "123412341234", None, None, None)
        for et, dash in [
            ("click", "ops_dash"), ("view", "ops_dash"), ("purchase", "rev_dash"),
            ("error", "ops_dash"), ("signup", "rev_dash"),
        ]
    ]
    return spark.createDataFrame(rows, METRIC_DEFS_SCHEMA)


def q_dashboard_widgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Widget synthesis per dashboard (ref:stacks/metrics_streamer.py:340-370):
    metric_id = 'data-gov-'+unique_id (C1), title = widget_title (C3), with
    'Bucket'-suffixed dimensions excluded (F6)."""
    return DB.dashboard_widgets(_dash_defs_df(spark)).orderBy("dashboard", "metric_id")


DASHBOARD_WIDGETS_ORACLE = """
WITH defs(name, dash) AS (
  VALUES ('click','ops_dash'),('view','ops_dash'),('purchase','rev_dash'),
         ('error','ops_dash'),('signup','rev_dash')
)
SELECT dash AS dashboard,
       dash || '-us-east-1' AS dashboard_name,
       'data-gov-' || lower(regexp_replace(
           'App/Events' || name || 'day' || 'FunctionName' || 'fn_' || name,
           '\\W+', '', 'g')) AS metric_id,
       lower(replace(name || ' per day-fn_' || name, '/', '')) AS title,
       10 AS width
FROM defs
"""


def q_dashboard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positioned dashboard geometry (ref:stacks/metrics_streamer.py:362-370
    CDK layout semantics: one widget per add_widgets call ⇒ one grid row
    each — x=0, y=i*6, width=10, height=6) plus the CloudWatch metric
    series path [namespace, name, dim_name, dim_value, ...] with ALL
    dimensions (Bucket exclusion is an id/title rule only). The rendered
    PutDashboard JSON body built from these rows is golden-pinned in
    tests/test_dashboards.py."""
    w = DB.positioned_widgets(_dash_defs_df(spark))
    return w.select(
        "dashboard",
        "dashboard_name",
        "metric_id",
        "title",
        F.array_join("series", "|").alias("series_path"),
        "x",
        "y",
        "width",
        "height",
    )


DASHBOARD_LAYOUT_ORACLE = """
WITH defs(name, dash) AS (
  VALUES ('click','ops_dash'),('view','ops_dash'),('purchase','rev_dash'),
         ('error','ops_dash'),('signup','rev_dash')
), w AS (
  SELECT dash AS dashboard,
         dash || '-us-east-1' AS dashboard_name,
         'data-gov-' || lower(regexp_replace(
             'App/Events' || name || 'day' || 'FunctionName' || 'fn_' || name,
             '\\W+', '', 'g')) AS metric_id,
         lower(replace(name || ' per day-fn_' || name, '/', '')) AS title,
         'App/Events|' || name || '|FunctionName|fn_' || name || '|S3Bucket|ignored'
             AS series_path
  FROM defs
)
SELECT dashboard, dashboard_name, metric_id, title, series_path,
       0 AS x,
       (ROW_NUMBER() OVER (PARTITION BY dashboard ORDER BY metric_id, title) - 1) * 6 AS y,
       10 AS width, 6 AS height
FROM w
"""


def q_dashboard_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dashboard rollup — widget_count per dashboard (the array column is
    exercised in tests; the oracle checks the grouped counts)."""
    rep = DB.dashboard_report(_dash_defs_df(spark))
    return rep.select("dashboard", "dashboard_name", "widget_count")


DASHBOARD_REPORT_ORACLE = """
WITH defs(name, dash) AS (
  VALUES ('click','ops_dash'),('view','ops_dash'),('purchase','rev_dash'),
         ('error','ops_dash'),('signup','rev_dash')
)
SELECT dash AS dashboard, dash || '-us-east-1' AS dashboard_name,
       COUNT(*) AS widget_count
FROM defs GROUP BY dash
"""


# --------------------------------------------------------------------------
# Corpus curation (PII, domains, sampling, entropy — operators/curation.py)
# --------------------------------------------------------------------------
#
# The synthetic documents corpus contains no PII or URLs, so these queries
# deterministically AUGMENT the text with engine-identical expressions
# (doc_id-derived emails/phones/IPs/URLs on modular slices) before running
# the operator — the check is non-vacuous (counts 0/1/2 vary per doc) and
# DuckDB rebuilds the identical input string.


def _pii_augmented(docs: DataFrame) -> DataFrame:
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" reach user"), F.col("doc_id").cast("string"),
                     F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" call 555-"),
                     F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                     F.lit("-1234")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
                     F.lit(".1")),
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", aug.alias("text"))


_PII_AUG_SQL = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-1234'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                 ELSE '' END AS text
  FROM documents
"""


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII hit counts (email/phone/IPv4) over the augmented
    corpus. Map-only regexp_extract_all scan — zero shuffle at any scale."""
    return CU.pii_scan(_pii_augmented(load_table(spark, sf_dir, "documents")),
                       "doc_id", "text")


PII_SCAN_ORACLE = f"""
WITH aug AS ({_PII_AUG_SQL})
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{CU.PII_PATTERNS["email"][0]}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '{CU.PII_PATTERNS["phone"][0]}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(text, '{CU.PII_PATTERNS["ipv4"][0]}')) AS BIGINT) AS n_ipv4
FROM aug
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full redacted-text equality check: every PII match replaced by its
    class placeholder, email→phone→ipv4 order (an address like
    user@10.0.0.1.corp.com must become one <EMAIL>, never keep a partial
    <IP> inside the host)."""
    return CU.redact_pii(_pii_augmented(load_table(spark, sf_dir, "documents")),
                         "doc_id", "text")


PII_REDACT_ORACLE = f"""
WITH aug AS ({_PII_AUG_SQL})
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{CU.PII_PATTERNS["email"][0]}', '<EMAIL>', 'g'),
           '{CU.PII_PATTERNS["phone"][0]}', '<PHONE>', 'g'),
           '{CU.PII_PATTERNS["ipv4"][0]}', '<IP>', 'g') AS redacted
FROM aug
"""


def q_domain_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL stats with broadcast-anti-join blocklist exclusion.
    One shuffle keyed by domain (map-side combined explode)."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(" see https://site"), (F.col("doc_id") % 20).cast("string"),
                     F.lit(".example.com/page")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.lit(" also http://mirror.example.org/x"),
        ).otherwise(F.lit("")),
    )
    blocklist = spark.createDataFrame(
        [("site3.example.com",), ("mirror.example.org",)], ["domain"]
    )
    return CU.domain_report(
        docs.select("doc_id", aug.alias("text")), "doc_id", "text",
        blocklist=blocklist,
    )


DOMAIN_REPORT_ORACLE = """
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 2 = 0
                 THEN ' see https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com/page'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' also http://mirror.example.org/x'
                 ELSE '' END AS text
  FROM documents
),
doms AS (
  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
  FROM aug
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM doms
WHERE domain NOT IN ('site3.example.com', 'mirror.example.org')
GROUP BY domain
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language Bernoulli sample (md5-60-bit ppm
    thresholds — reproducible across engines, runs and partitionings;
    zh rate 0 proves full-stratum exclusion). Map-only filter."""
    docs = load_table(spark, sf_dir, "documents")
    out = CU.stratified_sample(
        docs, "doc_id", "lang",
        rates_ppm={"en": 250_000, "zh": 0}, default_ppm=1_000_000,
    )
    return out.select("doc_id", "lang")


STRATIFIED_SAMPLE_ORACLE = """
SELECT doc_id, lang
FROM documents
WHERE ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      % 1000000
      < CASE WHEN lang = 'en' THEN 250000
             WHEN lang = 'zh' THEN 0
             ELSE 1000000 END
"""


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (T5 paper §2.2) over a deterministically
    synthesized newline-structured page: the corpus text is re-lined into
    8-token lines with doc_id-derived terminal punctuation (3 in 4 lines),
    'javascript' markers (~4% of lines), and per-doc 'lorem ipsum' / '{'
    injections — DuckDB rebuilds the identical page, so the full
    clean_text string equality is checked end-to-end. The operator itself
    is pure array HOFs: map-only, zero shuffle at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = D.tokenize(F.col("text"))
    nmax = F.greatest(
        (F.size(toks) + 7) / 8 - 1, F.lit(0)
    ).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nmax),
        lambda i: F.concat(
            F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
            F.when((F.col("doc_id") + i * 31) % 23 == 0,
                   F.lit(" javascript")).otherwise(F.lit("")),
            F.when((F.col("doc_id") + i) % 4 == 0,
                   F.lit("")).otherwise(F.lit(".")),
        ),
    )
    page = F.concat(
        F.array_join(lines, "\n"),
        F.when(F.col("doc_id") % 13 == 0,
               F.lit("\nlorem ipsum dolor.")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 19 == 0, F.lit(" {")).otherwise(F.lit("")),
    )
    return CU.c4_clean(
        docs.select("doc_id", page.alias("text")), "doc_id", "text",
        min_words_per_line=5, min_lines=3,
    )


C4_CLEAN_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS ts
  FROM documents
),
lines AS (
  SELECT doc_id, i,
         array_to_string(list_slice(ts, i*8+1, i*8+8), ' ')
         || CASE WHEN (doc_id + i*31) % 23 = 0 THEN ' javascript' ELSE '' END
         || CASE WHEN (doc_id + i) % 4 = 0 THEN '' ELSE '.' END AS line
  FROM tok, UNNEST(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) r(i)
),
page AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY i)
         || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'lorem ipsum dolor.' ELSE '' END
         || CASE WHEN doc_id % 19 = 0 THEN ' {' ELSE '' END AS text
  FROM lines GROUP BY doc_id
),
flt AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS ls,
         list_filter(string_split(text, chr(10)), l ->
           right(l, 1) IN ('.', '!', '?', '"')
           AND len(list_filter(string_split(regexp_replace(trim(l), '\\s+', ' ', 'g'), ' '),
                               x -> x <> '')) >= 5
           AND NOT contains(lower(l), 'javascript')) AS kept,
         NOT (contains(lower(text), 'lorem ipsum') OR contains(text, '{')) AS page_ok
  FROM page
)
SELECT doc_id,
       CASE WHEN page_ok AND len(kept) >= 3
            THEN array_to_string(kept, chr(10)) ELSE '' END AS clean_text,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       (page_ok AND len(kept) >= 3) AS doc_kept
FROM flt
"""


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, table A1), each rule
    its own boolean column + the conjunction. Thresholds sit inside the
    corpus distribution (words 10-99 median 56; avg word length 3.7-5.3
    median 4.5) so every flag splits the corpus non-vacuously. Map-only."""
    return CU.gopher_rules(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        min_words=30, max_words=80,
        min_avg_word_len=3.0, max_avg_word_len=4.5,
        stopwords=("the", "a", "value", "table", "row"),
        min_stopword_hits=2,
    )


# The gopher metric CTEs and the gate condition are shared verbatim between
# the gopher_rules oracle and the corpus_pipeline oracle — one source of
# truth for the cross-engine gate.
_GOPHER_CTE = """
t AS (
  SELECT doc_id, text,
         list_filter(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS ts
  FROM documents
),
m AS (
  SELECT doc_id, text, ts,
         len(ts) AS n,
         greatest(len(ts), 1) AS nn,
         CAST(list_sum(list_transform(ts, x -> length(x))) AS DOUBLE)
             / greatest(len(ts), 1) AS avg_len,
         (length(text) - length(replace(text, '#', '')))
             + (length(text) - length(replace(text, '...', ''))) / 3 AS symbols,
         len(list_filter(ts, x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
         len(list_filter(['the', 'a', 'value', 'table', 'row'],
                         w -> list_contains(ts, w))) AS stop_hits
  FROM t
)"""

_GOPHER_PASS = """((n >= 30 AND n <= 80)
        AND (avg_len >= 3.0 AND avg_len <= 4.5)
        AND (CAST(symbols AS DOUBLE) / nn <= 0.1)
        AND (CAST(alpha_words AS DOUBLE) / nn >= 0.8)
        AND (stop_hits >= 2))"""

GOPHER_RULES_ORACLE = f"""
WITH {_GOPHER_CTE}
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       ROUND(avg_len, 6) AS avg_word_len,
       (n >= 30 AND n <= 80) AS ok_words,
       (avg_len >= 3.0 AND avg_len <= 4.5) AS ok_avg_len,
       (CAST(symbols AS DOUBLE) / nn <= 0.1) AS ok_symbols,
       (CAST(alpha_words AS DOUBLE) / nn >= 0.8) AS ok_alpha,
       (stop_hits >= 2) AS ok_stopwords,
       {_GOPHER_PASS} AS pass
FROM m
"""


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pre-training curation chain as one composition: Gopher
    gate (same thresholds as ``gopher_rules``) → exact dedup (min-id
    representative per identical text) → deterministic 2% split (md5
    variant so DuckDB replays it) → token counts. The oracle recomposes
    every stage in SQL, so the INTERACTION of the operators is checked,
    not just each stage alone."""
    return CU.curate_corpus(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        gopher_kwargs=dict(
            min_words=30, max_words=80,
            min_avg_word_len=3.0, max_avg_word_len=4.5,
            stopwords=("the", "a", "value", "table", "row"),
            min_stopword_hits=2,
        ),
        val_fraction=0.02, seed=42, hash_fn="md5",
    )


CORPUS_PIPELINE_ORACLE = f"""
WITH {_GOPHER_CTE},
g AS (
  SELECT doc_id, text, ts FROM m WHERE {_GOPHER_PASS}
),
d AS (
  SELECT doc_id, ts,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY text) AS dup_count
  FROM g
)
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 15))::BIGINT
                 % 10000 < 200
            THEN 'val' ELSE 'train' END AS split,
       CAST(len(ts) AS BIGINT) AS n_tokens,
       CAST(dup_count AS BIGINT) AS dup_count
FROM d WHERE rn = 1
"""


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy over the 27-char alphabet — the
    natural-language-vs-noise curation signal. Map-only (27 codegen'd
    string scans per row); the oracle is generated from the SAME alphabet
    constant with the identical left-associated float chain."""
    return CU.char_entropy(load_table(spark, sf_dir, "documents"), "doc_id", "text")


CHAR_ENTROPY_ORACLE = CU.char_entropy_oracle_sql("documents", "doc_id", "text")


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN checked by AGGREGATE recall@5 against the exact brute-force
    top-k (clustering itself isn't SQL-expressible; the recall contract is —
    VERDICT r1 #1b). The test embeddings are isotropic noise, so expected
    recall is ≈ n_probe/n_lists per neighbor (no cluster structure to
    exploit); probing 6 of 8 lists yields ≈ 0.9 aggregate recall — the 0.8
    gate holds with margin and deterministic seeding makes it reproducible.
    Per-query gating would pin the worst single draw and be brittle here."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ann = SIM.ivf_ann_topk(queries, emb, k=5, n_lists=8, n_probe=6, scorer="hof")
    brute = SIM.brute_force_topk(queries, emb, k=5)
    hits = (
        brute.alias("b")
        .join(
            ann.alias("a"),
            (F.col("b.query_id") == F.col("a.query_id"))
            & (F.col("b.neighbor_id") == F.col("a.neighbor_id")),
            "left",
        )
        .agg(
            F.countDistinct(F.col("b.query_id")).cast("int").alias("n_queries"),
            (F.count(F.col("a.neighbor_id")) / F.count(F.lit(1))).alias("recall"),
        )
    )
    return hits.select("n_queries", (F.col("recall") >= 0.8).alias("recall_ok"))


IVF_ANN_ORACLE = """
SELECT CAST(COUNT(*) AS INTEGER) AS n_queries, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
"""


def q_ivf_ann_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The build-once/query-many IVF path END TO END: build, persist via
    ``persist_ivf_index`` (repartition-by-list_id layout — exactly one
    data file per list directory, the small-files contract), reload via
    ``load_ivf_index``, and query. Contract (driver-attested): the
    persisted-index results are row-for-row IDENTICAL to the inline
    build's (vectors round-trip parquet exactly; same scoring plan), and
    the on-disk layout honors one-file-per-directory."""
    import os
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # r14 optimization (guide §1.2/§5): the index-free ivf_ann_topk call
    # rebuilt the SAME deterministic index the persist branch builds again
    # below — two full builds, with the inline one replayed per action.
    # Build once, pin it, query the in-memory pair and persist that same
    # build. ivf_ann_topk(index=built) is definitionally the same plan the
    # index-free call constructs internally (same n_lists=8, same default
    # kmeans_iters=1, same scorer), so the inline rows are bit-identical.
    built = SIM.materialize_index(SIM.build_ivf_index(emb, n_lists=8), eager=True)
    root = tempfile.mkdtemp(prefix="ivf_q_idx_")
    try:
        # k·|queries| rows — compare driver-side (exceptAll over the
        # window+dedup ANN plans trips a Catalyst attribute-binding
        # INTERNAL_ERROR in Spark 4.1; the result set is tiny by contract)
        key = ["query_id", "neighbor_id", "cosine", "rank"]
        # r14 opt pass 2 (guide §2.6): the inline query collect and the
        # persist write are independent actions over the pinned build.
        got_i, _ = _par(
            lambda: sorted(map(tuple, SIM.ivf_ann_topk(
                queries, emb, k=5, n_probe=6, index=built, scorer="hof"
            ).select(*key).collect())),
            lambda: SIM.persist_ivf_index(built, root, mode="overwrite"),
        )
        loaded = SIM.load_ivf_index(spark, root)
        persisted = SIM.ivf_ann_topk(
            queries, emb, k=5, n_probe=6, index=loaded, scorer="hof"
        )
        got_p = sorted(map(tuple, persisted.select(*key).collect()))
        n_diff = 0 if got_i == got_p else 1
        one_file_per_dir = all(
            sum(1 for f in files if f.endswith(".parquet")) <= 1
            for _, _, files in os.walk(os.path.join(root, "assignments"))
        )
        n_queries = len({t[0] for t in got_i})
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(int(n_queries), n_diff == 0, bool(one_file_per_dir))],
        "n_queries int, persisted_equals_inline boolean, one_file_per_dir boolean",
    )


IVF_ANN_PERSISTED_ORACLE = """
SELECT CAST(COUNT(DISTINCT vec_id) AS INTEGER) AS n_queries,
       TRUE AS persisted_equals_inline, TRUE AS one_file_per_dir
FROM embeddings WHERE vec_id < 10
"""


def q_sharded_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded IVF — the path PAST the 4096-list clamp (r12;
    ``similarity.build_sharded_ivf_index`` / ``sharded_ivf_ann_topk``):
    hash-split the corpus into per-shard in-budget indexes and query with
    a GLOBAL probe budget, bounding per-query probed rows at ~n_probe ×
    4096 at ANY corpus size (a flat clamped index grows linearly —
    SCALE.md r11/r12). Driver-attested contract, END TO END:

    - exact degeneration: a global budget covering every list (n_probe =
      n_shards × n_lists) returns EXACTLY the brute-force top-k — the
      sharded merge loses nothing;
    - persisted round trip: persist_sharded_ivf_index /
      load_sharded_ivf_index reproduce the in-memory shard list's partial-
      probe results row for row;
    - layout: every shard honors the one-data-file-per-list-directory
      small-files contract."""
    import os
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # r14 optimization (guide §5): the 2-shard build feeds three actions
    # (full-budget collect, memory-roundtrip collect, persist write) — pin
    # it once instead of replaying both per-shard builds per action (see
    # materialize_index; bit-identical, the build is deterministic).
    idx = SIM.materialize_index(
        SIM.build_sharded_ivf_index(emb, n_shards=2, n_lists=6), eager=True
    )
    key = ["query_id", "neighbor_id", "rank"]
    root = tempfile.mkdtemp(prefix="sivf_q_idx_")
    try:
        # r14 opt pass 2 (guide §2.6): the full-budget collect, the brute
        # baseline, the persist write and the in-memory partial-probe
        # collect are all independent actions over the pinned build — fan
        # them out; same rows.
        got_full, got_brute, _, got_m = _par(
            lambda: sorted(map(tuple, SIM.sharded_ivf_ann_topk(
                queries, idx, k=5, n_probe=12, scorer="hof"
            ).select(*key).collect())),
            lambda: sorted(map(tuple, SIM.brute_force_topk(
                queries, emb, k=5
            ).select(*key).collect())),
            lambda: SIM.persist_sharded_ivf_index(idx, root, mode="overwrite"),
            lambda: sorted(map(tuple, SIM.sharded_ivf_ann_topk(
                queries, idx, k=5, n_probe=8, scorer="hof"
            ).select(*key).collect())),
        )
        exact_ok = got_full == got_brute
        n_queries = len({t[0] for t in got_brute})
        loaded = SIM.load_sharded_ivf_index(spark, root)
        per = SIM.sharded_ivf_ann_topk(queries, loaded, k=5, n_probe=8, scorer="hof")
        got_p = sorted(map(tuple, per.select(*key).collect()))
        persisted_ok = got_m == got_p
        one_file_per_dir = all(
            sum(1 for f in files if f.endswith(".parquet")) <= 1
            for s in range(2)
            for _, _, files in os.walk(
                os.path.join(root, f"shard={s:05d}", "assignments")
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(int(n_queries), bool(exact_ok), bool(persisted_ok), bool(one_file_per_dir))],
        "n_queries int, exact_matches_brute boolean, "
        "persisted_equals_memory boolean, one_file_per_dir boolean",
    )


SHARDED_IVF_ANN_ORACLE = """
SELECT CAST(COUNT(DISTINCT vec_id) AS INTEGER) AS n_queries,
       TRUE AS exact_matches_brute, TRUE AS persisted_equals_memory,
       TRUE AS one_file_per_dir
FROM embeddings WHERE vec_id < 10
"""


def q_ivf_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF maintenance — the daily-crawl growth path (r12;
    ``similarity.append_to_ivf_index`` / ``compact_ivf_index`` /
    ``ivf_index_stats``): a persisted index absorbs a new batch with ONE
    map-only assign over the increment (O(batch), never the O(corpus)
    rebuild), appends stay idempotent under replay with ``dedupe=True``,
    and compaction restores the one-file-per-directory layout without
    changing a single result row. Driver-attested contract, END TO END
    on the embeddings table (even half = base index, odd half = the
    increment):

    - append parity: every appended row carries exactly the list_id the
      build's own assign kernel gives it against the frozen centroids;
    - replayed append with dedupe=True appends 0 rows;
    - a planted exact twin appended into the index is found at rank 1 by
      the persisted-index query path;
    - after appends grow files-per-dir past 1, compact restores ≤1 file
      per list directory and the query results are row-for-row unchanged;
    - ivf_index_stats accounts for every corpus row."""
    import os
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    # r14 optimization (guide §2.3/§1.2): the three driver-side counts
    # (base, batch, twins) were three separate count jobs over the same
    # tiny scan — one aggregate pass computes all three (same ints).
    cnt = emb.agg(
        F.count(F.when(F.col("vec_id") % 2 == 0, 1)).alias("n_base"),
        F.count(F.when(F.col("vec_id") % 2 == 1, 1)).alias("n_batch"),
        F.count(
            F.when((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 6), 1)
        ).alias("n_twins"),
    ).first()
    n_base, n_batch, n_twins = cnt["n_base"], cnt["n_batch"], cnt["n_twins"]
    root = tempfile.mkdtemp(prefix="ivf_maint_q_")
    try:
        # r14 optimization (guide §5): pin the build before persisting —
        # persist_ivf_index runs two writes over the build lineage
        # (centroids, assignments); unpinned, each replays the build.
        SIM.persist_ivf_index(
            SIM.materialize_index(SIM.build_ivf_index(base, n_lists=8), eager=True),
            root, mode="overwrite",
        )
        twins = base.filter(F.col("vec_id") < 6).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
        appended = SIM.append_to_ivf_index(spark, root, batch, dedupe=True)
        replayed = SIM.append_to_ivf_index(spark, root, batch, dedupe=True)
        SIM.append_to_ivf_index(spark, root, twins)

        centroids, assignments = SIM.load_ivf_index(spark, root)
        queries = base.filter(F.col("vec_id") < 10)
        key = ["query_id", "neighbor_id", "cosine", "rank"]

        def max_files_per_dir():
            worst = 0
            for d, _, files in os.walk(os.path.join(root, "assignments")):
                worst = max(worst, sum(1 for f in files if f.endswith(".parquet")))
            return worst

        grew = max_files_per_dir() > 1
        # r14 opt pass 2 (guide §2.6): the four checks below are all
        # read-only over the loaded tree — fan them out; same rows.
        got_rows, expect_rows, hits, before = _par(
            lambda: assignments.filter(
                (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 1_000_000)
            ).collect(),
            lambda: SIM._assign_to_lists(
                batch.select(
                    F.col("vec_id").alias("cid"),
                    F.col("embedding").cast("array<double>").alias("v"),
                ),
                centroids,
            ).collect(),
            lambda: SIM.ivf_ann_topk(
                base.filter(F.col("vec_id") < 6), emb, k=1, n_probe=8,
                index=(centroids, assignments), scorer="hof",
            ).collect(),
            lambda: sorted(map(tuple, SIM.ivf_ann_topk(
                queries, emb, k=5, n_probe=6,
                index=(centroids, assignments), scorer="hof",
            ).select(*key).collect())),
        )
        got = {(r["vec_id"], r["list_id"]) for r in got_rows}
        expect = {(r["cid"], r["list_id"]) for r in expect_rows}
        parity_ok = got == expect
        twin_ok = len(hits) == n_twins and all(
            r["neighbor_id"] == r["query_id"] + 1_000_000 and r["cosine"] > 0.999999
            for r in hits
        )
        SIM.compact_ivf_index(spark, root)
        compact_ok = max_files_per_dir() == 1
        after_idx = SIM.load_ivf_index(spark, root)
        after, stats = _par(
            lambda: sorted(map(tuple, SIM.ivf_ann_topk(
                queries, emb, k=5, n_probe=6,
                index=after_idx, scorer="hof",
            ).select(*key).collect())),
            lambda: SIM.ivf_index_stats(after_idx[1]).first(),
        )
        stats_ok = stats["n_rows"] == n_base + n_batch + n_twins
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(
            int(appended), int(replayed), bool(parity_ok), bool(twin_ok),
            bool(grew and compact_ok), before == after, bool(stats_ok),
        )],
        "appended int, replayed int, append_parity boolean, "
        "twin_found boolean, compact_restores_layout boolean, "
        "compact_preserves_results boolean, stats_account_all_rows boolean",
    )


IVF_INDEX_MAINTENANCE_ORACLE = """
SELECT CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS INTEGER) AS appended,
       0 AS replayed, TRUE AS append_parity, TRUE AS twin_found,
       TRUE AS compact_restores_layout, TRUE AS compact_preserves_results,
       TRUE AS stats_account_all_rows
FROM embeddings
"""


def q_lsh_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH maintenance — the LSH face of the daily-crawl
    growth path (r12; ``similarity.append_to_lsh_index`` /
    ``compact_lsh_index``): a persisted bucket index absorbs a new batch
    with one map-only bucketize over the increment using the MANIFEST's
    stored n_planes/n_tables/seed (no desync possible), appends stay
    idempotent under replay with ``dedupe=True``, and compaction restores
    the one-file-per-directory bucket-sorted layout without changing a
    single result row. Driver-attested contract, END TO END on the
    embeddings table (even half = base index, odd half = the increment):

    - append parity: every appended row carries exactly the (tbl, bucket,
      prefix) the build's own bucketize+normalization gives it — appended
      rows stay visible to the query side's partition pruning;
    - replayed append with dedupe=True appends 0 vectors;
    - a planted exact twin appended into the index is found at rank 1 by
      the persisted-index query path;
    - after appends grow files-per-dir past 1, compact restores ≤1 file
      per (tbl, prefix) directory and query results are row-for-row
      unchanged."""
    import os
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    # r14 optimization (guide §1.2): n_twins was a separate count job;
    # fold it into one tiny aggregate (same int).
    n_twins = emb.agg(
        F.count(
            F.when((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 6), 1)
        ).alias("n")
    ).first()["n"]
    root = tempfile.mkdtemp(prefix="lsh_maint_q_")
    kw = dict(corpus_id="vec_id", vec_col="embedding")
    try:
        # r14 optimization (guide §5): pin the bucketize — persist runs a
        # count (prefix sizing) AND a write over its lineage; unpinned,
        # each replays the bucketize matmul.
        bucketed = SIM.materialize_index(
            SIM.bucketize_tables(
                base, id_col="vec_id", id_name="neighbor_id",
                vec_col="embedding", keep_vec="cv", n_tables=4, n_planes=4,
            ),
            eager=True,
        )
        SIM.persist_lsh_index(
            bucketed, root, n_planes=4, n_tables=4, seed=7, mode="overwrite"
        )
        twins = base.filter(F.col("vec_id") < 6).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
        appended = SIM.append_to_lsh_index(spark, root, batch, dedupe=True, **kw)
        replayed = SIM.append_to_lsh_index(spark, root, batch, dedupe=True, **kw)
        SIM.append_to_lsh_index(spark, root, twins, **kw)

        idx, params = SIM.load_lsh_index(spark, root)
        queries = base.filter(F.col("vec_id") < 10)
        key = ["query_id", "neighbor_id", "cosine", "rank"]

        def max_files_per_dir():
            worst = 0
            for d, _, files in os.walk(os.path.join(root, "buckets")):
                worst = max(worst, sum(1 for f in files if f.endswith(".parquet")))
            return worst

        grew = max_files_per_dir() > 1
        # r14 opt pass 2 (guide §2.6): the four checks are read-only over
        # the loaded tree — fan them out; same rows.
        got_rows, expect_rows, hits, before = _par(
            lambda: idx.filter(
                (F.col("neighbor_id") % 2 == 1)
                & (F.col("neighbor_id") < 1_000_000)
            ).collect(),
            lambda: SIM.bucketize_tables(
                batch, id_col="vec_id", id_name="neighbor_id",
                vec_col="embedding", n_tables=4, n_planes=4,
            ).withColumn(
                "bucket", F.lpad(F.col("bucket").cast("string"), 4, "0")
            ).collect(),
            lambda: SIM.lsh_ann_topk(
                base.filter(F.col("vec_id") < 6), emb, k=1,
                index=idx, scorer="hof", **params
            ).collect(),
            lambda: sorted(map(tuple, SIM.lsh_ann_topk(
                queries, emb, k=5, index=idx, scorer="hof", **params
            ).select(*key).collect())),
        )
        got = {(r["neighbor_id"], r["tbl"], r["bucket"]) for r in got_rows}
        expect = {(r["neighbor_id"], r["tbl"], r["bucket"]) for r in expect_rows}
        parity_ok = got == expect
        twin_ok = len(hits) == n_twins and all(
            r["neighbor_id"] == r["query_id"] + 1_000_000 and r["cosine"] > 0.999999
            for r in hits
        )
        SIM.compact_lsh_index(spark, root)
        compact_ok = max_files_per_dir() == 1
        idx2, params2 = SIM.load_lsh_index(spark, root)
        after = sorted(map(tuple, SIM.lsh_ann_topk(
            queries, emb, k=5, index=idx2, scorer="hof", **params2
        ).select(*key).collect()))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(
            int(appended), int(replayed), bool(parity_ok), bool(twin_ok),
            bool(grew and compact_ok), before == after,
        )],
        "appended int, replayed int, append_parity boolean, "
        "twin_found boolean, compact_restores_layout boolean, "
        "compact_preserves_results boolean",
    )


LSH_INDEX_MAINTENANCE_ORACLE = """
SELECT CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS INTEGER) AS appended,
       0 AS replayed, TRUE AS append_parity, TRUE AS twin_found,
       TRUE AS compact_restores_layout, TRUE AS compact_preserves_results
FROM embeddings
"""


def q_pq_ann_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-PQ-index path END TO END (r12;
    ``similarity.persist_pq_index`` / ``load_pq_index`` /
    ``append_to_pq_index`` / ``compact_pq_index``) — the third ANN family
    gets the same build-once/query-many + daily-increment story as
    IVF/LSH. Driver-attested contract on the embeddings table:

    - persisted round trip: the ``index=`` query path with the manifest's
      splatted params returns row-for-row the inline ``pq_ann_topk``
      result (integer fixed point — parquet round-trips exactly);
    - append parity: an increment encoded through ``append_to_pq_index``
      carries exactly the codes the build's own encode gives it against
      the frozen codebook, and a replayed append with dedupe=True adds 0;
    - compact restores one data file per subspace directory without
      changing a single result row."""
    import os
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    queries = emb.filter(F.col("vec_id") < 5)

    # r14 optimization (guide §1.2/§5): the index-free pq_ann_topk call
    # trained the SAME deterministic codebook the persist branch trains
    # again below — two full trainings. Train once, pin it, query through
    # index= (identical plan and rows — same m=4 and the same k/scale_bits/
    # hash_fn/kernel defaults) and persist that same build. r14 opt pass 2
    # (guide §2.6): the roundtrip block and the maintenance block share
    # nothing (separate builds, separate tmp trees) — run them as two
    # concurrent driver threads and fan independent actions out with _par.
    def roundtrip_block():
        built = SIM.materialize_index(SIM.pq_index(emb, m=4), eager=True)
        root = tempfile.mkdtemp(prefix="pq_q_idx_")
        try:
            inline, _ = _par(
                lambda: sorted(
                    map(tuple, SIM.pq_ann_topk(
                        queries, emb, k_neighbors=3, m=4, index=built
                    ).collect())
                ),
                lambda: SIM.persist_pq_index(built, root, m=4, mode="overwrite"),
            )
            idx, params = SIM.load_pq_index(spark, root)
            persisted = sorted(
                map(tuple, SIM.pq_ann_topk(
                    queries, emb, k_neighbors=3, index=idx, **params
                ).collect())
            )
            return persisted == inline
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def maintenance_block():
        root = tempfile.mkdtemp(prefix="pq_q_maint_")
        try:
            SIM.persist_pq_index(
                SIM.materialize_index(SIM.pq_index(base, m=4), eager=True),
                root, m=4, mode="overwrite",
            )
            appended = SIM.append_to_pq_index(spark, root, batch, dedupe=True)
            replayed = SIM.append_to_pq_index(spark, root, batch, dedupe=True)
            (centroids, codes), params = SIM.load_pq_index(spark, root)
            slices = SIM._pq_subslices(
                batch.select(
                    F.col("vec_id").alias("cid"), F.col("embedding").alias("_v")
                ),
                "cid", "_v", 4, 20, "cid",
            )
            # r15: reuse the load above — the `before` thunk used to re-load
            # the identical tree (second manifest read + parquet defs)
            got_rows, expect_rows, before = _par(
                lambda: codes.filter(F.col("vec_id") % 2 == 1).collect(),
                lambda: SIM._pq_assign(slices, centroids, "cid").collect(),
                lambda: sorted(
                    map(tuple, SIM.pq_ann_topk(
                        queries, emb, k_neighbors=3,
                        index=(centroids, codes), **params,
                    ).collect())
                ),
            )
            got = {(r["vec_id"], r["sub"], r["code"]) for r in got_rows}
            expect = {(r["cid"], r["sub"], r["code"]) for r in expect_rows}
            parity_ok = got == expect
            SIM.compact_pq_index(spark, root)
            one_file_per_dir = all(
                sum(1 for f in files if f.endswith(".parquet")) <= 1
                for _, _, files in os.walk(os.path.join(root, "codes"))
            )
            after = sorted(
                map(tuple, SIM.pq_ann_topk(
                    queries, emb, k_neighbors=3,
                    index=SIM.load_pq_index(spark, root)[0], **params,
                ).collect())
            )
            return appended, replayed, parity_ok, one_file_per_dir, before == after
        finally:
            shutil.rmtree(root, ignore_errors=True)

    (
        roundtrip_ok,
        (appended, replayed, parity_ok, one_file_per_dir, results_stable),
    ) = _par(roundtrip_block, maintenance_block)
    return spark.createDataFrame(
        [(
            bool(roundtrip_ok), int(appended), int(replayed),
            bool(parity_ok), bool(one_file_per_dir), bool(results_stable),
        )],
        "persisted_equals_inline boolean, appended int, replayed int, "
        "append_parity boolean, compact_restores_layout boolean, "
        "compact_preserves_results boolean",
    )


PQ_ANN_PERSISTED_ORACLE = """
SELECT TRUE AS persisted_equals_inline,
       CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS INTEGER) AS appended,
       0 AS replayed, TRUE AS append_parity,
       TRUE AS compact_restores_layout, TRUE AS compact_preserves_results
FROM embeddings
"""


def q_lsh_ann_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-LSH-index path END TO END: bucketize, persist via
    ``persist_lsh_index`` (directory-bounded (tbl, _bpfx<p>) layout whose
    prefix join key hands the corpus scan dynamic partition pruning),
    reload via ``load_lsh_index`` (params round-trip through the
    manifest), and query. Contract: identical rows to the inline call
    and the prefix column present in the loaded index."""
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    root = tempfile.mkdtemp(prefix="lsh_q_idx_")
    try:
        key = ["query_id", "neighbor_id", "cosine", "rank"]

        # r14 opt pass 2 (guide §2.6/§5): the inline query collect and the
        # build-and-persist chain are independent — run them concurrently;
        # the bucketize is pinned because persist_lsh_index runs a count
        # (prefix sizing) AND a write over its lineage.
        def persist_chain():
            bucketed = SIM.materialize_index(
                SIM.bucketize_tables(
                    emb, id_col="vec_id", id_name="neighbor_id",
                    vec_col="embedding", keep_vec="cv", n_tables=8, n_planes=4,
                ),
                eager=True,
            )
            SIM.persist_lsh_index(
                bucketed, root, n_planes=4, n_tables=8, seed=7, mode="overwrite"
            )

        got_i, _ = _par(
            lambda: sorted(map(tuple, SIM.lsh_ann_topk(
                queries, emb, k=5, n_planes=4, n_tables=8, scorer="hof"
            ).select(*key).collect())),
            persist_chain,
        )
        idx, params = SIM.load_lsh_index(spark, root)
        prefix_present = any(c.startswith("_bpfx") for c in idx.columns)
        persisted = SIM.lsh_ann_topk(
            queries, emb, k=5, index=idx, scorer="hof", **params
        )
        got_p = sorted(map(tuple, persisted.select(*key).collect()))
        n_diff = 0 if got_i == got_p else 1
        n_queries = len({t[0] for t in got_i})
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(int(n_queries), n_diff == 0, bool(prefix_present))],
        "n_queries int, persisted_equals_inline boolean, prefix_partitioned boolean",
    )


LSH_ANN_PERSISTED_ORACLE = """
SELECT CAST(COUNT(DISTINCT vec_id) AS INTEGER) AS n_queries,
       TRUE AS persisted_equals_inline, TRUE AS prefix_partitioned
FROM embeddings WHERE vec_id < 10
"""


def q_ivf_ann_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN on the SHIPPED SCALE PATH — ``n_lists='auto'`` (~sqrt(n)
    Voronoi cells, the sizing that keeps per-query probed volume
    ~n_probe·sqrt(n) instead of a fixed fraction of the corpus; see
    ``build_ivf_index``). The registered ``ivf_ann`` face pins numeric
    defaults for oracle corpus-independence; THIS face driver-attests the
    auto sizing itself. Gate: aggregate recall@5 vs exact brute force
    ≥ 0.8 — corpus-size-free because n_probe is derived from the same
    auto formula (probe 90% of the auto list count; on isotropic test
    embeddings expected recall ≈ n_probe/n_lists = 0.9, so the 0.8 gate
    holds with margin and deterministic seeding makes it reproducible)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_lists = min(4096, max(16, math.isqrt(emb.count())))
    n_probe = max(1, math.ceil(0.9 * n_lists))
    queries = emb.filter(F.col("vec_id") < 10)
    ann = SIM.ivf_ann_topk(queries, emb, k=5, n_lists="auto", n_probe=n_probe, scorer="hof")
    brute = SIM.brute_force_topk(queries, emb, k=5)
    hits = (
        brute.alias("b")
        .join(
            ann.alias("a"),
            (F.col("b.query_id") == F.col("a.query_id"))
            & (F.col("b.neighbor_id") == F.col("a.neighbor_id")),
            "left",
        )
        .agg(
            F.countDistinct(F.col("b.query_id")).cast("int").alias("n_queries"),
            (F.count(F.col("a.neighbor_id")) / F.count(F.lit(1))).alias("recall"),
        )
    )
    return hits.select("n_queries", (F.col("recall") >= 0.8).alias("recall_ok"))


IVF_ANN_AUTO_ORACLE = """
SELECT CAST(COUNT(*) AS INTEGER) AS n_queries, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
"""


def q_lsh_ann_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN on the SHIPPED SCALE PATH — ``n_planes='auto'``
    (occupancy-pinned plane count, the sizing that keeps within-bucket
    verification O(n·occupancy) instead of n²/2^planes; see
    ``auto_planes``). Gate: PLANTED-TWIN recovery, the corpus-size-free
    contract — each query is a bit-identical copy of a corpus vector, so
    it lands in exactly the same bucket in every table at ANY plane
    count and its cosine-1.0 twin must come back as the top-1 neighbor.
    (A fixed recall gate on isotropic noise would NOT survive auto
    sizing: more planes deliberately shed far-apart candidates — recall
    on cosine≈0.3 'neighbors' is the wrong contract for the scale path;
    exact recovery of true near-duplicates is the right one. The
    testdata has no duplicate embeddings, so top-1 is unambiguous.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    twins = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    ann = SIM.lsh_ann_topk(twins, emb, k=1, n_planes="auto", n_tables=4, scorer="hof")
    return ann.select(
        "query_id",
        (
            (F.col("rank") == 1)
            & (F.col("neighbor_id") == F.col("query_id") - 1_000_000)
            & (F.col("cosine") > 0.999999)
        ).alias("twin_top1"),
    )


LSH_ANN_AUTO_ORACLE = """
SELECT vec_id + 1000000 AS query_id, TRUE AS twin_top1
FROM embeddings WHERE vec_id < 25
"""


def q_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (r6 — ``similarity.pq_ann_topk``): 4
    subspaces × 16 centroids, deterministic md5 seeding, one Lloyd step
    in integer fixed point, ADC top-5 for the vec_id < 10 queries.

    Unlike `ivf_ann`'s recall contract, the ENTIRE pipeline here is
    hash-exact oracled: integer units, floored integer centroid means
    and exact BIGINT squared-L2 (ties to the smaller index) let DuckDB
    replay seeding, training, encoding and ADC scoring verbatim — the
    pagerank/bpe discipline applied to vector search.

    ``assign_kernel='hof'`` is PINNED here (the public default is the
    bit-identical Arrow kernel since r14): this face attests the
    interpreted Catalyst-expression path — the reference
    implementation whose plan IS the SQL the oracle replays — while
    ``pq_ann_arrow`` attests the kernel the builders default to."""
    from ..operators.similarity import pq_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = pq_ann_topk(
        emb.filter(F.col("vec_id") < 10), emb,
        k_neighbors=5, m=4, k=16, hash_fn="md5",
        assign_kernel="hof",
    )
    return out.orderBy("query_id", "rank")


PQ_ANN_ORACLE = """
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
vals AS MATERIALIZED (
  SELECT vec_id,
         CAST((d - 1) // 16 AS INTEGER) AS sub,
         CAST((d - 1) % 16 AS INTEGER) AS pos,
         CAST(ROUND(e[d] * 1048576) AS BIGINT) AS x
  FROM base, UNNEST(range(1, len(e) + 1)) r(d)
),
seeds AS MATERIALIZED (
  SELECT vec_id AS cid,
         CAST(ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS INTEGER) AS idx
  FROM (SELECT vec_id,
               ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
                 AS h
        FROM base)
  ORDER BY h, vec_id LIMIT 16
),
c0 AS MATERIALIZED (
  SELECT v.sub, s.idx, v.pos, v.x AS c
  FROM vals v JOIN seeds s ON v.vec_id = s.cid
),
d0 AS MATERIALIZED (
  SELECT v.vec_id, v.sub, c.idx, SUM((v.x - c.c) * (v.x - c.c)) AS d2
  FROM vals v JOIN c0 c ON c.sub = v.sub AND c.pos = v.pos
  GROUP BY 1, 2, 3
),
a0 AS MATERIALIZED (
  SELECT vec_id, sub, idx AS code FROM (
    SELECT vec_id, sub, idx,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                              ORDER BY d2, idx) AS rn
    FROM d0) WHERE rn = 1
),
upd AS MATERIALIZED (
  SELECT a.sub, a.code AS idx, v.pos,
         CAST(FLOOR(CAST(SUM(v.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM a0 a JOIN vals v ON v.vec_id = a.vec_id AND v.sub = a.sub
  GROUP BY 1, 2, 3
),
c1 AS MATERIALIZED (
  SELECT c0.sub, c0.idx, c0.pos, COALESCE(u.c, c0.c) AS c
  FROM c0 LEFT JOIN upd u
    ON u.sub = c0.sub AND u.idx = c0.idx AND u.pos = c0.pos
),
d1 AS MATERIALIZED (
  SELECT v.vec_id, v.sub, c.idx, SUM((v.x - c.c) * (v.x - c.c)) AS d2
  FROM vals v JOIN c1 c ON c.sub = v.sub AND c.pos = v.pos
  GROUP BY 1, 2, 3
),
codes AS MATERIALIZED (
  SELECT vec_id, sub, idx AS code FROM (
    SELECT vec_id, sub, idx,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                              ORDER BY d2, idx) AS rn
    FROM d1) WHERE rn = 1
),
qt AS MATERIALIZED (
  SELECT d1.vec_id AS query_id, d1.sub, d1.idx AS code, d1.d2
  FROM d1 WHERE d1.vec_id < 10
),
adc AS (
  SELECT q.query_id, k.vec_id AS neighbor_id, SUM(q.d2) AS adc_dist
  FROM codes k JOIN qt q ON q.sub = k.sub AND q.code = k.code
  WHERE k.vec_id <> q.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist,
       CAST(rn AS INTEGER) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, neighbor_id) AS rn
      FROM adc)
WHERE rn <= 5
ORDER BY query_id, rank
"""


def q_pq_ann_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``pq_ann`` pipeline executed through the Arrow exact-int64
    assign kernel (r14 — ``similarity._pq_assign_arrow``): identical
    parameters, identical oracle. The kernel swaps the interpreted HOF
    argmin for one vectorized numpy int64 pass per Arrow batch — the
    big-build path (the 2M × 768-dim corpus-encode pass is HOF's
    measured bottleneck) — and this face is the driver-attested proof
    that the swap is BIT-identical: same seeding, training, encoding and
    ADC rows, hash-matched against the very same DuckDB replay the HOF
    face pins (suite parity tests in tests/test_pq_arrow.py cover ties
    and null vectors the sf data lacks)."""
    from ..operators.similarity import pq_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = pq_ann_topk(
        emb.filter(F.col("vec_id") < 10), emb,
        k_neighbors=5, m=4, k=16, hash_fn="md5",
        assign_kernel="arrow",
    )
    return out.orderBy("query_id", "rank")


def q_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (r14 — ``similarity.build_ivfpq_index`` /
    ``ivfpq_ann_topk``): PQ codes inside the IVF lists, the FAISS IVFPQ
    shape — the probe stage bounds candidate ROWS, the m-int ADC codes
    bound candidate BYTES. 8 lists seeded deterministically
    (``hash_fn='md5'``, ``kmeans_iters=0`` so the coarse centroids are
    raw corpus vectors — no float averaging crosses the engine
    boundary), 4×16 integer codebook trained on the UNIT-normalized
    corpus (one Lloyd step), n_probe=4, ADC top-5 for the vec_id < 10
    queries.

    The ENTIRE pipeline is hash-exact oracled (the ``pq_ann``
    discipline extended over the composition): DuckDB replays unit
    normalization, both quantizers' md5 seeding, the integer Lloyd
    step, the per-corpus-vector list assignment (cosine argmax, ties to
    the larger list), the per-query probe selection (top-4 lists by
    cosine desc/list desc) and the ADC scan restricted to the probed
    lists — verbatim, and matches bit for bit at all three SFs."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = SIM.build_ivfpq_index(
        emb, n_lists=8, kmeans_iters=0, m=4, pq_k=16, hash_fn="md5"
    )
    out = SIM.ivfpq_ann_topk(
        emb.filter(F.col("vec_id") < 10), idx, k=5, n_probe=4, scorer="hof"
    )
    return out.orderBy("query_id", "rank")


IVFPQ_ANN_ORACLE = """
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
norms AS MATERIALIZED (
  SELECT vec_id, SQRT(SUM(e[d]*e[d])) AS nn
  FROM base, UNNEST(range(1, len(e) + 1)) r(d) GROUP BY vec_id
),
uv AS MATERIALIZED (
  SELECT b.vec_id,
         CASE WHEN n.nn > 0 THEN list_transform(b.e, x -> x / n.nn) ELSE b.e END AS u
  FROM base b JOIN norms n USING (vec_id)
),
vals AS MATERIALIZED (
  SELECT vec_id,
         CAST((d - 1) // 16 AS INTEGER) AS sub,
         CAST((d - 1) % 16 AS INTEGER) AS pos,
         CAST(ROUND(u[d] * 1048576) AS BIGINT) AS x
  FROM uv, UNNEST(range(1, len(u) + 1)) r(d)
),
seeds AS MATERIALIZED (
  SELECT vec_id AS cid,
         CAST(ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS INTEGER) AS idx
  FROM (SELECT vec_id,
               ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM base)
  ORDER BY h, vec_id LIMIT 16
),
c0 AS MATERIALIZED (
  SELECT v.sub, s.idx, v.pos, v.x AS c
  FROM vals v JOIN seeds s ON v.vec_id = s.cid
),
d0 AS MATERIALIZED (
  SELECT v.vec_id, v.sub, c.idx, SUM((v.x - c.c) * (v.x - c.c)) AS d2
  FROM vals v JOIN c0 c ON c.sub = v.sub AND c.pos = v.pos
  GROUP BY 1, 2, 3
),
a0 AS MATERIALIZED (
  SELECT vec_id, sub, idx AS code FROM (
    SELECT vec_id, sub, idx,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, idx) AS rn
    FROM d0) WHERE rn = 1
),
upd AS MATERIALIZED (
  SELECT a.sub, a.code AS idx, v.pos,
         CAST(FLOOR(CAST(SUM(v.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM a0 a JOIN vals v ON v.vec_id = a.vec_id AND v.sub = a.sub
  GROUP BY 1, 2, 3
),
c1 AS MATERIALIZED (
  SELECT c0.sub, c0.idx, c0.pos, COALESCE(u.c, c0.c) AS c
  FROM c0 LEFT JOIN upd u ON u.sub = c0.sub AND u.idx = c0.idx AND u.pos = c0.pos
),
d1 AS MATERIALIZED (
  SELECT v.vec_id, v.sub, c.idx, SUM((v.x - c.c) * (v.x - c.c)) AS d2
  FROM vals v JOIN c1 c ON c.sub = v.sub AND c.pos = v.pos
  GROUP BY 1, 2, 3
),
codes AS MATERIALIZED (
  SELECT vec_id, sub, idx AS code FROM (
    SELECT vec_id, sub, idx,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, idx) AS rn
    FROM d1) WHERE rn = 1
),
iseeds AS MATERIALIZED (
  SELECT vec_id AS cid,
         CAST(ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS INTEGER) AS list_id
  FROM (SELECT vec_id,
               ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM base)
  ORDER BY h, vec_id LIMIT 8
),
cents AS MATERIALIZED (
  SELECT s.list_id, b.e AS c FROM iseeds s JOIN base b ON b.vec_id = s.cid
),
cosims AS MATERIALIZED (
  SELECT b.vec_id, c.list_id,
         SUM(b.e[d] * c.c[d])
           / (SQRT(SUM(b.e[d] * b.e[d])) * SQRT(SUM(c.c[d] * c.c[d]))) AS cs
  FROM base b, cents c, UNNEST(range(1, len(b.e) + 1)) r(d)
  GROUP BY 1, 2
),
asg AS MATERIALIZED (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, list_id DESC) AS rn
    FROM cosims) WHERE rn = 1
),
probes AS MATERIALIZED (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT vec_id, list_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, list_id DESC) AS rn
    FROM cosims WHERE vec_id < 10) WHERE rn <= 4
),
qt AS MATERIALIZED (
  SELECT vec_id AS query_id, sub, idx AS code, d2 FROM d1 WHERE vec_id < 10
),
adc AS (
  SELECT q.query_id, k.vec_id AS neighbor_id, SUM(q.d2) AS adc_dist
  FROM codes k
  JOIN asg a ON a.vec_id = k.vec_id
  JOIN probes p ON p.list_id = a.list_id
  JOIN qt q ON q.sub = k.sub AND q.code = k.code AND q.query_id = p.query_id
  WHERE k.vec_id <> q.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist,
       CAST(rn AS INTEGER) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, neighbor_id) AS rn
      FROM adc)
WHERE rn <= 5
ORDER BY query_id, rank
"""


def q_ivfpq_ann_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted IVF-PQ lifecycle END TO END (r14) — the composed
    family gets the same build-once/query-many + daily-increment story
    as its parents, plus the contracts only the composition has.
    Driver-attested, on the embeddings table:

    - planted-twin exactness: a bit-identical copy of a corpus vector
      probes its source's own list at n_probe=1 (same argmax kernel)
      and its ADC distance is provably minimal (its codes are the
      argmin encoding of itself), so top-1 recovery is exact — in ADC
      mode AND after the exact cosine re-rank (cosine ≈ 1);
    - persisted round trip: the ``index=`` path with the manifest's
      splatted params returns row-for-row the in-memory build's ADC
      result (integer ADC — parquet round-trips exactly);
    - append parity + replay: an increment encoded through
      ``append_to_ivfpq_index`` lands with both frozen-quantizer
      columns populated, and a replayed append with dedupe=True adds 0;
    - compact restores one data file per list directory without
      changing a single result row."""
    import os
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    n_twins = 10
    twins = emb.filter(F.col("vec_id") < n_twins).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    # r14 optimization (guide §5): the built index feeds FOUR actions below
    # (two twin counts, the inline collect, the persist write) — without the
    # pin each one replays the whole build (IVF seeding + assign pass + PQ
    # Lloyd chain + codes join). materialize_index computes it once;
    # bit-identical rows by construction (deterministic build, and a local
    # checkpoint only stores what the lazy plan would produce).
    # r14 opt pass 2 (guide §2.6): the roundtrip block and the maintenance
    # block share nothing (separate builds, separate tmp trees) — run them
    # as two concurrent driver threads, and fan the independent actions
    # inside each block out with _par. Same actions, same rows.
    queries = emb.filter(F.col("vec_id") < 5)

    def roundtrip_block():
        idx = SIM.materialize_index(
            SIM.build_ivfpq_index(emb, n_lists=8, m=4, pq_k=16), eager=True
        )

        def twin_adc_n():
            return SIM.ivfpq_ann_topk(
                twins, idx, k=1, n_probe=1, scorer="hof"
            ).filter(
                (F.col("rank") == 1)
                & (F.col("neighbor_id") == F.col("query_id") - 1_000_000)
            ).count()

        def twin_rr_n():
            return SIM.ivfpq_ann_topk(
                twins, idx, k=1, n_probe=1, rerank=8, scorer="hof"
            ).filter(
                (F.col("rank") == 1)
                & (F.col("neighbor_id") == F.col("query_id") - 1_000_000)
                & (F.col("cosine") > 0.999999)
            ).count()

        def inline_rows():
            return sorted(
                map(tuple, SIM.ivfpq_ann_topk(
                    queries, idx, k=5, n_probe=6, scorer="hof"
                ).collect())
            )

        root = tempfile.mkdtemp(prefix="ivfpq_q_idx_")
        try:
            adc_n, rr_n, inline, _ = _par(
                twin_adc_n, twin_rr_n, inline_rows,
                lambda: SIM.persist_ivfpq_index(
                    idx, root, m=4, pq_k=16, mode="overwrite"
                ),
            )
            loaded, params = SIM.load_ivfpq_index(spark, root)
            persisted = sorted(
                map(tuple, SIM.ivfpq_ann_topk(
                    queries, loaded, k=5, n_probe=6, scorer="hof", **params
                ).collect())
            )
            roundtrip_ok = persisted == inline
        finally:
            shutil.rmtree(root, ignore_errors=True)
        return adc_n == n_twins, rr_n == n_twins, roundtrip_ok

    def maintenance_block():
        root = tempfile.mkdtemp(prefix="ivfpq_q_maint_")
        try:
            SIM.persist_ivfpq_index(
                SIM.materialize_index(
                    SIM.build_ivfpq_index(base, n_lists=8, m=4, pq_k=16),
                    eager=True,
                ),
                root, m=4, pq_k=16, mode="overwrite",
            )
            appended = SIM.append_to_ivfpq_index(spark, root, batch, dedupe=True)
            replayed = SIM.append_to_ivfpq_index(spark, root, batch, dedupe=True)
            # r15: ONE load feeds both read-only checks below — the `before`
            # thunk used to re-load the identical tree (second manifest read
            # + parquet defs) for no reason (guide §1.2)
            loaded, params = SIM.load_ivfpq_index(spark, root)
            entries = loaded[2]
            appended_complete_n, before = _par(
                lambda: entries.filter(
                    (F.col("vec_id") % 2 == 1)
                    & (F.col("list_id").isNotNull())
                    & (F.col("codes").isNotNull())
                ).count(),
                lambda: sorted(
                    map(tuple, SIM.ivfpq_ann_topk(
                        queries, loaded,
                        k=5, n_probe=6, scorer="hof", **params,
                    ).collect())
                ),
            )
            appended_complete = appended_complete_n == appended
            SIM.compact_ivfpq_index(spark, root)
            one_file_per_dir = all(
                sum(1 for f in files if f.endswith(".parquet")) <= 1
                for _, _, files in os.walk(os.path.join(root, "entries"))
            )
            after = sorted(
                map(tuple, SIM.ivfpq_ann_topk(
                    queries, SIM.load_ivfpq_index(spark, root)[0],
                    k=5, n_probe=6, scorer="hof", **params,
                ).collect())
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
        return appended, replayed, appended_complete, one_file_per_dir, before == after

    (
        (twin_adc_ok, twin_rerank_ok, roundtrip_ok),
        (appended, replayed, appended_complete, one_file_per_dir, results_stable),
    ) = _par(roundtrip_block, maintenance_block)
    return spark.createDataFrame(
        [(
            bool(twin_adc_ok), bool(twin_rerank_ok), bool(roundtrip_ok),
            int(appended), int(replayed), bool(appended_complete),
            bool(one_file_per_dir), bool(results_stable),
        )],
        "twin_adc_top1 boolean, twin_rerank_top1 boolean, "
        "persisted_equals_inline boolean, appended int, replayed int, "
        "append_rows_complete boolean, compact_restores_layout boolean, "
        "compact_preserves_results boolean",
    )


IVFPQ_ANN_PERSISTED_ORACLE = """
SELECT TRUE AS twin_adc_top1, TRUE AS twin_rerank_top1,
       TRUE AS persisted_equals_inline,
       CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS INTEGER) AS appended,
       0 AS replayed, TRUE AS append_rows_complete,
       TRUE AS compact_restores_layout, TRUE AS compact_preserves_results
FROM embeddings
"""



def q_sharded_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded IVF-PQ (r14 — ``similarity.build_sharded_ivfpq_index`` /
    ``sharded_ivfpq_ann_topk``): the full 100 TB composition — the
    sharded global probe budget bounds candidate ROWS per query at
    ~n_probe × 4096 at any corpus size, and the shared PQ codebook's
    codes bound candidate BYTES at m ints per row. Driver-attested
    contract, END TO END:

    - flat degeneration: 1 shard returns row-for-row the flat
      ``ivfpq_ann_topk`` result (ADC mode);
    - shard-independence at full budget: a probe budget covering every
      list returns the SAME ADC rows at 2 shards as flat — the codebook
      is trained on the whole corpus once, so codes and distances never
      depend on the hash split;
    - planted-twin exactness through the sharded path at the FULL probe
      budget (the global budget at small n_probe can rank another
      shard's centroid above the twin's source list — a property of
      cross-shard ranking, not an error; with every list probed, ADC
      minimality makes top-1 recovery provable);
    - persisted round trip (per-shard standalone ivfpq trees + top-level
      manifest) reproduces the in-memory partial-probe rows;
    - every shard honors one-data-file-per-list-directory."""
    import os
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    # r14 optimization (guide §5): `flat` feeds three actions and `two`
    # four (full-budget, twin, memory-roundtrip, persist) — pin each build
    # once instead of replaying it per action (see materialize_index;
    # results bit-identical, the builds are deterministic). r14 opt pass 2
    # (guide §2.6): the three builds are independent, and so are the six
    # check actions over the pinned builds — materialize eagerly in
    # parallel, then fan the checks out (_par; same actions, same rows).
    flat, one, two = _par(
        lambda: SIM.materialize_index(
            SIM.build_ivfpq_index(emb, n_lists=6, m=4, pq_k=16), eager=True
        ),
        lambda: SIM.materialize_index(
            SIM.build_sharded_ivfpq_index(
                emb, n_shards=1, n_lists=6, m=4, pq_k=16
            ),
            eager=True,
        ),
        lambda: SIM.materialize_index(
            SIM.build_sharded_ivfpq_index(
                emb, n_shards=2, n_lists=6, m=4, pq_k=16
            ),
            eager=True,
        ),
    )

    n_twins = 10
    twins = emb.filter(F.col("vec_id") < n_twins).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    root = tempfile.mkdtemp(prefix="sivfpq_q_")
    try:
        # r15 (guide §2.6): the persist only reads the pinned `two` build,
        # exactly like the six read-only checks — run it in the same
        # fan-out instead of as a serial tail (same writes, same rows;
        # the persisted tree is only read after the fan-out joins).
        f_adc, s_adc, full_flat, full_two, n_twin_hits, mem, _ = _par(
            lambda: sorted(map(tuple, SIM.ivfpq_ann_topk(
                queries, flat, k=5, n_probe=4, scorer="hof").collect())),
            lambda: sorted(map(tuple, SIM.sharded_ivfpq_ann_topk(
                queries, one, k=5, n_probe=4, scorer="hof").collect())),
            lambda: sorted(map(tuple, SIM.ivfpq_ann_topk(
                queries, flat, k=5, n_probe=6, scorer="hof").collect())),
            lambda: sorted(map(tuple, SIM.sharded_ivfpq_ann_topk(
                queries, two, k=5, n_probe=12, scorer="hof").collect())),
            lambda: SIM.sharded_ivfpq_ann_topk(
                twins, two, k=1, n_probe=12, rerank=8, scorer="hof"
            ).filter(
                (F.col("rank") == 1)
                & (F.col("neighbor_id") == F.col("query_id") - 1_000_000)
                & (F.col("cosine") > 0.999999)
            ).count(),
            lambda: sorted(map(tuple, SIM.sharded_ivfpq_ann_topk(
                queries, two, k=5, n_probe=6, scorer="hof").collect())),
            lambda: SIM.persist_sharded_ivfpq_index(
                two, root, m=4, pq_k=16, mode="overwrite"
            ),
        )
        flat_degeneration = f_adc == s_adc
        shard_independent = full_flat == full_two
        twin_ok = n_twin_hits == n_twins

        loaded, params = SIM.load_sharded_ivfpq_index(spark, root)
        per = sorted(map(tuple, SIM.sharded_ivfpq_ann_topk(
            queries, loaded, k=5, n_probe=6, scorer="hof", **params
        ).collect()))
        persisted_ok = per == mem
        one_file_per_dir = all(
            sum(1 for f in files if f.endswith(".parquet")) <= 1
            for s in range(2)
            for _, _, files in os.walk(
                os.path.join(root, f"shard={s:05d}", "entries")
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(
            bool(flat_degeneration), bool(shard_independent), bool(twin_ok),
            bool(persisted_ok), bool(one_file_per_dir),
        )],
        "flat_degeneration boolean, shard_independent boolean, "
        "twin_rerank_top1 boolean, persisted_equals_memory boolean, "
        "one_file_per_dir boolean",
    )


SHARDED_IVFPQ_ANN_ORACLE = """
SELECT TRUE AS flat_degeneration, TRUE AS shard_independent,
       TRUE AS twin_rerank_top1, TRUE AS persisted_equals_memory,
       TRUE AS one_file_per_dir
FROM embeddings LIMIT 1
"""



def q_cosine_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for cosine near-dup pairs (VERDICT r1 #3): multi-table
    hyperplane-LSH buckets + exact cosine verification, checked for FULL
    equality against the exact crossJoin oracle. 16 tables × 2 planes give
    per-pair miss probability < 1e-4 at cosine 0.5, so the deterministic run
    matches the exact result; the crossJoin variant (``cosine_pairs``)
    remains the recall baseline.

    The equality check runs on the vec_id < 250 slice at threshold 0.4
    (13 true pairs at sf0.01 — non-vacuous, unlike the lone ≥0.5 pair which
    falls outside the slice): the 16-table candidate set deliberately does
    MORE work than the crossJoin (that redundancy IS the near-certain-recall
    contract — per-pair miss ≈ 3e-4 at cosine 0.4), so the slice keeps the
    driver's sf0.01 sweep cheap — quartering the quadratic pair volume —
    without weakening what is proven (every bucket table and verify step
    still executes on 250 real vectors and must emit every true pair)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 250)
    out = D.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, n_planes=2, n_tables=16,
        scorer="hof",
    )
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


COSINE_PAIRS_LSH_ORACLE = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE vec_id < 250)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.e, b.e) /
             (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6)
         AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.e, b.e) /
      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.4
"""


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl-shaped ingest through the REAL WARC source: serialize
    documents (doc_id < 200) into valid WARC/1.0 files — one shard gzipped
    member-per-record, as crawlers emit — then read them back through
    ``sources.warc.read_warc`` (binaryFile scan → Arrow mapInPandas record
    parser) and project per-record facts. The oracle recomputes url /
    status / byte-length / md5 from the documents table directly, so the
    length-delimited framing, HTTP payload split, and utf-8 decode must
    all round-trip exactly.

    Fixture synthesis is a bounded driver-side build (200 slim rows), the
    same planning-time budget as the defs loaders; the READ under test is
    fully distributed."""
    import gzip as _gzip
    import tempfile

    from ..sources.warc import read_warc, warc_bytes

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
        .collect()
    )
    recs = [
        {
            "url": f"http://corpus.example/doc/{r['doc_id']}",
            "date": "2026-01-01T00:00:00Z",
            "body": r["text"],
        }
        for r in sorted(docs, key=lambda r: r["doc_id"])
    ]
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_warc_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    os.makedirs(out_dir, exist_ok=True)
    # 4 shards: 3 plain + 1 gzipped (both container paths exercised)
    shards = [recs[i::4] for i in range(4)]
    for i, shard in enumerate(shards[:3]):
        with open(os.path.join(out_dir, f"part-{i}.warc"), "wb") as fh:
            fh.write(warc_bytes(shard))
    with open(os.path.join(out_dir, "part-3.warc.gz"), "wb") as fh:
        fh.write(b"".join(_gzip.compress(warc_bytes([r])) for r in shards[3]))

    good, _bad = read_warc(spark, out_dir)
    return good.select(
        "url",
        "http_status",
        "n_bytes",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    )


WARC_INGEST_ORACLE = """
SELECT 'http://corpus.example/doc/' || doc_id AS url,
       CAST(200 AS INTEGER) AS http_status,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS text_md5
FROM documents WHERE doc_id < 200
"""


def _synth_html_col() -> F.Column:
    """Deterministic messy-HTML page per document (built-ins only): head
    with title/style/script (the script quotes ``</p>`` and contains a bare
    ``<`` — early-termination traps), a comment hiding markup, an
    uppercase-tag nav with two links, entity soup, and body paragraphs
    sliced from ``text``.  Shared by q_html_extract and q_web_pipeline."""
    did = F.col("doc_id")
    return F.concat(
        F.lit("<!DOCTYPE html>\n<html>\n<head>\n  <title> Doc "),
        did,
        F.lit(" </title>\n  <style type=\"text/css\">body { color: #000; } .nav > a { content: \"<p>\"; }</style>\n"),
        F.lit("  <script type=\"text/javascript\">\n    var s = \"</p>\"; if (1 < 2) { s = \"<b>x</b>\"; }\n  </script>\n"),
        F.lit("</head>\n<body>\n<!-- build "),
        did,
        F.lit(" <p>hidden</p> -->\n<div class=\"nav\"><a href=\"http://site"),
        F.pmod(did, F.lit(7)),
        F.lit(".example/home\">Home</a> &amp; <A HREF=\"/about\">About</A></div>\n<h1> Doc "),
        did,
        F.lit(" </h1>\n<p>"),
        F.substring(F.col("text"), 1, 40),
        F.lit("</p>\n<P>"),
        F.substring(F.col("text"), 41, 80),
        F.lit("</P>\n<p>Entities &amp; &lt;tags&gt; &quot;quoted&#39;s&quot;&nbsp;ok</p>\n"),
        F.when(
            F.length("text") > 120,
            F.concat(
                F.lit("<p>"), F.expr("substring(text, 121, 100000)"), F.lit("</p>\n")
            ),
        ).otherwise(F.lit("")),
        F.lit("<br/>\n</body>\n</html>"),
    )


def q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal / main-content extraction (r6 —
    ``html.main_content``, the trafilatura/jusText step between raw HTML
    and line cleaning) over the same synthesized messy pages as
    `html_extract`: the nav bar must die by link density, the title/h1
    stubs by minimum length, the prose paragraphs survive.

    Like HTML_EXTRACT_ORACLE, the oracle does NOT mirror the regex chain:
    it reconstructs every block's visible text and anchor-char count
    independently from the documents table and replays only the two
    integer rules — the split/strip/decode pipeline must invert the page
    synthesis exactly."""
    from ..operators import html as HT

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    pages = docs.select("doc_id", _synth_html_col().alias("html"))
    return HT.main_content(pages, "doc_id", "html").orderBy("doc_id")


MAIN_CONTENT_ORACLE = """
WITH d AS (
  SELECT doc_id, 'Doc ' || doc_id AS t,
         trim(substr(text, 1, 40)) AS p1,
         trim(substr(text, 41, 80)) AS p2,
         CASE WHEN length(text) > 120 THEN trim(substr(text, 121, 100000))
              ELSE '' END AS p3
  FROM documents WHERE doc_id < 400
),
b AS (
  SELECT doc_id,
         [{'txt': t, 'lc': 0},
          {'txt': 'Home & About', 'lc': 9},
          {'txt': t, 'lc': 0},
          {'txt': p1, 'lc': 0},
          {'txt': p2, 'lc': 0},
          {'txt': 'Entities & <tags> "quoted''s" ok', 'lc': 0},
          {'txt': p3, 'lc': 0}] AS blocks
  FROM d
),
ne AS (
  SELECT doc_id, list_filter(blocks, s -> s.txt <> '') AS blocks FROM b
),
c AS (
  SELECT doc_id, blocks,
         list_filter(blocks, s -> length(s.txt) >= 25
                              AND s.lc * 100 <= length(s.txt) * 33) AS keep
  FROM ne
)
SELECT doc_id,
       COALESCE(array_to_string(list_transform(keep, s -> s.txt), chr(10)),
                '') AS main_text,
       CAST(len(blocks) AS INTEGER) AS n_blocks,
       CAST(len(keep) AS INTEGER) AS n_content_blocks,
       CAST(length(COALESCE(array_to_string(list_transform(keep, s -> s.txt),
                                            chr(10)), '')) AS INTEGER)
         AS n_chars_main
FROM c
ORDER BY doc_id
"""


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction (``operators/html.py``) over deterministic
    messy pages synthesized from documents: script/style/comment traps,
    case-insensitive tags, entity decode order, block-structure newlines.

    The oracle does NOT mirror the regex chain — it reconstructs the
    expected title/link-count/plain-text *independently* from the documents
    table (the extraction must invert the synthesis exactly), so a quietly
    wrong pattern on either engine cannot self-confirm."""
    from ..operators import html as HT

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    pages = docs.select("doc_id", _synth_html_col().alias("html"))
    return HT.html_to_text(pages, "doc_id", "html")


HTML_EXTRACT_ORACLE = """
WITH d AS (
  SELECT doc_id, 'Doc ' || doc_id AS t,
         trim(substr(text, 1, 40)) AS p1,
         trim(substr(text, 41, 80)) AS p2,
         CASE WHEN length(text) > 120 THEN trim(substr(text, 121, 100000))
              ELSE '' END AS p3
  FROM documents WHERE doc_id < 400
)
SELECT doc_id,
       t AS title,
       CAST(2 AS INTEGER) AS n_links,
       array_to_string(
         list_filter(
           [t, 'Home & About', t, p1, p2,
            'Entities & <tags> "quoted''s" ok', p3],
           y -> y <> ''), chr(10)) AS text
FROM d
"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL dedup (``curation.url_dedup``) over messy URL
    variants synthesized per document: scheme/host case noise, ``www.``
    prefixes, explicit default ports, duplicate + trailing slashes,
    tracking params in shuffled order, fragments. Every variant family must
    collapse to one canonical form; the oracle reconstructs the canonical
    string and group stats *independently* from doc_id arithmetic, so the
    canonicalizer must invert the mess exactly."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    scheme = (
        F.when(did % 3 == 0, F.lit("http://"))
        .when(did % 3 == 1, F.lit("HTTP://"))
        .otherwise(F.lit("https://"))
    )
    host = F.when(
        did % 2 == 0,
        F.concat(F.lit("WWW.Site"), did % 20 % 5, F.lit(".Example.com")),
    ).otherwise(F.concat(F.lit("site"), did % 20 % 5, F.lit(".example.com")))
    port = F.when(
        (did % 4 == 0) & (did % 3 != 2), F.lit(":80")
    ).when((did % 4 == 0) & (did % 3 == 2), F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/articles//"),
        did % 20,
        F.when(did % 2 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = (
        F.when(did % 3 == 0, F.lit("?utm_source=x&b=2&a=1"))
        .when(did % 3 == 1, F.lit("?a=1&b=2&fbclid=zz"))
        .otherwise(F.lit("?b=2&a=1"))
    )
    frag = F.when(did % 5 == 0, F.lit("#sec")).otherwise(F.lit(""))
    urls = docs.select(
        "doc_id", F.concat(scheme, host, port, path, query, frag).alias("url")
    )
    return CU.url_dedup(urls, "doc_id", "url")


URL_DEDUP_ORACLE = """
WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 2 THEN 'https' ELSE 'http' END AS s,
         doc_id % 20 AS m
  FROM documents
)
SELECT s || '://site' || (m % 5) || '.example.com/articles/' || m
         || '?a=1&b=2' AS canonical_url,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_dups
FROM u GROUP BY s, m
"""


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dataset contamination estimate via KMV sketches
    (``operators/sketches.py``): 3-gram shingle overlap between the
    even-doc_id and odd-doc_id corpus halves, k=256. Deterministic given
    the data (md5-derived hashes, exact integer order), so the oracle
    recomputes the ENTIRE sketch pipeline — per-side k-minima, union
    sample, membership fractions, KMV distinct estimators — and must
    hash-match every column."""
    from ..operators import sketches as SK

    docs = load_table(spark, sf_dir, "documents")
    return SK.corpus_overlap(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "text",
        k=256,
    )


KMV_OVERLAP_ORACLE = """
WITH toks AS (
  SELECT doc_id, doc_id % 2 AS side,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
),
e AS (SELECT doc_id, side, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
sh AS (
  SELECT DISTINCT a.side, a.w || ' ' || b.w || ' ' || c.w AS s
  FROM e a
  JOIN e b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN e c ON c.doc_id = a.doc_id AND c.i = a.i + 2
),
h AS (SELECT side, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h FROM sh),
ska AS (SELECT DISTINCT h FROM h WHERE side = 0 ORDER BY h LIMIT 256),
skb AS (SELECT DISTINCT h FROM h WHERE side = 1 ORDER BY h LIMIT 256),
na AS (SELECT COUNT(*) AS n, MAX(h) AS mx FROM ska),
nb AS (SELECT COUNT(*) AS n, MAX(h) AS mx FROM skb),
uk AS (SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb) ORDER BY h LIMIT 256),
j AS (
  SELECT ROUND(CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                             THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
           AS est_jaccard
  FROM uk LEFT JOIN ska a ON a.h = uk.h LEFT JOIN skb b ON b.h = uk.h
)
SELECT CAST(256 AS INTEGER) AS k,
       CAST(na.n AS BIGINT) AS n_a,
       CAST(nb.n AS BIGINT) AS n_b,
       ROUND(CASE WHEN na.n < 256 THEN CAST(na.n AS DOUBLE)
                  ELSE 255.0 * 1152921504606846976.0 / CAST(na.mx AS DOUBLE)
             END, 4) AS est_distinct_a,
       ROUND(CASE WHEN nb.n < 256 THEN CAST(nb.n AS DOUBLE)
                  ELSE 255.0 * 1152921504606846976.0 / CAST(nb.mx AS DOUBLE)
             END, 4) AS est_distinct_b,
       j.est_jaccard
FROM na, nb, j
"""


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle (``textops.global_shuffle``,
    md5 oracle variant): every document gets a reproducible (shard, pos)
    coordinate; the oracle recomputes key/shard/position with the identical
    hash and window, so shard assignment AND intra-shard order must match
    exactly."""
    docs = load_table(spark, sf_dir, "documents")
    out = TX.global_shuffle(docs, "doc_id", seed=7, n_shards=8, hash_fn="md5")
    return out.select("doc_id", "shard", "pos")


CORPUS_SHUFFLE_ORACLE = """
WITH k AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(doc_id || '#7'), 1, 15) AS BIGINT) AS key
  FROM documents
)
SELECT doc_id,
       CAST(key % 8 AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY key % 8 ORDER BY key, doc_id) - 1
            AS BIGINT) AS pos
FROM k
"""


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup spans (``dedup.duplicate_substring_spans``,
    ACL'22 recipe, md5 oracle variant, window=8): every 8-token sequence
    occurring more than once in the corpus, with the globally-first
    occurrence kept and the rest merged into removable (start, end) token
    spans. The documents word-soup has ~2k organically duplicated 8-token
    windows at sf0.01, so the result is non-vacuous. The oracle recomputes
    windows, keeper election, and island merge independently in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return D.duplicate_substring_spans(
        docs, "doc_id", "text", window=8, hash_fn="md5"
    )


SUBSTRING_DEDUP_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
),
win AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i, t
  FROM toks
),
g AS (
  SELECT doc_id, i,
         CAST('0x' || substr(md5(array_to_string(list_slice(t, i, i + 7), ' ')), 1, 15)
              AS BIGINT) AS h
  FROM win
),
d2 AS (
  SELECT doc_id, i,
         COUNT(*) OVER (PARTITION BY h) AS c,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
  FROM g
),
rem AS (SELECT doc_id, i FROM d2 WHERE c > 1 AND rn > 1),
isl AS (
  SELECT doc_id, i,
         CASE WHEN i > COALESCE(MAX(i + 7) OVER (
                  PARTITION BY doc_id ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM rem
),
isl2 AS (
  SELECT doc_id, i,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM isl
)
SELECT doc_id,
       CAST(MIN(i) AS BIGINT) AS span_start,
       CAST(MAX(i) + 7 AS BIGINT) AS span_end,
       COUNT(*) AS n_windows
FROM isl2 GROUP BY doc_id, island
"""


def q_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor extraction (``html.extract_links``) over the synthesized
    pages: every page carries exactly two quoted anchors (one absolute with
    a doc_id-derived host, one relative), with uppercase-tag and
    entity-in-markup traps upstream. The oracle reconstructs the full edge
    list from doc_id arithmetic."""
    from ..operators import html as HT

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    pages = docs.select("doc_id", _synth_html_col().alias("html"))
    return HT.extract_links(pages, "doc_id", "html")


LINK_GRAPH_ORACLE = """
SELECT doc_id, 'http://site' || (doc_id % 7) || '.example/home' AS href,
       'Home' AS anchor_text
FROM documents WHERE doc_id < 400
UNION ALL
SELECT doc_id, '/about' AS href, 'About' AS anchor_text
FROM documents WHERE doc_id < 400
"""


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill resampling (``temporal.resample_ffill``): user_id < 20
    event series onto an hourly grid, last observation carried forward.
    The oracle rebuilds grid + carry with DuckDB's generate_series and an
    IGNORE NULLS window — identical union-stream trick, hash-exact."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    out = T.resample_ffill(ev, "user_id", "ts", "value", step="1 hour")
    return out.select("user_id", "ts", F.round("value", 6).alias("value"))


RESAMPLE_FFILL_ORACLE = """
WITH ev AS (SELECT user_id, ts, value FROM events WHERE user_id < 20),
grid AS (
  SELECT user_id,
         unnest(generate_series(date_trunc('hour', MIN(ts)), MAX(ts),
                                INTERVAL 1 HOUR)) AS ts
  FROM ev GROUP BY user_id
),
u AS (
  SELECT user_id, ts, value, 1 AS is_obs FROM ev
  UNION ALL
  SELECT user_id, ts, CAST(NULL AS DOUBLE) AS value, 0 AS is_obs FROM grid
),
filled AS (
  SELECT user_id, ts, is_obs,
         LAST_VALUE(value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, is_obs DESC, value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
  FROM u
)
SELECT user_id, ts, ROUND(f, 6) AS value FROM filled WHERE is_obs = 0
"""


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (``similarity.quantize_int8``)
    over the embeddings table — every lane reproduced exactly by the
    oracle's identical IEEE max/divide/round chain."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.quantize_int8(emb, "vec_id", "embedding")
    return out.select(
        "vec_id",
        F.array_join(F.col("qvec"), ",").alias("qvec"),
        F.round("scale", 9).alias("scale"),
    )


QUANTIZE_EMB_ORACLE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                       x -> abs(x)), 'max') AS mx
  FROM embeddings
)
SELECT vec_id,
       array_to_string(
         CASE WHEN mx > 0
              THEN list_transform(e, x -> CAST(round(x * 127.0 / mx) AS INTEGER))
              ELSE list_transform(e, x -> 0) END, ',') AS qvec,
       ROUND(CASE WHEN mx > 0 THEN mx / 127.0 ELSE 0.0 END, 9) AS scale
FROM v
"""


def q_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row ids (``textops.assign_row_ids``) over events
    ordered by (ts, event_id) — the two-phase range-partition + offset
    recipe whose ids must equal a naive global ROW_NUMBER exactly (range
    boundaries move work, never ids). That equality IS the oracle."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    out = TX.assign_row_ids(ev, ["ts", "event_id"], n_partitions=8)
    return out.select("event_id", "row_id")


ROW_IDS_ORACLE = """
SELECT event_id,
       ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS row_id
FROM events WHERE user_id < 100
"""


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE (``operators/bpe.py``): train 30 merges on the
    doc_id < 50 slice, tokenize it via the trained-vocab join path.

    Fully oracled (r6): the DuckDB oracle REPLAYS THE WHOLE TRAINING as
    30 unrolled CTE stages — pair stats over the (word, count) vocabulary,
    total-order argmax (count desc, pair asc), then the greedy
    left-to-right merge fold expressed as a ``list_reduce`` over each
    word's symbol list — the same technique as the unrolled PageRank/LPA
    oracles, so both the trained merges AND the tokenization must
    hash-match exactly. tests/test_bpe.py additionally pins exact
    equality with a pure-Python reference implementation."""
    from ..operators import bpe as B

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    merges, vocab = B.train_bpe(docs, "text", num_merges=30)
    out = B.apply_bpe(docs, "doc_id", "text", merges, vocab_df=vocab)
    return out.select(
        "doc_id", "word_idx", F.array_join("pieces", " ").alias("pieces")
    )


def _bpe_oracle(num_merges: int = 30) -> str:
    """Unrolled BPE training + apply in pure SQL.

    Symbol sequences are prefix-space-joined strings (`` a b c ▁``): the
    leading delimiter makes every symbol boundary explicit without a
    trailing one to consume, and the merge application is a left fold
    over the symbol list whose accumulator is the joined string —
    ``ends_with(acc, ' '||l) AND x = r`` is exact (symbols contain no
    spaces), reproducing ``operators/bpe._merge_fold`` semantics
    including the no-re-merge-of-own-output rule (l||r can never equal
    l or r). Iterations where the best pair count drops below 2 are
    guarded no-ops, mirroring train_bpe's early break."""
    fold = (
        "list_reduce(list_prepend('', string_split(substr(s, 2), ' ')), "
        "(acc, x) -> CASE WHEN x = b.r AND ends_with(acc, ' ' || b.l) "
        "THEN substr(acc, 1, length(acc) - length(b.l) - 1) || ' ' || b.l || x "
        "ELSE acc || ' ' || x END)"
    )
    ctes = [
        "toks AS (SELECT doc_id, "
        "list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'),"
        " ' '), x -> x <> '') AS t "
        "FROM documents WHERE doc_id < 50)",
        "words AS (SELECT doc_id, CAST(j - 1 AS INTEGER) AS word_idx, t[j] AS"
        " word FROM toks, UNNEST(range(1, len(t) + 1)) rr(j))",
        "v0 AS (SELECT word, COUNT(*) AS cnt, "
        "regexp_replace(word, '(.)', ' \\1', 'g') || ' ▁' AS s "
        "FROM words GROUP BY word)",
    ]
    for i in range(1, num_merges + 1):
        # AS MATERIALIZED: each stage references its predecessor twice
        # (pair stats + merge application); inlined CTEs would blow up
        # 2^num_merges references to the base scan.
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT t[j] AS l, t[j + 1] AS r, "
            "SUM(cnt) AS n "
            f"FROM (SELECT cnt, string_split(substr(s, 2), ' ') AS t "
            f"FROM v{i - 1}), "
            "UNNEST(range(1, greatest(len(t), 1))) rr(j) GROUP BY 1, 2)"
        )
        ctes.append(
            f"b{i} AS MATERIALIZED (SELECT l, r, n FROM p{i} "
            "ORDER BY n DESC, l, r LIMIT 1)"
        )
        ctes.append(
            f"v{i} AS MATERIALIZED (SELECT word, cnt, "
            f"CASE WHEN b.n >= 2 THEN {fold} ELSE s END AS s "
            f"FROM v{i - 1} LEFT JOIN b{i} b ON TRUE)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT w.doc_id, w.word_idx, substr(v.s, 2) AS pieces"
        f"\nFROM words w JOIN v{num_merges} v USING (word)"
        "\nORDER BY w.doc_id, w.word_idx"
    )


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (``dq.numeric_histogram``) of events.value, 16
    bins over the observed min/max. The oracle repeats the identical IEEE
    double arithmetic (same op order), so bin boundaries and counts must
    hash-match exactly."""
    ev = load_table(spark, sf_dir, "events")
    out = DQ.numeric_histogram(ev, "value", bins=16)
    return out.select("bin", F.round("lo", 6).alias("lo"),
                      F.round("hi", 6).alias("hi"), "n")


VALUE_HISTOGRAM_ORACLE = """
WITH b AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events
           WHERE value IS NOT NULL),
binned AS (
  SELECT CASE WHEN b.mx = b.mn THEN 0
              ELSE LEAST(15, CAST(FLOOR((e.value - b.mn) / ((b.mx - b.mn) / 16))
                                  AS INTEGER)) END AS bin,
         b.mn, b.mx
  FROM events e CROSS JOIN b WHERE e.value IS NOT NULL
)
SELECT bin,
       ROUND(mn + (bin * (mx - mn)) / 16, 6) AS lo,
       ROUND(mn + ((bin + 1) * (mx - mn)) / 16, 6) AS hi,
       COUNT(*) AS n
FROM binned GROUP BY bin, mn, mx
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (``graph.pagerank``) over a deterministic synthetic link
    graph: nodes = doc_id < 50, three out-links per node at
    (31·id + 7k) mod 50 — present identically at every sf. Fixed-point
    integer arithmetic makes the 5-iteration loop bit-exact, so the oracle
    UNROLLS the same five iterations as SQL CTEs and must match
    ``rank_units`` exactly — an iterative algorithm held to a hash-exact
    contract, not a rows-only one."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(*[((F.col("doc_id") * 31 + 7 * k) % 50) for k in (1, 2, 3)])
        ).alias("dst"),
    )
    out = G.pagerank(edges, iterations=5)
    return out.select("id", "rank_units")


def _pagerank_oracle(iterations: int = 5, n: int = 50, scale: int = 10**12) -> str:
    """Unrolled-iteration DuckDB mirror of q_pagerank (standard SQL forbids
    aggregation in a recursive CTE member, so fixed iterations unroll)."""
    base = (15 * scale) // (100 * n)
    r0 = scale // n
    ctes = [
        f"nodes AS (SELECT DISTINCT dst AS id FROM (SELECT doc_id AS src, "
        f"unnest([(doc_id*31+7)%{n}, (doc_id*31+14)%{n}, (doc_id*31+21)%{n}]) AS dst "
        f"FROM documents WHERE doc_id < {n}) UNION "
        f"SELECT DISTINCT doc_id FROM documents WHERE doc_id < {n})",
        f"edges AS (SELECT doc_id AS src, "
        f"unnest([(doc_id*31+7)%{n}, (doc_id*31+14)%{n}, (doc_id*31+21)%{n}]) AS dst "
        f"FROM documents WHERE doc_id < {n})",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        f"r0 AS (SELECT id, CAST({r0} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(iterations):
        # every node has out-links in this graph, so the dangling term is 0
        ctes.append(
            f"r{i + 1} AS (SELECT n.id, CAST({base} + (85 * COALESCE(c.contrib, 0)) // 100 "
            f"AS BIGINT) AS rank FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS id, SUM(r.rank // d.deg) AS contrib "
            f"FROM r{i} r JOIN edges e ON e.src = r.id JOIN deg d ON d.src = e.src "
            f"GROUP BY e.dst) c ON c.id = n.id)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, rank AS rank_units FROM r{iterations}"
    )


PAGERANK_ORACLE = _pagerank_oracle()


def q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity filtering (``textops.perplexity_scores``): bigram
    LM trained on the lang='en' slice, every document scored by average
    log10 likelihood and NTILE'd into head/middle/tail. Exact decimals for
    the sums, one double division for the average, total-order NTILE —
    hash-exact across engines despite being an LM scoring pass."""
    docs = load_table(spark, sf_dir, "documents")
    out = TX.perplexity_scores(
        docs,
        "doc_id",
        "text",
        reference=docs.filter(F.col("lang") == "en"),
        n_buckets=3,
    )
    return out.select(
        "doc_id",
        "n_bigrams",
        F.col("sum_logp10").cast("string").alias("sum_logp10"),
        "avg_logp10",
        "bucket",
    )


PERPLEXITY_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS t
  FROM documents
),
e AS (SELECT doc_id, lang, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
bg AS (
  SELECT a.doc_id, a.lang, a.w AS w1, b.w AS w2
  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg WHERE lang = 'en' GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg WHERE lang = 'en' GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w) AS v FROM e WHERE lang = 'en'),
term AS (
  SELECT d.doc_id,
         CAST(ROUND(log10(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
                          / CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)), 6)
              AS DECIMAL(28,6)) AS logp
  FROM bg d
  LEFT JOIN c2 ON c2.w1 = d.w1 AND c2.w2 = d.w2
  LEFT JOIN c1 ON c1.w1 = d.w1
  CROSS JOIN v
),
sc AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         CAST(SUM(logp) AS DECIMAL(28,6)) AS s
  FROM term GROUP BY doc_id
),
out AS (
  SELECT d0.doc_id,
         COALESCE(sc.n_bigrams, 0) AS n_bigrams,
         sc.s AS sum_logp10,
         -- exact integer micro-units; // on the POSITIVE magnitude matches
         -- Spark's truncating DIV (they differ on negatives)
         -((-CAST(sc.s * 1000000 AS BIGINT)) // sc.n_bigrams) AS avg_micro
  FROM (SELECT doc_id FROM documents) d0 LEFT JOIN sc ON sc.doc_id = d0.doc_id
)
SELECT doc_id, n_bigrams, CAST(sum_logp10 AS VARCHAR) AS sum_logp10,
       CAST(avg_micro AS DOUBLE) / 1000000.0 AS avg_logp10,
       CAST(NTILE(3) OVER (ORDER BY avg_micro DESC NULLS LAST, doc_id) AS INTEGER)
         AS bucket
FROM out
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (``operators/mlquality.py``): fit the
    tokenize→HashingTF→IDF→LogisticRegression pipeline on a deterministic
    separable label (docs mentioning 'spark' or 'agg' — a learnable signal
    in the synthetic word-soup corpus), then score every document.

    Rows-only contract (the registry's declared non-SQL set, like
    image_phash_pairs): LBFGS training is iterative and not
    SQL-expressible; correctness is pinned by tests/test_mlquality.py
    (AUC≈1 on separable labels, fixed-seed determinism, holdout
    generalization)."""
    from ..operators import mlquality as ML

    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.withColumn(
        "label",
        (F.col("text").contains("spark") | F.col("text").contains("agg")).cast(
            "double"
        ),
    )
    model = ML.train_quality_classifier(
        labeled.filter(F.col("doc_id") % 5 != 0), "text", "label"
    )
    return ML.score_quality(model, docs, "doc_id").select("doc_id", "predicted")


# The hash-exact contract requires the Spark training run and the unrolled
# oracle to agree on EVERY hyperparameter; both sides draw from this one
# dict so a tweak cannot silently desync them.
_QE_PARAMS = dict(dim=64, iters=10, lr_shift=6, scale_bits=20, bias_x=16)


def q_quality_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ORACLED face of the quality classifier's FEATURE stage: the
    hashed bag-of-words projection (tokenize → 60-bit md5 bucket mod dim
    → per-doc counts) as its own registry entry, returning the exact
    (doc_id, j, x) feature rows ``fit_linear_quality_exact`` trains on.

    Adjudication note (r7 verdict task 4): the MLlib face
    (``quality_scores``) featurizes via HashingTF — murmur3, which DuckDB
    cannot compute — so ITS projection stays pinned by pytest, while this
    entry makes the engine-owned projection (the one the oracled
    ``quality_exact`` trainer consumes) hash-exact against SQL. Scale
    shape: one tokenize pass + one (doc, bucket) aggregation — map-side
    combinable, no join, no driver stage."""
    from ..operators.dedup import md5_60bit, tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("_w")
    )
    return (
        toks.groupBy(
            "doc_id",
            # modulus comes from the SAME dict quality_exact trains with —
            # a future dim change cannot desync the two faces (r9 ADVICE)
            F.pmod(md5_60bit(F.col("_w")), F.lit(_QE_PARAMS["dim"]))
            .cast("int").alias("j"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )


QUALITY_TF_ORACLE = """
WITH toks AS (SELECT doc_id,
  unnest(list_filter(string_split(regexp_replace(trim(text),
  '\\s+', ' ', 'g'), ' '), x -> x <> '')) AS t FROM documents)
SELECT doc_id,
       CAST(('0x' || substr(md5(t), 1, 15))::BIGINT % {dim} AS INTEGER) AS j,
       CAST(COUNT(*) AS BIGINT) AS x
FROM toks GROUP BY 1, 2
""".format(dim=_QE_PARAMS["dim"])


def q_quality_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ORACLED face of model-based quality scoring
    (``mlquality.fit_linear_quality_exact``): a hashed bag-of-words linear
    classifier trained by 10 full-batch gradient steps with a hard-sigmoid
    link, every quantity held in fixed-point BIGINT units — training is
    bit-identical across engines, so the DuckDB oracle UNROLLS the same
    ten iterations as CTEs and must hash-match ``logit_units`` exactly
    (the same contract escalation pagerank and bpe_tokenize made for
    their iterative loops).  The LBFGS MLlib face (``quality_scores``)
    stays rows-only; this face closes the "iterative training is never
    oracle-checkable" gap for the quality-classifier stage."""
    from ..operators import mlquality as ML

    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.withColumn(
        "label", (F.col("n_chars") >= 300).cast("double")
    )
    _, scores = ML.fit_linear_quality_exact(
        labeled, "doc_id", "text", "label", **_QE_PARAMS
    )
    return scores




def _quality_exact_oracle(
    iters: int, dim: int, lr_shift: int, scale_bits: int, bias_x: int
) -> str:
    """Unrolled fixed-point linear-classifier training in pure SQL.

    Mirrors ``mlquality.fit_linear_quality_exact`` stage for stage: md5
    token hashing mod ``dim`` (+ bias slot ``dim``), logits as
    Σ x·w over a (dim+1)-row weight relation, hard-sigmoid
    clamp(half + floor(lg/4), 0, one) in integer units, gradient
    Σ x·err per feature, update floor(g / (n_docs · 2^lr_shift)) — the
    averaged-gradient division is reproducible because both operands are
    exactly-representable in doubles, so the correctly-rounded IEEE
    quotient is identical in DuckDB and the JVM.  Intermediate sums may
    be HUGEINT (exact); the final projection casts to the Spark output
    schema (BIGINT logit_units, INTEGER label/pred)."""
    half, one = 1 << (scale_bits - 1), 1 << scale_bits
    step = float(1 << lr_shift)
    ctes = [
        "toks AS (SELECT doc_id, "
        "unnest(list_filter(string_split(regexp_replace(trim(text), "
        "'\\s+', ' ', 'g'), ' '), x -> x <> '')) AS t FROM documents)",
        "lab AS (SELECT doc_id, CASE WHEN n_chars >= 300 THEN 1 "
        "ELSE 0 END AS label FROM documents)",
        "feats AS MATERIALIZED (SELECT doc_id, "
        f"CAST(('0x' || substr(md5(t), 1, 15))::BIGINT % {dim} AS INTEGER)"
        " AS j, CAST(COUNT(*) AS BIGINT) AS x FROM toks GROUP BY 1, 2 "
        f"UNION ALL SELECT doc_id, {dim} AS j, CAST({bias_x} AS BIGINT) "
        "AS x FROM documents)",
        f"y AS (SELECT doc_id, CAST(label AS BIGINT) * {one} AS yu "
        "FROM lab)",
        f"w0 AS (SELECT CAST(i AS INTEGER) AS j, CAST(0 AS BIGINT) AS w "
        f"FROM range({dim + 1}) r(i))",
        "nn AS (SELECT COUNT(*) AS n FROM documents)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"l{i} AS (SELECT doc_id, SUM(x * w) AS lg FROM feats "
            f"JOIN w{i - 1} USING (j) GROUP BY doc_id)"
        )
        ctes.append(
            f"e{i} AS (SELECT doc_id, yu - LEAST(GREATEST({half} + "
            "CAST(FLOOR(lg / 4.0) AS BIGINT), 0), "
            f"{one}) AS e FROM l{i} JOIN y USING (doc_id))"
        )
        ctes.append(
            f"g{i} AS (SELECT j, SUM(x * e) AS g FROM feats "
            f"JOIN e{i} USING (doc_id) GROUP BY j)"
        )
        ctes.append(
            f"w{i} AS MATERIALIZED (SELECT w{i - 1}.j, w{i - 1}.w + "
            f"COALESCE(CAST(FLOOR(g / (nn.n * {step})) AS BIGINT), 0) AS w "
            f"FROM w{i - 1} LEFT JOIN g{i} USING (j) CROSS JOIN nn)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT f.doc_id, CAST(lab.label AS INTEGER) AS label,"
        "\n       CAST(SUM(f.x * w.w) AS BIGINT) AS logit_units,"
        "\n       CAST(SUM(f.x * w.w) > 0 AS INTEGER) AS pred"
        f"\nFROM feats f JOIN w{iters} w USING (j) "
        "JOIN lab ON lab.doc_id = f.doc_id"
        "\nGROUP BY f.doc_id, lab.label"
    )


QUALITY_EXACT_ORACLE = _quality_exact_oracle(**_QE_PARAMS)


def q_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END web ingestion: messy HTML pages (the q_html_extract
    synthesis) are serialized into real WARC/1.0 shards, read back through
    ``sources.warc.read_warc``, extracted with ``operators.html``, and
    reduced to per-page stats — WARC framing, HTTP payload split, utf-8
    decode, tag/entity extraction and tokenization all have to survive
    COMPOSITION, not just their individual oracles. The oracle reconstructs
    url/title/line/token counts independently from the documents table.

    Fixture synthesis is a bounded driver-side build (200 slim rows, the
    q_warc_ingest pattern); the read+extract under test is distributed."""
    import tempfile

    from ..operators import html as HT
    from ..operators.dedup import tokenize
    from ..sources.warc import read_warc, warc_bytes

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pages = (
        docs.select("doc_id", _synth_html_col().alias("html"))
        .orderBy("doc_id")
        .collect()
    )
    recs = [
        {
            "url": f"http://corpus.example/doc/{r['doc_id']}",
            "date": "2026-01-01T00:00:00Z",
            "body": r["html"],
            "content_type": "text/html; charset=utf-8",
        }
        for r in pages
    ]
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_webpipe_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    os.makedirs(out_dir, exist_ok=True)
    for i in range(3):
        with open(os.path.join(out_dir, f"crawl-{i}.warc"), "wb") as fh:
            fh.write(warc_bytes(recs[i::3]))

    good, _bad = read_warc(spark, out_dir)
    extracted = HT.html_to_text(
        good.withColumn(
            "doc_id", F.regexp_extract("url", r"doc/(\d+)$", 1).cast("long")
        ),
        "doc_id",
        "text",  # read_warc's decoded payload column holds the HTML
    ).withColumnRenamed("text", "clean")
    return (
        extracted.join(
            good.select(
                F.regexp_extract("url", r"doc/(\d+)$", 1).cast("long").alias("doc_id"),
                "url",
            ),
            "doc_id",
        )
        .select(
            "doc_id",
            "url",
            "title",
            F.when(F.col("clean") == "", F.lit(0))
            .otherwise(F.size(F.split(F.col("clean"), "\n")))
            .cast("int")
            .alias("n_lines"),
            F.size(tokenize(F.col("clean"))).cast("int").alias("n_tokens"),
        )
    )


WEB_PIPELINE_ORACLE = """
WITH d AS (
  SELECT doc_id, 'Doc ' || doc_id AS t,
         trim(substr(text, 1, 40)) AS p1,
         trim(substr(text, 41, 80)) AS p2,
         CASE WHEN length(text) > 120 THEN trim(substr(text, 121, 100000))
              ELSE '' END AS p3
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       'http://corpus.example/doc/' || doc_id AS url,
       t AS title,
       CAST(6 + CASE WHEN p3 <> '' THEN 1 ELSE 0 END AS INTEGER) AS n_lines,
       CAST(12
            + len(list_filter(string_split(p1, ' '), y -> y <> ''))
            + len(list_filter(string_split(p2, ' '), y -> y <> ''))
            + CASE WHEN p3 <> ''
                   THEN len(list_filter(string_split(p3, ' '), y -> y <> ''))
                   ELSE 0 END AS INTEGER) AS n_tokens
FROM d
"""


def q_index_maintenance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-maintenance policy (r13; ``similarity.index_maintenance_plan``):
    the tested decision layer over the occupancy/layout gauges — each
    stats row gets an ``action`` (append_ok | compact_due | rebuild_due)
    and the fired-signal ``reasons``. The five synthetic rows cover every
    branch of the contract: the append default, skew-triggered rebuild,
    rebuild WINNING over a simultaneous compact signal, the
    min-rows-for-rebuild floor, and compact_due with the null-rate
    data-quality reason that never escalates. Fully SQL-oracled — the
    thresholds are exact arithmetic on the same literals in both
    engines; ``reasons`` is serialized with array_join for the
    column-hash compare."""
    from ..operators.similarity import index_maintenance_plan

    schema = (
        "shard int, n_lists_used int, n_rows long, null_rows long, "
        "max_occupancy long, avg_occupancy double, skew double, "
        "files_per_dir int"
    )
    rows = [
        (0, 64, 1_000_000, 0, 30_000, 15_625.0, 1.92, 3),
        (1, 64, 2_000_000, 0, 200_000, 31_250.0, 6.4, 2),
        (2, 64, 500_000, 0, 40_000, 7_812.5, 5.12, 12),
        (3, 64, 50_000, 0, 4_000, 781.25, 5.12, 2),
        (4, 64, 1_000_000, 20_000, 16_000, 15_312.0, 1.045, 9),
    ]
    plan = index_maintenance_plan(spark.createDataFrame(rows, schema))
    return plan.select(
        "shard", "n_rows", "skew", "files_per_dir", "action",
        F.array_join("reasons", ",").alias("reasons"),
    ).orderBy("shard")


INDEX_MAINTENANCE_PLAN_ORACLE = """
WITH stats(shard, n_rows, null_rows, skew, files_per_dir) AS (VALUES
  (0, 1000000, 0,     1.92,  3),
  (1, 2000000, 0,     6.4,   2),
  (2, 500000,  0,     5.12,  12),
  (3, 50000,   0,     5.12,  2),
  (4, 1000000, 20000, 1.045, 9)
), fired AS (
  SELECT shard, n_rows, skew, files_per_dir,
         (skew > 4.0 AND n_rows >= 100000) AS skew_f,
         (files_per_dir > 8) AS compact_f,
         (CAST(null_rows AS DOUBLE) / GREATEST(n_rows, 1) > 0.01) AS nulls_f
  FROM stats
)
SELECT CAST(shard AS INTEGER) AS shard,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(skew AS DOUBLE) AS skew,
       CAST(files_per_dir AS INTEGER) AS files_per_dir,
       CASE WHEN skew_f THEN 'rebuild_due'
            WHEN compact_f THEN 'compact_due'
            ELSE 'append_ok' END AS action,
       concat_ws(',',
         CASE WHEN skew_f THEN 'occupancy_skew' END,
         CASE WHEN compact_f THEN 'files_per_dir' END,
         CASE WHEN nulls_f THEN 'null_vector_rate' END) AS reasons
FROM fired
ORDER BY shard
"""


def q_sharded_build_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-build economics contract (r13;
    ``similarity.build_sharded_ivf_index(scratch_dir=...)`` +
    the ``sharded_ivf_ann_topk`` probe-reuse pin). Driver-attested END TO
    END on the embeddings table:

    - the one-shuffle materialized split (write the hash split once
      partitioned by shard, feed each per-shard build from its pruned
      partition) produces BIT-IDENTICAL centroids and assignments to the
      direct N-scan build on every shard;
    - the scratch split is a real partitionBy layout: one _shard=N
      directory per shard, disjoint cover;
    - the multi-shard query plan materializes the globally-ranked probe
      set ONCE (per-branch ExistingRDD scans; the ranking window is NOT
      replanned per shard — the O(n_shards²) probe-recompute pin);
    - query results through the materialized-build index equal the
      direct-build index's row for row."""
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    scratch_root = tempfile.mkdtemp(prefix="sivf_mat_q_")
    try:
        # r14 optimization (guide §5): each build below feeds 7 actions
        # (six per-shard parity collects + one query collect) — pin both
        # builds once instead of replaying 3 per-shard builds per action.
        # The probe-reuse PLAN check keeps the raw (un-checkpointed) build:
        # its ExistingRDD census counts exactly the probe checkpoint's
        # scans, a property of the standard index shape — checkpointed
        # shard tables would add their own ExistingRDD nodes and the pin
        # would stop measuring what it pins. Same operator, same contract:
        # the collected rows come from the materialized twins, which are
        # bit-identical by construction.
        # r14 opt pass 2 (guide §2.6): the materialized-split build and the
        # direct build are independent — build and pin them in parallel;
        # then fan out the 12 parity collects and the two query collects.
        # Same actions, same rows.
        def build_mat():
            raw = SIM.build_sharded_ivf_index(
                emb, n_shards=3, n_lists=6, scratch_dir=f"{scratch_root}/split"
            )
            return raw, SIM.materialize_index(raw, eager=True)

        (mat_raw, mat), direct = _par(
            build_mat,
            lambda: SIM.materialize_index(
                SIM.build_sharded_ivf_index(emb, n_shards=3, n_lists=6),
                eager=True,
            ),
        )
        cent_thunks = []
        asg_thunks = []
        for (ca, aa), (cb, ab) in zip(direct, mat):
            cent_thunks.append(
                (lambda df=ca: sorted(map(tuple, df.collect())),
                 lambda df=cb: sorted(map(tuple, df.collect())))
            )
            asg_thunks.append(
                (lambda df=aa: sorted((r["vec_id"], r["list_id"]) for r in df.collect()),
                 lambda df=ab: sorted((r["vec_id"], r["list_id"]) for r in df.collect()))
            )
        flat_thunks = [t for pair in cent_thunks + asg_thunks for t in pair]
        results = _par(*flat_thunks)
        parity = all(results[i] == results[i + 1] for i in range(0, len(results), 2))
        split_dirs = sorted(
            n for n in os.listdir(f"{scratch_root}/split") if n.startswith("_shard=")
        )
        layout_ok = split_dirs == [f"_shard={s}" for s in range(3)]

        queries = emb.filter(F.col("vec_id") < 8)
        key = ["query_id", "neighbor_id", "rank"]
        plan = (
            SIM.sharded_ivf_ann_topk(queries, mat_raw, k=4, n_probe=5, scorer="hof")
            ._jdf.queryExecution().executedPlan().toString()
        )
        probe_pinned = plan.count("ExistingRDD") == 3 and plan.count("row_number") < 4
        r_mat, r_dir, n_queries = _par(
            lambda: sorted(map(tuple, SIM.sharded_ivf_ann_topk(
                queries, mat, k=4, n_probe=5, scorer="hof"
            ).select(*key).collect())),
            lambda: sorted(map(tuple, SIM.sharded_ivf_ann_topk(
                queries, direct, k=4, n_probe=5, scorer="hof"
            ).select(*key).collect())),
            lambda: queries.count(),
        )
    finally:
        shutil.rmtree(scratch_root, ignore_errors=True)
    return spark.createDataFrame(
        [(
            bool(parity), bool(layout_ok), bool(probe_pinned),
            r_mat == r_dir, int(len(r_mat)), int(n_queries),
        )],
        "build_parity boolean, split_layout boolean, probe_reuse_pinned boolean, "
        "query_parity boolean, result_rows int, n_queries int",
    )


SHARDED_BUILD_MATERIALIZED_ORACLE = """
SELECT TRUE AS build_parity, TRUE AS split_layout, TRUE AS probe_reuse_pinned,
       TRUE AS query_parity,
       CAST(4 * COUNT(*) AS INTEGER) AS result_rows,
       CAST(COUNT(*) AS INTEGER) AS n_queries
FROM embeddings WHERE vec_id < 8
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ---- registry ORDER is deliberate: the driver's correctness sweep
    # samples queries in registry order with a bounded budget, so entries
    # that have never received a driver-verified row lead.  Through r4 the
    # driver always sampled the first 50 entries; the 52 entries that had
    # never been driver-sampled (including every sketch/LSH query) now come
    # first, with the six that have never had a green driver row at the top.
    # The 50 queries green in the r3+r4 driver files close out the registry.
    #
    # sketch/LSH queries with semantic oracles (exact-Jaccard equality,
    # independent DuckDB reformulation, recall-vs-brute-force contracts)
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "fingerprint": q_fingerprint,
    "lsh_ann": q_lsh_ann,
    "lsh_ann_auto": q_lsh_ann_auto,
    "ivf_ann": q_ivf_ann,
    "ivf_ann_persisted": q_ivf_ann_persisted,
    "sharded_ivf_ann": q_sharded_ivf_ann,
    "ivf_index_maintenance": q_ivf_index_maintenance,
    "lsh_index_maintenance": q_lsh_index_maintenance,
    "pq_ann_persisted": q_pq_ann_persisted,
    "ivfpq_ann": q_ivfpq_ann,
    "ivfpq_ann_persisted": q_ivfpq_ann_persisted,
    "sharded_ivfpq_ann": q_sharded_ivfpq_ann,
    "lsh_ann_persisted": q_lsh_ann_persisted,
    "index_maintenance_plan": q_index_maintenance_plan,
    "sharded_build_materialized": q_sharded_build_materialized,
    "ivf_ann_auto": q_ivf_ann_auto,
    "sessionize": q_sessionize,
    # r5: WARC source (Common-Crawl entry point) — never driver-sampled yet
    "warc_ingest": q_warc_ingest,
    # r5: baseline JPEG decode (bit-exact block-constant fixtures)
    "jpeg_features": q_jpeg_features,
    "jpeg_progressive": q_jpeg_progressive,
    "main_content": q_main_content,
    "pq_ann": q_pq_ann,
    # r14: the Arrow assign kernel run through the same oracle — the
    # driver-attested bit-parity face
    "pq_ann_arrow": q_pq_ann_arrow,
    "hard_negatives": q_hard_negatives,
    # r5: HTML -> text extraction (the WARC -> c4_clean bridge)
    "html_extract": q_html_extract,
    # r5: crawl-frontier URL canonicalization + dedup
    "url_dedup": q_url_dedup,
    # r5: KMV sketch cross-dataset overlap estimation
    "kmv_overlap": q_kmv_overlap,
    # r5: deterministic global training shuffle
    "corpus_shuffle": q_corpus_shuffle,
    # r5: exact-substring dedup spans (ACL'22 recipe)
    "substring_dedup": q_substring_dedup,
    # r5: MLlib quality classifier (rows-only: iterative LBFGS, not
    # SQL-expressible — pinned by tests/test_mlquality.py)
    "quality_scores": q_quality_scores,
    "quality_tf": q_quality_tf,
    # r7: fixed-point linear quality classifier — iterative training held
    # to a hash-exact unrolled-CTE oracle (the oracled face of
    # quality_scores; pagerank/bpe_tokenize contract)
    "quality_exact": q_quality_exact,
    # r5: WARC -> HTML -> text -> stats composition
    "web_pipeline": q_web_pipeline,
    # r5: PageRank in fixed-point integer arithmetic (iterative, yet
    # hash-exact against an unrolled-CTE oracle)
    "pagerank": q_pagerank,
    # r5: CCNet perplexity filtering (bigram LM, head/middle/tail)
    "perplexity": q_perplexity,
    # r5: anchor/link extraction (the edge list PageRank consumes)
    "link_graph": q_link_graph,
    # r5: DQ equi-width histogram
    "value_histogram": q_value_histogram,
    # r5: forward-fill grid resampling
    "resample_ffill": q_resample_ffill,
    # r5 (oracled r6): distributed BPE tokenizer training — the full
    # 30-merge training replays as unrolled materialized CTEs in DuckDB
    "bpe_tokenize": q_bpe_tokenize,
    # r5: contiguous row ids via range-partition + offsets
    "row_ids": q_row_ids,
    # r5: int8 embedding quantization
    "quantize_embeddings": q_quantize_embeddings,
    # r5: CDC snapshot diff with column-level blame
    "snapshot_diff": q_snapshot_diff,
    # r5: exactly-k per-group deterministic sampling (two-phase threshold)
    "group_sample": q_group_sample,
    # r5: edit-distance fuzzy join (q-gram count filter + exact verify)
    "fuzzy_join": q_fuzzy_join,
    # r5: incremental materialized-rollup maintenance (merge == recompute)
    "incremental_rollup": q_incremental_rollup,
    # r5: NFC unicode normalization (pandas_udf; DuckDB nfc_normalize oracle)
    "unicode_normalize": q_unicode_normalize,
    # r5 (oracled r6): zlib compression-ratio signal — independent
    # driver-local zlib pass embedded as a VALUES-literal oracle
    "compression_signals": q_compression_signals,
    # r5: EXIF APP1/TIFF-IFD metadata round trip (id-arithmetic oracle)
    "exif_metadata": q_exif_metadata,
    # r5: dataset-mixture sampling (binding-cap integer rates, md5 sample)
    "corpus_mix": q_corpus_mix,
    # r5: deterministic synchronous LPA (unrolled-CTE hash-exact oracle)
    "label_propagation": q_label_propagation,
    # r5: incremental cross-corpus dedup (new batch vs existing corpus)
    "incremental_dedup": q_incremental_dedup,
    # r5: event-time attribution join (batch face of the stream-stream join)
    "attribution": q_attribution,
    # r5: keyed pseudonymization (sha256 tokens that keep joins working)
    "pseudonymize": q_pseudonymize,
    # r5: embedding normalization (unit-L2 + per-dim z-score, micro-units)
    "embedding_norm": q_embedding_norm,
    # r5: nested-JSON parse/flatten/explode (arithmetic-reconstructed oracle)
    "json_flatten": q_json_flatten,
    # r5: mergeable-histogram percentiles (split/merge vs one-shot oracle)
    "rollup_percentile": q_rollup_percentile,
    # r5: seasonality-aware anomaly flags (slot-grid z-scores)
    "seasonal_outliers": q_seasonal_outliers,
    # r5: CUSUM drift detection (recursion closed-formed into windows)
    "cusum": q_cusum,
    # r5: bin-thresholded exact top-k per group (no full group sort)
    "topk_value": q_topk_value,
    # r5: survivorship merge (golden records per duplicate cluster)
    "golden_records": q_golden_records,
    # r5: leakage-safe group-keyed splitting (one (source, split) per source)
    "group_split": q_group_split,
    # r5: feature-hashed model-free doc embeddings (bit-exact oracle)
    "hashed_embeddings": q_hashed_embeddings,
    # r5: PMI collocations (phrase/merge candidates from exact counts)
    "pmi_collocations": q_pmi_collocations,
    # r5: degree-ordered triangle counting (clustering signal)
    "triangles": q_triangles,
    # r5: PSI distribution-drift gate (per-bin terms + total)
    "psi_drift": q_psi_drift,
    # r5: BM25 full-text ranking (Okapi, exact counts)
    "bm25_search": q_bm25_search,
    # r5: mergeable KMV distinct-count rollup state
    "distinct_rollup": q_distinct_rollup,
    # r5: weight-proportional sampling (Efraimidis–Spirakis keys)
    "weighted_sample": q_weighted_sample,
    # r5: chi-square independence screen (exact contingency)
    "chi_square": q_chi_square,
    # r5: Pearson correlation matrix (quantized exact sums)
    "correlations": q_correlations,
    # r5: Markov transition matrix over event sequences
    "transition_matrix": q_transition_matrix,
    # r5: alert burst suppression (chained-gap episodes)
    "alert_suppress": q_alert_suppress,
    # never-driver-sampled block (judge-verified in r4; driver rows wanted)
    "importance_weights": q_importance_weights,
    "upsert_latest": q_upsert_latest,
    "scd2_history": q_scd2_history,
    "token_estimate": q_token_estimate,
    "semantic_dedup": q_semantic_dedup,
    "semantic_dedup_auto": q_semantic_dedup_auto,
    "skew_report": q_skew_report,
    "key_histogram": q_key_histogram,
    "funnel": q_funnel,
    "cohort_retention": q_cohort_retention,
    "dq_profile": q_dq_profile,
    "dq_checks": q_dq_checks,
    "interval_overlap": q_interval_overlap,
    "mad_outliers": q_mad_outliers,
    "pivot_events": q_pivot_events,
    # oracled r6 by GROUND TRUTH: the planted-pair contract is
    # closed-form SQL even though the DCT itself is not
    "image_phash_pairs": q_image_phash_pairs,
    "image_thumbnails": q_image_thumbnails,
    # corpus curation (PII / domains / sampling / entropy)
    "pii_scan": q_pii_scan,
    "pii_redact": q_pii_redact,
    "domain_report": q_domain_report,
    "stratified_sample": q_stratified_sample,
    "char_entropy": q_char_entropy,
    "c4_clean": q_c4_clean,
    "gopher_rules": q_gopher_rules,
    "corpus_pipeline": q_corpus_pipeline,
    # dedup / text / similarity / sessions / multimodal
    "dedup_exact_stats": q_dedup_exact_stats,
    "dedup_exact_keep": q_dedup_exact_keep,
    "ngram_jaccard": q_ngram_jaccard,
    "ngram_jaccard_allpairs": q_ngram_jaccard_allpairs,
    "dedup_clusters": q_dedup_clusters,
    "approx_distinct": q_approx_distinct,
    "approx_quantile": q_approx_quantile,
    "token_stats": q_token_stats,
    "tfidf_top_terms": q_tfidf_top_terms,
    "chunk_documents": q_chunk_documents,
    "repetition_stats": q_repetition_stats,
    "text_quality": q_text_quality,
    "language_id": q_language_id,
    "cosine_topk": q_cosine_topk,
    "cosine_pairs": q_cosine_pairs,
    "cosine_pairs_lsh": q_cosine_pairs_lsh,
    "session_window": q_session_window,
    "asof_join": q_asof_join,
    "range_bucket": q_range_bucket,
    "multimodal_features": q_multimodal_features,
    "audio_features": q_audio_features,
    "frame_sample": q_frame_sample,
    # ---- driver-green in r3+r4 from here down ----
    # business SQL corpus (S1/A4/J4)
    "q01_pricing_summary": _sql_query(Q01_SQL),
    "q03_shipping_priority": _sql_query(Q03_SQL),
    "q05_local_supplier": _sql_query(Q05_SQL),
    "q06_forecast_revenue": _sql_query(Q06_SQL),
    "q10_returned_items": _sql_query(Q10_SQL),
    "q04_order_priority": _sql_query(Q04_SQL),
    "q16_parts_suppliers": _sql_query(Q16_SQL),
    "q22_global_sales": _sql_query(Q22_SQL),
    "q02_min_cost_supplier": _sql_query(Q02_SQL),
    "q07_volume_shipping": _sql_query(Q07_SQL),
    "q08_market_share": _sql_query(Q08_SQL),
    "q09_product_profit": _sql_query(Q09_SQL),
    "q11_important_balance": _sql_query(Q11_SQL),
    "q12_priority_lines": _sql_query(Q12_SQL),
    "q13_order_distribution": _sql_query(Q13_SQL),
    "q14_promo_effect": _sql_query(Q14_SQL),
    "q15_top_supplier": _sql_query(Q15_SQL),
    "q17_small_qty_revenue": _sql_query(Q17_SQL),
    "q18_large_volume": _sql_query(Q18_SQL),
    "q19_discount_revenue": _sql_query(Q19_SQL),
    "q20_part_promotion": _sql_query(Q20_SQL),
    "q21_waiting_supplier": _sql_query(Q21_SQL),
    "window_topn": _sql_query(WINDOW_TOPN_SQL),
    "window_moving_avg": _sql_query(WINDOW_MOVING_AVG_SQL),
    "window_rank": _sql_query(WINDOW_RANK_SQL),
    "rollup_lineitem": _sql_query(ROLLUP_SQL),
    "cube_lineitem": _sql_query(CUBE_SQL),
    "window_distribution": _sql_query(WINDOW_DISTRIBUTION_SQL),
    "grouping_sets_lineitem": _sql_query(GROUPING_SETS_SQL),
    "set_ops_customers": _sql_query(SET_OPS_SQL),
    "window_range_interval": _sql_query(WINDOW_RANGE_INTERVAL_SQL),
    "business_scalars": lambda spark, sf: (
        register_tables(spark, sf) and None
    ) or business_metrics_distributed(spark, _BUSINESS_SCALARS).select(
        "name", "value"
    ),
    # statistic engine (A1/W1/W2/J1/A3/C1)
    "metrics_day": q_metrics_day,
    "metrics_day_p50": q_metrics_day_p50,
    "metrics_hour_dims": q_metrics_hour_dims,
    "metrics_minute": q_metrics_minute,
    "metrics_latest": q_metrics_latest,
    # SLA engine (C13/W3/W4/A6)
    "sla_daily": q_sla_daily,
    "sla_transitions": q_sla_transitions,
    "sla_gap_fill": q_sla_gap_fill,
    "sla_table": q_sla_table,
    "sla_alerts": q_sla_alerts,
    # key derivations (C1-C4)
    "derived_keys": q_derived_keys,
    "alarm_roundtrip": q_alarm_roundtrip,
    # definitions flattening (S9/S11)
    "metric_defs_flat": q_metric_defs_flat,
    "sla_defs_flat": q_sla_defs_flat,
    "metric_defs_multi_account": q_metric_defs_multi_account,
    # dashboard report generation (F5/C1/C3)
    "dashboard_widgets": q_dashboard_widgets,
    "dashboard_report": q_dashboard_report,
    "dashboard_layout": q_dashboard_layout,
    "decontaminate": q_decontaminate,
    "paragraph_dedup": q_paragraph_dedup,
    "train_val_split": q_train_val_split,
    "pack_sequences": q_pack_sequences,
}

ORACLES: dict[str, str] = {
    "q01_pricing_summary": Q01_SQL,
    "q03_shipping_priority": Q03_SQL,
    "q05_local_supplier": Q05_SQL,
    "q06_forecast_revenue": Q06_SQL,
    "q10_returned_items": Q10_SQL,
    "q04_order_priority": Q04_SQL,
    "q16_parts_suppliers": Q16_SQL,
    "q22_global_sales": Q22_SQL,
    "q02_min_cost_supplier": Q02_SQL,
    "q07_volume_shipping": Q07_SQL,
    "q08_market_share": Q08_SQL,
    "q09_product_profit": Q09_SQL,
    "q11_important_balance": Q11_SQL,
    "q12_priority_lines": Q12_SQL,
    "q13_order_distribution": Q13_SQL,
    "q14_promo_effect": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q18_large_volume": Q18_SQL,
    "q19_discount_revenue": Q19_SQL,
    "q20_part_promotion": Q20_SQL,
    "q21_waiting_supplier": Q21_SQL,
    "window_topn": WINDOW_TOPN_SQL,
    "window_moving_avg": WINDOW_MOVING_AVG_SQL,
    "window_rank": WINDOW_RANK_SQL,
    "rollup_lineitem": ROLLUP_SQL,
    "cube_lineitem": CUBE_SQL,
    "window_distribution": WINDOW_DISTRIBUTION_SQL,
    "grouping_sets_lineitem": GROUPING_SETS_SQL,
    "set_ops_customers": SET_OPS_SQL,
    "window_range_interval": WINDOW_RANGE_INTERVAL_SQL,
    "business_scalars": BUSINESS_SCALARS_SQL,
    "metrics_day": METRICS_DAY_ORACLE,
    "metrics_day_p50": METRICS_DAY_P50_ORACLE,
    "metrics_hour_dims": METRICS_HOUR_DIMS_ORACLE,
    "metrics_minute": METRICS_MINUTE_ORACLE,
    "metrics_latest": METRICS_LATEST_ORACLE,
    "sla_daily": SLA_DAILY_ORACLE,
    "sla_transitions": SLA_TRANSITIONS_ORACLE,
    "sla_gap_fill": SLA_GAP_FILL_ORACLE,
    "sla_table": SLA_TABLE_ORACLE,
    "sla_alerts": SLA_ALERTS_ORACLE,
    "derived_keys": DERIVED_KEYS_ORACLE,
    "alarm_roundtrip": ALARM_ROUNDTRIP_ORACLE,
    "metric_defs_flat": METRIC_DEFS_FLAT_ORACLE,
    "sla_defs_flat": SLA_DEFS_FLAT_ORACLE,
    "metric_defs_multi_account": METRIC_DEFS_MULTI_ACCOUNT_ORACLE,
    "dashboard_widgets": DASHBOARD_WIDGETS_ORACLE,
    "dashboard_report": DASHBOARD_REPORT_ORACLE,
    "dashboard_layout": DASHBOARD_LAYOUT_ORACLE,
    "decontaminate": DECONTAMINATE_ORACLE,
    "paragraph_dedup": PARAGRAPH_DEDUP_ORACLE,
    "train_val_split": TRAIN_VAL_SPLIT_ORACLE,
    "pack_sequences": PACK_SEQUENCES_ORACLE,
    "importance_weights": IMPORTANCE_WEIGHTS_ORACLE,
    "upsert_latest": UPSERT_LATEST_ORACLE,
    "scd2_history": SCD2_HISTORY_ORACLE,
    "token_estimate": _token_estimate_oracle(),
    "semantic_dedup": SEMANTIC_DEDUP_ORACLE,
    "semantic_dedup_auto": SEMANTIC_DEDUP_AUTO_ORACLE,
    "skew_report": SKEW_REPORT_ORACLE,
    "key_histogram": KEY_HISTOGRAM_ORACLE,
    "funnel": FUNNEL_ORACLE,
    "cohort_retention": COHORT_RETENTION_ORACLE,
    "dq_profile": DQ_PROFILE_ORACLE,
    "dq_checks": DQ_CHECKS_ORACLE,
    "interval_overlap": INTERVAL_OVERLAP_ORACLE,
    "mad_outliers": MAD_OUTLIERS_ORACLE,
    "pivot_events": PIVOT_EVENTS_ORACLE,
    "image_thumbnails": IMAGE_THUMBNAILS_ORACLE,
    "pii_scan": PII_SCAN_ORACLE,
    "pii_redact": PII_REDACT_ORACLE,
    "domain_report": DOMAIN_REPORT_ORACLE,
    "stratified_sample": STRATIFIED_SAMPLE_ORACLE,
    "char_entropy": CHAR_ENTROPY_ORACLE,
    "c4_clean": C4_CLEAN_ORACLE,
    "gopher_rules": GOPHER_RULES_ORACLE,
    "corpus_pipeline": CORPUS_PIPELINE_ORACLE,
    "dedup_exact_stats": DEDUP_EXACT_STATS_ORACLE,
    "dedup_exact_keep": DEDUP_EXACT_KEEP_ORACLE,
    "ngram_jaccard": NGRAM_JACCARD_ORACLE,
    "ngram_jaccard_allpairs": NGRAM_JACCARD_ORACLE,
    "dedup_clusters": DEDUP_CLUSTERS_ORACLE,
    "approx_distinct": APPROX_DISTINCT_ORACLE,
    "approx_quantile": APPROX_QUANTILE_ORACLE,
    "token_stats": TOKEN_STATS_ORACLE,
    "tfidf_top_terms": TFIDF_TOP_TERMS_ORACLE,
    "chunk_documents": CHUNK_DOCUMENTS_ORACLE,
    "repetition_stats": REPETITION_STATS_ORACLE,
    "text_quality": TEXT_QUALITY_ORACLE,
    "language_id": LANGUAGE_ID_ORACLE,
    "cosine_topk": COSINE_TOPK_ORACLE,
    "cosine_pairs": COSINE_PAIRS_ORACLE,
    "cosine_pairs_lsh": COSINE_PAIRS_LSH_ORACLE,
    "minhash_pairs": NGRAM_JACCARD_ORACLE,
    "simhash_pairs": SIMHASH_PAIRS_ORACLE,
    "fingerprint": FINGERPRINT_ORACLE,
    "lsh_ann": LSH_ANN_ORACLE,
    "lsh_ann_auto": LSH_ANN_AUTO_ORACLE,
    "ivf_ann": IVF_ANN_ORACLE,
    "sharded_ivf_ann": SHARDED_IVF_ANN_ORACLE,
    "ivf_index_maintenance": IVF_INDEX_MAINTENANCE_ORACLE,
    "lsh_index_maintenance": LSH_INDEX_MAINTENANCE_ORACLE,
    "pq_ann_persisted": PQ_ANN_PERSISTED_ORACLE,
    "ivfpq_ann": IVFPQ_ANN_ORACLE,
    "ivfpq_ann_persisted": IVFPQ_ANN_PERSISTED_ORACLE,
    "sharded_ivfpq_ann": SHARDED_IVFPQ_ANN_ORACLE,
    "index_maintenance_plan": INDEX_MAINTENANCE_PLAN_ORACLE,
    "sharded_build_materialized": SHARDED_BUILD_MATERIALIZED_ORACLE,
    "ivf_ann_persisted": IVF_ANN_PERSISTED_ORACLE,
    "lsh_ann_persisted": LSH_ANN_PERSISTED_ORACLE,
    "ivf_ann_auto": IVF_ANN_AUTO_ORACLE,
    "sessionize": SESSIONIZE_ORACLE,
    "asof_join": ASOF_JOIN_ORACLE,
    "range_bucket": RANGE_BUCKET_ORACLE,
    "session_window": SESSION_WINDOW_ORACLE,
    "multimodal_features": MULTIMODAL_ORACLE,
    "audio_features": AUDIO_FEATURES_ORACLE,
    "frame_sample": FRAME_SAMPLE_ORACLE,
    "warc_ingest": WARC_INGEST_ORACLE,
    "jpeg_features": JPEG_FEATURES_ORACLE,
    "jpeg_progressive": JPEG_FEATURES_ORACLE,
    "main_content": MAIN_CONTENT_ORACLE,
    "image_phash_pairs": IMAGE_PHASH_PAIRS_ORACLE,
    "pq_ann": PQ_ANN_ORACLE,
    # the SAME replay verbatim: the arrow kernel's contract is
    # bit-identity with the HOF path
    "pq_ann_arrow": PQ_ANN_ORACLE,
    "hard_negatives": HARD_NEGATIVES_ORACLE,
    "html_extract": HTML_EXTRACT_ORACLE,
    "url_dedup": URL_DEDUP_ORACLE,
    "kmv_overlap": KMV_OVERLAP_ORACLE,
    "corpus_shuffle": CORPUS_SHUFFLE_ORACLE,
    "substring_dedup": SUBSTRING_DEDUP_ORACLE,
    "web_pipeline": WEB_PIPELINE_ORACLE,
    "pagerank": PAGERANK_ORACLE,
    "perplexity": PERPLEXITY_ORACLE,
    "link_graph": LINK_GRAPH_ORACLE,
    "value_histogram": VALUE_HISTOGRAM_ORACLE,
    "resample_ffill": RESAMPLE_FFILL_ORACLE,
    "row_ids": ROW_IDS_ORACLE,
    "quantize_embeddings": QUANTIZE_EMB_ORACLE,
    "snapshot_diff": SNAPSHOT_DIFF_ORACLE,
    "group_sample": GROUP_SAMPLE_ORACLE,
    "fuzzy_join": FUZZY_JOIN_ORACLE,
    "incremental_rollup": INCREMENTAL_ROLLUP_ORACLE,
    "unicode_normalize": UNICODE_NORMALIZE_ORACLE,
    "exif_metadata": EXIF_METADATA_ORACLE,
    "corpus_mix": CORPUS_MIX_ORACLE,
    "label_propagation": _label_propagation_oracle(),
    "incremental_dedup": INCREMENTAL_DEDUP_ORACLE,
    "attribution": ATTRIBUTION_ORACLE,
    "pseudonymize": PSEUDONYMIZE_ORACLE,
    "embedding_norm": EMBEDDING_NORM_ORACLE,
    "json_flatten": JSON_FLATTEN_ORACLE,
    "rollup_percentile": ROLLUP_PERCENTILE_ORACLE,
    "seasonal_outliers": SEASONAL_OUTLIERS_ORACLE,
    "cusum": CUSUM_ORACLE,
    "topk_value": TOPK_VALUE_ORACLE,
    "golden_records": GOLDEN_RECORDS_ORACLE,
    "group_split": GROUP_SPLIT_ORACLE,
    "hashed_embeddings": HASHED_EMBEDDINGS_ORACLE,
    "pmi_collocations": PMI_COLLOCATIONS_ORACLE,
    "triangles": TRIANGLES_ORACLE,
    "psi_drift": PSI_DRIFT_ORACLE,
    "bm25_search": BM25_SEARCH_ORACLE,
    "distinct_rollup": DISTINCT_ROLLUP_ORACLE,
    "weighted_sample": WEIGHTED_SAMPLE_ORACLE,
    "chi_square": CHI_SQUARE_ORACLE,
    "correlations": CORRELATIONS_ORACLE,
    "transition_matrix": TRANSITION_MATRIX_ORACLE,
    "alert_suppress": ALERT_SUPPRESS_ORACLE,
    "bpe_tokenize": _bpe_oracle(30),
    "quality_exact": QUALITY_EXACT_ORACLE,
    "quality_tf": QUALITY_TF_ORACLE,
}

# ---- sampling rotation: the driver samples the FIRST ~50 registry
# entries each round, so the list is reordered every round — new faces
# first (never driver-attested), then oldest-driver-row first, keeping
# every query's newest attestation within three rounds.
# r14 rotation (VERDICT r13 ask #1): new r14 faces lead, then the 50
# queries whose newest driver row was r10 (they hit the 3-round staleness
# boundary after r13), then the carried r13 order. Recomputed from
# CORRECTNESS_r*.json (max round per query).
_R14_PRIORITY = [
    'ivfpq_ann',
    'sharded_ivfpq_ann',
    'ivfpq_ann_persisted',
    'pq_ann_arrow',
    'bm25_search',
    'bpe_tokenize',
    'c4_clean',
    'char_entropy',
    'cohort_retention',
    'compression_signals',
    'corpus_mix',
    'correlations',
    'cusum',
    'distinct_rollup',
    'domain_report',
    'dq_checks',
    'dq_profile',
    'embedding_norm',
    'funnel',
    'golden_records',
    'group_split',
    'hard_negatives',
    'hashed_embeddings',
    'image_phash_pairs',
    'image_thumbnails',
    'importance_weights',
    'interval_overlap',
    'ivf_ann_auto',
    'jpeg_progressive',
    'json_flatten',
    'key_histogram',
    'lsh_ann_auto',
    'mad_outliers',
    'main_content',
    'pii_redact',
    'pii_scan',
    'pivot_events',
    'pmi_collocations',
    'pq_ann',
    'pseudonymize',
    'psi_drift',
    'rollup_percentile',
    'scd2_history',
    'seasonal_outliers',
    'semantic_dedup',
    'semantic_dedup_auto',
    'skew_report',
    'stratified_sample',
    'token_estimate',
    'topk_value',
    'transition_matrix',
    'triangles',
    'upsert_latest',
    'weighted_sample',
    'index_maintenance_plan',
    'sharded_build_materialized',
    'attribution',
    'exif_metadata',
    'fuzzy_join',
    'group_sample',
    'incremental_dedup',
    'incremental_rollup',
    'label_propagation',
    'link_graph',
    'pagerank',
    'perplexity',
    'quality_scores',
    'quality_tf',
    'quantize_embeddings',
    'resample_ffill',
    'row_ids',
    'snapshot_diff',
    'unicode_normalize',
    'value_histogram',
    'web_pipeline',
    'ivf_index_maintenance',
    'lsh_index_maintenance',
    'pq_ann_persisted',
    'sharded_ivf_ann',
    'dashboard_report',
    'dashboard_layout',
    'q01_pricing_summary',
    'q03_shipping_priority',
    'q05_local_supplier',
    'q06_forecast_revenue',
    'q10_returned_items',
    'q04_order_priority',
    'q16_parts_suppliers',
    'q22_global_sales',
    'q02_min_cost_supplier',
    'q07_volume_shipping',
    'q08_market_share',
    'q09_product_profit',
    'q11_important_balance',
    'q12_priority_lines',
    'q13_order_distribution',
    'q14_promo_effect',
    'q15_top_supplier',
    'q17_small_qty_revenue',
    'q18_large_volume',
    'q19_discount_revenue',
    'q20_part_promotion',
    'q21_waiting_supplier',
    'window_topn',
    'window_moving_avg',
    'window_rank',
    'rollup_lineitem',
    'cube_lineitem',
    'decontaminate',
    'paragraph_dedup',
    'train_val_split',
    'pack_sequences',
    'minhash_pairs',
    'simhash_pairs',
    'fingerprint',
    'lsh_ann',
    'ivf_ann',
    'sessionize',
    'warc_ingest',
    'jpeg_features',
    'html_extract',
    'url_dedup',
    'kmv_overlap',
    'corpus_shuffle',
    'substring_dedup',
    'ivf_ann_persisted',
    'lsh_ann_persisted',
    'gopher_rules',
    'corpus_pipeline',
    'approx_distinct',
    'approx_quantile',
    'tfidf_top_terms',
    'chunk_documents',
    'repetition_stats',
    'cosine_pairs_lsh',
    'asof_join',
    'range_bucket',
    'window_distribution',
    'grouping_sets_lineitem',
    'set_ops_customers',
    'chi_square',
    'alert_suppress',
    'quality_exact',
    'window_range_interval',
    'token_stats',
    'text_quality',
    'language_id',
    'cosine_topk',
    'cosine_pairs',
    'session_window',
    'multimodal_features',
    'audio_features',
    'frame_sample',
    'dedup_exact_stats',
    'dedup_exact_keep',
    'ngram_jaccard',
    'ngram_jaccard_allpairs',
    'dedup_clusters',
    'business_scalars',
    'metrics_day',
    'metrics_day_p50',
    'metrics_hour_dims',
    'metrics_minute',
    'metrics_latest',
    'sla_daily',
    'sla_transitions',
    'sla_gap_fill',
    'sla_table',
    'sla_alerts',
    'derived_keys',
    'alarm_roundtrip',
    'metric_defs_flat',
    'sla_defs_flat',
    'metric_defs_multi_account',
    'dashboard_widgets',
]
if set(_R14_PRIORITY) != set(QUERIES) or len(_R14_PRIORITY) != len(QUERIES):
    raise RuntimeError(
        "priority rotation out of sync with QUERIES: missing="
        f"{sorted(set(QUERIES) - set(_R14_PRIORITY))} extra="
        f"{sorted(set(_R14_PRIORITY) - set(QUERIES))}"
    )
QUERIES = {name: QUERIES[name] for name in _R14_PRIORITY}

# Keep ORACLES iteration order identical to QUERIES (never-driver-sampled
# entries first) so a budget-bounded sweep sees the same priority whichever
# dict it walks.  quality_scores is the single rows-only query left
# (iterative LBFGS; contract in its docstring).
ORACLES = {name: ORACLES[name] for name in QUERIES if name in ORACLES}
