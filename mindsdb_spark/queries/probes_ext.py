"""Extended relational probes P33+ — capabilities beyond the reference's own
probe list that its DuckDB delegation layer nevertheless exposes.

The reference executes any SELECT DuckDB accepts over registered frames
(reference: mindsdb/api/executor/utilities/sql.py:160-205 — the allow-list is
pulled live from duckdb_functions(), so CUBE / GROUPING SETS / string_agg /
quantile_cont / FILTER clauses are all reachable surface). SURVEY.md §2.4
marks these "absent / available if we extend" — here they are, oracle-checked.

Same conventions as probes.py: identical aliases both sides, full ordering,
cross-engine-deterministic rounding via floor(x*10^d + 0.5)/10^d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mindsdb_spark.catalog import load_table as _t
from mindsdb_spark.queries.probes import _roundc

col = F.col


# --- P33 CUBE ----------------------------------------------------------------
def p33_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g1"),
            F.grouping("l_linestatus").alias("g2"),
            F.count("*").alias("cnt"),
            _roundc(F.sum("l_quantity"), 2).alias("sq"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "g1",
            "g2",
            "cnt",
            "sq",
        )
        .orderBy("g1", "g2", "rf", "ls")
    )


P33_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
       grouping(l_returnflag) AS g1, grouping(l_linestatus) AS g2,
       count(*) AS cnt, floor(sum(l_quantity) * 100 + 0.5) / 100 AS sq
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g1, g2, rf, ls
"""


# --- P34 GROUPING SETS -------------------------------------------------------
def p34_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").alias("g1"),
            F.grouping("l_linestatus").alias("g2"),
            F.count("*").alias("cnt"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "g1",
            "g2",
            "cnt",
        )
        .orderBy("g1", "g2", "rf", "ls")
    )


P34_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
       grouping(l_returnflag) AS g1, grouping(l_linestatus) AS g2, count(*) AS cnt
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY g1, g2, rf, ls
"""


# --- P35 string aggregation --------------------------------------------------
# DuckDB string_agg(x, sep ORDER BY x) ≡ Spark array_join(array_sort(
# collect_list(x))) — the explicit sort makes the concatenation order
# deterministic on both engines regardless of shuffle arrival order.
def p35_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), col("n_regionkey") == col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n"),
        )
        .orderBy("r_name")
    )


P35_SQL = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, count(*) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# --- P36 exact percentiles / median -----------------------------------------
# Both engines use linear interpolation for continuous quantiles; inputs are
# whole-valued quantities so the interpolated midpoints are exact in binary.
def p36_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            _roundc(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25"),
            _roundc(F.expr("percentile(l_quantity, 0.5)"), 4).alias("med"),
            _roundc(F.expr("percentile(l_quantity, 0.75)"), 4).alias("q75"),
        )
        .orderBy("l_returnflag")
    )


P36_SQL = """
SELECT l_returnflag,
       floor(quantile_cont(l_quantity, 0.25) * 10000 + 0.5) / 10000 AS q25,
       floor(quantile_cont(l_quantity, 0.5)  * 10000 + 0.5) / 10000 AS med,
       floor(quantile_cont(l_quantity, 0.75) * 10000 + 0.5) / 10000 AS q75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- P37 filtered aggregates -------------------------------------------------
# DuckDB `agg(...) FILTER (WHERE p)` ≡ Spark conditional aggregation.
def p37_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.count(F.when(col("o_totalprice") > 150000, 1)).alias("big"),
            _roundc(
                F.sum(F.when(col("o_orderstatus") == "F", col("o_totalprice")).otherwise(F.lit(0.0))), 2
            ).alias("f_rev"),
        )
        .orderBy("o_orderpriority")
    )


P37_SQL = """
SELECT o_orderpriority, count(*) AS cnt,
       count(*) FILTER (WHERE o_totalprice > 150000) AS big,
       floor(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0) * 100 + 0.5) / 100 AS f_rev
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- P38 approximate distinct count (property-checked, no value oracle) ------
# HyperLogLog sketches differ across engines (SURVEY §2.12 exclusions); the
# driver records a rows-only check and tests/test_probes_ext.py asserts the
# ±2%-of-exact property the reference inherits from DuckDB's approx sketch.
def p38_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.approx_count_distinct("o_custkey").alias("approx_cust"),
        F.countDistinct("o_custkey").alias("exact_cust"),
    )


# --- P39 lateral join (top-2 orders per customer) ----------------------------
# Correlated subquery in FROM — Catalyst decorrelates the lateral into a
# ranked window; DuckDB executes it as a dependent join.
def p39_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("p39_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("p39_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               FLOOR(t.o_totalprice * 100 + 0.5) / 100 AS price
        FROM p39_customer c,
             LATERAL (
               SELECT o_orderkey, o_totalprice FROM p39_orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
             ) t
        ORDER BY c.c_custkey, price DESC, t.o_orderkey
        """
    )


P39_SQL = """
SELECT c.c_custkey, t.o_orderkey,
       floor(t.o_totalprice * 100 + 0.5) / 100 AS price
FROM customer c,
     LATERAL (
       SELECT o_orderkey, o_totalprice FROM orders o
       WHERE o.o_custkey = c.c_custkey
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
     ) t
ORDER BY c.c_custkey, price DESC, t.o_orderkey
"""


# --- P40 RANGE window frame --------------------------------------------------
# Value-based frame (vs P21's ROWS frames): peers within 10000 price units.
def p40_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"))
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.count("*").over(w).alias("near_cnt"),
        _roundc(F.sum("o_totalprice").over(w), 2).alias("near_sum"),
    ).orderBy("o_orderkey")


P40_SQL = """
SELECT o_orderkey, o_orderpriority,
       count(*) OVER w AS near_cnt,
       floor(sum(o_totalprice) OVER w * 100 + 0.5) / 100 AS near_sum
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
"""

def p41_dist_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / nth_value."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"), col("o_orderkey"))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        _roundc(F.percent_rank().over(w), 6).alias("pr"),
        _roundc(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
    ).orderBy("o_orderkey")


P41_SQL = """
SELECT o_orderkey, o_orderpriority,
       floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pr,
       floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cd,
       nth_value(o_orderkey, 2) OVER
         (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
"""


def p42_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one column per return flag, summed revenue per status.

    Spark's relational `groupBy().pivot()` compiles to the same
    conditional-aggregate plan DuckDB builds from CASE; values are
    enumerated so the output schema is static (required for a
    deterministic contract — and for any SQL engine's PIVOT)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = col("l_extendedprice") * (1 - col("l_discount"))
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(rev))
    )
    return out.select(
        "l_linestatus",
        *[_roundc(col(c), 2).alias(f"rev_{c.lower()}") for c in ("A", "N", "R")],
    ).orderBy("l_linestatus")


P42_SQL = """
SELECT l_linestatus,
       floor(sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice * (1 - l_discount) END) * 100 + 0.5) / 100 AS rev_a,
       floor(sum(CASE WHEN l_returnflag = 'N' THEN l_extendedprice * (1 - l_discount) END) * 100 + 0.5) / 100 AS rev_n,
       floor(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1 - l_discount) END) * 100 + 0.5) / 100 AS rev_r
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
"""


# --- P43 Q17 shape: correlated aggregate subquery ----------------------------
# `l_quantity < 0.2 * per-part average` — Catalyst decorrelates the
# correlated scalar agg into an aggregate + join (the reference relies on
# DuckDB's decorrelation for the same SQL; sql.py:160-205 delegation).
def p43_q17_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p43")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_p43")
    return spark.sql(
        """
        SELECT p.p_size,
               FLOOR(SUM(l.l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
        FROM li_p43 l JOIN part_p43 p ON p.p_partkey = l.l_partkey
        WHERE p.p_size <= 3
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM li_p43 l2 WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p.p_size ORDER BY p.p_size
        """
    )


P43_SQL = """
SELECT p.p_size,
       FLOOR(SUM(l.l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= 3
  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
GROUP BY p.p_size ORDER BY p.p_size
"""


# --- P44 Q18 shape: IN over GROUP BY ... HAVING -------------------------------
def p44_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p44")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_p44")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_p44")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey,
               FLOOR(o.o_totalprice * 100 + 0.5) / 100 AS price,
               FLOOR(t.sq * 100 + 0.5) / 100 AS sq
        FROM ord_p44 o
        JOIN cust_p44 c ON c.c_custkey = o.o_custkey
        JOIN (SELECT l_orderkey, SUM(l_quantity) AS sq
              FROM li_p44 GROUP BY l_orderkey
              HAVING SUM(l_quantity) > 150) t
          ON t.l_orderkey = o.o_orderkey
        ORDER BY o.o_orderkey
        """
    )


P44_SQL = """
SELECT c.c_custkey, o.o_orderkey,
       FLOOR(o.o_totalprice * 100 + 0.5) / 100 AS price,
       FLOOR(t.sq * 100 + 0.5) / 100 AS sq
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN (SELECT l_orderkey, SUM(l_quantity) AS sq
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150) t
  ON t.l_orderkey = o.o_orderkey
ORDER BY o.o_orderkey
"""


# --- P45 Q22 shape: scalar subquery + NOT EXISTS anti-join --------------------
# "dormant" = no order since 2000-07-01 (order dates span 1995..2001; a
# plain no-orders-at-all predicate is empty at every SF — dense fixtures)
def p45_q22_dormant(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_p45")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_p45")
    return spark.sql(
        """
        SELECT c.c_nationkey, COUNT(*) AS numcust,
               FLOOR(SUM(c.c_acctbal) * 100 + 0.5) / 100 AS totacct
        FROM cust_p45 c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM cust_p45 c2
                             WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM ord_p45 o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= DATE '2000-07-01')
        GROUP BY c.c_nationkey ORDER BY c.c_nationkey
        """
    )


P45_SQL = """
SELECT c.c_nationkey, COUNT(*) AS numcust,
       FLOOR(SUM(c.c_acctbal) * 100 + 0.5) / 100 AS totacct
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= DATE '2000-07-01')
GROUP BY c.c_nationkey ORDER BY c.c_nationkey
"""


# --- P46 Q7 shape: volume shipping between two nations ------------------------
# Classic bidirectional nation-pair filter; the disjunctive pair predicate
# lands on the joined row, revenue grouped by (supp_nation, cust_nation, yr).
# Reference reaches this via DuckDB delegation (sql.py:160-205).
def p46_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"{t}_p46")
    return spark.sql(
        """
        SELECT supp_nation, cust_nation, yr,
               FLOOR(SUM(volume) * 100 + 0.5) / 100 AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     YEAR(l.l_shipdate) AS yr,
                     l.l_extendedprice * (1 - l.l_discount) AS volume
              FROM supplier_p46 s
              JOIN lineitem_p46 l ON s.s_suppkey = l.l_suppkey
              JOIN orders_p46 o ON o.o_orderkey = l.l_orderkey
              JOIN customer_p46 c ON c.c_custkey = o.o_custkey
              JOIN nation_p46 n1 ON s.s_nationkey = n1.n_nationkey
              JOIN nation_p46 n2 ON c.c_nationkey = n2.n_nationkey
              WHERE (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
                 OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')) shipping
        GROUP BY supp_nation, cust_nation, yr
        ORDER BY supp_nation, cust_nation, yr
        """
    )


P46_SQL = """
SELECT supp_nation, cust_nation, yr,
       FLOOR(SUM(volume) * 100 + 0.5) / 100 AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             YEAR(l.l_shipdate) AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
         OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')) shipping
GROUP BY supp_nation, cust_nation, yr
ORDER BY supp_nation, cust_nation, yr
"""


# --- P47 Q8 shape: market share of one nation in a region ---------------------
# Conditional-sum-over-sum ratio per year; 6-way join with region pruning.
def p47_q8_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders", "customer", "supplier", "nation", "region", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"{t}_p47")
    return spark.sql(
        """
        SELECT yr,
               FLOOR(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                     / SUM(volume) * 10000 + 0.5) / 10000 AS mkt_share
        FROM (SELECT YEAR(o.o_orderdate) AS yr,
                     l.l_extendedprice * (1 - l.l_discount) AS volume,
                     n1.n_name AS supp_nation
              FROM part_p47 p
              JOIN lineitem_p47 l ON p.p_partkey = l.l_partkey
              JOIN supplier_p47 s ON s.s_suppkey = l.l_suppkey
              JOIN orders_p47 o ON o.o_orderkey = l.l_orderkey
              JOIN customer_p47 c ON c.c_custkey = o.o_custkey
              JOIN nation_p47 n2 ON c.c_nationkey = n2.n_nationkey
              JOIN region_p47 r ON n2.n_regionkey = r.r_regionkey
              JOIN nation_p47 n1 ON s.s_nationkey = n1.n_nationkey
              WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO') t
        GROUP BY yr ORDER BY yr
        """
    )


P47_SQL = """
SELECT yr,
       FLOOR(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
             / SUM(volume) * 10000 + 0.5) / 10000 AS mkt_share
FROM (SELECT YEAR(o.o_orderdate) AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO') t
GROUP BY yr ORDER BY yr
"""


# --- P48 Q9 shape: profit by supplier nation and year -------------------------
# (fixtures carry no partsupp/ps_supplycost, so profit = discounted revenue;
# the operator shape — LIKE-filtered part join, 5-way, two-key group — holds)
def p48_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders", "supplier", "nation", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"{t}_p48")
    return spark.sql(
        """
        SELECT nation, yr, FLOOR(SUM(amount) * 100 + 0.5) / 100 AS sum_profit
        FROM (SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS yr,
                     l.l_extendedprice * (1 - l.l_discount) AS amount
              FROM part_p48 p
              JOIN lineitem_p48 l ON p.p_partkey = l.l_partkey
              JOIN supplier_p48 s ON s.s_suppkey = l.l_suppkey
              JOIN orders_p48 o ON o.o_orderkey = l.l_orderkey
              JOIN nation_p48 n ON s.s_nationkey = n.n_nationkey
              WHERE p.p_name LIKE '%red%') profit
        GROUP BY nation, yr ORDER BY nation, yr DESC
        """
    )


P48_SQL = """
SELECT nation, yr, FLOOR(SUM(amount) * 100 + 0.5) / 100 AS sum_profit
FROM (SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%') profit
GROUP BY nation, yr ORDER BY nation, yr DESC
"""


# --- P49 Q14 shape: promo revenue share per month -----------------------------
def p49_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"{t}_p49")
    return spark.sql(
        """
        SELECT DATE_TRUNC('month', l.l_shipdate) AS mon,
               FLOOR(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                      THEN l.l_extendedprice * (1 - l.l_discount)
                                      ELSE 0 END)
                     / SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5)
               / 100 AS promo_revenue
        FROM lineitem_p49 l JOIN part_p49 p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
        GROUP BY DATE_TRUNC('month', l.l_shipdate) ORDER BY mon
        """
    )


P49_SQL = """
SELECT CAST(DATE_TRUNC('month', l.l_shipdate) AS TIMESTAMP) AS mon,
       FLOOR(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5)
       / 100 AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
GROUP BY DATE_TRUNC('month', l.l_shipdate) ORDER BY mon
"""


# --- P50 Q19 shape: disjunction of conjunctive brand/size/qty predicates ------
# Catalyst splits the common p_partkey = l_partkey conjunct out of the OR so
# the join stays equi; the residual disjunction filters post-join.
def p50_q19_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"{t}_p50")
    return spark.sql(
        """
        SELECT FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5)
               / 100 AS revenue,
               COUNT(*) AS nrows
        FROM lineitem_p50 l JOIN part_p50 p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 40)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 5 AND 50
               AND l.l_quantity BETWEEN 20 AND 50)
        """
    )


P50_SQL = """
SELECT FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5)
       / 100 AS revenue,
       COUNT(*) AS nrows
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 40)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 5 AND 50
       AND l.l_quantity BETWEEN 20 AND 50)
"""


# --- P51 Q20 shape: nested IN subqueries with HAVING threshold ----------------
# (partsupp absent: availability is derived from shipped quantity per
# supplier×part — same nested-IN + correlated-threshold operator shape)
def p51_q20_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "supplier", "nation", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"{t}_p51")
    return spark.sql(
        """
        SELECT s.s_name, FLOOR(s.s_acctbal * 100 + 0.5) / 100 AS acctbal
        FROM supplier_p51 s
        JOIN nation_p51 n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
          AND s.s_suppkey IN (
              SELECT l.l_suppkey FROM lineitem_p51 l
              WHERE l.l_partkey IN (SELECT p.p_partkey FROM part_p51 p
                                    WHERE p.p_name LIKE 'small%')
                AND l.l_shipdate >= DATE '1996-01-01'
              GROUP BY l.l_suppkey, l.l_partkey
              HAVING SUM(l.l_quantity) > 50)
        ORDER BY s.s_name
        """
    )


P51_SQL = """
SELECT s.s_name, FLOOR(s.s_acctbal * 100 + 0.5) / 100 AS acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (SELECT p.p_partkey FROM part p
                            WHERE p.p_name LIKE 'small%')
        AND l.l_shipdate >= DATE '1996-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(l.l_quantity) > 50)
ORDER BY s.s_name
"""


# --- P52 Q21 shape: EXISTS + NOT EXISTS against the same fact table -----------
# "the only supplier whose returned line blocked a multi-supplier order":
# EXISTS another supplier on the order, NOT EXISTS another supplier who also
# returned — the reference reaches the same shape through DuckDB delegation.
def p52_q21_multi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders", "supplier", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"{t}_p52")
    return spark.sql(
        """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier_p52 s
        JOIN lineitem_p52 l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders_p52 o ON o.o_orderkey = l1.l_orderkey
        JOIN nation_p52 n ON s.s_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          AND EXISTS (SELECT 1 FROM lineitem_p52 l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem_p52 l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name ORDER BY numwait DESC, s.s_name
        """
    )


P52_SQL = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name ORDER BY numwait DESC, s.s_name
"""


# --- P53 ordered funnel over the event stream ---------------------------------
# view → click → purchase with strictly increasing timestamps per user; each
# stage joins the previous stage's first-reach time and takes the first
# qualifying event after it. Three bounded aggregates (one row per user per
# stage) — at scale each stage is a map-side-combinable groupBy plus an
# equi-join on user_id; no window over the whole stream is needed.
def p53_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("ev_p53")
    return spark.sql(
        """
        WITH a AS (SELECT user_id, MIN(ts) AS t1 FROM ev_p53
                   WHERE event_type = 'view' GROUP BY user_id),
        b AS (SELECT e.user_id, MIN(e.ts) AS t2
              FROM ev_p53 e JOIN a ON a.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts > a.t1 GROUP BY e.user_id),
        c AS (SELECT e.user_id, MIN(e.ts) AS t3
              FROM ev_p53 e JOIN b ON b.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > b.t2 GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM a) AS n_view,
               (SELECT COUNT(*) FROM b) AS n_click,
               (SELECT COUNT(*) FROM c) AS n_purchase
        """
    )


P53_SQL = """
WITH a AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
b AS (SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN a ON a.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > a.t1 GROUP BY e.user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN b ON b.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > b.t2 GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM a) AS n_view,
       (SELECT COUNT(*) FROM b) AS n_click,
       (SELECT COUNT(*) FROM c) AS n_purchase
"""


# --- P54 Q13 shape: outer-join count distribution -----------------------------
# LEFT JOIN with a join-level filter (not WHERE — NULL rows must survive),
# two stacked aggregations: per-customer order count, then histogram.
def p54_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_p54")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_p54")
    return spark.sql(
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
              FROM cust_p54 c LEFT JOIN ord_p54 o
                ON o.o_custkey = c.c_custkey
               AND o.o_orderpriority <> '1-URGENT'
              GROUP BY c.c_custkey) t
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
        """
    )


P54_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# --- P55 Q15 shape: aggregate CTE + scalar-max self-reference ------------------
# revenue rounds to 2dp INSIDE the CTE so the max-equality comparison is on
# bit-identical doubles in both engines.
def p55_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p55")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("sup_p55")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
                   AS total_revenue
          FROM li_p55
          WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM sup_p55 s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
        """
    )


P55_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


# --- P56 bag-semantics set ops: EXCEPT ALL / INTERSECT ALL --------------------
# Multiplicity-preserving variants (Spark exceptAll/intersectAll); counts per
# key make the multiplicities visible to the hash compare.
def p56_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(col("s_nationkey").alias("k"))
    ex = c.exceptAll(s).groupBy("k").agg(F.count("*").alias("n_except"))
    inter = c.intersectAll(s).groupBy("k").agg(F.count("*").alias("n_intersect"))
    return (
        ex.join(inter, "k", "full_outer")
        .select(
            "k",
            F.coalesce("n_except", F.lit(0)).alias("n_except"),
            F.coalesce("n_intersect", F.lit(0)).alias("n_intersect"),
        )
        .orderBy("k")
    )


P56_SQL = """
WITH ex AS (
  SELECT k, count(*) AS n_except FROM (
    SELECT c_nationkey AS k FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
  ) GROUP BY k
),
inter AS (
  SELECT k, count(*) AS n_intersect FROM (
    SELECT c_nationkey AS k FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
  ) GROUP BY k
)
SELECT k, coalesce(n_except, 0) AS n_except, coalesce(n_intersect, 0) AS n_intersect
FROM ex FULL OUTER JOIN inter USING (k) ORDER BY k
"""


# --- P57 fuzzy matching: levenshtein self-join on a small dimension -----------
# The record-linkage primitive (same edit-distance definition in both
# engines). Self-join restricted to the 25-row nation dimension — at scale
# fuzzy joins go through blocking (LSH/n-gram) first, not all-pairs;
# dedup.py's LSH family is that path.
def p57_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    a = n.select(col("n_name").alias("name_a"))
    b = n.select(col("n_name").alias("name_b"))
    return (
        a.crossJoin(b)
        .filter(col("name_a") < col("name_b"))
        .select("name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist"))
        .filter(col("dist") <= 2)
        .orderBy("name_a", "name_b")
    )


P57_SQL = """
SELECT a.n_name AS name_a, b.n_name AS name_b,
       levenshtein(a.n_name, b.n_name) AS dist
FROM nation a, nation b
WHERE a.n_name < b.n_name AND levenshtein(a.n_name, b.n_name) <= 2
ORDER BY name_a, name_b
"""


# --- P58 forward fill (IGNORE NULLS last_value) -------------------------------
# The time-series imputation primitive: carry the last non-null observation
# forward per key. error events are masked to NULL, then filled from the
# preceding non-null value — one window, no self-join.
def p58_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("ev_p58")
    return spark.sql(
        """
        SELECT user_id, event_id,
               COALESCE(masked, 0.0) AS v_raw,
               COALESCE(
                 LAST_VALUE(masked) IGNORE NULLS OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 0.0) AS v_filled
        FROM (SELECT user_id, event_id, ts,
                     CASE WHEN event_type = 'error' THEN NULL ELSE value END AS masked
              FROM ev_p58)
        ORDER BY user_id, event_id
        """
    )


P58_SQL = """
SELECT user_id, event_id,
       COALESCE(masked, 0.0) AS v_raw,
       COALESCE(
         LAST_VALUE(masked IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         0.0) AS v_filled
FROM (SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS masked
      FROM events)
ORDER BY user_id, event_id
"""


# --- P59 keep-latest-per-key dedup (QUALIFY idiom) ----------------------------
# The daily-driver CDC/dedup idiom: one ranked window, filter rn = 1.
# Spark plans a single window over the (user_id) shuffle — no self-join.
def p59_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(col("ts").desc(), col("event_id").desc())
    return (
        e.withColumn("__rn", F.row_number().over(w))
        .filter(col("__rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 2).alias("v"))
        .orderBy("user_id")
    )


P59_SQL = """
SELECT user_id, event_id, event_type, round(value, 2) AS v
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1 ORDER BY user_id
"""




# --- P60 Q4 shape: EXISTS semi-join with date-range predicate -----------------
def p60_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_p60")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p60")
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM ord_p60 o
        WHERE o.o_orderdate >= DATE '1996-01-01'
          AND o.o_orderdate < DATE '1997-01-01'
          AND EXISTS (SELECT 1 FROM li_p60 l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
        """
    )


P60_SQL = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
"""


# --- P61 Q2 shape: correlated-min subquery picks the cheapest supplier --------
# (no partsupp in the fixtures; lineitem is the part<->supplier bridge)
def p61_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p61")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_p61")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("sup_p61")
    return spark.sql(
        """
        SELECT p.p_partkey, s.s_name,
               FLOOR(l.l_extendedprice * 100 + 0.5) / 100 AS min_price
        FROM part_p61 p
        JOIN li_p61 l ON l.l_partkey = p.p_partkey
        JOIN sup_p61 s ON s.s_suppkey = l.l_suppkey
        WHERE p.p_size <= 2
          AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                                   FROM li_p61 l2
                                   WHERE l2.l_partkey = p.p_partkey)
        ORDER BY p.p_partkey, s.s_name LIMIT 50
        """
    )


P61_SQL = """
SELECT p.p_partkey, s.s_name,
       FLOOR(l.l_extendedprice * 100 + 0.5) / 100 AS min_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size <= 2
  AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                           FROM lineitem l2
                           WHERE l2.l_partkey = p.p_partkey)
ORDER BY p.p_partkey, s.s_name LIMIT 50
"""


# --- P62 Q11 shape: HAVING against a global scalar subquery -------------------
def p62_q11_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p62")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("sup_p62")
    return spark.sql(
        """
        SELECT l.l_partkey,
               FLOOR(SUM(l.l_extendedprice) * 100 + 0.5) / 100 AS total_value
        FROM li_p62 l
        JOIN sup_p62 s ON s.s_suppkey = l.l_suppkey
        WHERE s.s_nationkey = 3
        GROUP BY l.l_partkey
        HAVING SUM(l.l_extendedprice) > (
            SELECT 0.001 * SUM(l2.l_extendedprice)
            FROM li_p62 l2 JOIN sup_p62 s2 ON s2.s_suppkey = l2.l_suppkey
            WHERE s2.s_nationkey = 3)
        ORDER BY total_value DESC, l.l_partkey LIMIT 40
        """
    )


P62_SQL = """
SELECT l.l_partkey,
       FLOOR(SUM(l.l_extendedprice) * 100 + 0.5) / 100 AS total_value
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE s.s_nationkey = 3
GROUP BY l.l_partkey
HAVING SUM(l.l_extendedprice) > (
    SELECT 0.001 * SUM(l2.l_extendedprice)
    FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    WHERE s2.s_nationkey = 3)
ORDER BY total_value DESC, l.l_partkey LIMIT 40
"""


# --- P63 Q16 shape: COUNT(DISTINCT) with NOT IN blacklist subquery ------------
def p63_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p63")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_p63")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("sup_p63")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM li_p63 l
        JOIN part_p63 p ON p.p_partkey = l.l_partkey
        WHERE p.p_size <= 5
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM sup_p63 WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_size LIMIT 40
        """
    )


P63_SQL = """
SELECT p.p_brand, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= 5
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_size LIMIT 40
"""


# --- P64 Q10 shape: top-k returned-revenue customers --------------------------
# revenue sums EXACT integer cents (floor per term, integer sum) — per-customer
# groups are small enough that double fold order flips the last cent between
# engines; integer-cent addition is order-free and bit-identical
def p64_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p64")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_p64")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_p64")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nat_p64")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, n.n_name,
               SUM(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)) / CAST(100 AS DOUBLE) AS revenue
        FROM cust_p64 c
        JOIN ord_p64 o ON o.o_custkey = c.c_custkey
        JOIN li_p64 l ON l.l_orderkey = o.o_orderkey
        JOIN nat_p64 n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= DATE '1996-01-01'
          AND o.o_orderdate < DATE '1996-07-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey LIMIT 20
        """
    )


P64_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)) AS BIGINT) / 100.0 AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1996-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey LIMIT 20
"""


# --- P65 Q3 shape: shipping-priority top-k ------------------------------------
def p65_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p65")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_p65")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_p65")
    return spark.sql(
        """
        SELECT l.l_orderkey,
               FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100 AS revenue,
               o.o_orderdate
        FROM cust_p65 c
        JOIN ord_p65 o ON o.o_custkey = c.c_custkey
        JOIN li_p65 l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < DATE '1997-01-01'
          AND l.l_shipdate > DATE '1997-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey LIMIT 10
        """
    )


P65_SQL = """
SELECT l.l_orderkey,
       FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100 AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1997-01-01'
  AND l.l_shipdate > DATE '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
"""


# --- P66 Q6 shape: pure scan aggregate with range predicates ------------------
def p66_q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p66")
    return spark.sql(
        """
        SELECT FLOOR(SUM(l_extendedprice * l_discount) * 100 + 0.5) / 100 AS revenue
        FROM li_p66
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 25
        """
    )


P66_SQL = """
SELECT FLOOR(SUM(l_extendedprice * l_discount) * 100 + 0.5) / 100 AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
"""




# --- P67 Q1 shape: the pricing-summary scan aggregate -------------------------
# money sums use EXACT integer cents (per-term floor, integer sum) so the
# totals are fold-order-free across engines; averages round at 1e-6 on
# group sizes where double noise is ~1e-10 relative
def p67_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p67")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
               SUM(FLOOR(l_extendedprice * 100 + 0.5)) / CAST(100 AS DOUBLE) AS sum_base_price,
               SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / CAST(100 AS DOUBLE) AS sum_disc_price,
               FLOOR(AVG(l_quantity) * 1000000 + 0.5) / 1000000 AS avg_qty,
               FLOOR(AVG(l_discount) * 1000000 + 0.5) / 1000000 AS avg_disc,
               COUNT(*) AS count_order
        FROM li_p67
        WHERE l_shipdate <= DATE '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


P67_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       CAST(SUM(FLOOR(l_extendedprice * 100 + 0.5)) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)) AS BIGINT) / 100.0 AS sum_disc_price,
       FLOOR(AVG(l_quantity) * 1000000 + 0.5) / 1000000 AS avg_qty,
       FLOOR(AVG(l_discount) * 1000000 + 0.5) / 1000000 AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- P68 Q12 shape: join + two-way conditional counts -------------------------
# (no l_shipmode in the fixtures; l_returnflag plays the grouping column and
# o_orderpriority the CASE dimension — same plan shape: join + CASE-sum)
def p68_q12_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_p68")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_p68")
    return spark.sql(
        """
        SELECT l.l_returnflag,
               SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM ord_p68 o JOIN li_p68 l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= DATE '1996-01-01'
          AND l.l_shipdate < DATE '1997-01-01'
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag
        """
    )


P68_SQL = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= DATE '1996-01-01'
  AND l.l_shipdate < DATE '1997-01-01'
GROUP BY l.l_returnflag ORDER BY l.l_returnflag
"""


def p69_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL — the modern-SQL convenience both
    engines grew (Spark 3.4+, DuckDB): non-aggregate targets become the
    grouping set implicitly. Through the engine SQL door."""
    from mindsdb_spark.queries.engine_queries import _session

    sess = _session(spark, sf_dir)
    return sess.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
               FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS rev
        FROM tpch_orders GROUP BY ALL ORDER BY ALL
        """
    )


P69_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS rev
FROM orders GROUP BY ALL ORDER BY ALL
"""




# --- P70 three-valued logic: NULLs inside IN / NOT IN subqueries --------------
# The classic cross-engine divergence spot: `x IN (subquery with NULLs)` is
# TRUE on a match and UNKNOWN (not FALSE) otherwise; `NOT IN` over a set
# containing NULL can never be TRUE. Both engines must implement identical
# SQL 3VL for the row sets to agree.
def p70_null_in_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mindsdb_spark.queries.engine_queries import _session

    sess = _session(spark, sf_dir)
    return sess.sql(
        """
        SELECT c_custkey,
               CASE WHEN c_custkey IN (
                      SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                              ELSE o_custkey END
                      FROM tpch_orders WHERE o_totalprice > 200000)
                    THEN 1 ELSE 0 END AS in_rich
        FROM tpch_customer ORDER BY c_custkey
        """
    )


P70_SQL = """
SELECT c_custkey,
       CASE WHEN c_custkey IN (
              SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                          ELSE o_custkey END
              FROM orders WHERE o_totalprice > 200000)
            THEN 1 ELSE 0 END AS in_rich
FROM customer ORDER BY c_custkey
"""

# --- P71 cohort retention matrix ---------------------------------------------
def p71_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-event week, distinct
    actives counted per weeks-since-cohort — the canonical product-analytics
    rollup. Two aggregates (first-event per user, distinct user-week
    actions) joined on the user key; week arithmetic stays integer
    (floor(day-diff / 7)) so both engines agree exactly."""
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    acts = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    week_n = F.floor(
        F.datediff(F.col("wk"), F.col("cohort")) / F.lit(7)
    ).cast("int")
    return (
        acts.join(first, "user_id")
        .select("cohort", week_n.alias("week_n"), "user_id")
        .groupBy("cohort", "week_n")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort", "week_n")
    )


P71_SQL = """
WITH first AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
               FROM events GROUP BY user_id),
acts AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
SELECT f.cohort,
       CAST(floor(date_diff('day', f.cohort, a.wk) / 7.0) AS INT) AS week_n,
       count(DISTINCT a.user_id) AS n_users
FROM acts a JOIN first f USING (user_id)
GROUP BY f.cohort, week_n
ORDER BY f.cohort, week_n
"""


# --- P72 DAU / WAU / stickiness ----------------------------------------------
def p72_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day actives, and the DAU/WAU
    stickiness ratio — the canonical engagement rollup. The trailing
    distinct-user count is a range self-join on the (day, user) DISTINCT
    table (windowed COUNT DISTINCT doesn't exist in either engine); the
    joined table is days x active-users, already deduplicated, so the join
    fans out by window width (7), not event volume."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        F.date_trunc("day", F.col("ts")).alias("d"), "user_id"
    ).distinct()
    dau = days.groupBy("d").agg(F.count("*").alias("dau"))
    anchors = days.select("d").distinct().withColumnRenamed("d", "ad")
    wau = (
        anchors.join(
            days,
            (F.col("d") <= F.col("ad"))
            & (F.col("d") >= F.expr("ad - INTERVAL 6 DAYS")),
        )
        .groupBy("ad")
        .agg(F.count_distinct("user_id").alias("wau"))
        .withColumnRenamed("ad", "d")
    )
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        dau.join(wau, "d")
        .select("d", "dau", "wau", r6(F.col("dau") / F.col("wau")).alias("stickiness"))
        .orderBy("d")
    )


P72_SQL = """
WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
dau AS (SELECT d, count(*) AS dau FROM days GROUP BY d),
wau AS (SELECT a.d, count(DISTINCT b.user_id) AS wau
        FROM (SELECT DISTINCT d FROM days) a
        JOIN days b ON b.d <= a.d AND b.d >= a.d - INTERVAL 6 DAY
        GROUP BY a.d)
SELECT dau.d, dau.dau, wau.wau,
       floor(dau.dau / CAST(wau.wau AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS stickiness
FROM dau JOIN wau USING (d) ORDER BY d
"""


# --- P73 recursive CTE (delegated SELECT surface) ---------------------------
def p73_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through the SQL surface (reference: everything inside
    a QueryStep/SubSelectStep runs on DuckDB, whose SELECT surface includes
    recursive CTEs — utilities/sql.py:208-352; Spark 4 executes them
    natively as an iterative union loop). The recursion walks 6 steps from
    the ASIA region key and joins each step back to `nation` — anchor on a
    real table, recursive arithmetic, table join over the recursion output.
    """
    _t(spark, sf_dir, "region").createOrReplaceTempView("p73_region")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("p73_nation")
    return spark.sql(
        """
        WITH RECURSIVE walk(rk, step) AS (
          SELECT CAST(r_regionkey AS INT), 1 FROM p73_region
          WHERE r_name = 'ASIA'
          UNION ALL
          SELECT rk + 4, step + 1 FROM walk WHERE step < 6
        )
        SELECT w.step, w.rk, n.n_name
        FROM walk w JOIN p73_nation n ON n.n_nationkey = w.rk
        ORDER BY w.step
        """
    )


P73_SQL = """
WITH RECURSIVE walk(rk, step) AS (
  SELECT CAST(r_regionkey AS INT) AS rk, 1 AS step FROM region
  WHERE r_name = 'ASIA'
  UNION ALL
  SELECT rk + 4, step + 1 FROM walk WHERE step < 6
)
SELECT w.step, w.rk, n.n_name
FROM walk w JOIN nation n ON n.n_nationkey = w.rk
ORDER BY w.step
"""


PROBES_EXT = {
    "p33_cube": (p33_cube, P33_SQL),
    "p34_grouping_sets": (p34_grouping_sets, P34_SQL),
    "p35_string_agg": (p35_string_agg, P35_SQL),
    "p36_percentiles": (p36_percentiles, P36_SQL),
    "p37_filtered_agg": (p37_filtered_agg, P37_SQL),
    "p38_approx_distinct": (p38_approx_distinct, None),
    "p39_lateral": (p39_lateral, P39_SQL),
    "p40_range_frame": (p40_range_frame, P40_SQL),
    "p41_dist_windows": (p41_dist_windows, P41_SQL),
    "p42_pivot": (p42_pivot, P42_SQL),
    "p43_q17_correlated": (p43_q17_correlated, P43_SQL),
    "p44_q18_big_orders": (p44_q18_big_orders, P44_SQL),
    "p45_q22_dormant": (p45_q22_dormant, P45_SQL),
    "p46_q7_volume": (p46_q7_volume, P46_SQL),
    "p47_q8_share": (p47_q8_share, P47_SQL),
    "p48_q9_profit": (p48_q9_profit, P48_SQL),
    "p49_q14_promo": (p49_q14_promo, P49_SQL),
    "p50_q19_disjunct": (p50_q19_disjunct, P50_SQL),
    "p51_q20_nested_in": (p51_q20_nested_in, P51_SQL),
    "p52_q21_multi_exists": (p52_q21_multi_exists, P52_SQL),
    "p53_funnel": (p53_funnel, P53_SQL),
    "p54_q13_custdist": (p54_q13_custdist, P54_SQL),
    "p56_set_ops_all": (p56_set_ops_all, P56_SQL),
    "p57_fuzzy_match": (p57_fuzzy_match, P57_SQL),
    "p58_forward_fill": (p58_forward_fill, P58_SQL),
    "p59_keep_latest": (p59_keep_latest, P59_SQL),
    "p55_q15_top_supplier": (p55_q15_top_supplier, P55_SQL),
    "p60_q4_priority": (p60_q4_priority, P60_SQL),
    "p61_q2_min_cost": (p61_q2_min_cost, P61_SQL),
    "p62_q11_threshold": (p62_q11_threshold, P62_SQL),
    "p63_q16_supplier_cnt": (p63_q16_supplier_cnt, P63_SQL),
    "p64_q10_returns": (p64_q10_returns, P64_SQL),
    "p65_q3_shipping": (p65_q3_shipping, P65_SQL),
    "p66_q6_revenue": (p66_q6_revenue, P66_SQL),
    "p67_q1_pricing": (p67_q1_pricing, P67_SQL),
    "p68_q12_priority_mix": (p68_q12_priority_mix, P68_SQL),
    "p69_group_by_all": (p69_group_by_all, P69_SQL),
    "p70_null_in_semantics": (p70_null_in_semantics, P70_SQL),
    "p71_retention": (p71_retention, P71_SQL),
    "p72_stickiness": (p72_stickiness, P72_SQL),
    "p73_recursive_cte": (p73_recursive_cte, P73_SQL),
}
