"""Remaining TPC-H query shapes (Q2, Q4, Q7-Q11, Q13, Q15-Q17, Q19-Q22 —
with relational_queries.py this completes all 22), adapted to the driver's
narrowed star schema (no partsupp table, no l_commitdate/l_receiptdate, no
c_phone — each adaptation is noted per query).

The reference has no joins at all (SURVEY §2.10), so like
relational_queries.py this module is beyond-reference extension coverage:
the correlation / outer-join / disjunctive-predicate patterns a complete
engine must plan well.

Scale notes (100 TB) are given per query; the recurring principles:
- nation/region are constant-size (25/5 rows) → always broadcast;
- supplier/part/customer grow with SF → leave the strategy to AQE unless
  a filter provably shrinks them to broadcast size;
- orders⋈lineitem is the fact-fact join → shuffle on orderkey, AQE skew
  handling; never nest it under a per-row subquery (Catalyst decorrelates
  EXISTS/IN/scalar subqueries into joins — verified in plan tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flinkapps_spark.operators import joins
from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.exact import (exact_avg, exact_sum, sql_avg,
                                         sql_sum, sql_units, units_col)
from flinkapps_spark.sources.batch import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@query(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    category="extension: EXISTS semi join (TPC-H Q4 shape)",
    doc="Order-priority checking: EXISTS with an extra inequality on the "
        "correlated row (adapted: l_shipdate > o_orderdate stands in for "
        "l_commitdate < l_receiptdate, absent from the fixture). Spark plans "
        "the EXISTS as a LeftSemi hash join on orderkey with the inequality "
        "as a join residual — one shuffle, no per-row subquery. Scale: "
        "semi join keeps only orders columns (no row multiplication by the "
        "~4 lineitems/order).",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-07-01 00:00:00")))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    exists = joins.semi_join(
        od, li,
        (od.o_orderkey == li.l_orderkey) & (li.l_shipdate > od.o_orderdate))
    return exists.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count"))


@query(
    "q7_volume_shipping",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               {sql_sum('volume')} AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     YEAR(l_shipdate) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM supplier
                JOIN lineitem ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    category="extension: self-joined dimension (TPC-H Q7 shape)",
    doc="Volume shipping between two nations: the nation table joins TWICE "
        "under different roles (supplier's vs customer's nation) with a "
        "disjunctive cross-pair filter. Scale: both nation joins broadcast "
        "(25 rows, always); the nation-pair filter can only be applied "
        "after both joins — Catalyst still pushes the year range to the "
        "lineitem scan. orders⋈lineitem shuffles on orderkey; "
        "supplier/customer joins are AQE-sized.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00")))
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    n1 = na.select(F.col("n_nationkey").alias("n1_key"),
                   F.col("n_name").alias("supp_nation"))
    n2 = na.select(F.col("n_nationkey").alias("n2_key"),
                   F.col("n_name").alias("cust_nation"))
    j = (li.join(su, F.col("l_suppkey") == F.col("s_suppkey"))
         .join(od, F.col("o_orderkey") == F.col("l_orderkey"))
         .join(cu, F.col("c_custkey") == F.col("o_custkey")))
    j = joins.broadcast_dim_join(j, n1, F.col("s_nationkey") == F.col("n1_key"))
    j = joins.broadcast_dim_join(j, n2, F.col("c_nationkey") == F.col("n2_key"))
    pair = (((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    return (j.filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue")))


@query(
    "q8_market_share",
    oracle=f"""
        SELECT o_year,
               {sql_sum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")}
                     / {sql_sum('volume')} AS mkt_share
        FROM (SELECT YEAR(o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS nation
              FROM part
                JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region    ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'ASIA' AND p_type = 'PROMO'
                AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') all_nations
        GROUP BY o_year
    """,
    category="extension: conditional ratio agg (TPC-H Q8 shape)",
    doc="National market share: fraction of regional revenue supplied by "
        "one nation, per year — a conditional-sum / total-sum ratio in one "
        "aggregation pass (no self-join, no window). Scale: 8-way join "
        "tree where region/nation broadcast always; the PROMO part filter "
        "shrinks part before its join (pushed to the scan); single "
        "group-by on ~years groups so the final agg is tiny. Ratio of two "
        "fixed-point sums, unrounded — bit-identical on both engines.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00")))
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = na.select(F.col("n_nationkey").alias("n1_key"),
                   F.col("n_regionkey").alias("n1_region"))
    n2 = na.select(F.col("n_nationkey").alias("n2_key"),
                   F.col("n_name").alias("nation"))
    j = (li.join(F.broadcast(pa), F.col("p_partkey") == F.col("l_partkey"))
         .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
         .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(cu, F.col("o_custkey") == F.col("c_custkey")))
    j = joins.broadcast_dim_join(j, n1, F.col("c_nationkey") == F.col("n1_key"))
    j = joins.broadcast_dim_join(j, re, F.col("n1_region") == F.col("r_regionkey"))
    j = joins.broadcast_dim_join(j, n2, F.col("s_nationkey") == F.col("n2_key"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    share_num = exact_sum(
        F.when(F.col("nation") == "NATION_3", volume).otherwise(F.lit(0.0)))
    return (j.groupBy(F.year("o_orderdate").alias("o_year"))
            .agg((share_num / exact_sum(volume)).alias("mkt_share")))


@query(
    "q9_product_profit",
    oracle=f"""
        SELECT nation, o_year,
               {sql_sum('amount')} AS sum_profit
        FROM (SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount) AS amount
              FROM part
                JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN nation   ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%widget%') profit
        GROUP BY nation, o_year
    """,
    category="extension: LIKE-filtered join agg (TPC-H Q9 shape)",
    doc="Product-type profit by supplier nation and year (adapted: amount "
        "is discounted revenue — the fixture has no ps_supplycost). The "
        "%widget% infix LIKE cannot use min/max pruning, so it runs as a "
        "scan-level string predicate on part (still pushed, still pruned "
        "to 2 columns). Scale: filtered part (~13%) joins lineitem on "
        "partkey — shuffle join at 100 TB (part grows with SF, too big to "
        "broadcast unfiltered); nation broadcasts.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    od = load_table(spark, sf_dir, "orders")
    na = load_table(spark, sf_dir, "nation")
    j = (li.join(pa, F.col("p_partkey") == F.col("l_partkey"))
         .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
         .join(od, F.col("o_orderkey") == F.col("l_orderkey")))
    j = joins.broadcast_dim_join(j, na, F.col("s_nationkey") == F.col("n_nationkey"))
    return (j.groupBy(F.col("n_name").alias("nation"),
                      F.year("o_orderdate").alias("o_year"))
            .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("sum_profit")))


@query(
    "q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name,
               {sql_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
               c_acctbal, n_name
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    category="extension: top-k join agg (TPC-H Q10 shape)",
    doc="Returned-item reporting: top-20 customers by lost revenue in a "
        "quarter. Scale: returnflag + quarter filters push to the lineitem/"
        "orders scans before the orderkey shuffle join; the grouped result "
        "is customer-cardinality, and top-k runs as TakeOrderedAndProject "
        "(heap per partition + merge of 20-row heads — no global sort). "
        "Deterministic: rounded revenue, unique custkey tiebreak.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00")))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = load_table(spark, sf_dir, "nation")
    j = (li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(cu, F.col("c_custkey") == F.col("o_custkey")))
    j = joins.broadcast_dim_join(j, na, F.col("c_nationkey") == F.col("n_nationkey"))
    return (j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


@query(
    "q13_order_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count
    """,
    category="extension: outer-join histogram (TPC-H Q13 shape)",
    doc="Customer order-count distribution: LEFT OUTER join with a "
        "predicate INSIDE the join condition (filtering the right side "
        "only — moving it to WHERE would wrongly drop order-less "
        "customers), COUNT(col) null-skip semantics, then a second "
        "aggregation over the counts. Adapted: priority <> '1-URGENT' "
        "stands in for the comment NOT LIKE filter. Scale: two shuffles "
        "(custkey, then c_count); the second input is one row per "
        "customer, the final histogram ~tens of rows.",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").select("c_custkey")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT").select("o_custkey", "o_orderkey")
    per_cust = (cu.join(od, cu.c_custkey == od.o_custkey, "left_outer")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q16_supplier_cnt",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    category="extension: distinct-agg + NOT IN (TPC-H Q16 shape)",
    doc="Supplier count per part group, excluding a supplier blocklist "
        "(adapted: lineitem is the part-supplier association — no partsupp "
        "table; negative account balance stands in for complaints). NOT IN "
        "over a provably non-null key column = LeftAnti join (the "
        "null-semantics trap of NOT IN doesn't bite; test pins it). "
        "COUNT(DISTINCT) expands to a two-phase partial-distinct "
        "aggregate. Scale: the blocklist is tiny → broadcast anti join; "
        "part filter prunes before the partkey join.",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    li = joins.anti_join(li, F.broadcast(bad),
                         li.l_suppkey == F.col("s_suppkey"))
    return (li.join(F.broadcast(pa), F.col("p_partkey") == F.col("l_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@query(
    "q17_small_qty_revenue",
    oracle=f"""
        SELECT SUM({sql_units('l1.l_extendedprice', 100)})
                 / 100.0 / 7.0 AS avg_yearly
        FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        WHERE p_brand = 'Brand#3'
          AND l1.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l1.l_partkey)
    """,
    category="extension: correlated avg subquery (TPC-H Q17 shape)",
    doc="Small-quantity-order revenue: rows below 20% of their part's "
        "average quantity. The correlated AVG decorrelates into a "
        "per-partkey aggregate joined back on partkey — Spark builds it "
        "explicitly here (same plan Catalyst derives from the SQL form): "
        "one groupBy(partkey).avg over ONLY the brand's parts (push the "
        "brand filter into the inner agg's domain via semi join — at "
        "100 TB aggregating all parts when the outer needs 0.3% would be "
        "the classic decorrelation waste; DuckDB's optimizer does the "
        "same sideways pass).",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    # restrict to the brand's parts once; reuse for both branches
    li_b = li.join(F.broadcast(pa), F.col("p_partkey") == F.col("l_partkey"))
    thresh = (li_b.groupBy(F.col("l_partkey").alias("t_partkey"))
              .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")))
    cents = units_col(F.col("l_extendedprice"), 100)
    return (li_b.join(thresh, F.col("l_partkey") == F.col("t_partkey"))
            .filter(F.col("l_quantity") < F.col("qty_thresh"))
            .agg((F.sum(cents) / 100.0 / 7.0).alias("avg_yearly")))


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
        SELECT {sql_sum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    category="extension: disjunctive join predicate (TPC-H Q19 shape)",
    doc="Discounted revenue under a 3-arm OR of brand/size/quantity "
        "conjunctions — the classic CNF-extraction case: Catalyst factors "
        "the part-only predicate (brand IN ... AND size <= 15) out of the "
        "OR and pushes it to the part scan, and the lineitem-only "
        "(quantity <= 30) to the lineitem scan, leaving the cross-table "
        "residual on the join. Scale: that extraction is what keeps the "
        "partkey join input small; without it the OR would force "
        "full-table join inputs.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(pa, F.col("p_partkey") == F.col("l_partkey"))
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand) & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi))
    cond = (arm("Brand#1", 5, 1, 11) | arm("Brand#2", 10, 10, 20)
            | arm("Brand#3", 15, 20, 30))
    return j.filter(cond).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue"))


@query(
    "q20_part_promotion",
    oracle="""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'red%'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(l_quantity) > 100)
    """,
    category="extension: IN over grouped HAVING (TPC-H Q20 shape)",
    doc="Part-promotion suppliers: IN-subquery whose body is itself a "
        "grouped HAVING (suppliers that moved >100 units of some 'red' "
        "part; adapted — availqty vs half-of-shipped becomes a fixed "
        "threshold, no partsupp). Spark: the prefix LIKE 'red%' is "
        "range-prunable at the scan; the IN becomes a LeftSemi join "
        "against the (suppkey,partkey) aggregate. Scale: the aggregate "
        "shrinks lineitem to association cardinality before the semi "
        "join, so supplier never joins raw lineitem.",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    pa = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity")
    heavy = (li.join(F.broadcast(pa), F.col("p_partkey") == F.col("l_partkey"))
             .groupBy("l_suppkey", "l_partkey")
             .agg(F.sum("l_quantity").alias("qty"))
             .filter(F.col("qty") > 100)
             .select("l_suppkey").distinct())
    return joins.semi_join(su, heavy, su.s_suppkey == F.col("l_suppkey"))


@query(
    "q22_dormant_customers",
    oracle=f"""
        SELECT cntry, COUNT(*) AS numcust,
               {sql_sum('c_acctbal', 100)} AS totacctbal
        FROM (SELECT CAST(c_nationkey % 10 AS INT) AS cntry,
                     c_acctbal, c_custkey
              FROM customer
              WHERE c_nationkey % 10 IN (1, 3, 5, 7)
                AND c_acctbal > (SELECT {sql_avg('c_acctbal', 100)}
                                 FROM customer
                                 WHERE c_acctbal > 0
                                   AND c_nationkey % 10 IN (1, 3, 5, 7))
                AND NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey
                                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
             ) custsale
        GROUP BY cntry
    """,
    category="extension: scalar subquery + NOT EXISTS (TPC-H Q22 shape)",
    doc="Global-sales-opportunity: above-average-balance customers with no "
        "recent orders, grouped by country code (adapted: nationkey%10 "
        "stands in for the phone prefix, 'no orders since 2000' for 'no "
        "orders ever' — every fixture customer has some order). Composes "
        "an uncorrelated scalar subquery (one global AVG, broadcast as a "
        "1-row cross join — computed once, not per row) with a LeftAnti "
        "join for NOT EXISTS. Scale: anti join shuffles on custkey; the "
        "date filter shrinks the right side first.",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    code = (F.col("c_nationkey") % 10).cast("int")
    cu = cu.select("c_custkey", "c_acctbal", code.alias("cntry")).filter(
        F.col("cntry").isin(1, 3, 5, 7))
    # fixed-point avg: the comparison boundary must be the same double on
    # both engines (a plain double AVG is partition-order dependent)
    avg_bal = cu.filter(F.col("c_acctbal") > 0).agg(
        exact_avg("c_acctbal", 100).alias("avg_bal"))
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01 00:00:00")).select("o_custkey")
    rich = (cu.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("avg_bal")))
    dormant = joins.anti_join(rich, recent,
                              F.col("c_custkey") == F.col("o_custkey"))
    return dormant.groupBy("cntry").agg(
        F.count("*").alias("numcust"),
        exact_sum("c_acctbal", 100).alias("totacctbal"))


@query(
    "cube_status_priority",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {sql_sum('o_totalprice', 100)} AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    category="extension: cube grouping",
    doc="CUBE over (status, priority): all 4 grouping sets in one pass — "
        "Spark Expand duplicates each input row per grouping set before "
        "one hash aggregate (rows×4 map-side, but partial agg collapses "
        "to |groups| per task before the shuffle). Complements "
        "rollup_status_priority (hierarchical sets). NULL marks the "
        "rolled-up dimensions on both engines; money summed fixed-point.",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return (od.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 exact_sum("o_totalprice", 100).alias("total_price")))


@query(
    "q2_min_cost_supplier",
    oracle="""
        WITH supply AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey),
        eu AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE')
        SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost
        FROM supply
          JOIN eu   ON l_suppkey = s_suppkey
          JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'STANDARD' AND p_size >= 40
          AND unit_cost = (SELECT MIN(s2.unit_cost)
                           FROM supply s2 JOIN eu e2
                             ON s2.l_suppkey = e2.s_suppkey
                           WHERE s2.l_partkey = p_partkey)
    """,
    category="extension: correlated scalar-min subquery (TPC-H Q2 shape)",
    doc="Minimum-cost supplier per part within a region (adapted: the "
        "fixture has no partsupp, so supply cost is the observed minimum "
        "unit price MIN(l_extendedprice/l_quantity) per (part, supplier) "
        "derived from lineitem; reference TPC-H Q2 reads ps_supplycost). "
        "The correlated scalar MIN decorrelates into a window MIN over "
        "partkey followed by an equality filter — one extra shuffle on "
        "partkey, no per-row subquery. Cross-engine float safety: the "
        "compared values are MINs of identical double sets (min is "
        "order-independent), so the equality is exact on both engines. "
        "Scale: supply is a lineitem rollup (shuffle on part+supp); the "
        "region-filtered supplier side broadcasts only nation/region "
        "(constant); the part filter is scan-pushed.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    li = load_table(spark, sf_dir, "lineitem")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    su = load_table(spark, sf_dir, "supplier")
    su = joins.broadcast_dim_join(
        su, na, F.col("s_nationkey") == F.col("n_nationkey"))
    su = joins.broadcast_dim_join(
        su, re, F.col("n_regionkey") == F.col("r_regionkey"))
    pa = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") >= 40))
    # push BOTH selective dims below the big aggregation: broadcast semi
    # joins shrink the (partkey, suppkey) agg input to matching parts ×
    # EUROPE suppliers BEFORE the shuffle — at 100 TB the aggregation
    # reads a few percent of lineitem instead of all of it, and no
    # semantics change (the dims re-join for payload columns after).
    li = (li.join(F.broadcast(pa.select("p_partkey")),
                  F.col("l_partkey") == F.col("p_partkey"), "left_semi")
          .join(F.broadcast(su.select("s_suppkey")),
                F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"))
    supply = (li.groupBy("l_partkey", "l_suppkey")
              .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                   .alias("unit_cost")))
    cand = (supply.join(F.broadcast(su),
                        F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(pa), F.col("p_partkey") == F.col("l_partkey")))
    w = Window.partitionBy("p_partkey")
    return (cand.withColumn("min_cost", F.min("unit_cost").over(w))
            .filter(F.col("unit_cost") == F.col("min_cost"))
            .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name",
                    "unit_cost"))


@query(
    "q11_important_stock",
    oracle=f"""
        WITH natl AS (
            SELECT l_partkey AS p_partkey,
                   CAST(SUM({sql_units('l_extendedprice * l_quantity', 100)})
                        AS BIGINT) AS units
            FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY l_partkey)
        SELECT p_partkey, units / 100.0 AS part_value
        FROM natl
        WHERE units > 0.001 * (SELECT SUM(units) FROM natl)
    """,
    category="extension: HAVING vs scalar-subquery total (TPC-H Q11 shape)",
    doc="Important stock identification (adapted: part value is "
        "SUM(l_extendedprice * l_quantity) over one nation's line items — "
        "the fixture has no partsupp availqty/supplycost). The grand-total "
        "scalar subquery evaluates once and broadcasts; the per-part "
        "threshold compare happens in integer unit space scaled by a "
        "float fraction, so both engines compare the same exact int64 "
        "against the same double. Scale: one shuffle to roll up partkey; "
        "the nation filter prunes the supplier join input; the rolled-up "
        "CTE is computed once and reused for both the total and the "
        "per-part rows (Spark: cached two-consumer plan is unnecessary — "
        "the total is a 1-row broadcast).",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    na = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3")
    su = load_table(spark, sf_dir, "supplier")
    su = joins.broadcast_dim_join(
        su, na, F.col("s_nationkey") == F.col("n_nationkey"))
    units = units_col(F.col("l_extendedprice") * F.col("l_quantity"), 100)
    natl = (li.join(su, F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy(F.col("l_partkey").alias("p_partkey"))
            .agg(F.sum(units).alias("units")))
    total = natl.agg(F.sum("units").alias("total_units"))
    return (natl.crossJoin(F.broadcast(total))
            .filter(F.col("units") > 0.001 * F.col("total_units"))
            .select("p_partkey", (F.col("units") / 100.0).alias("part_value")))


@query(
    "q15_top_supplier",
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(SUM({sql_units('l_extendedprice * (1 - l_discount)',
                                       10000)}) AS BIGINT) AS units
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, units / 10000.0 AS total_revenue
        FROM rev JOIN supplier ON s_suppkey = l_suppkey
        WHERE units = (SELECT MAX(units) FROM rev)
    """,
    category="extension: argmax vs scalar-subquery max (TPC-H Q15 shape)",
    doc="Top supplier by quarterly revenue: the revenue 'view' (CTE) is "
        "referenced twice — once for the per-supplier rows, once for the "
        "scalar MAX — and the equality keeps every tied supplier, exactly "
        "TPC-H Q15's semantics. Revenue is a fixed-point int64 sum, so "
        "the tie compare is exact integer equality on both engines (a "
        "double SUM here could split ties differently per engine). "
        "Scale: one shuffle on suppkey for the rollup; the MAX is a "
        "1-row broadcast; supplier join is AQE-sized.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00")))
    units = units_col(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                      10000)
    rev = (li.groupBy("l_suppkey").agg(F.sum(units).alias("units")))
    mx = rev.agg(F.max("units").alias("max_units"))
    su = load_table(spark, sf_dir, "supplier")
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("units") == F.col("max_units"))
            .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
            .select("s_suppkey", "s_name",
                    (F.col("units") / 10000.0).alias("total_revenue")))


@query(
    "q21_waiting_supplier",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
          JOIN orders   ON o_orderkey = l1.l_orderkey
          JOIN supplier ON s_suppkey = l1.l_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND n_name = 'NATION_2'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate >
                                o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    category="extension: EXISTS + NOT EXISTS double correlation "
             "(TPC-H Q21 shape)",
    doc="Suppliers who kept orders waiting (adapted: 'late' is "
        "l_shipdate > o_orderdate + 60 days — the fixture has no "
        "l_commitdate/l_receiptdate). The oracle keeps the literal "
        "EXISTS / NOT EXISTS double correlation; the Spark plan uses the "
        "decorrelated one-aggregation rewrite: per order, count distinct "
        "suppliers and distinct LATE suppliers, then a late line qualifies "
        "iff its order has >1 supplier and exactly 1 late supplier — "
        "provably the same set, and it replaces two correlated semi/anti "
        "joins with a two-level aggregation ((orderkey, suppkey) → "
        "max(late), then orderkey), chosen over a double countDistinct "
        "whose Expand doubles rows and shuffles on a wide gid key; an "
        "orderkey partitioning satisfies both levels. Top-20 via "
        "orderBy+limit → "
        "TakeOrderedAndProject; (numwait DESC, s_name) is a total order "
        "so the cut is deterministic on both engines.",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    j = (li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
         .withColumn("late", F.col("l_shipdate")
                     > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")))
    # two-level agg instead of a double countDistinct: the multi-distinct
    # form Expands every row with a gid column and shuffles on the wide
    # (orderkey, suppkey, case, gid) key; (orderkey, suppkey) → max(late)
    # then orderkey keeps keys narrow, and an orderkey partitioning
    # satisfies BOTH levels (no extra exchange between them).
    # The late-line COUNT rides the same aggregation (round-9, guide
    # §1.2/§2.4): a qualifying order has EXACTLY ONE late supplier, so
    # its numwait contribution is that supplier's late-line count —
    # max(when(supp_late, ...)) picks the pair unambiguously.  The old
    # form recomputed the lineitem⋈orders join a second time and
    # shuffle-joined it back against the qualifying orders; both passes
    # fold into the aggregation the query already pays for.
    per_order = (j.groupBy("l_orderkey", "l_suppkey")
                 .agg(F.max("late").alias("supp_late"),
                      F.count(F.when(F.col("late"), 1))
                      .alias("n_late_lines"))
                 .groupBy("l_orderkey")
                 .agg(F.count("*").alias("n_supp"),
                      F.count(F.when(F.col("supp_late"), 1))
                      .alias("n_late_supp"),
                      F.max(F.when(F.col("supp_late"),
                                   F.col("l_suppkey"))).alias("late_skey"),
                      F.max(F.when(F.col("supp_late"),
                                   F.col("n_late_lines")))
                      .alias("late_lines")))
    qualifying = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    na = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_2")
    su = load_table(spark, sf_dir, "supplier")
    su = joins.broadcast_dim_join(
        su, na, F.col("s_nationkey") == F.col("n_nationkey"))
    return (qualifying.join(F.broadcast(su),
                            F.col("late_skey") == F.col("s_suppkey"))
            .groupBy("s_name").agg(F.sum("late_lines").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name").limit(20))
