package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Exact._

/** Relational query surface (SURVEY.md §2.2) — the analytics a catalog
  * client (reference: Bodo-inc/denali, routes/tables.go) runs against
  * its tables, expressed as declarative DataFrame plans so Catalyst
  * performs pushdown, pruning, join selection and AQE re-planning.
  *
  * Scale notes per query are in the Scaladoc; dims (region, nation,
  * supplier, part) are explicitly broadcast — they stay tiny at any SF
  * — while fact-fact joins shuffle on their keys and rely on AQE for
  * skew handling at the 100 TB target.
  */
object Relational {

  /** R1/R2 — TPC-H Q1-style pricing summary: scan + pushed filter +
    * 8-agg hash aggregate. One shuffle (partial agg map-side). */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        expr(prodSum(discPrice("l_extendedprice", "l_discount"))).as("sum_disc_price"),
        expr(prodSum(discPriceTaxed("l_extendedprice", "l_discount", "l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       ${sqlSum("l_quantity")} AS sum_qty,
       ${sqlSum("l_extendedprice")} AS sum_base_price,
       ${prodSum(discPrice("l_extendedprice", "l_discount"))} AS sum_disc_price,
       ${prodSum(discPriceTaxed("l_extendedprice", "l_discount", "l_tax"))} AS sum_charge,
       ${sqlAvg("l_quantity")} AS avg_qty,
       ${sqlAvg("l_extendedprice")} AS avg_price,
       ${sqlAvg("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

  /** R4/R6 — TPC-H Q3-style shipping priority: 3-way join (customer
    * broadcast, orders⋈lineitem shuffle on orderkey) + top-K.
    * At scale the order-by-limit is a TakeOrderedAndProject — no full
    * sort. */
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(to_date(col("o_orderdate")) < lit("1998-06-01"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(to_date(col("l_shipdate")) > lit("1998-06-01"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).cast("string").as("order_date"))
      .agg(expr(prodSum(discPrice("l_extendedprice", "l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select("l_orderkey", "order_date", "revenue")

  val q3Sql: String =
    s"""SELECT l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
       ${prodSum(discPrice("l_extendedprice", "l_discount"))} AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
         AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
       GROUP BY l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** R3/R5 — TPC-H Q5-style local supplier volume: 6-table star join.
    * region/nation/supplier broadcast; customer⋈orders⋈lineitem
    * shuffles. Demonstrates multi-way join planning + dim broadcast. */
  def q5LocalSupplier(s: SparkSession, d: String): DataFrame =
    region(s, d).filter(col("r_name") === "ASIA")
      .join(broadcast(nation(s, d)), col("r_regionkey") === col("n_regionkey"))
      .join(customer(s, d), col("n_nationkey") === col("c_nationkey"))
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
              to_date(col("o_orderdate")) < lit("1998-01-01"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(expr(prodSum(discPrice("l_extendedprice", "l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  val q5Sql: String =
    s"""SELECT n_name, ${prodSum(discPrice("l_extendedprice", "l_discount"))} AS revenue
       FROM region JOIN nation ON r_regionkey = n_regionkey
       JOIN customer ON n_nationkey = c_nationkey
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       WHERE r_name = 'ASIA'
         AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
         AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
       GROUP BY n_name ORDER BY revenue DESC, n_name"""

  /** R1 — TPC-H Q6-style: pure scan-filter-aggregate; the filters all
    * push to the parquet scan, zero joins, one partial+final agg. */
  def q6FilterAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(to_date(col("l_shipdate")) >= lit("1997-01-01") &&
              to_date(col("l_shipdate")) < lit("1998-01-01") &&
              col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
      .agg(expr(prodSum("CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))")).as("revenue"),
           count(lit(1)).as("n_rows"))

  val q6Sql: String =
    s"""SELECT ${prodSum("CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))")} AS revenue, COUNT(*) AS n_rows
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
         AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
         AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24"""

  /** R10 — TPC-H Q14-style promo share: broadcast dim join +
    * conditional aggregation (CASE inside SUM). */
  /** Shared numerator/denominator fragment — parses identically in
    * Spark SQL and DuckDB, so both engines run the same arithmetic. */
  private val promoFrag: String = {
    val dp = discPrice("l_extendedprice", "l_discount")
    s"""100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN $dp ELSE 0 END) AS DOUBLE)
        / CAST(SUM($dp) AS DOUBLE)"""
  }

  def q14PromoShare(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(to_date(col("l_shipdate")) >= lit("1997-09-01") &&
              to_date(col("l_shipdate")) < lit("1997-10-01"))
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(expr(promoFrag).as("promo_revenue_pct"))

  val q14Sql: String =
    s"""SELECT $promoFrag AS promo_revenue_pct
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
         AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'"""

  /** R20 — TPC-H Q17-style: per-group average compared back against
    * rows (correlated scalar subquery, planned as an aggregate +
    * re-join; avg over integral doubles is exact so cross-engine
    * safe). */
  def q17SmallQty(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val pk = broadcast(part(s, d).filter(col("p_brand") === "Brand#11").select("p_partkey"))
    // cache() the brand-filtered lineitems: the per-part average and
    // the final re-join both read them — uncached, the lineitem scan
    // + broadcast part filter run twice.
    val branded = li.join(pk, col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .cache()
    val avgQty = branded
      .groupBy(col("l_partkey").as("a_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    branded
      .join(avgQty, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(dsum(col("l_extendedprice")).as("total_price"), count(lit(1)).as("n_rows"))
  }

  val q17Sql: String =
    s"""WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
       aq AS (SELECT l_partkey AS a_partkey, AVG(l_quantity) AS avg_qty
              FROM lineitem JOIN pk ON l_partkey = p_partkey GROUP BY l_partkey)
       SELECT ${sqlSum("l_extendedprice")} AS total_price, COUNT(*) AS n_rows
       FROM lineitem JOIN pk ON l_partkey = p_partkey
       JOIN aq ON l_partkey = a_partkey
       WHERE l_quantity < 0.5 * avg_qty"""

  /** R7/R11 — TPC-H Q18-style large-volume orders: HAVING filter on an
    * aggregate, then semi-join back to orders/customer. The qty sums
    * are integral doubles → exact. */
  def q18LargeVolume(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d).groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > 130)
    big.join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), to_date(col("o_orderdate")).cast("string").as("order_date"),
              col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
                    FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 130)
       SELECT c_name, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
              o_totalprice, sum_qty
       FROM big JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""

  /** R8 — anti join: customers with no orders in the first half of
    * 1995 (NOT EXISTS). */
  def qAntiCustomers(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(to_date(col("o_orderdate")) < lit("1995-07-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  val qAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND CAST(o_orderdate AS DATE) < DATE '1995-07-01')
       ORDER BY c_custkey"""

  /** R9 — left outer join + agg: order count / total per customer,
    * zero-filled for order-less customers. */
  def qCustOrderCounts(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("n_orders"),
           dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spent"))
      .orderBy("c_custkey")

  val qCustOrderCountsSql: String =
    s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
       ${sqlSum("COALESCE(o_totalprice, 0.0)")} AS total_spent
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey, c_name ORDER BY c_custkey"""

  /** R12 — distinct aggregates per group (expand-based plan). */
  def qDistinctParts(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val qDistinctPartsSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** R13 — set operations: UNION / INTERSECT / EXCEPT between
    * rich customers and frequent buyers. */
  def qSetops(s: SparkSession, d: String): DataFrame = {
    // cache() both cohorts: UNION/INTERSECT/EXCEPT each re-evaluate
    // their inputs, so uncached the customer scan and the orders
    // count-aggregate run three times over.
    val a = customer(s, d).filter(col("c_acctbal") > 7000).select(col("c_custkey").as("k"))
      .cache()
    val b = orders(s, d).groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 14).select("k")
      .cache()
    val u = a.union(b).distinct.agg(count(lit(1)).as("cnt")).withColumn("op", lit("union"))
    val i = a.intersect(b).agg(count(lit(1)).as("cnt")).withColumn("op", lit("intersect"))
    val e = a.except(b).agg(count(lit(1)).as("cnt")).withColumn("op", lit("except"))
    u.union(i).union(e).select("op", "cnt").orderBy("op")
  }

  val qSetopsSql: String =
    """WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 7000),
       b AS (SELECT o_custkey AS k FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 14)
       SELECT 'union' AS op, COUNT(*) AS cnt FROM (SELECT k FROM a UNION SELECT k FROM b)
       UNION ALL
       SELECT 'intersect' AS op, COUNT(*) AS cnt FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
       UNION ALL
       SELECT 'except' AS op, COUNT(*) AS cnt FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
       ORDER BY op"""

  /** R13b — multiset set operations (ALL variants keep duplicates):
    * order-priority multisets of two customer cohorts. */
  def qSetopsAll(s: SparkSession, d: String): DataFrame = {
    // cache() both cohorts — same reason as [[qSetops]]: three set
    // operations each re-scan orders for both sides uncached.
    val a = orders(s, d).filter(col("o_custkey") % 2 === 0).select(col("o_orderpriority").as("p"))
      .cache()
    val b = orders(s, d).filter(col("o_custkey") % 3 === 0).select(col("o_orderpriority").as("p"))
      .cache()
    val u = a.unionAll(b).groupBy().count().withColumn("op", lit("union_all"))
    val i = a.intersectAll(b).groupBy().count().withColumn("op", lit("intersect_all"))
    val e = a.exceptAll(b).groupBy().count().withColumn("op", lit("except_all"))
    u.union(i).union(e).select(col("op"), col("count").as("cnt")).orderBy("op")
  }

  val qSetopsAllSql: String =
    """WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_custkey % 2 = 0),
       b AS (SELECT o_orderpriority AS p FROM orders WHERE o_custkey % 3 = 0)
       SELECT 'union_all' AS op, COUNT(*) AS cnt FROM (SELECT p FROM a UNION ALL SELECT p FROM b)
       UNION ALL
       SELECT 'intersect_all' AS op, COUNT(*) AS cnt FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b)
       UNION ALL
       SELECT 'except_all' AS op, COUNT(*) AS cnt FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b)
       ORDER BY op"""

  /** R14 — ranking window: top-3 orders by value per market segment.
    * Single shuffle on the partition key; rank prunes early under AQE. */
  def qWindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    customer(s, d).join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn").cast("long").as("rn"),
              col("o_orderkey"), col("o_totalprice"))
      .orderBy("c_mktsegment", "rn")
  }

  val qWindowRankSql: String =
    """SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM (
         SELECT c_mktsegment, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM customer JOIN orders ON c_custkey = o_custkey) t
       WHERE rn <= 3 ORDER BY c_mktsegment, rn"""

  /** R15 — running cumulative sum per customer over order history.
    * Decimal-cast inside the window frame keeps the prefix sums exact
    * and identical cross-engine. */
  def qWindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d).filter(col("o_custkey") < 150)
      .withColumn("running_total", sum(col("o_totalprice").cast(D)).over(w).cast("double"))
      .select(col("o_custkey"), to_date(col("o_orderdate")).cast("string").as("order_date"),
              col("o_orderkey"), col("running_total"))
      .orderBy("o_custkey", "order_date", "o_orderkey")
  }

  val qWindowRunningSql: String =
    """SELECT o_custkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date, o_orderkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
       FROM orders WHERE o_custkey < 150
       ORDER BY o_custkey, order_date, o_orderkey"""

  /** R16 — lag window: order-to-order spend delta per customer
    * (decimal subtraction → exact doubles both engines). */
  def qWindowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d).filter(col("o_custkey") < 300)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .filter(col("prev_price").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"),
        (col("o_totalprice").cast(D) - col("prev_price").cast(D)).cast("double").as("price_delta"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val qWindowLagSql: String =
    """SELECT o_custkey, o_orderkey,
              CAST(CAST(o_totalprice AS DECIMAL(18,4)) - CAST(prev_price AS DECIMAL(18,4)) AS DOUBLE) AS price_delta
       FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS prev_price
             FROM orders WHERE o_custkey < 300) t
       WHERE prev_price IS NOT NULL ORDER BY o_custkey, o_orderkey"""

  /** R17 — ROLLUP grouping sets over region → nation revenue;
    * subtotal rows COALESCE'd to 'ALL' for deterministic compare.
    * The ROLLUP itself goes through `spark.sql` on a temp view:
    * Spark's DetectAmbiguousSelfJoin false-positives on the Expand
    * copies of rollup grouping columns when the frame is built with
    * the DataFrame API. The plan is identical (Expand → 2-phase
    * HashAggregate, dims broadcast). */
  def qRollupSales(s: SparkSession, d: String): DataFrame = {
    region(s, d)
      .join(broadcast(nation(s, d)), col("r_regionkey") === col("n_regionkey"))
      .join(customer(s, d), col("n_nationkey") === col("c_nationkey"))
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("r_name").as("rname"), col("n_name").as("nname"), col("o_totalprice"))
      .createOrReplaceTempView("graft_rollup_base")
    s.sql(
      s"""SELECT COALESCE(rname, 'ALL') AS region_name, COALESCE(nname, 'ALL') AS nation_name,
         ${sqlSum("o_totalprice")} AS revenue, COUNT(*) AS n_orders
         FROM graft_rollup_base GROUP BY ROLLUP(rname, nname)
         ORDER BY region_name, nation_name""")
  }

  val qRollupSalesSql: String =
    s"""SELECT COALESCE(r_name, 'ALL') AS region_name, COALESCE(n_name, 'ALL') AS nation_name,
       ${sqlSum("o_totalprice")} AS revenue, COUNT(*) AS n_orders
       FROM region JOIN nation ON r_regionkey = n_regionkey
       JOIN customer ON n_nationkey = c_nationkey
       JOIN orders ON c_custkey = o_custkey
       GROUP BY ROLLUP(r_name, n_name)
       ORDER BY region_name, nation_name"""

  /** R18 — pivot: order status → columns per order year (expressed as
    * conditional aggs so the oracle is plain ANSI SQL). */
  def qPivotStatus(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("order_year", year(to_date(col("o_orderdate"))).cast("long"))
      .groupBy("order_year")
      .agg(sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
           sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"),
           sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_partial"))
      .orderBy("order_year")

  val qPivotStatusSql: String =
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
              CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
              CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
              CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
       FROM orders GROUP BY 1 ORDER BY order_year"""

  /** R19 — scalar string/math/regex function coverage, all
    * whole-stage-codegen expressions. */
  def qScalarFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d).filter(col("p_partkey") < 200)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        substring(col("p_name"), 1, 4).as("pre4"),
        length(col("p_name")).cast("long").as("name_len"),
        (col("p_size") % 7).cast("long").as("size_mod"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        round(col("p_retailprice") * 1.1, 2).as("adj_price"))
      .orderBy("p_partkey")

  val qScalarFuncsSql: String =
    """SELECT p_partkey, UPPER(p_name) AS up_name, SUBSTRING(p_name, 1, 4) AS pre4,
              CAST(LENGTH(p_name) AS BIGINT) AS name_len,
              CAST(p_size % 7 AS BIGINT) AS size_mod,
              p_brand || ':' || p_type AS brand_type,
              regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
              ROUND(p_retailprice * 1.1, 2) AS adj_price
       FROM part WHERE p_partkey < 200 ORDER BY p_partkey"""

  /** R21 — gap-based sessionization of the event stream (30-min gap),
    * in epoch seconds so both engines agree exactly. At scale this is
    * one shuffle on user_id + two window passes. */
  def qSessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    events(s, d).filter(col("user_id") < 30)
      .withColumn("sec", expr("ts div 1000000000"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(byUser))
      .withColumn("new_sess", when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           (max(col("sec")) - min(col("sec"))).as("duration_sec"))
      .orderBy("user_id", "session_id")
  }

  val qSessionizeSql: String =
    """WITH e AS (SELECT user_id, event_id,
                         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
                  FROM events WHERE user_id < 30),
       g AS (SELECT user_id, event_id, sec,
                    sec - LAG(sec, 1) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
             FROM e),
       t AS (SELECT user_id, sec,
                    SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY sec, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             FROM g)
       SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              COUNT(*) AS n_events,
              CAST(MAX(sec) - MIN(sec) AS BIGINT) AS duration_sec
       FROM t GROUP BY user_id, session_id ORDER BY user_id, session_id"""

  /** R22 — as-of join: for each purchase, the most recent earlier
    * click by the same user. Expressed as a union + carry-forward
    * window (one shuffle on user_id) instead of a range cross join —
    * the formulation that survives 100 TB. */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d).filter(col("user_id") < 20 &&
        (col("event_type") === "purchase" || col("event_type") === "click"))
      .withColumn("sec", expr("ts div 1000000000"))
      .withColumn("click_id", when(col("event_type") === "click", col("event_id")))
      .withColumn("click_sec", when(col("event_type") === "click", col("sec")))
      .withColumn("prev_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("prev_click_sec", last(col("click_sec"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("prev_click_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("prev_click_id"),
              (col("sec") - col("prev_click_sec")).as("secs_since_click"))
      .orderBy("user_id", "event_id")
  }

  val qAsofJoinSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
                         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
                  FROM events
                  WHERE user_id < 20 AND event_type IN ('purchase', 'click')),
       c AS (SELECT *,
                    LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY sec, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_click_id,
                    LAST_VALUE(CASE WHEN event_type = 'click' THEN sec END IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY sec, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_click_sec
             FROM e)
       SELECT event_id, user_id, prev_click_id, sec - prev_click_sec AS secs_since_click
       FROM c WHERE event_type = 'purchase' AND prev_click_id IS NOT NULL
       ORDER BY user_id, event_id"""

  /** R23 — HLL approximate distinct (rows-only check; AnalyticsSpec
    * asserts <5% error vs exact). */
  def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
           count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** R24 — deterministic hash sampling (~5%) shared bit-for-bit with
    * the oracle: multiplicative hash on the key, no RNG. */
  def qHashSample(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter((col("l_orderkey") * lit(2654435761L)) % 1000 < 50)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")

  val qHashSampleSql: String =
    s"""SELECT l_returnflag, COUNT(*) AS n_rows, ${sqlSum("l_extendedprice")} AS sum_price
       FROM lineitem WHERE (l_orderkey * 2654435761) % 1000 < 50
       GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** R32 — RANGE window frame: per-user moving 1-hour spend over the
    * event stream (value-based frame, not row-count) + first/last
    * value in frame. One shuffle on user_id. */
  def qWindowRange(s: SparkSession, d: String): DataFrame = {
    val hour = Window.partitionBy("user_id").orderBy(col("sec"))
      .rangeBetween(-3600L, Window.currentRow)
    events(s, d).filter(col("user_id") < 10)
      .withColumn("sec", expr("ts div 1000000000"))
      .withColumn("hour_spend", sum(col("value").cast(D)).over(hour).cast("double"))
      .withColumn("hour_events", count(lit(1)).over(hour))
      .withColumn("first_in_hour", min(col("event_id")).over(hour))
      .select("user_id", "sec", "event_id", "hour_spend", "hour_events", "first_in_hour")
      .orderBy("user_id", "sec", "event_id")
  }

  val qWindowRangeSql: String =
    """SELECT user_id, sec, event_id,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS hour_spend,
              COUNT(*) OVER w AS hour_events,
              MIN(event_id) OVER w AS first_in_hour
       FROM (SELECT user_id, event_id, value,
                    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
             FROM events WHERE user_id < 10) t
       WINDOW w AS (PARTITION BY user_id ORDER BY sec
                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
       ORDER BY user_id, sec, event_id"""

  /** R31 — FULL OUTER join: reconcile per-customer order totals with
    * per-customer event spend; either side may be absent. */
  def qFullOuter(s: SparkSession, d: String): DataFrame = {
    val ordSide = orders(s, d).groupBy(col("o_custkey").as("k"))
      .agg(dsum(col("o_totalprice")).as("order_total"))
      .filter(col("k") < 200)
    val evSide = events(s, d).groupBy(col("user_id").as("k"))
      .agg(dsum(col("value")).as("event_total"))
      .filter(col("k") < 200)
    ordSide.join(evSide, Seq("k"), "full_outer")
      .select(col("k").as("cust_key"),
        coalesce(col("order_total"), lit(0.0)).as("order_total"),
        coalesce(col("event_total"), lit(0.0)).as("event_total"),
        (col("order_total").isNotNull && col("event_total").isNotNull).as("in_both"))
      .orderBy("cust_key")
  }

  val qFullOuterSql: String =
    s"""WITH o AS (SELECT o_custkey AS k, ${sqlSum("o_totalprice")} AS order_total
                  FROM orders GROUP BY o_custkey HAVING o_custkey < 200),
       e AS (SELECT user_id AS k, ${sqlSum("value")} AS event_total
             FROM events GROUP BY user_id HAVING user_id < 200)
       SELECT COALESCE(o.k, e.k) AS cust_key,
              COALESCE(order_total, 0.0) AS order_total,
              COALESCE(event_total, 0.0) AS event_total,
              (order_total IS NOT NULL AND event_total IS NOT NULL) AS in_both
       FROM o FULL OUTER JOIN e ON o.k = e.k
       ORDER BY cust_key"""

  /** R28 — CUBE grouping sets (all 4 combinations of region × order
    * status); same temp-view SQL routing as ROLLUP (R17). */
  def qCubeSales(s: SparkSession, d: String): DataFrame = {
    region(s, d)
      .join(broadcast(nation(s, d)), col("r_regionkey") === col("n_regionkey"))
      .join(customer(s, d), col("n_nationkey") === col("c_nationkey"))
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("r_name").as("rname"), col("o_orderstatus").as("status"), col("o_totalprice"))
      .createOrReplaceTempView("graft_cube_base")
    s.sql(
      s"""SELECT COALESCE(rname, 'ALL') AS region_name, COALESCE(status, 'ALL') AS order_status,
         ${sqlSum("o_totalprice")} AS revenue, COUNT(*) AS n_orders
         FROM graft_cube_base GROUP BY CUBE(rname, status)
         ORDER BY region_name, order_status""")
  }

  val qCubeSalesSql: String =
    s"""SELECT COALESCE(r_name, 'ALL') AS region_name, COALESCE(o_orderstatus, 'ALL') AS order_status,
       ${sqlSum("o_totalprice")} AS revenue, COUNT(*) AS n_orders
       FROM region JOIN nation ON r_regionkey = n_regionkey
       JOIN customer ON n_nationkey = c_nationkey
       JOIN orders ON c_custkey = o_custkey
       GROUP BY CUBE(r_name, o_orderstatus)
       ORDER BY region_name, order_status"""

  /** R29 — ordered list/string aggregation: nation names per region as
    * a sorted CSV (sort_array makes collect_list order-deterministic —
    * raw collect order is partition-dependent). */
  def qStringAgg(s: SparkSession, d: String): DataFrame =
    region(s, d)
      .join(broadcast(nation(s, d)), col("r_regionkey") === col("n_regionkey"))
      .groupBy(col("r_name").as("region_name"))
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
           countDistinct(col("n_name")).as("n_nations"))
      .orderBy("region_name")

  val qStringAggSql: String =
    """SELECT r_name AS region_name,
              string_agg(n_name, ',' ORDER BY n_name) AS nations,
              COUNT(DISTINCT n_name) AS n_nations
       FROM region JOIN nation ON r_regionkey = n_regionkey
       GROUP BY r_name ORDER BY region_name"""

  /** R30 — exact percentiles: median and p90 of order value per order
    * status (Spark `percentile` and DuckDB `quantile_cont` share the
    * linear-interpolation definition; round(4) guards last-ulp). */
  def qPercentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
           round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
           count(lit(1)).as("n_orders"))
      .orderBy("status")

  val qPercentilesSql: String =
    """SELECT o_orderstatus AS status,
              ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
              ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
              COUNT(*) AS n_orders
       FROM orders GROUP BY o_orderstatus ORDER BY status"""

  /** R25 — skew-resistant two-phase (salted) aggregation: partial agg
    * on (key, salt) then final on key. Same result as a direct
    * groupBy; at 100 TB the salt spreads a hot user over 8 reducers. */
  def qSaltedTopusers(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("salt", col("event_id") % 8)
      .groupBy("user_id", "salt")
      .agg(sum(col("value").cast(D)).as("pv"), count(lit(1)).as("pc"))
      .groupBy("user_id")
      .agg(sum(col("pv")).cast("double").as("total_value"), sum(col("pc")).as("n_events"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(20)

  val qSaltedTopusersSql: String =
    s"""SELECT user_id, ${sqlSum("value")} AS total_value, COUNT(*) AS n_events
       FROM events GROUP BY user_id ORDER BY total_value DESC, user_id LIMIT 20"""

  // ——————————————————————————————————————————————————————————————————
  // Adapted TPC-H remainder (the test schema has no partsupp /
  // commitdate / shipmode / phone, so q2/q4/q7–q22 are re-expressed on
  // the available columns while keeping each query's characteristic
  // operator shape).
  // ——————————————————————————————————————————————————————————————————

  /** R34 — TPC-H Q2-style "best supplier per part": argmax aggregation
    * via `max_by` on an orderable struct (acctbal, suppkey) — one
    * shuffle on p_partkey, dims broadcast. Deterministic tie-break:
    * highest balance, then highest suppkey. */
  def q2BestSupplier(s: SparkSession, d: String): DataFrame = {
    val pk = part(s, d).filter(col("p_size") < 10 && col("p_type") === "SMALL")
      .select("p_partkey")
    lineitem(s, d)
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_partkey")
      .agg(max_by(col("s_suppkey"), struct(col("s_acctbal"), col("s_suppkey"))).as("best_supp"),
           max(col("s_acctbal")).as("best_bal"))
      .orderBy("p_partkey")
  }

  val q2Sql: String =
    """WITH cand AS (SELECT DISTINCT p_partkey, s_suppkey, s_acctbal
                     FROM lineitem JOIN part ON l_partkey = p_partkey
                     JOIN supplier ON l_suppkey = s_suppkey
                     WHERE p_size < 10 AND p_type = 'SMALL')
       SELECT p_partkey, s_suppkey AS best_supp, s_acctbal AS best_bal
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
                       ORDER BY s_acctbal DESC, s_suppkey DESC) AS rn FROM cand) t
       WHERE rn = 1 ORDER BY p_partkey"""

  /** R35 — TPC-H Q4-style order-priority check: EXISTS (left-semi join
    * against qualifying lineitems) then per-priority counts. */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
              to_date(col("o_orderdate")) < lit("1996-04-01"))
      .join(lineitem(s, d).filter(col("l_quantity") > 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
       FROM orders
       WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
         AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_quantity > 45)
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** R36 — TPC-H Q7-style volume shipping: role-playing dimension
    * (nation joined twice — supplier side and customer side) with a
    * cross-role pair predicate, revenue by ship year. The pair filter
    * is cross-column so it runs post-join; both nation copies
    * broadcast. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val supNat = nation(s, d).select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cusNat = nation(s, d).select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(supNat), col("s_nationkey") === col("sn_key"))
      .join(broadcast(cusNat), col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .withColumn("l_year", year(to_date(col("l_shipdate"))).cast("long"))
      .filter(col("l_year").isin(1996L, 1997L))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(expr(prodSum(discPrice("l_extendedprice", "l_discount"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       ${prodSum(discPrice("l_extendedprice", "l_discount"))} AS revenue
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                    l_extendedprice, l_discount
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
             WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) t
       WHERE l_year IN (1996, 1997)
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year"""

  /** Share-of-total fragment for q8 — identical text in both engines so
    * the arithmetic agrees bit-for-bit (decimal inputs, double ratio). */
  private val mktShareFrag: String = {
    val dp = discPrice("l_extendedprice", "l_discount")
    s"""CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN $dp ELSE 0 END) AS DOUBLE)
        / CAST(SUM($dp) AS DOUBLE)"""
  }

  /** R37 — TPC-H Q8-style market share: one supplier nation's share of
    * ASIA-customer PROMO-part revenue per order year. Conditional
    * numerator over a shared denominator in a single aggregate pass. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val supNat = nation(s, d).select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val asiaCust = region(s, d).filter(col("r_name") === "ASIA")
      .join(broadcast(nation(s, d)), col("r_regionkey") === col("n_regionkey"))
      .join(customer(s, d), col("n_nationkey") === col("c_nationkey"))
      .select("c_custkey")
    lineitem(s, d)
      .join(broadcast(part(s, d).filter(col("p_type") === "PROMO").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(supNat), col("s_nationkey") === col("sn_key"))
      .withColumn("o_year", year(to_date(col("o_orderdate"))).cast("long"))
      .groupBy("o_year")
      .agg(expr(mktShareFrag).as("mkt_share"))
      .orderBy("o_year")
  }

  val q8Sql: String =
    s"""SELECT o_year, $mktShareFrag AS mkt_share
       FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                    n1.n_name AS supp_nation, l_extendedprice, l_discount
             FROM lineitem JOIN part ON l_partkey = p_partkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             WHERE p_type = 'PROMO'
               AND EXISTS (SELECT 1 FROM customer
                           JOIN nation n2 ON c_nationkey = n2.n_nationkey
                           JOIN region ON n2.n_regionkey = r_regionkey
                           WHERE c_custkey = o_custkey AND r_name = 'ASIA')) t
       GROUP BY o_year ORDER BY o_year"""

  /** R38 — TPC-H Q9-style product profit: revenue of pattern-matched
    * parts ('%bolt%') by supplier nation × order year. LIKE pushes to
    * the part scan; part/supplier/nation broadcast. */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame = {
    val supNat = nation(s, d).select(col("n_nationkey").as("sn_key"), col("n_name").as("nation"))
    lineitem(s, d)
      .join(broadcast(part(s, d).filter(col("p_name").like("%bolt%")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(supNat), col("s_nationkey") === col("sn_key"))
      .withColumn("o_year", year(to_date(col("o_orderdate"))).cast("long"))
      .groupBy("nation", "o_year")
      .agg(expr(prodSum(discPrice("l_extendedprice", "l_discount"))).as("sum_profit"))
      .orderBy("nation", "o_year")
  }

  val q9Sql: String =
    s"""SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       ${prodSum(discPrice("l_extendedprice", "l_discount"))} AS sum_profit
       FROM lineitem JOIN part ON l_partkey = p_partkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE p_name LIKE '%bolt%'
       GROUP BY n_name, o_year ORDER BY nation, o_year"""

  /** R39 — TPC-H Q10-style returned-item reporting: top-20 customers by
    * lost revenue (returnflag = 'R') in a quarter; 4-way join with a
    * wide multi-column group key, then TakeOrdered. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(orders(s, d)
          .filter(to_date(col("o_orderdate")) >= lit("1996-07-01") &&
                  to_date(col("o_orderdate")) < lit("1996-10-01")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(expr(prodSum(discPrice("l_extendedprice", "l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")

  val q10Sql: String =
    s"""SELECT c_custkey, c_name,
       ${prodSum(discPrice("l_extendedprice", "l_discount"))} AS revenue,
       c_acctbal, n_name
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
         AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
         AND l_returnflag = 'R'
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** R40 — TPC-H Q13-style customer distribution: histogram of
    * aggregates (two stacked groupBys — orders per customer, then
    * customers per order count). Left join keeps zero-order
    * customers. */
  def q13CustDistribution(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_custs"))
      .orderBy(col("n_custs").desc, col("n_orders").desc)

  val q13Sql: String =
    """SELECT n_orders, COUNT(*) AS n_custs
       FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
             FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey) t
       GROUP BY n_orders ORDER BY n_custs DESC, n_orders DESC"""

  /** R41 — TPC-H Q15-style top supplier: quarterly revenue per
    * supplier, then keep the max via a broadcast scalar-aggregate
    * join. Revenue equality is safe — decimal-sum both engines. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    // cache(): the MAX probe and the equality join both read the
    // per-supplier revenue table — uncached, the lineitem scan +
    // aggregate run twice.
    val rev = lineitem(s, d)
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
              to_date(col("l_shipdate")) < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(expr(prodSum(discPrice("l_extendedprice", "l_discount"))).as("total_rev"))
      .cache()
    val mx = rev.agg(max(col("total_rev")).as("mx"))
    rev.join(broadcast(mx), col("total_rev") === col("mx"))
      .select(col("l_suppkey").as("s_suppkey"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  val q15Sql: String =
    s"""WITH rev AS (SELECT l_suppkey,
         ${prodSum(discPrice("l_extendedprice", "l_discount"))} AS total_rev
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
         GROUP BY l_suppkey)
       SELECT l_suppkey AS s_suppkey, total_rev FROM rev
       WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
       ORDER BY s_suppkey"""

  /** R42 — TPC-H Q16-style parts/supplier relationship: distinct
    * supplier counts per (brand, type, size) portfolio with NOT-filters
    * and an IN-list, lineitem standing in for partsupp. */
  def q16PartsSupplier(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
              col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))

  val q16Sql: String =
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
              COUNT(DISTINCT l_suppkey) AS supplier_cnt
       FROM part JOIN lineitem ON p_partkey = l_partkey
       WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
         AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
       GROUP BY p_brand, p_type, p_size
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** R43 — TPC-H Q19-style discounted revenue: disjunction of
    * conjunctive brand/size/quantity blocks across the join — Catalyst
    * extracts the common `p_partkey = l_partkey` equi-key and keeps
    * the OR as a post-join filter; part side broadcast. */
  def q19Disjunctive(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#3"  && col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 15) && col("l_quantity").between(20, 30)))
      .agg(expr(prodSum(discPrice("l_extendedprice", "l_discount"))).as("revenue"),
           count(lit(1)).as("n_rows"))

  val q19Sql: String =
    s"""SELECT ${prodSum(discPrice("l_extendedprice", "l_discount"))} AS revenue,
       COUNT(*) AS n_rows
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""

  /** R45 — NTILE quantile bucketing: orders per status split into
    * value quartiles (equal-count buckets, remainder to the first —
    * same definition both engines; orderkey tiebreak keeps the
    * assignment total-ordered and deterministic). */
  def qNtile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .withColumn("q", ntile(4).over(w).cast("long"))
      .groupBy(col("o_orderstatus").as("status"), col("q"))
      .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("bucket_max"))
      .orderBy("status", "q")
  }

  val qNtileSql: String =
    """SELECT o_orderstatus AS status, CAST(q AS BIGINT) AS q,
              COUNT(*) AS n_orders, MAX(o_totalprice) AS bucket_max
       FROM (SELECT o_orderstatus, o_totalprice,
                    NTILE(4) OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_totalprice, o_orderkey) AS q
             FROM orders) t
       GROUP BY o_orderstatus, q ORDER BY status, q"""

  /** R46 — time-bucketed aggregation: monthly order volume + revenue
    * (date_trunc month; month rendered as its first day). */
  def qTimeBuckets(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("month", date_trunc("month", col("o_orderdate")).cast("date").cast("string"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("month")

  val qTimeBucketsSql: String =
    s"""SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month,
       COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS revenue
       FROM orders GROUP BY 1 ORDER BY month"""

  /** R47 — explicit GROUPING SETS (beyond ROLLUP/CUBE): per-segment
    * totals, per-priority totals, and the grand total in one pass
    * (same temp-view SQL routing as R17). */
  def qGroupingSets(s: SparkSession, d: String): DataFrame = {
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("prio"),
        col("o_totalprice"))
      .createOrReplaceTempView("graft_gsets_base")
    s.sql(
      s"""SELECT COALESCE(seg, 'ALL') AS segment, COALESCE(prio, 'ALL') AS priority,
         COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS revenue
         FROM graft_gsets_base
         GROUP BY GROUPING SETS ((seg), (prio), ())
         ORDER BY segment, priority""")
  }

  val qGroupingSetsSql: String =
    s"""SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
       GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
       ORDER BY segment, priority"""

  /** R48 — explode / unnest: corpus-wide word frequencies (generator
    * + re-aggregation; the lateral-view shape every tokenization
    * pipeline starts with). */
  def qExplodeWords(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(20)

  val qExplodeWordsSql: String =
    """SELECT w AS word, COUNT(*) AS cnt
       FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
       GROUP BY w ORDER BY cnt DESC, word LIMIT 20"""

  /** R49 — higher-order array functions (codegen'd lambda pipeline:
    * transform → filter → aggregate) over tokenized part names. */
  def qHigherOrder(s: SparkSession, d: String): DataFrame =
    part(s, d).filter(col("p_partkey") < 300)
      .withColumn("ws", split(col("p_name"), " "))
      .select(
        col("p_partkey"),
        expr("CAST(size(filter(ws, w -> length(w) > 4)) AS BIGINT)").as("n_long"),
        expr("CAST(aggregate(transform(ws, w -> length(w)), 0, (a, b) -> a + b) AS BIGINT)").as("total_len"),
        array_join(expr("transform(ws, w -> upper(w))"), "_").as("shouty"))
      .orderBy("p_partkey")

  val qHigherOrderSql: String =
    """SELECT p_partkey,
              CAST(len(list_filter(ws, w -> length(w) > 4)) AS BIGINT) AS n_long,
              CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS total_len,
              array_to_string(list_transform(ws, w -> upper(w)), '_') AS shouty
       FROM (SELECT p_partkey, string_split(p_name, ' ') AS ws
             FROM part WHERE p_partkey < 300) t
       ORDER BY p_partkey"""

  /** R50 — datetime function breadth: extract family, date arithmetic,
    * month boundaries, day-of-week (DuckDB numbers Sunday 0, Spark 1 —
    * oracle shifts by one). */
  def qDatetimeFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") < 300)
      .withColumn("d", to_date(col("o_orderdate")))
      .select(col("o_orderkey"),
        col("d").cast("string").as("order_date"),
        year(col("d")).cast("long").as("y"),
        quarter(col("d")).cast("long").as("qtr"),
        month(col("d")).cast("long").as("m"),
        dayofmonth(col("d")).cast("long").as("dom"),
        dayofweek(col("d")).cast("long").as("dow"),
        date_add(col("d"), 30).cast("string").as("plus30"),
        last_day(col("d")).cast("string").as("eom"),
        datediff(lit("1998-01-01").cast("date"), col("d")).cast("long").as("days_to_98"))
      .orderBy("o_orderkey")

  val qDatetimeFuncsSql: String =
    """SELECT o_orderkey, CAST(d AS VARCHAR) AS order_date,
              CAST(EXTRACT(year FROM d) AS BIGINT) AS y,
              CAST(EXTRACT(quarter FROM d) AS BIGINT) AS qtr,
              CAST(EXTRACT(month FROM d) AS BIGINT) AS m,
              CAST(EXTRACT(day FROM d) AS BIGINT) AS dom,
              CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
              CAST(CAST(d + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus30,
              CAST(last_day(d) AS VARCHAR) AS eom,
              CAST(date_diff('day', d, DATE '1998-01-01') AS BIGINT) AS days_to_98
       FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
             FROM orders WHERE o_orderkey < 300) t
       ORDER BY o_orderkey"""

  /** R51 — string function breadth: padding, search, slicing, repeat,
    * edit distance, token extraction. */
  def qStringFuncs2(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_custkey") < 500)
      .select(col("c_custkey"),
        lpad(col("c_name"), 22, "*").as("lpadded"),
        instr(col("c_name"), "1").cast("long").as("pos1"),
        expr("left(c_name, 8)").as("head8"),
        expr("repeat('ab', 3)").as("abab"),
        levenshtein(col("c_name"), col("c_mktsegment")).cast("long").as("lev"),
        expr("split_part(c_name, '#', 2)").as("cust_num"))
      .orderBy("c_custkey")

  val qStringFuncs2Sql: String =
    """SELECT c_custkey, lpad(c_name, 22, '*') AS lpadded,
              CAST(strpos(c_name, '1') AS BIGINT) AS pos1,
              left(c_name, 8) AS head8,
              repeat('ab', 3) AS abab,
              CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS lev,
              split_part(c_name, '#', 2) AS cust_num
       FROM customer WHERE c_custkey < 500 ORDER BY c_custkey"""

  /** R52 — JSON functions: serialize a struct per row, then extract
    * scalars back out (compared post-extraction so the engines'
    * whitespace/format differences never matter). */
  def qJsonFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") < 300)
      .withColumn("js", to_json(struct(col("o_orderkey").as("k"),
        col("o_orderstatus").as("st"), col("o_totalprice").as("tp"))))
      .select(col("o_orderkey"),
        get_json_object(col("js"), "$.st").as("st"),
        get_json_object(col("js"), "$.k").cast("long").as("k2"),
        get_json_object(col("js"), "$.tp").cast("double").as("tp2"))
      .orderBy("o_orderkey")

  val qJsonFuncsSql: String =
    """SELECT o_orderkey,
              json_extract_string(js, '$.st') AS st,
              CAST(json_extract_string(js, '$.k') AS BIGINT) AS k2,
              CAST(json_extract_string(js, '$.tp') AS DOUBLE) AS tp2
       FROM (SELECT o_orderkey,
                    to_json(struct_pack(k := o_orderkey, st := o_orderstatus,
                                        tp := o_totalprice)) AS js
             FROM orders WHERE o_orderkey < 300) t
       ORDER BY o_orderkey"""

  /** R53 — conditional expressions: NULLIF / COALESCE chains,
    * GREATEST / LEAST, multi-arm CASE banding. */
  def qConditionalFuncs(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_custkey") < 500)
      .select(col("c_custkey"),
        expr("NULLIF(c_mktsegment, 'BUILDING')").as("seg_or_null"),
        expr("COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'SUPPRESSED')").as("seg_coalesced"),
        expr("GREATEST(c_acctbal, 0.0)").as("bal_floor"),
        expr("CAST(LEAST(c_custkey, 100) AS BIGINT)").as("capped"),
        expr("""CASE WHEN c_acctbal < 0 THEN 'neg'
                     WHEN c_acctbal < 5000 THEN 'mid'
                     ELSE 'high' END""").as("bal_band"))
      .orderBy("c_custkey")

  val qConditionalFuncsSql: String =
    """SELECT c_custkey,
              NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
              COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg_coalesced,
              GREATEST(c_acctbal, 0.0) AS bal_floor,
              CAST(LEAST(c_custkey, 100) AS BIGINT) AS capped,
              CASE WHEN c_acctbal < 0 THEN 'neg'
                   WHEN c_acctbal < 5000 THEN 'mid'
                   ELSE 'high' END AS bal_band
       FROM customer WHERE c_custkey < 500 ORDER BY c_custkey"""

  /** R44 — TPC-H Q22-style wealthy inactives: scalar-subquery
    * threshold (average positive balance, exact decimal mean) feeding a
    * filter + anti join against orders, grouped by nation. */
  def q22WealthyInactive(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d)
    val thr = cust.filter(col("c_acctbal") > 0).agg(davg(col("c_acctbal")).as("thr"))
    cust.join(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_custs"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy("nation")
  }

  val q22Sql: String =
    s"""SELECT n_name AS nation, COUNT(*) AS n_custs, ${sqlSum("c_acctbal")} AS total_bal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       WHERE c_acctbal > (SELECT ${sqlAvg("c_acctbal")} FROM customer WHERE c_acctbal > 0)
         AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
       GROUP BY n_name ORDER BY nation"""

  /** R54 — TPC-H Q11-style value concentration (adapted: the test
    * schema has no partsupp, so the held value is supplier account
    * balance per nation): group-agg filtered by a HAVING against a
    * global scalar aggregate. The global total is one broadcast row;
    * the per-nation agg is one shuffle with map-side partials. */
  def q11ValueConcentration(s: SparkSession, d: String): DataFrame = {
    val sup = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
    val total = sup.agg(dsum(col("s_acctbal")).as("tot"))
    sup.groupBy(col("n_name").as("nation"))
      .agg(dsum(col("s_acctbal")).as("value"))
      .join(broadcast(total))
      .filter(col("value") > col("tot") * 0.04)
      .select(col("nation"), col("value"))
      .orderBy(col("value").desc, col("nation"))
  }

  val q11Sql: String =
    s"""SELECT n_name AS nation, ${sqlSum("s_acctbal")} AS value
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       GROUP BY n_name
       HAVING ${sqlSum("s_acctbal")} >
         (SELECT ${sqlSum("s_acctbal")} * 0.04 FROM supplier)
       ORDER BY value DESC, nation"""

  /** R55 — TPC-H Q12-style shipping-delay priority split (adapted:
    * no shipmode/receiptdate columns, so "late" = shipped more than
    * 60 days after the order date): join + dual conditional counts
    * per group. One shuffle join on orderkey, then a tiny agg. */
  def q12LatePriority(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) > 60)
      .groupBy("l_returnflag")
      .agg(
        count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("high_late"),
        count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("low_late"))
      .orderBy("l_returnflag")

  val q12Sql: String =
    """SELECT l_returnflag,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH')) AS high_late,
       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_late
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
       GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** R56 — TPC-H Q21-style sole-blame supplier (adapted lateness as in
    * R55): late lines in multi-supplier orders where NO other supplier
    * of the same order was late — a correlated EXISTS plus NOT EXISTS
    * over the same self-joined table. Both the semi and the anti join
    * shuffle lineitem on orderkey; Catalyst reuses the exchange, so
    * the fact table partitions once. Supplier side is broadcast. */
  def q21BlameSupplier(s: SparkSession, d: String): DataFrame = {
    // The EXISTS / NOT-EXISTS pair over OTHER lineitems of the same
    // order reduces to two per-order distinct-supplier counts: a late
    // row survives iff its order has ≥ 2 distinct suppliers (EXISTS
    // another supplier) and exactly ONE distinct LATE supplier (the
    // row's own — so NOT EXISTS another late one). The previous shape
    // evaluated the lineitem⋈orders join three times (probe + semi
    // build + anti build) and paid two extra join shuffles; this one
    // pays the join once plus a window that REUSES the join's own
    // l_orderkey partitioning (no new exchange — and per-order
    // supplier sets are bounded by order size, so collect_set cannot
    // hub). Oracle string unchanged; the driver hash-gates
    // equivalence.
    val w = Window.partitionBy("l_orderkey")
    lineitem(s, d)
      .join(orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) > 60)
      .select("l_orderkey", "l_suppkey", "late")
      .withColumn("n_supps", size(collect_set(col("l_suppkey")).over(w)))
      .withColumn("n_late_supps",
        size(collect_set(when(col("late"), col("l_suppkey"))).over(w)))
      .filter(col("late") && col("n_supps") > 1 && col("n_late_supps") === 1)
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val q21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
       FROM supplier, lineitem l1, orders
       WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         AND datediff('day', CAST(o_orderdate AS DATE), CAST(l1.l_shipdate AS DATE)) > 60
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                     WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                       AND datediff('day', CAST(o_orderdate AS DATE), CAST(l3.l_shipdate AS DATE)) > 60)
       GROUP BY s_name ORDER BY numwait DESC, s_name"""

  /** R57 — recursive CTE (Spark 4's WITH RECURSIVE): a generated
    * calendar spine LEFT-joined to facts, the standard way to report
    * over periods with zero activity. The recursion runs on the
    * driver-side loop of Spark's UnionLoop (12 tiny iterations); the
    * join + agg stay fully distributed. */
  def qRecursiveSpine(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("graft_rec_orders")
    s.sql(
      """WITH RECURSIVE m(mon) AS (
           SELECT 1 UNION ALL SELECT mon + 1 FROM m WHERE mon < 12
         )
         SELECT mon, COUNT(o_orderkey) AS n_orders
         FROM m LEFT JOIN graft_rec_orders
           ON month(CAST(o_orderdate AS DATE)) = mon
         GROUP BY mon ORDER BY mon""")
  }

  val qRecursiveSpineSql: String =
    """WITH RECURSIVE m(mon) AS (
         SELECT 1 UNION ALL SELECT mon + 1 FROM m WHERE mon < 12
       )
       SELECT mon, COUNT(o_orderkey) AS n_orders
       FROM m LEFT JOIN orders ON month(CAST(o_orderdate AS DATE)) = mon
       GROUP BY mon ORDER BY mon"""

  /** R59 — statistical aggregates (covariance / Pearson correlation)
    * from EXACT decimal moments: built-in `corr`/`covar_pop` accumulate
    * running doubles in partition order and diverge across engines in
    * the last ulps, so the moments (n, Σx, Σy, Σxy, Σx², Σy²) are
    * summed as decimals — order-independent and exact — and the
    * closed-form combination runs in IEEE doubles, identical on both
    * sides (sqrt is correctly rounded). One shuffle, map-side partial
    * moment sums — the textbook distributed-statistics shape. */
  def qStatsCorr(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val D20 = DecimalType(20, 4)
    val D12 = DecimalType(12, 4)
    val m = lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sx"),
        dsum(col("l_extendedprice")).as("sy"),
        sum(col("l_quantity").cast(D20) * col("l_extendedprice").cast(D12))
          .cast("double").as("sxy"),
        sum(col("l_quantity").cast(D20) * col("l_quantity").cast(D12))
          .cast("double").as("sxx"),
        sum(col("l_extendedprice").cast(D20) * col("l_extendedprice").cast(D12))
          .cast("double").as("syy"))
    val cov = col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))
    val sdx = sqrt(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")))
    val sdy = sqrt(col("syy") / col("n") - (col("sy") / col("n")) * (col("sy") / col("n")))
    // round(4/8): DuckDB's int128-decimal → double cast double-rounds
    // beyond 2^53, so the engines can differ in the final ulp — the
    // repo-standard rounding kills that noise (values are exact to
    // ~15 significant digits before it)
    m.select(col("l_returnflag"), col("n"),
        round(cov, 4).as("cov_qty_price"),
        round(cov / (sdx * sdy), 8).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  val qStatsCorrSql: String =
    """WITH m AS (
         SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS syy
         FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag, n,
         round(sxy / n - (sx / n) * (sy / n), 4) AS cov_qty_price,
         round((sxy / n - (sx / n) * (sy / n)) /
           (sqrt(sxx / n - (sx / n) * (sx / n)) * sqrt(syy / n - (sy / n) * (sy / n))), 8) AS corr_qty_price
       FROM m ORDER BY l_returnflag"""

  /** R69 — catalog round-trip under the EXTERNAL oracle gate: orders
    * flow through the graft catalog (create → two append snapshots →
    * snapshot-pinned time travel) and the aggregate of what comes back
    * is hash-compared against DuckDB over the raw parquet. This puts
    * the commit protocol, manifest resolution and time travel —
    * normally covered by ScalaTest only — under the same
    * cross-engine correctness gate as every query. */
  /** Per-JVM cache of the roundtrip's temp warehouse: the table is
    * built ONCE per scale-factor dir and reused by every later
    * construction (bench loops, repeated verify runs), and the dir is
    * reclaimed by a shutdown hook instead of leaking one
    * `graft-rt-*` per run. Also separates concerns in the bench: the
    * first timed run pays the DDL+write cost, the steady-state (min
    * of runs) measures the read/time-travel path only. */
  private val rtCache = new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  def qCatalogRoundtrip(s: SparkSession, d: String): DataFrame = {
    import graft.catalog._
    import org.apache.hadoop.fs.{Path => HPath}
    val ops = new TableOps(new FsStore(s.sparkContext.hadoopConfiguration))
    val (wh, firstSnap) = rtCache.computeIfAbsent(d, { _ =>
      val whPath = java.nio.file.Files.createTempDirectory("graft-rt-")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(whPath.toFile)
      }))
      val tdir = new HPath(whPath.toString, "orders_rt")
      val src0 = orders(s, d).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      ops.create(tdir, TableMetadata.create(
        tdir.toString, SchemaBridge.fromSpark(src0.schema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
      ops.write(tdir, src0.filter(col("o_orderkey") < 1000), "append")
      val snap1 = ops.load(tdir).get._2.currentSnapshot.get.snapshotId
      ops.write(tdir, src0.filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 2000), "append")
      (whPath.toString, snap1)
    })
    val dir = new HPath(wh, "orders_rt")

    val full = ops.read(s, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_all"), dsum(col("o_totalprice")).as("sum_all"))
    val asOfFirst = ops.read(s, dir, snapshotId = Some(firstSnap))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_snap1"))
    full.join(asOfFirst, Seq("o_orderstatus"), "left")
      .select(col("o_orderstatus"), col("n_all"), col("sum_all"),
        coalesce(col("n_snap1"), lit(0L)).as("n_snap1"))
      .orderBy("o_orderstatus")
  }

  val qCatalogRoundtripSql: String =
    s"""WITH full_t AS (
         SELECT o_orderstatus, COUNT(*) AS n_all,
                ${sqlSum("o_totalprice")} AS sum_all
         FROM orders WHERE o_orderkey < 2000 GROUP BY o_orderstatus),
       snap1 AS (
         SELECT o_orderstatus, COUNT(*) AS n_snap1
         FROM orders WHERE o_orderkey < 1000 GROUP BY o_orderstatus)
       SELECT f.o_orderstatus, f.n_all, f.sum_all,
              COALESCE(s.n_snap1, 0) AS n_snap1
       FROM full_t f LEFT JOIN snap1 s ON f.o_orderstatus = s.o_orderstatus
       ORDER BY f.o_orderstatus"""

  /** C61 under the oracle gate — deletion-vector roundtrip: a catalog
    * table takes two OVERLAPPING deletion-vector DELETEs (Roaring
    * bitmaps per data file, the Iceberg v3 direction) plus a
    * vectorize-compaction, and the MOR-resolved read is hash-compared
    * against DuckDB computing the same complement over raw parquet.
    * Covers the bitmap write path, the overlap-union read path and
    * [[graft.catalog.TableOps.vectorizeDeletes]] cross-engine. */
  private val dvCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def qDvRoundtrip(s: SparkSession, d: String): DataFrame = {
    import graft.catalog._
    import org.apache.hadoop.fs.{Path => HPath}
    val ops = new TableOps(new FsStore(s.sparkContext.hadoopConfiguration))
    val wh = dvCache.computeIfAbsent(d, { _ =>
      val whPath = java.nio.file.Files.createTempDirectory("graft-dv-")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(whPath.toFile)
      }))
      val tdir = new HPath(whPath.toString, "orders_dv")
      val src = orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter(col("o_orderkey") < 4000)
      ops.create(tdir, TableMetadata.create(
        tdir.toString, SchemaBridge.fromSpark(src.schema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
      ops.write(tdir, src, "append")
      // two overlapping bitmap deletes (keys ≡ 0 mod 7, mod 5 — the
      // union path), then fold both commits into one vector set
      ops.deletionVectorDelete(s, tdir, col("o_orderkey") % 7 === 0)
      ops.deletionVectorDelete(s, tdir, col("o_orderkey") % 5 === 0)
      ops.vectorizeDeletes(s, tdir)
      whPath.toString
    })
    ops.read(s, new HPath(wh, "orders_dv"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_live"), dsum(col("o_totalprice")).as("sum_live"))
      .orderBy("o_orderstatus")
  }

  val qDvRoundtripSql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_live,
              ${sqlSum("o_totalprice")} AS sum_live
       FROM orders
       WHERE o_orderkey < 4000 AND o_orderkey % 7 <> 0 AND o_orderkey % 5 <> 0
       GROUP BY o_orderstatus
       ORDER BY o_orderstatus"""

  /** C75 under the oracle gate — default-value roundtrip: a catalog
    * table gains a column via ADD COLUMN ... DEFAULT after its first
    * append; files that predate the column fill the frozen
    * initial-default at read (no rewrite), later appends carry real
    * values — and the final mapping is hash-compared against DuckDB
    * stating the era split directly over raw parquet. */
  private val defCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def qDefaultRoundtrip(s: SparkSession, d: String): DataFrame = {
    import graft.catalog._
    import org.apache.hadoop.fs.{Path => HPath}
    val ops = new TableOps(new FsStore(s.sparkContext.hadoopConfiguration))
    val wh = defCache.computeIfAbsent(d, { _ =>
      val whPath = java.nio.file.Files.createTempDirectory("graft-def-")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(whPath.toFile)
      }))
      val tdir = new HPath(whPath.toString, "orders_def")
      def slice(lo: Long, hi: Long) = orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
      ops.create(tdir, TableMetadata.create(
        tdir.toString, SchemaBridge.fromSpark(slice(0, 1).schema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
      ops.write(tdir, slice(0, 3000), "append")
      // ADD COLUMN segment STRING DEFAULT 'legacy': the file above
      // predates the column and must read it back filled — zero rewrite
      val meta = ops.load(tdir).get._2
      val sch = TableSchema(meta.schemas.map(_.schemaId).max + 1,
        meta.currentSchema.fields :+ NestedField(
          meta.lastColumnId + 1, "segment", "STRING", required = false,
          initialDefault = Some("'legacy'"), writeDefault = Some("'legacy'")))
      ops.commit(tdir, Seq.empty,
        Seq(MetadataUpdate.AddSchema(sch), MetadataUpdate.SetCurrentSchema(sch.schemaId)))
      ops.write(tdir, slice(3000, 6000).withColumn("segment", lit("fresh")), "append")
      whPath.toString
    })
    ops.read(s, new HPath(wh, "orders_def"))
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("segment"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  val qDefaultRoundtripSql: String =
    """SELECT o_orderkey,
              CASE WHEN o_orderkey < 3000 THEN 'legacy' ELSE 'fresh' END AS segment,
              o_totalprice
       FROM orders
       WHERE o_orderkey < 6000 AND o_orderkey % 3 = 0
       ORDER BY o_orderkey"""

  /** R70 — latest-row-per-key dedup (the CDC-compaction / SCD-1
    * pattern): one row_number window per key, keep rank 1. One
    * shuffle on the key; at 100 TB this is THE idiom for collapsing
    * an append-only event log to current state. */
  def qLatestPerKey(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders(s, d).filter(col("o_custkey") < 300)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_order"),
        col("o_orderdate").cast("date").cast("string").as("latest_date"),
        col("o_totalprice").as("latest_price"))
      .orderBy("o_custkey")
  }

  val qLatestPerKeySql: String =
    """SELECT o_custkey, o_orderkey AS latest_order,
              CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS latest_date,
              o_totalprice AS latest_price
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_custkey < 300) t
       WHERE rn = 1 ORDER BY o_custkey"""

  /** R71 — UNPIVOT (wide → long): per-flag quantity/price measure
    * columns melted into (measure, value) rows. Narrow per-row
    * expansion, no shuffle until the final sort. */
  def qUnpivot(s: SparkSession, d: String): DataFrame = {
    val wide = lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(dsum(col("l_quantity")).as("qty"),
           dsum(col("l_extendedprice")).as("price"),
           dsum(col("l_discount")).as("disc"))
    wide.select(col("l_returnflag"),
        expr("stack(3, 'qty', qty, 'price', price, 'disc', disc) AS (measure, value)"))
      .orderBy("l_returnflag", "measure")
  }

  val qUnpivotSql: String =
    s"""WITH wide AS (
         SELECT l_returnflag,
                ${sqlSum("l_quantity")} AS qty,
                ${sqlSum("l_extendedprice")} AS price,
                ${sqlSum("l_discount")} AS disc
         FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag, measure, value
       FROM wide UNPIVOT (value FOR measure IN (qty, price, disc))
       ORDER BY l_returnflag, measure"""

  /** R72 — dense-grid zero-fill report: the full (status × priority)
    * grid cross-joined from the distinct dimensions, LEFT-joined to
    * facts so empty cells report 0 — the reporting idiom that makes
    * dashboards stable when a cell has no activity. Both dimension
    * sides are tiny and broadcast. */
  def qDenseGrid(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val statuses = o.select("o_orderstatus").distinct()
    val prios = o.select("o_orderpriority").distinct()
    val facts = o.groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    statuses.crossJoin(prios)
      .join(facts, Seq("o_orderstatus", "o_orderpriority"), "left")
      .select(col("o_orderstatus"), col("o_orderpriority"),
        coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  val qDenseGridSql: String =
    """SELECT s.o_orderstatus, p.o_orderpriority,
              COALESCE(f.n, 0) AS n_orders
       FROM (SELECT DISTINCT o_orderstatus FROM orders) s
       CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
       LEFT JOIN (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
                  FROM orders GROUP BY 1, 2) f
         ON s.o_orderstatus = f.o_orderstatus AND p.o_orderpriority = f.o_orderpriority
       ORDER BY s.o_orderstatus, p.o_orderpriority"""

  /** R60 — distribution window functions: percent_rank / cume_dist
    * over a peerless ordering (unique tiebreak ⇒ both are exact rank
    * arithmetic, engine-independent), plus first/nth/last value over
    * the full-partition frame. Single window sort per nation
    * partition — one shuffle on the partition key at any scale. */
  def qWindowDist(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal"), col("s_suppkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"),
        round(percent_rank().over(w), 8).as("pr"),
        round(cume_dist().over(w), 8).as("cd"),
        first(col("s_name")).over(wf).as("poorest"),
        nth_value(col("s_name"), 2).over(wf).as("second_poorest"),
        last(col("s_name")).over(wf).as("richest"))
      .orderBy("s_nationkey", "s_suppkey")
  }

  val qWindowDistSql: String =
    """SELECT s_suppkey, s_nationkey,
              round(percent_rank() OVER w, 8) AS pr,
              round(cume_dist() OVER w, 8) AS cd,
              first_value(s_name) OVER wf AS poorest,
              nth_value(s_name, 2) OVER wf AS second_poorest,
              last_value(s_name) OVER wf AS richest
       FROM supplier
       WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey),
              wf AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY s_nationkey, s_suppkey"""

  /** R61 — least-squares regression (slope / intercept / R²) from the
    * same exact decimal moments as R59: order-independent partial sums
    * (map-side combined), closed-form combination in doubles. The
    * distributed-regression shape: one narrow shuffle of 6 numbers per
    * group regardless of fact size. */
  def qRegression(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val D20 = DecimalType(20, 4)
    val D12 = DecimalType(12, 4)
    val m = lineitem(s, d)
      .groupBy("l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sx"),
        dsum(col("l_extendedprice")).as("sy"),
        sum(col("l_quantity").cast(D20) * col("l_extendedprice").cast(D12))
          .cast("double").as("sxy"),
        sum(col("l_quantity").cast(D20) * col("l_quantity").cast(D12))
          .cast("double").as("sxx"),
        sum(col("l_extendedprice").cast(D20) * col("l_extendedprice").cast(D12))
          .cast("double").as("syy"))
    val cov = col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))
    val varx = col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))
    val vary = col("syy") / col("n") - (col("sy") / col("n")) * (col("sy") / col("n"))
    val slope = cov / varx
    m.select(col("l_linestatus"), col("n"),
        round(slope, 8).as("slope"),
        round(col("sy") / col("n") - slope * (col("sx") / col("n")), 6).as("intercept"),
        round(cov * cov / (varx * vary), 8).as("r2"))
      .orderBy("l_linestatus")
  }

  val qRegressionSql: String =
    """WITH m AS (
         SELECT l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS syy
         FROM lineitem GROUP BY l_linestatus),
       k AS (SELECT l_linestatus, n,
               sxy / n - (sx / n) * (sy / n) AS cov,
               sxx / n - (sx / n) * (sx / n) AS varx,
               syy / n - (sy / n) * (sy / n) AS vary,
               sx / n AS mx, sy / n AS my
             FROM m)
       SELECT l_linestatus, n,
         round(cov / varx, 8) AS slope,
         round(my - (cov / varx) * mx, 6) AS intercept,
         round(cov * cov / (varx * vary), 8) AS r2
       FROM k ORDER BY l_linestatus"""

  /** R68 — higher-moment statistics (population skewness / excess
    * kurtosis) from exact decimal raw moments Σq..Σq⁴: quantity is an
    * exact 2dp decimal bounded by 50, so its 4th-power sums stay
    * inside DECIMAL(38) at any row count that fits a cluster — the
    * same order-independent one-shuffle shape as R59/R61 (built-in
    * `skewness`/`kurtosis` accumulate running doubles and drift
    * between engines). */
  def qSkewKurt(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val q = col("l_quantity").cast(DecimalType(8, 2))
    val m = lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(q).cast("double").as("s1"),
        sum(q * q).cast("double").as("s2"),
        sum(q * q * q).cast("double").as("s3"),
        sum(q * q * q * q).cast("double").as("s4"))
    val mu = col("s1") / col("n")
    val m2 = col("s2") / col("n") - mu * mu
    val m3 = col("s3") / col("n") - lit(3.0) * mu * (col("s2") / col("n")) + lit(2.0) * mu * mu * mu
    val m4 = col("s4") / col("n") - lit(4.0) * mu * (col("s3") / col("n")) +
      lit(6.0) * mu * mu * (col("s2") / col("n")) - lit(3.0) * mu * mu * mu * mu
    m.select(col("l_returnflag"), col("n"),
        round(m3 / pow(m2, 1.5), 8).as("skew_pop"),
        round(m4 / (m2 * m2) - 3.0, 8).as("kurt_excess"))
      .orderBy("l_returnflag")
  }

  val qSkewKurtSql: String =
    """WITH m AS (
         SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(q) AS DOUBLE) AS s1,
           CAST(SUM(q * q) AS DOUBLE) AS s2,
           CAST(SUM(q * q * q) AS DOUBLE) AS s3,
           CAST(SUM(q * q * q * q) AS DOUBLE) AS s4
         FROM (SELECT l_returnflag, CAST(l_quantity AS DECIMAL(8,2)) AS q FROM lineitem) t
         GROUP BY l_returnflag),
       k AS (SELECT l_returnflag, n, s1 / n AS mu,
               s2 / n - (s1 / n) * (s1 / n) AS m2,
               s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
               s4 / n - 4.0 * (s1 / n) * (s3 / n)
                 + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                 - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
             FROM m)
       SELECT l_returnflag, n,
         round(m3 / pow(m2, 1.5), 8) AS skew_pop,
         round(m4 / (m2 * m2) - 3.0, 8) AS kurt_excess
       FROM k ORDER BY l_returnflag"""

  /** R62 — bitwise and boolean aggregates: bit_and/or/xor fold the
    * key space per group (commutative+associative ⇒ map-side partials
    * and order independence for free), bool_and/bool_or + filtered
    * count over a predicate. */
  def qBitBoolAggs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        expr("bit_and(o_orderkey)").as("key_and"),
        expr("bit_or(o_orderkey)").as("key_or"),
        expr("bit_xor(o_orderkey)").as("key_xor"),
        expr("bool_and(o_totalprice > 1000.0)").as("all_over_1k"),
        expr("bool_or(o_totalprice > 400000.0)").as("any_over_400k"),
        expr("count_if(o_totalprice > 200000.0)").as("n_big"))
      .orderBy("o_orderstatus")

  val qBitBoolAggsSql: String =
    """SELECT o_orderstatus,
              bit_and(o_orderkey) AS key_and,
              bit_or(o_orderkey) AS key_or,
              bit_xor(o_orderkey) AS key_xor,
              bool_and(o_totalprice > 1000.0) AS all_over_1k,
              bool_or(o_totalprice > 400000.0) AS any_over_400k,
              COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** R63 — point-in-range temporal join (attribution shape): each
    * purchase joined to the same user's clicks in the preceding hour.
    * The equi key (user) carries the shuffle; the range predicate is a
    * cheap residual on the hash-join probe — NOT a cartesian band
    * join, so it scales as a plain shuffle join at 100 TB (the
    * streaming twin is the watermarked interval join, R58). */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).filter(col("user_id") < 50)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("sec"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u"), col("event_id").as("buy_id"), col("sec").as("bsec"))
    val clicks = ev.filter(col("event_type") === "click")
    buys.join(clicks,
        col("u") === col("user_id") &&
          col("sec") >= col("bsec") - lit(3600L) && col("sec") < col("bsec"))
      .groupBy(col("u").as("user_id"))
      .agg(count(lit(1)).as("n_attr"),
           countDistinct(col("buy_id")).as("n_buys"),
           countDistinct(col("event_id")).as("n_clicks"),
           max(col("bsec") - col("sec")).as("max_gap_sec"))
      .orderBy("user_id")
  }

  val qRangeJoinSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
                         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
                  FROM events WHERE user_id < 50)
       SELECT b.user_id, COUNT(*) AS n_attr,
              COUNT(DISTINCT b.event_id) AS n_buys,
              COUNT(DISTINCT c.event_id) AS n_clicks,
              MAX(b.sec - c.sec) AS max_gap_sec
       FROM e b JOIN e c
         ON b.user_id = c.user_id AND b.event_type = 'purchase' AND c.event_type = 'click'
        AND c.sec >= b.sec - 3600 AND c.sec < b.sec
       GROUP BY b.user_id ORDER BY b.user_id"""

  /** R64 — positional explode: per-word ordinals via posexplode
    * (UNNEST WITH ORDINALITY), the building block for order-aware
    * token pipelines. Narrow (no shuffle until the final sort). */
  def qPosexplode(s: SparkSession, d: String): DataFrame =
    documents(s, d).filter(col("doc_id") < 10)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("ord"), col("col").as("word"))
      .filter(col("ord") <= 5)
      .orderBy("doc_id", "ord")

  val qPosexplodeSql: String =
    """SELECT doc_id, CAST(i AS BIGINT) AS ord, ws[i] AS word
       FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 10) w,
            UNNEST(range(1, len(ws) + 1)) AS t(i)
       WHERE i <= 5
       ORDER BY doc_id, ord"""

  /** R65 — array function breadth: sort/slice/contains/position/
    * distinct over the per-document word array. All per-row codegen'd
    * array kernels — no shuffle besides the output sort. */
  def qArrayFuncs(s: SparkSession, d: String): DataFrame =
    documents(s, d).filter(col("doc_id") < 300)
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_uniq"),
        concat_ws(" ", slice(array_sort(col("ws")), 1, 3)).as("first3_sorted"),
        array_contains(col("ws"), "spark").as("has_spark"),
        array_position(col("ws"), "table").cast("long").as("pos_table"))
      .orderBy("doc_id")

  val qArrayFuncsSql: String =
    """SELECT doc_id,
              CAST(len(ws) AS BIGINT) AS n_words,
              CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
              array_to_string(list_sort(ws)[1:3], ' ') AS first3_sorted,
              list_contains(ws, 'spark') AS has_spark,
              CAST(COALESCE(list_position(ws, 'table'), 0) AS BIGINT) AS pos_table
       FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 300) w
       ORDER BY doc_id"""

  /** R66 — regular-expression functions: extract / global replace /
    * match count / anchored match, patterns kept in the RE2 ∩ Java
    * common subset so both engines agree. */
  def qRegexpFuncs(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_custkey") < 300)
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("cnum"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        expr("regexp_count(c_name, '0')").cast("long").as("n_zeros"),
        col("c_name").rlike("^Customer#[0-9]+$").as("well_formed"))
      .orderBy("c_custkey")

  val qRegexpFuncsSql: String =
    """SELECT c_custkey,
              regexp_extract(c_name, '([0-9]+)', 1) AS cnum,
              regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
              CAST(len(regexp_extract_all(c_name, '0')) AS BIGINT) AS n_zeros,
              regexp_matches(c_name, '^Customer#[0-9]+$') AS well_formed
       FROM customer WHERE c_custkey < 300 ORDER BY c_custkey"""

  /** R67 — hashing / encoding scalar functions: md5, sha2-256,
    * base64, ascii, bit_length — content-addressing primitives the
    * dedup pipeline builds on, exposed as a query of their own. */
  def qHashFuncs(s: SparkSession, d: String): DataFrame =
    supplier(s, d).filter(col("s_suppkey") < 200)
      .select(col("s_suppkey"),
        md5(col("s_name")).as("h_md5"),
        sha2(col("s_name"), 256).as("h_sha256"),
        base64(col("s_name").cast("binary")).as("b64"),
        ascii(col("s_name")).cast("long").as("first_ascii"),
        bit_length(col("s_name")).cast("long").as("bits"))
      .orderBy("s_suppkey")

  val qHashFuncsSql: String =
    """SELECT s_suppkey,
              md5(s_name) AS h_md5,
              sha256(s_name) AS h_sha256,
              to_base64(encode(s_name)) AS b64,
              CAST(ascii(s_name) AS BIGINT) AS first_ascii,
              CAST(bit_length(s_name) AS BIGINT) AS bits
       FROM supplier WHERE s_suppkey < 200 ORDER BY s_suppkey"""

  /** R73 — TPC-H Q20-style excess supply (adapted: the testdata has no
    * partsupp, so availability is proxied by the all-time shipped
    * quantity per (part, supplier), exactly how Q2/Q11 were adapted):
    * suppliers of 'small%' parts whose 1996 shipments exceed half
    * their all-time volume of that part. Preserves Q20's nested shape
    * — part-filtered semi chain → per-(part,supp) aggregate →
    * threshold comparing two aggregates of the same group → semi join
    * into the supplier dim. Plan: part broadcast into the lineitem
    * scan, ONE shuffle for the (partkey,suppkey) agg, then the
    * distinct suppkeys broadcast back as a left-semi against the tiny
    * supplier dim; nation broadcast. The threshold is compared in
    * DECIMAL (2·y > total) so both engines agree exactly at any SF. */
  def q20ExcessSupply(s: SparkSession, d: String): DataFrame = {
    val qty = col("l_quantity").cast("decimal(18,4)")
    val supply = lineitem(s, d)
      .join(broadcast(part(s, d).filter(col("p_name").startsWith("small"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(qty).as("total_qty"),
           sum(when(year(to_date(col("l_shipdate"))) === 1996, qty).otherwise(lit(0).cast("decimal(18,4)"))).as("y_qty"))
      .filter(col("y_qty") * 2 > col("total_qty"))
      .select(col("l_suppkey").as("sk")).distinct()
    supplier(s, d)
      .join(broadcast(supply), col("s_suppkey") === col("sk"), "left_semi")
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin("NATION_3", "NATION_7"))
      .select("s_name", "n_name")
      .orderBy("s_name")
  }

  val q20Sql: String =
    """WITH supply AS (
         SELECT l_partkey, l_suppkey,
                SUM(CAST(l_quantity AS DECIMAL(18,4))) AS total_qty,
                SUM(CASE WHEN year(CAST(l_shipdate AS DATE)) = 1996
                         THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS y_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_name LIKE 'small%'
         GROUP BY l_partkey, l_suppkey)
       SELECT s_name, n_name
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       WHERE s_suppkey IN (SELECT l_suppkey FROM supply WHERE 2 * y_qty > total_qty)
         AND n_name IN ('NATION_3', 'NATION_7')
       ORDER BY s_name"""

  /** R73 — correlated LATERAL join: per-customer order profile as a
    * lateral aggregate subquery (the SQL:2016 `LATERAL` form clients
    * port from Postgres/DuckDB). Catalyst decorrelates it into the
    * same one-shuffle aggregate-then-join plan the hand-written
    * groupBy would produce — the point of the entry is that the
    * DECORRELATION path is exercised and oracle-gated, not a new
    * physical shape. Exact-decimal spend (dsum pattern) keeps the
    * float hash cross-engine stable. */
  def qLateralProfile(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("graft_lat_customer")
    orders(s, d).createOrReplaceTempView("graft_lat_orders")
    s.sql(
      s"""SELECT c_custkey, c_mktsegment, t.n_open, t.spend
         FROM graft_lat_customer,
         LATERAL (
           SELECT COUNT(o_orderkey) AS n_open,
                  ${sqlSum("o_totalprice")} AS spend
           FROM graft_lat_orders
           WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
         ) t
         WHERE c_custkey < 200 AND t.n_open > 0
         ORDER BY c_custkey""")
  }

  /** R74 — null-safe equi-join (`<=>` / SQL:2003 IS NOT DISTINCT
    * FROM): NULL join keys match each other instead of vanishing — the
    * semantics ETL reconciliation joins need when "unknown" is a real
    * category. Spark plans the null-safe comparison as a HASH join key
    * (no fallback to nested loops), so it shuffles exactly like a
    * plain equi-join at any scale; nulls are synthesized via NULLIF so
    * both engines derive the identical key set. */
  def qNullSafeJoin(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderkey"),
      expr("NULLIF(o_orderpriority, '3-MEDIUM')").as("p"))
    val dim = orders(s, d)
      .select(expr("NULLIF(o_orderpriority, '3-MEDIUM')").as("dp")).distinct()
    o.join(broadcast(dim), col("p") <=> col("dp"))
      .groupBy(coalesce(col("dp"), lit("(null)")).as("prio"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prio")
  }

  val qNullSafeJoinSql: String =
    """WITH o AS (SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS p FROM orders),
       d AS (SELECT DISTINCT NULLIF(o_orderpriority, '3-MEDIUM') AS dp FROM orders)
       SELECT COALESCE(dp, '(null)') AS prio, COUNT(*) AS n
       FROM o JOIN d ON p IS NOT DISTINCT FROM dp
       GROUP BY 1 ORDER BY prio"""

  val qLateralProfileSql: String =
    """SELECT c_custkey, c_mktsegment, t.n_open, t.spend
       FROM customer,
       LATERAL (
         SELECT COUNT(o_orderkey) AS n_open,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
         FROM orders
         WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
       ) t
       WHERE c_custkey < 200 AND t.n_open > 0
       ORDER BY c_custkey"""

  /** R76 — MAP-typed aggregation state: per customer, the order-status
    * histogram built as a real `MAP<STRING,BIGINT>` (map_from_entries
    * over the per-status counts) and then consumed with element_at /
    * map_keys / map_filter. Two partial-agg shuffles (status level,
    * then customer level), both map-side combined; the map itself
    * stays row-local so nothing about the type changes the exchange
    * shape at scale. Output is scalars only — the map is the working
    * state, not the interchange format. */
  def qMapFuncs(s: SparkSession, d: String): DataFrame = {
    val perStatus = orders(s, d).filter(col("o_custkey") < 200)
      .groupBy("o_custkey", "o_orderstatus").agg(count(lit(1)).as("cnt"))
    perStatus.groupBy("o_custkey")
      .agg(map_from_entries(collect_list(struct(col("o_orderstatus"), col("cnt")))).as("m"))
      .select(col("o_custkey"),
        size(col("m")).cast("long").as("n_statuses"),
        coalesce(element_at(col("m"), "O"), lit(0L)).as("n_open"),
        coalesce(element_at(col("m"), "F"), lit(0L)).as("n_done"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("statuses"),
        size(map_filter(col("m"), (_, v) => v <= 2)).cast("long").as("n_rare"))
      .orderBy("o_custkey")
  }

  val qMapFuncsSql: String =
    """WITH ps AS (SELECT o_custkey, o_orderstatus, COUNT(*) AS cnt
                   FROM orders WHERE o_custkey < 200 GROUP BY 1, 2)
       SELECT o_custkey,
              COUNT(*) AS n_statuses,
              CAST(COALESCE(SUM(cnt) FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS n_open,
              CAST(COALESCE(SUM(cnt) FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS n_done,
              array_to_string(list_sort(list(o_orderstatus)), ',') AS statuses,
              CAST(COUNT(*) FILTER (WHERE cnt <= 2) AS BIGINT) AS n_rare
       FROM ps GROUP BY o_custkey ORDER BY o_custkey"""

  /** R77 — VARIANT semi-structured type (Spark 4): JSON ingested once
    * via parse_json into the binary VARIANT encoding, then fields read
    * with typed variant_get path extraction — the open-schema column
    * pattern (logs, API payloads) that replaces per-query JSON string
    * re-parsing. At scale the win is decode-once: variant_get is a
    * codegen'd binary traversal, not a parser, so N path reads cost
    * one parse. try_variant_get covers the missing-path contract. The
    * oracle mirrors values (DuckDB has JSON, not VARIANT) — equality
    * of the extracted results is the cross-engine contract. */
  def qVariant(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") < 400)
      .withColumn("js", to_json(struct(col("o_orderkey").as("k"),
        col("o_totalprice").as("price"),
        struct(col("o_orderstatus").as("s"), col("o_orderpriority").as("pri")).as("meta"))))
      .withColumn("v", expr("parse_json(js)"))
      .select(col("o_orderkey"),
        expr("variant_get(v, '$.price', 'double')").as("price"),
        expr("variant_get(v, '$.meta.s', 'string')").as("status"),
        expr("variant_get(v, '$.meta.pri', 'string')").as("pri"),
        expr("CAST(try_variant_get(v, '$.nope', 'bigint') AS BIGINT)").as("missing"))
      .orderBy("o_orderkey")

  val qVariantSql: String =
    """SELECT o_orderkey,
              CAST(o_totalprice AS DOUBLE) AS price,
              o_orderstatus AS status,
              o_orderpriority AS pri,
              CAST(NULL AS BIGINT) AS missing
       FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey"""

  /** R78 — IGNORE NULLS window functions: last/first/nth non-null and
    * gap-skipping lag over a sparse "big order" marker — the
    * forward-fill family (sensor gaps, sparse dimension changes).
    * Same exchange as any window: one shuffle on the partition key;
    * IGNORE NULLS only changes the frame evaluator. Unique
    * (date, orderkey) ordering keeps both engines deterministic. */
  def qWindowIgnoreNulls(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("od"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d).filter(col("o_custkey") < 60)
      .withColumn("od", to_date(col("o_orderdate")))
      .withColumn("big", when(col("o_totalprice") > 150000.0, col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("big"), 1, null, true).over(w).as("prev_big"),
        last(col("big"), ignoreNulls = true).over(wRun).as("last_big"),
        first(col("big"), ignoreNulls = true).over(wRun).as("first_big"),
        nth_value(col("big"), 2, ignoreNulls = true).over(wRun).as("second_big"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val qWindowIgnoreNullsSql: String =
    """SELECT o_custkey, o_orderkey,
              lag(big IGNORE NULLS) OVER w AS prev_big,
              last_value(big IGNORE NULLS) OVER wr AS last_big,
              first_value(big IGNORE NULLS) OVER wr AS first_big,
              nth_value(big, 2 IGNORE NULLS) OVER wr AS second_big
       FROM (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
                    CASE WHEN o_totalprice > 150000.0 THEN o_orderkey END AS big
             FROM orders WHERE o_custkey < 60) t
       WINDOW w  AS (PARTITION BY o_custkey ORDER BY od, o_orderkey),
              wr AS (PARTITION BY o_custkey ORDER BY od, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       ORDER BY o_custkey, o_orderkey"""

  /** R79 — error-safe arithmetic (try_divide / try_to_number /
    * try_element_at): NULL instead of runtime failure on div-zero,
    * malformed numerics and out-of-range subscripts — what keeps a
    * 100 TB batch job from dying at hour 3 on one bad row. All
    * row-local codegen'd expressions; the oracle mirrors the NULL
    * contract with guards (DuckDB errors on div-zero by design). */
  def qTryArith(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
        expr("try_divide(l_extendedprice, l_quantity - 17.0)").as("per_unit_adj"),
        expr("try_divide(CAST(l_orderkey AS DOUBLE), CAST(l_linenumber AS DOUBLE) - 2.0)").as("int_div"),
        expr("CAST(try_to_number(CASE WHEN l_returnflag = 'A' THEN '123' ELSE 'x9' END, '999') AS BIGINT)").as("flag_num"),
        expr("try_element_at(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT)), CAST(l_linenumber AS INT) + 1)").as("elem"))
      .orderBy("l_orderkey", "ln")

  val qTryArithSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
              CASE WHEN l_quantity = 17.0 THEN NULL
                   ELSE l_extendedprice / (l_quantity - 17.0) END AS per_unit_adj,
              CASE WHEN l_linenumber = 2 THEN NULL
                   ELSE CAST(l_orderkey AS DOUBLE) / (CAST(l_linenumber AS DOUBLE) - 2.0) END AS int_div,
              CASE WHEN l_returnflag = 'A' THEN CAST(123 AS BIGINT) ELSE try_cast('x9' AS BIGINT) END AS flag_num,
              CAST(([1, 2, 3])[l_linenumber + 1] AS BIGINT) AS elem
       FROM lineitem WHERE l_orderkey < 300 ORDER BY l_orderkey, ln"""

  /** R80 — generator-built date spine (`sequence()` + explode): the
    * non-recursive sibling of R57 — a monthly calendar emitted by one
    * codegen'd generator expression, left-joined to the monthly order
    * rollup so empty months report zeros. At scale the spine is O(1)
    * to produce on one task and broadcast; the only real shuffle is
    * the fact-side month aggregate (map-side combined). Prefer this
    * over the recursive CTE whenever the spine bounds are known —
    * no iterative plan, no driver round per step. */
  def qSeqSpine(s: SparkSession, d: String): DataFrame = {
    val months = s.range(1).select(explode(expr(
      "sequence(DATE'1996-01-01', DATE'1997-12-01', interval 1 month)")).as("mstart"))
    val rev = orders(s, d)
      .withColumn("mstart", date_trunc("month", to_date(col("o_orderdate"))).cast("date"))
      .filter(col("mstart") >= lit("1996-01-01") && col("mstart") <= lit("1997-12-01"))
      .groupBy("mstart")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("rev"))
    months.join(rev, Seq("mstart"), "left")
      .select(col("mstart").cast("string").as("month_start"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("rev"), lit(0.0)).as("rev"))
      .orderBy("month_start")
  }

  val qSeqSpineSql: String =
    """WITH spine AS (
         SELECT CAST(unnest(generate_series(DATE '1996-01-01', DATE '1997-12-01',
                                            INTERVAL 1 MONTH)) AS DATE) AS mstart),
       rev AS (
         SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS mstart,
                COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
         FROM orders
         WHERE CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
               BETWEEN DATE '1996-01-01' AND DATE '1997-12-01'
         GROUP BY 1)
       SELECT CAST(s.mstart AS VARCHAR) AS month_start,
              COALESCE(r.n_orders, 0) AS n_orders,
              COALESCE(r.rev, 0.0) AS rev
       FROM spine s LEFT JOIN rev r ON s.mstart = r.mstart
       ORDER BY month_start"""

  /** R81 — nested struct-array composition: per-document word arrays
    * zipped with their lengths (arrays_zip → ARRAY<STRUCT>), consumed
    * with struct-field lambdas (filter on z.lens) and struct-ordered
    * array_sort. All row-local codegen'd array kernels — the nested
    * type never crosses an exchange, so the plan is a pure map +
    * output sort at any scale. */
  def qStructFuncs(s: SparkSession, d: String): DataFrame =
    documents(s, d).filter(col("doc_id") < 40)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("lens", transform(col("ws"), w => length(w)))
      .withColumn("zipped", arrays_zip(col("ws"), col("lens")))
      .select(col("doc_id"),
        element_at(col("zipped"), 1).getField("ws").as("first_word"),
        element_at(col("zipped"), 1).getField("lens").cast("long").as("first_len"),
        size(filter(col("zipped"), z => z.getField("lens") >= 6)).cast("long").as("n_long"),
        element_at(array_sort(col("zipped")), 1).getField("ws").as("alpha_first"))
      .orderBy("doc_id")

  val qStructFuncsSql: String =
    """SELECT doc_id,
              ws[1] AS first_word,
              CAST(len(ws[1]) AS BIGINT) AS first_len,
              CAST(len(list_filter(ws, w -> len(w) >= 6)) AS BIGINT) AS n_long,
              list_sort(ws)[1] AS alpha_first
       FROM (SELECT doc_id, string_split(text, ' ') AS ws
             FROM documents WHERE doc_id < 40) t
       ORDER BY doc_id"""

  /** R83 — collation-aware grouping (Spark 4 collations): mixed-case
    * variants of the same logical name group as ONE key under
    * UTF8_LCASE — the engine-level answer to scattering lower() calls
    * through every comparison. The collated compare runs inside the
    * hash-agg's key (no normalized copy materialized); exchanges are
    * the same two-phase agg as any groupBy. The oracle mirrors the
    * SEMANTICS with lower() (DuckDB's collation support is
    * per-database, not per-expression), plus a binary-distinct count
    * inside each group proving the collation actually merged
    * distinct byte sequences. */
  def qCollation(s: SparkSession, d: String): DataFrame = {
    val base = customer(s, d).filter(col("c_custkey") <= 300)
      .select(col("c_custkey"), col("c_name"))
    val variants = base.filter(col("c_custkey") % 3 === 0)
      .select(upper(col("c_name")).as("n"))
      .unionAll(base.select(lower(col("c_name")).as("n")))
    variants
      .groupBy(expr("collate(n, 'UTF8_LCASE')").as("k"))
      .agg(count(lit(1)).as("n_variants"),
           countDistinct(col("n")).as("n_forms"))
      .select(lower(col("k").cast("string")).as("name_key"),
              col("n_variants"), col("n_forms").cast("long").as("n_forms"))
      .orderBy("name_key")
  }

  val qCollationSql: String =
    """WITH base AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 300),
       v AS (SELECT upper(c_name) AS n FROM base WHERE c_custkey % 3 = 0
             UNION ALL SELECT lower(c_name) FROM base)
       SELECT lower(n) AS name_key, COUNT(*) AS n_variants,
              CAST(COUNT(DISTINCT n) AS BIGINT) AS n_forms
       FROM v GROUP BY lower(n) ORDER BY name_key"""

  /** R84 — XML ingestion: an XML payload column decoded two ways —
    * schema-on-read `from_xml` (struct extraction, the JSON/VARIANT
    * sibling for XML feeds) and targeted `xpath_*` point extraction.
    * Both are row-local codegen'd parses; the oracle mirrors the
    * round-tripped VALUES (DuckDB has no XML type). Map-only plan. */
  def qXmlFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") < 300)
      .withColumn("xml", concat(
        lit("<order><k>"), col("o_orderkey"),
        lit("</k><status>"), col("o_orderstatus"),
        lit("</status><price>"), col("o_totalprice"),
        lit("</price></order>")))
      .select(col("o_orderkey"),
        expr("xpath_long(xml, '/order/k/text()')").as("k"),
        expr("xpath_string(xml, '/order/status/text()')").as("status"),
        expr("from_xml(xml, 'k BIGINT, status STRING, price DOUBLE').price").as("price"))
      .orderBy("o_orderkey")

  val qXmlFuncsSql: String =
    """SELECT o_orderkey, o_orderkey AS k, o_orderstatus AS status,
              CAST(o_totalprice AS DOUBLE) AS price
       FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey"""

  private val rlCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** C70 (gate query) — row-lineage roundtrip: a lineage-enabled
    * table built from orders (one ordered file, so the id block IS
    * the key rank), compacted through the materializing rewrite, then
    * appended again — the final `_row_id` mapping must equal the
    * dense key rank across BOTH representations (materialized column
    * for the compacted block, manifest base+ordinal for the fresh
    * append). The oracle states that rank directly. */
  def qRowidRoundtrip(s: SparkSession, d: String): DataFrame = {
    import graft.catalog._
    import org.apache.hadoop.fs.{Path => HPath}
    val ops = new TableOps(new FsStore(s.sparkContext.hadoopConfiguration))
    val wh = rlCache.computeIfAbsent(d, { _ =>
      val whPath = java.nio.file.Files.createTempDirectory("graft-rl-")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(whPath.toFile)
      }))
      val tdir = new HPath(whPath.toString, "orders_rl")
      def slice(lo: Long, hi: Long) = orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
        .orderBy("o_orderkey").coalesce(1)
      ops.create(tdir, TableMetadata.create(
        tdir.toString, SchemaBridge.fromSpark(slice(0, 1).schema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty),
        Map(RowLineage.EnabledProp -> "true")))
      ops.write(tdir, slice(0, 4000), "append")
      ops.compactLineage(s, tdir, numFiles = 1)
      ops.write(tdir, slice(4000, 6000), "append")
      whPath.toString
    })
    val tdir = new HPath(wh, "orders_rl")
    val (_, meta) = ops.load(tdir).get
    val t = new GraftTable(tdir.toString, tdir, meta, ops, None)
    org.apache.spark.sql.execution.datasources.GraftBridge.ofRows(s, t)
      .select(col("o_orderkey"), col("_row_id").as("row_id"), col("o_totalprice"))
      .filter(col("o_orderkey") % 3 === 0)
      .orderBy("o_orderkey")
  }

  val qRowidRoundtripSql: String =
    """SELECT o_orderkey, row_id, o_totalprice FROM (
         SELECT o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS row_id
         FROM orders WHERE o_orderkey < 6000) t
       WHERE o_orderkey % 3 = 0 ORDER BY o_orderkey"""

  /** C88 under the oracle gate — transparent MV rewrite end-to-end: a
    * catalog table is built in three commit windows (append evens →
    * deletion-vector delete of high quantities → append odds) with an
    * INCREMENTAL [[graft.catalog.Materialized.refreshSumCount]] after
    * each, the MV is registered as a rewrite target, and the returned
    * aggregate query is REQUIRED to have been answered by the MV scan
    * (the plan check throws if the rewrite didn't fire, failing the
    * gate loudly). The DuckDB oracle recomputes the same aggregate
    * directly over raw lineitem — the hash match proves three things
    * at once: the CDC-driven incremental maintenance arithmetic, the
    * rewrite's answer equivalence, and the `AVG = value_sum/n_rows`
    * derivation. `l_quantity` is integer-valued, so every double here
    * is exact and order-independent cross-engine. */
  private val mvCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Shared C88 fixture: a catalog table fed by a 3-commit incremental
    * timeline (append / DV delete / append) with a sum/count MV kept
    * exactly at head and registered for rewrite — built once per
    * sf-dir, reused by [[qMvRewrite]] and [[qMvRollup]]. */
  private def mvSetup(s: SparkSession, d: String, ops: graft.catalog.TableOps): String = {
    import graft.catalog._
    import org.apache.hadoop.fs.{Path => HPath}
    mvCache.computeIfAbsent(d, { _ =>
      val whPath = java.nio.file.Files.createTempDirectory("graft-mvrw-")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(whPath.toFile)
      }))
      val tdir = new HPath(whPath.toString, "mv_src")
      val mdir = new HPath(whPath.toString, "mv_agg")
      val src = lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"), col("l_orderkey"))
      ops.create(tdir, TableMetadata.create(
        tdir.toString, SchemaBridge.fromSpark(src.schema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
      def refresh(): Unit = { Materialized.refreshSumCount(
        s, ops, tdir, mdir, Seq("l_returnflag", "l_linestatus"), "l_quantity"); () }
      ops.write(tdir, src.filter(col("l_orderkey") % 2 === 0), "append")
      refresh()
      ops.deletionVectorDelete(s, tdir, col("l_quantity") >= 45.0)
      refresh()
      ops.write(tdir, src.filter(col("l_orderkey") % 2 === 1), "append")
      refresh()
      Materialized.enableRewrite(ops, tdir, mdir)
      whPath.toString
    })
  }

  def qMvRewrite(s: SparkSession, d: String): DataFrame = {
    import graft.catalog._
    import org.apache.hadoop.fs.{Path => HPath}
    val ops = new TableOps(new FsStore(s.sparkContext.hadoopConfiguration))
    val wh = mvSetup(s, d, ops)
    // sessions without GraftExtensions register the same rule through
    // the public experimental hook (runs post-pushdown; the rule
    // handles both relation forms)
    if (!s.experimental.extraOptimizations.exists(_.isInstanceOf[RewriteToMaterializedView]))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ new RewriteToMaterializedView(s)
    val tdir = new HPath(wh, "mv_src")
    val (_, meta) = ops.load(tdir).get
    val t = new GraftTable(tdir.toString, tdir, meta, ops, None)
    val df = org.apache.spark.sql.execution.datasources.GraftBridge.ofRows(s, t)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"),
        count(lit(1)).as("n_rows_g"),
        avg("l_quantity").as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")
    val answered = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name.startsWith("mv:") => r
    }.nonEmpty
    require(answered, "C88 MV rewrite did not answer the aggregate — gate check failed")
    df
  }

  val qMvRewriteSql: String =
    """WITH src AS (
         SELECT l_returnflag, l_linestatus, l_quantity
         FROM lineitem
         WHERE l_orderkey % 2 = 1 OR l_quantity < 45)
       SELECT l_returnflag, l_linestatus,
              SUM(l_quantity) AS sum_qty,
              COUNT(*) AS n_rows_g,
              SUM(l_quantity) / COUNT(*) AS avg_qty
       FROM src GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** C88 drill-up gate: same MV and incremental timeline as
    * [[qMvRewrite]], but the query groups on a PROPER SUBSET of the
    * MV's keys (`l_returnflag` of a (l_returnflag, l_linestatus) MV) —
    * the rewrite must answer it by RE-AGGREGATING the MV's O(groups)
    * rows, and the plan check `require`s both the `mv:` scan AND the
    * roll-up Aggregate on top of it. DuckDB recomputes from raw
    * lineitem; integer-valued quantities keep every double exact. */
  def qMvRollup(s: SparkSession, d: String): DataFrame = {
    import graft.catalog._
    import org.apache.hadoop.fs.{Path => HPath}
    val ops = new TableOps(new FsStore(s.sparkContext.hadoopConfiguration))
    val wh = mvSetup(s, d, ops) // shared 3-commit timeline (cached per sf-dir)
    if (!s.experimental.extraOptimizations.exists(_.isInstanceOf[RewriteToMaterializedView]))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ new RewriteToMaterializedView(s)
    val tdir = new HPath(wh, "mv_src")
    val (_, meta) = ops.load(tdir).get
    val t = new GraftTable(tdir.toString, tdir, meta, ops, None)
    val df = org.apache.spark.sql.execution.datasources.GraftBridge.ofRows(s, t)
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_qty"),
        count(lit(1)).as("n_rows_g"),
        avg("l_quantity").as("avg_qty"))
      .orderBy("l_returnflag")
    val opt = df.queryExecution.optimizedPlan
    val mvScans = opt.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name.startsWith("mv:") => r
    }
    val reAgg = opt.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    require(mvScans.nonEmpty && reAgg.nonEmpty,
      "C88 drill-up did not fire (need mv: scan under a roll-up Aggregate)")
    df
  }

  val qMvRollupSql: String =
    """WITH src AS (
         SELECT l_returnflag, l_quantity
         FROM lineitem
         WHERE l_orderkey % 2 = 1 OR l_quantity < 45)
       SELECT l_returnflag,
              SUM(l_quantity) AS sum_qty,
              COUNT(*) AS n_rows_g,
              SUM(l_quantity) / COUNT(*) AS avg_qty
       FROM src GROUP BY l_returnflag
       ORDER BY l_returnflag"""

  /** C47 × C88 under the oracle gate — transparent JOIN-MV rewrite
    * end-to-end: TWO catalog tables are built in interleaved commit
    * windows (orders evens + half the customers → incremental
    * [[graft.catalog.Materialized.refreshJoinCount]] → DV delete of
    * high-price orders → refresh → orders odds + remaining customers →
    * refresh), the join MV is registered on source A, and the returned
    * `key, COUNT(*)` join aggregate is REQUIRED to have been answered
    * by the MV scan with the Join GONE from the plan. DuckDB recomputes
    * the same join count from raw orders/customer under the timeline's
    * net predicate — the hash match proves the bilinear
    * ΔA⋈B + A⋈ΔB maintenance arithmetic AND the rewrite's answer
    * equivalence at once. Counts are integers; nothing float-sensitive. */
  private val mvJoinCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def mvJoinSetup(s: SparkSession, d: String, ops: graft.catalog.TableOps): String = {
    import graft.catalog._
    import org.apache.hadoop.fs.{Path => HPath}
    mvJoinCache.computeIfAbsent(d, { _ =>
      val whPath = java.nio.file.Files.createTempDirectory("graft-mvjoin-")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(whPath.toFile)
      }))
      val aDir = new HPath(whPath.toString, "mvj_orders")
      val bDir = new HPath(whPath.toString, "mvj_cust")
      val mDir = new HPath(whPath.toString, "mvj_agg")
      val srcA = orders(s, d).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val srcB = customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      ops.create(aDir, TableMetadata.create(
        aDir.toString, SchemaBridge.fromSpark(srcA.schema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
      ops.create(bDir, TableMetadata.create(
        bDir.toString, SchemaBridge.fromSpark(srcB.schema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
      def refresh(): Unit = { Materialized.refreshJoinCount(
        s, ops, aDir, bDir, mDir, "o_custkey", "c_custkey"); () }
      ops.write(aDir, srcA.filter(col("o_orderkey") % 2 === 0), "append")
      ops.write(bDir, srcB.filter(col("c_custkey") % 2 === 0), "append")
      refresh()
      ops.deletionVectorDelete(s, aDir, col("o_totalprice") >= 150000.0)
      refresh()
      ops.write(aDir, srcA.filter(col("o_orderkey") % 2 === 1), "append")
      ops.write(bDir, srcB.filter(col("c_custkey") % 2 === 1), "append")
      refresh()
      Materialized.enableRewrite(ops, aDir, mDir)
      whPath.toString
    })
  }

  def qMvJoinRewrite(s: SparkSession, d: String): DataFrame = {
    import graft.catalog._
    import org.apache.hadoop.fs.{Path => HPath}
    val ops = new TableOps(new FsStore(s.sparkContext.hadoopConfiguration))
    val wh = mvJoinSetup(s, d, ops)
    if (!s.experimental.extraOptimizations.exists(_.isInstanceOf[RewriteToMaterializedView]))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ new RewriteToMaterializedView(s)
    val aDir = new HPath(wh, "mvj_orders")
    val bDir = new HPath(wh, "mvj_cust")
    val (_, aMeta) = ops.load(aDir).get
    val (_, bMeta) = ops.load(bDir).get
    val ta = new GraftTable(aDir.toString, aDir, aMeta, ops, None)
    val tb = new GraftTable(bDir.toString, bDir, bMeta, ops, None)
    val dfa = org.apache.spark.sql.execution.datasources.GraftBridge.ofRows(s, ta)
    val dfb = org.apache.spark.sql.execution.datasources.GraftBridge.ofRows(s, tb)
    val df = dfa.join(dfb, dfa("o_custkey") === dfb("c_custkey"))
      .groupBy(dfa("o_custkey"))
      .agg(count(lit(1)).as("n_pairs_q"))
      .orderBy("o_custkey")
    val opt = df.queryExecution.optimizedPlan
    val mvScans = opt.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name.startsWith("mv:") => r
    }
    val joins = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    require(mvScans.nonEmpty && joins.isEmpty,
      "C47 join-MV rewrite did not answer the join aggregate — gate check failed")
    df
  }

  val qMvJoinRewriteSql: String =
    """WITH a AS (
         SELECT o_custkey FROM orders
         WHERE (o_orderkey % 2 = 0 AND o_totalprice < 150000)
            OR o_orderkey % 2 = 1),
       b AS (SELECT c_custkey FROM customer)
       SELECT o_custkey, COUNT(*) AS n_pairs_q
       FROM a JOIN b ON o_custkey = c_custkey
       GROUP BY o_custkey
       ORDER BY o_custkey"""

  /** R88 — ordered funnel analysis: how many users did view → click
    * → purchase IN THAT ORDER (a later stage only counts after the
    * earlier one has occurred) — the product-analytics staple.
    * Cascaded seen-so-far window maxima over one (user, ts) sort:
    * stage-k's flag conditions on stage-(k-1)'s running flag, so the
    * whole funnel is ONE shuffle on user_id plus in-partition sorts —
    * never a per-stage self-join. Ties broken by event_id for
    * cross-engine determinism. */
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = events(s, d).select("user_id", "ts", "event_id", "event_type")
    val staged = e
      .withColumn("sv", max(when(col("event_type") === "view", 1).otherwise(0)).over(w))
      .withColumn("sc", max(when(col("event_type") === "click" && col("sv") === 1, 1)
        .otherwise(0)).over(w))
      .withColumn("sp", max(when(col("event_type") === "purchase" && col("sc") === 1, 1)
        .otherwise(0)).over(w))
    staged.groupBy("user_id")
      .agg(max("sv").as("v"), max("sc").as("c"), max("sp").as("p"))
      .agg(count(lit(1)).as("n0"),
        sum("v").cast("long").as("n1"),
        sum("c").cast("long").as("n2"),
        sum("p").cast("long").as("n3"))
      .selectExpr(
        """stack(4,
             1L, 'any', n0,
             2L, 'view', n1,
             3L, 'view_click', n2,
             4L, 'view_click_purchase', n3) AS (stage, label, n_users)""")
      .orderBy("stage")
  }

  val qFunnelSql: String =
    """WITH s1 AS (
         SELECT user_id, ts, event_id, event_type,
                MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sv
         FROM events),
       s2 AS (
         SELECT *, MAX(CASE WHEN event_type = 'click' AND sv = 1 THEN 1 ELSE 0 END) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sc
         FROM s1),
       s3 AS (
         SELECT *, MAX(CASE WHEN event_type = 'purchase' AND sc = 1 THEN 1 ELSE 0 END) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sp
         FROM s2),
       per AS (SELECT user_id, MAX(sv) AS v, MAX(sc) AS c, MAX(sp) AS p
               FROM s3 GROUP BY user_id),
       a AS (SELECT COUNT(*) AS n0, CAST(SUM(v) AS BIGINT) AS n1,
                    CAST(SUM(c) AS BIGINT) AS n2, CAST(SUM(p) AS BIGINT) AS n3
             FROM per)
       SELECT stage, label, n_users FROM (
         SELECT CAST(1 AS BIGINT) AS stage, 'any' AS label, n0 AS n_users FROM a
         UNION ALL SELECT 2, 'view', n1 FROM a
         UNION ALL SELECT 3, 'view_click', n2 FROM a
         UNION ALL SELECT 4, 'view_click_purchase', n3 FROM a)
       ORDER BY stage"""

  /** R87 — time-series linear interpolation over a gap-filled date
    * spine: daily revenue with missing days filled by the straight
    * line between surviving neighbors (edges clamp to the nearest
    * value) — the standard sensor/metric repair step before any
    * rolling-window model. last/first with IGNORE NULLS over
    * unbounded frames find each gap's bracketing observations in one
    * pass; no self-join, no per-gap loop. The single unpartitioned
    * window is the per-series shape — at scale the same plan runs
    * under `partitionBy(series_key)`. */
  def qInterpolate(s: SparkSession, d: String): DataFrame = {
    val day = to_date(col("o_orderdate"))
    val agg = orders(s, d)
      .filter(day >= lit("1997-03-01") && day <= lit("1997-03-31"))
      .groupBy(day.as("day")).agg(dsum(col("o_totalprice")).as("v"))
    val spine = s.range(0, 31)
      .select(date_add(lit("1997-03-01").cast("date"), col("id").cast("int")).as("day"))
    val wPrev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    spine.join(agg, Seq("day"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nd", first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wNext))
      .withColumn("filled", when(col("v").isNotNull, col("v"))
        .when(col("pv").isNull, col("nv"))
        .when(col("nv").isNull, col("pv"))
        .otherwise(col("pv") + (col("nv") - col("pv"))
          * datediff(col("day"), col("pd")) / datediff(col("nd"), col("pd"))))
      .select(col("day").cast("string").as("day"), col("v").isNotNull.as("observed"),
        round(col("filled"), 4).as("filled"))
      .orderBy("day")
  }

  val qInterpolateSql: String =
    s"""WITH agg AS (
         SELECT CAST(o_orderdate AS DATE) AS day,
                ${sqlSum("o_totalprice")} AS v
         FROM orders
         WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1997-03-01' AND DATE '1997-03-31'
         GROUP BY 1),
       spine AS (
         SELECT DATE '1997-03-01' + CAST(i AS INTEGER) AS day
         FROM UNNEST(range(0, 31)) t(i)),
       j AS (SELECT spine.day AS day, v FROM spine LEFT JOIN agg USING (day)),
       w AS (
         SELECT day, v,
           last_value(v IGNORE NULLS) OVER
             (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
             (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
           first_value(v IGNORE NULLS) OVER
             (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
             (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
         FROM j)
       SELECT CAST(day AS VARCHAR) AS day, v IS NOT NULL AS observed,
              ROUND(CASE WHEN v IS NOT NULL THEN v
                         WHEN pv IS NULL THEN nv
                         WHEN nv IS NULL THEN pv
                         ELSE pv + (nv - pv) * (day - pd) / (nd - pd) END, 4) AS filled
       FROM w ORDER BY day"""

  /** R85 — bitmap-index exact distinct counting (Spark 4 bitmap
    * aggregates): per-group COUNT(DISTINCT key) computed as 32k-bit
    * bitmap segments — `bitmap_bucket_number` shards the key space,
    * `bitmap_construct_agg` ORs positions map-side, `bitmap_count`
    * pops bits. At 100 TB this is the exact-distinct shape that
    * scales: the shuffle carries (group, bucket, 4 KB bitmap) rows —
    * thousands of keys collapse into one binary blob before the
    * exchange — instead of every distinct key riding the wire as its
    * own row the way a plain count-distinct expand does. The oracle
    * states the semantics directly (COUNT(DISTINCT)). */
  def qBitmapDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"), expr("bitmap_bucket_number(l_orderkey)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_orderkey))").as("bm"))
      .groupBy("l_returnflag")
      .agg(sum(expr("bitmap_count(bm)")).as("n_orders"))
      .orderBy("l_returnflag")

  val qBitmapDistinctSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** R86 — URL + key-value parsing: `parse_url` host/path/query-param
    * point extraction and `str_to_map` over a packed kv string — the
    * clickstream-ingest decode pair. Row-local, codegen'd, map-only
    * plan; the oracle mirrors the algebra of the constructed URL
    * (DuckDB has no parse_url). */
  def qUrlFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") < 400)
      .withColumn("url", concat(
        lit("https://shop.example.com/"), col("o_orderstatus"),
        lit("/detail?k="), col("o_orderkey"), lit("&src=web")))
      .withColumn("kv", concat(
        lit("status:"), col("o_orderstatus"), lit(",pri:"), col("o_orderpriority")))
      .select(col("o_orderkey"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("CAST(parse_url(url, 'QUERY', 'k') AS BIGINT)").as("qk"),
        expr("str_to_map(kv, ',', ':')['pri']").as("pri"))
      .orderBy("o_orderkey")

  val qUrlFuncsSql: String =
    """SELECT o_orderkey, 'shop.example.com' AS host,
              '/' || o_orderstatus || '/detail' AS path,
              o_orderkey AS qk, o_orderpriority AS pri
       FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey"""

  /** R89 — inverse-distribution aggregates: deterministic MODE
    * (most-frequent value, ties to the smallest — arg-max over a
    * (count, -value) struct so the answer is engine-independent),
    * PERCENTILE_DISC (smallest value whose cumulative count reaches
    * p·n — integer arithmetic only, `4·run ≥ tot` instead of a float
    * cume_dist) and the native interpolating `median`. The frequency
    * table is ONE shuffle on (group, value); the windows and the
    * final agg then run per group, so at 100 TB the shuffled payload
    * is the distinct-value histogram, never the raw rows. */
  def qInverseDist(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_returnflag").as("flag"),
      col("l_quantity").cast("bigint").as("qty"))
    val counts = li.groupBy("flag", "qty").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("flag").orderBy("qty")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val disc = counts
      .withColumn("run", sum("cnt").over(w))
      .withColumn("tot", sum("cnt").over(Window.partitionBy("flag")))
      .groupBy("flag")
      .agg(
        max_by(col("qty"), struct(col("cnt"), col("qty") * -1)).as("mode_qty"),
        min(when(col("run") * 4 >= col("tot"), col("qty"))).as("p25_qty"),
        min(when(col("run") * 2 >= col("tot"), col("qty"))).as("median_disc_qty"),
        min(when(col("run") * 4 >= col("tot") * 3, col("qty"))).as("p75_qty"))
    val med = li.groupBy("flag").agg(round(median(col("qty")), 4).as("median_cont"))
    disc.join(broadcast(med), "flag")
      .select("flag", "mode_qty", "p25_qty", "median_disc_qty", "p75_qty", "median_cont")
      .orderBy("flag")
  }

  val qInverseDistSql: String =
    """WITH li AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty
                   FROM lineitem),
       c AS (SELECT flag, qty, COUNT(*) AS cnt FROM li GROUP BY flag, qty),
       w AS (SELECT flag, qty, cnt,
               SUM(cnt) OVER (PARTITION BY flag ORDER BY qty) AS run,
               SUM(cnt) OVER (PARTITION BY flag) AS tot FROM c),
       d AS (SELECT flag,
               MIN(qty) FILTER (WHERE run * 4 >= tot) AS p25_qty,
               MIN(qty) FILTER (WHERE run * 2 >= tot) AS median_disc_qty,
               MIN(qty) FILTER (WHERE run * 4 >= tot * 3) AS p75_qty
             FROM w GROUP BY flag),
       mo AS (SELECT flag, qty AS mode_qty FROM c
              QUALIFY ROW_NUMBER() OVER (PARTITION BY flag ORDER BY cnt DESC, qty) = 1),
       me AS (SELECT flag, ROUND(median(qty), 4) AS median_cont FROM li GROUP BY flag)
       SELECT flag, mode_qty, p25_qty, median_disc_qty, p75_qty, median_cont
       FROM d JOIN mo USING (flag) JOIN me USING (flag)
       ORDER BY flag"""

  /** R90 — schema-flexible set union: `unionByName` with
    * allowMissingColumns (columns matched by NAME, absent ones
    * null-filled — the heterogeneous-source append that positional
    * UNION silently corrupts) + SQL `GROUP BY ALL` over the merged
    * frame. Map-only until the final one-shuffle aggregate. */
  def qUnionByName(s: SparkSession, d: String): DataFrame = {
    val a = orders(s, d).filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey").as("id"), col("o_totalprice").as("amount"),
        lit("order").as("src"))
    val b = lineitem(s, d).filter(col("l_orderkey") < 2000)
      .select(col("l_orderkey").as("id"), col("l_extendedprice").as("amount"),
        col("l_quantity").cast("bigint").as("items"), lit("line").as("src"))
    a.unionByName(b, allowMissingColumns = true).createOrReplaceTempView("graft_ubn")
    s.sql(s"""SELECT src, COUNT(*) AS n_rows, COUNT(items) AS n_with_items,
              ${sqlSum("amount")} AS total_amount
              FROM graft_ubn GROUP BY ALL ORDER BY src""")
  }

  val qUnionByNameSql: String =
    s"""WITH u AS (
         SELECT o_orderkey AS id, o_totalprice AS amount, 'order' AS src
         FROM orders WHERE o_orderkey < 2000
         UNION ALL BY NAME
         SELECT l_orderkey AS id, l_extendedprice AS amount,
                CAST(l_quantity AS BIGINT) AS items, 'line' AS src
         FROM lineitem WHERE l_orderkey < 2000)
       SELECT src, COUNT(*) AS n_rows, COUNT(items) AS n_with_items,
              ${sqlSum("amount")} AS total_amount
       FROM u GROUP BY ALL ORDER BY src"""

  /** R91 — native batch `session_window` (gap-merged event sessions as
    * a first-class grouping column, vs R21's hand-rolled lag/flag
    * cascade): one shuffle on (user, session assignment), sessions
    * merge while consecutive events are < 30 min apart, window end =
    * last event + gap (exclusive). The oracle restates the merge rule
    * with integer epoch-micros arithmetic. */
  def qSessionWindowBatch(s: SparkSession, d: String): DataFrame =
    events(s, d).filter(col("user_id") < 30)
      .withColumn("t", expr("timestamp_micros(ts div 1000)"))
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("unix_micros(sw.start)").as("start_us"),
        expr("unix_micros(sw.end)").as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")

  val qSessionWindowBatchSql: String =
    """WITH e AS (SELECT user_id, event_id,
                         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
                  FROM events WHERE user_id < 30),
       g AS (SELECT user_id, event_id, us,
               LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS pus
             FROM e),
       t AS (SELECT user_id, us,
               SUM(CASE WHEN pus IS NULL OR us - pus >= 1800000000 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             FROM g)
       SELECT user_id, MIN(us) AS start_us,
              MAX(us) + 1800000000 AS end_us, COUNT(*) AS n_events
       FROM t GROUP BY user_id, sid ORDER BY user_id, start_us"""

  /** R94 — SCD-2 point-in-time reconstruction: build validity
    * intervals from a change history (`lead` over each customer's
    * order dates → [from, next) periods carrying the attribute then
    * in effect) and join facts AT THEIR EVENT TIME — the
    * slowly-changing-dimension type-2 lookup every warehouse needs.
    * The interval join is an equi-join on the customer key with the
    * range condition as a post-join filter (one shuffle on the key;
    * each key's periods are few, so the per-key nested check is
    * bounded). Zero-length periods from same-day changes resolve
    * deterministically: [d, d) matches nothing, the successor takes
    * the day. */
  def qScd2AsOf(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("cust").orderBy(col("from_d"), col("o_orderkey"))
    val periods = orders(s, d).filter(col("o_custkey") < 10)
      .select(col("o_custkey").as("cust"), to_date(col("o_orderdate")).as("from_d"),
        col("o_orderkey"), col("o_orderpriority").as("prio"))
      .withColumn("to_d", lead(col("from_d"), 1).over(w))
      .withColumn("ver", row_number().over(w).cast("long"))
      .select("cust", "from_d", "to_d", "ver", "prio")
    val facts = lineitem(s, d)
      .join(orders(s, d).filter(col("o_custkey") < 10),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("fcust"), col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("ship_d"))
    facts.join(periods,
        col("fcust") === col("cust") && col("from_d") <= col("ship_d") &&
          (col("to_d").isNull || col("ship_d") < col("to_d")))
      .select(col("cust"), col("l_orderkey"), col("l_linenumber"),
        col("ship_d").cast("string").as("ship_day"),
        col("ver"), col("prio").as("prio_in_effect"))
      // ship_day in the sort: the synthetic lineitem repeats
      // (orderkey, linenumber) with different ship dates
      .orderBy("cust", "l_orderkey", "l_linenumber", "ship_day")
  }

  val qScd2AsOfSql: String =
    """WITH p AS (
         SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS from_d,
                o_orderkey, o_orderpriority AS prio
         FROM orders WHERE o_custkey < 10),
       periods AS (
         SELECT cust, from_d,
                LEAD(from_d) OVER (PARTITION BY cust ORDER BY from_d, o_orderkey) AS to_d,
                CAST(ROW_NUMBER() OVER (PARTITION BY cust ORDER BY from_d, o_orderkey)
                     AS BIGINT) AS ver,
                prio
         FROM p),
       facts AS (
         SELECT o_custkey AS cust, l_orderkey, l_linenumber,
                CAST(l_shipdate AS DATE) AS ship_d
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_custkey < 10)
       SELECT f.cust, f.l_orderkey, f.l_linenumber,
              CAST(f.ship_d AS VARCHAR) AS ship_day,
              pr.ver, pr.prio AS prio_in_effect
       FROM facts f JOIN periods pr
         ON f.cust = pr.cust AND pr.from_d <= f.ship_d
        AND (pr.to_d IS NULL OR f.ship_d < pr.to_d)
       ORDER BY f.cust, f.l_orderkey, f.l_linenumber, ship_day"""

  /** R92 — mergeable quantile sketch (`approx_percentile`): the
    * streaming/distributed percentile estimator whose state merges
    * across partitions — the shape exact percentiles (R30) can't take
    * at 100 TB because they shuffle every raw value. Sketch contents
    * are engine-specific, so this is a rows-only gate entry; the
    * rank-error bound vs the exact quantiles is property-tested in
    * PlanSpec. */
  def qApproxQuantile(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 1000)").as("qs"),
        count(lit(1)).as("n"))
      .select(col("status"), col("n"),
        round(element_at(col("qs"), 1), 4).as("p25"),
        round(element_at(col("qs"), 2), 4).as("p50"),
        round(element_at(col("qs"), 3), 4).as("p75"))
      .orderBy("status")
}
