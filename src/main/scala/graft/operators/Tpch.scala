package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H q1–q22 re-expressed Spark-first, adapted to the driver's simplified
  * schema (no `partsupp`; fewer columns — see SURVEY.md §3). Reference query
  * texts: /root/reference/benchmarks/queries/q1.sql … q22.sql.
  *
  * Join/agg-shaped queries use the DataFrame API; subquery-heavy ones use one
  * shared ANSI-SQL text executed verbatim by BOTH Spark and the DuckDB oracle
  * (same Catalyst plan as the DF equivalent, zero dialect-drift risk).
  *
  * Scale notes (100 TB): every query is pure declarative Catalyst — filters
  * reach the parquet scan, dims (region/nation/supplier/part/customer) are
  * broadcast under AQE thresholds, fact-fact joins shuffle on their join key
  * only. Floats rounded (money 2dp, ratios 4dp) on both sides so the
  * hash-compare is insensitive to double-summation order (SURVEY §4).
  */
object Tpch {

  /** Run the same SQL text on Spark (as the query) and DuckDB (as oracle). */
  private def viaSql(q: String): (SparkSession, String) => DataFrame =
    (spark, dir) => { Tables.registerViews(spark, dir); spark.sql(q) }

  private val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ---------------------------------------------------------------- q1
  /** Pricing summary report: scan → filter → 8-way aggregate. Ref q1.sql. */
  def q1(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(rev), 2).as("sum_disc_price"),
        round(sum(rev * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  /** Min-cost supplier (adapted: no partsupp → per-nation max-acctbal
    * supplier). DF form: the correlated max is a window max over the
    * nation partition — one shuffle, no rejoin. Ref q2.sql. */
  def q2(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("s_nationkey")
    Tables.t(spark, dir, "supplier")
      .withColumn("mx", max("s_acctbal").over(w))
      .filter(col("s_acctbal") === col("mx"))
      .join(broadcast(Tables.t(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), round(col("s_acctbal"), 2).as("s_acctbal"), col("n_name"))
      .orderBy("n_name", "s_name")
  }

  val q2Sql: String =
    """SELECT s_name, round(s_acctbal, 2) AS s_acctbal, n_name
      |FROM supplier, nation
      |WHERE s_nationkey = n_nationkey
      |  AND s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
      |                   WHERE s2.s_nationkey = supplier.s_nationkey)
      |ORDER BY n_name, s_name""".stripMargin

  // ---------------------------------------------------------------- q3
  /** Shipping priority: 3-way join + topK by revenue. Ref q3.sql. */
  def q3(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    Tables.t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.t(spark, dir, "orders").filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.t(spark, dir, "lineitem").filter(col("l_shipdate") > cutoff),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
      .agg(round(sum(rev), 2).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate")
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  CAST(o_orderdate AS DATE) AS o_orderdate
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q4
  /** Order-priority count with EXISTS semi-join (adapted: correlation
    * predicate l_shipdate > o_orderdate replaces commit/receipt). The
    * correlated EXISTS is a left-semi join with a compound (equi + range)
    * condition — Catalyst extracts the equi part for hashing. Ref q4.sql. */
  def q4(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .join(Tables.t(spark, dir, "lineitem"),
        col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q5
  /** Local supplier volume: 6-way join through region. Ref q5.sql. */
  def q5(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "customer")
      .join(Tables.t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.t(spark, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.t(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.t(spark, dir, "region")).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(rev), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))

  val q5Sql: String =
    """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q6
  /** Forecast revenue: selective scan + single aggregate. Ref q6.sql. */
  def q6(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.02, 0.04) && col("l_quantity") < 25)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  val q6Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 25""".stripMargin

  // ---------------------------------------------------------------- q7
  /** Volume shipping between nation pair (anti-symmetric join). Ref q7.sql. */
  def q7(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.t(spark, dir, "nation").as("n1")
    val n2 = Tables.t(spark, dir, "nation").as("n2")
    Tables.t(spark, dir, "lineitem")
      .filter(col("l_shipdate").between(
        lit("1995-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
      .join(Tables.t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.t(spark, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.t(spark, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1.n_nationkey"))
      .join(broadcast(n2), col("c_nationkey") === col("n2.n_nationkey"))
      .filter((col("n1.n_name") === "NATION_1" && col("n2.n_name") === "NATION_2") ||
              (col("n1.n_name") === "NATION_2" && col("n2.n_name") === "NATION_1"))
      .select(col("n1.n_name").as("supp_nation"), col("n2.n_name").as("cust_nation"),
        year(col("l_shipdate")).as("l_year"), rev.as("volume"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(round(sum("volume"), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |       round(sum(volume), 2) AS revenue
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
      |             l_extendedprice * (1.0 - l_discount) AS volume
      |      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |        AND c_nationkey = n2.n_nationkey
      |        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
      |                           AND TIMESTAMP '1996-12-31 00:00:00') AS shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------- q8
  /** Market share: CASE-in-aggregate ratio over a 7-way join. Ref q8.sql. */
  def q8(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.t(spark, dir, "nation").as("n1") // supplier nation (share target)
    val n2 = Tables.t(spark, dir, "nation").as("n2") // customer nation (region filter)
    Tables.t(spark, dir, "part").filter(col("p_type") === "STANDARD")
      .join(Tables.t(spark, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
      .join(Tables.t(spark, dir, "orders")
          .filter(col("o_orderdate").between(
            lit("1995-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables.t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1.n_nationkey"))
      .join(broadcast(n2), col("c_nationkey") === col("n2.n_nationkey"))
      .join(broadcast(Tables.t(spark, dir, "region")).filter(col("r_name") === "ASIA"),
        col("n2.n_regionkey") === col("r_regionkey"))
      .select(year(col("o_orderdate")).as("o_year"), rev.as("volume"), col("n1.n_name").as("nat"))
      .groupBy("o_year")
      .agg(round(
        sum(when(col("nat") === "NATION_2", col("volume")).otherwise(0.0)) / sum(col("volume")),
        4).as("mkt_share"))
      .orderBy("o_year")
  }

  val q8Sql: String =
    """SELECT o_year,
      |  round(sum(CASE WHEN nat = 'NATION_2' THEN volume ELSE 0.0 END) / sum(volume), 4) AS mkt_share
      |FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
      |             l_extendedprice * (1.0 - l_discount) AS volume,
      |             n1.n_name AS nat
      |      FROM part, lineitem, orders, customer, supplier, nation n1, nation n2, region
      |      WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
      |        AND o_custkey = c_custkey AND l_suppkey = s_suppkey
      |        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |        AND n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
      |        AND p_type = 'STANDARD'
      |        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
      |                            AND TIMESTAMP '1996-12-31 00:00:00') AS all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------- q9
  /** Product-type profit (adapted: no ps_supplycost → retailprice-based cost
    * proxy), LIKE filter + multi-join + group by nation/year. Ref q9.sql. */
  def q9(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "part").filter(col("p_name").like("%red%"))
      .join(Tables.t(spark, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
      .join(Tables.t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
        (rev - lit(0.5) * col("p_retailprice") * col("l_quantity")).as("amount"))
      .groupBy("nation", "o_year")
      .agg(round(sum("amount"), 2).as("sum_profit"))
      .orderBy(asc("nation"), desc("o_year"))

  val q9Sql: String =
    """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
      |FROM (SELECT n_name AS nation,
      |             CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
      |             l_extendedprice * (1.0 - l_discount)
      |               - 0.5 * p_retailprice * l_quantity AS amount
      |      FROM part, lineitem, supplier, nation, orders
      |      WHERE p_partkey = l_partkey AND l_suppkey = s_suppkey
      |        AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
      |        AND p_name LIKE '%red%') AS profit
      |GROUP BY nation, o_year
      |ORDER BY nation ASC, o_year DESC""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Returned-item reporting: join + topK by revenue. Ref q10.sql. */
  def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "customer")
      .join(Tables.t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.t(spark, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(rev), 2).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)

  val q10Sql: String =
    """SELECT c_custkey, c_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  round(c_acctbal, 2) AS c_acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Important stock (adapted: supplier revenue share with agg-of-agg scalar
    * subquery threshold = broadcast 1-row average). Ref q11.sql. */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.t(spark, dir, "lineitem")
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(sum(rev).as("v"))
    val avgV = perSupp.agg(avg("v").as("av"))
    perSupp.crossJoin(broadcast(avgV))
      .filter(col("v") > col("av"))
      .select(col("s_suppkey"), round(col("v"), 2).as("value"))
      .orderBy(desc("value"), asc("s_suppkey"))
  }

  val q11Sql: String =
    """SELECT l_suppkey AS s_suppkey,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS value
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING sum(l_extendedprice * (1.0 - l_discount)) >
      |  (SELECT avg(v) FROM (SELECT sum(l_extendedprice * (1.0 - l_discount)) AS v
      |                       FROM lineitem GROUP BY l_suppkey) AS pervalue)
      |ORDER BY value DESC, s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Priority-class pivot counts (adapted: linestatus × orderpriority classes
    * replace shipmode). Ref q12.sql. */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.t(spark, dir, "orders")
      .join(Tables.t(spark, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("l_shipdate") < lit("1997-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_linestatus").as("shipclass"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("shipclass")
  }

  val q12Sql: String =
    """SELECT l_linestatus AS shipclass,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus
      |ORDER BY shipclass""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Customer order-count distribution: left outer join + two-level agg.
    * Ref q13.sql (comment-filter replaced by priority filter). */
  def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "customer")
      .join(Tables.t(spark, dir, "orders").filter(col("o_orderpriority") =!= "5-LOW"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count("o_orderkey").as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |      GROUP BY c_custkey) AS c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Promotion effect: conditional aggregate ratio. Ref q14.sql. */
  def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(broadcast(Tables.t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(round(
        lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) / sum(rev),
        4).as("promo_revenue"))

  val q14Sql: String =
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
      |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
      |  / sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Top supplier: CTE + max-of-agg scalar subquery. DF form: the revenue
    * view is one aggregate; the scalar max is a broadcast 1-row cross. */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(round(sum(rev), 2).as("total_revenue"))
    val maxRev = revenue.agg(max("total_revenue").as("mx"))
    Tables.t(spark, dir, "supplier")
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Parts/supplier stats: NOT IN subquery + count distinct (adapted:
    * lineitem replaces partsupp). NOT IN over a never-null key is a left
    * anti join. Ref q16.sql. */
  def q16(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .join(Tables.t(spark, dir, "supplier").filter(col("s_acctbal") < 0)
          .select("s_suppkey"),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.t(spark, dir, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
                  col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Small-quantity-order revenue: correlated scalar avg subquery. DF form =
    * Catalyst's decorrelation written out: per-part averages (semi-pruned to
    * the brand's parts before aggregating — at 100 TB the aggregate runs on
    * the 1/brand-count fraction only) joined back. Ref q17.sql. */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.t(spark, dir, "part").filter(col("p_brand") === "Brand#3")
    val li = Tables.t(spark, dir, "lineitem")
    val halfAvg = li
      .join(brandParts.select("p_partkey"), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("pk"))
      .agg((avg("l_quantity") * 0.5).as("half_avg"))
    li.join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .join(halfAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
      |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Large-volume customers: IN over grouped HAVING = semi join against the
    * big-order aggregate. Ref q18.sql. */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.t(spark, dir, "lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("sq"))
      .filter(col("sq") > 300).select(col("l_orderkey").as("bigkey"))
    Tables.t(spark, dir, "customer")
      .join(Tables.t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(big, col("o_orderkey") === col("bigkey"), "left_semi")
      .join(Tables.t(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_totalprice"))
      .agg(round(sum("l_quantity"), 2).as("sum_qty"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("sum_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  round(o_totalprice, 2) AS o_totalprice, round(sum(l_quantity), 2) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Discounted revenue: disjunctive multi-column pushdown predicates
    * (p_container → p_size/p_brand). Ref q19.sql. */
  def q19(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .join(broadcast(Tables.t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) && col("l_quantity").between(20, 30)))
      .agg(round(sum(rev), 2).as("revenue"))

  val q19Sql: String =
    """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey AND (
      |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  // ---------------------------------------------------------------- q20
  /** Potential part promotion: nested IN subqueries = chained semi joins
    * (red parts → qualifying suppliers → suppliers). Ref q20.sql. */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.t(spark, dir, "part")
      .filter(col("p_name").like("%red%")).select("p_partkey")
    val qualifying = Tables.t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(redParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey").agg(sum("l_quantity").as("sq"))
      .filter(col("sq") > 100).select("l_suppkey")
    Tables.t(spark, dir, "supplier")
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), round(col("s_acctbal"), 2).as("s_acctbal"))
      .orderBy("s_name")
  }

  val q20Sql: String =
    """SELECT s_name, round(s_acctbal, 2) AS s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY l_suppkey
      |  HAVING sum(l_quantity) > 100)
      |ORDER BY s_name""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Suppliers who kept orders waiting. Adapted: the reference's double
    * EXISTS/NOT-EXISTS (q21.sql) is re-expressed as a two-level aggregation —
    * "sole late supplier among multi-supplier finished orders" — which shuffles
    * twice on l_orderkey instead of running correlated quadratic subqueries;
    * at 100 TB this is the only formulation that survives. */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.t(spark, dir, "lineitem")
      .join(Tables.t(spark, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"), 1)
        .otherwise(0)).as("late"))
    val agg = per.groupBy("l_orderkey")
      .agg(count(lit(1)).as("nsupp"), sum("late").as("nlate"),
        max(when(col("late") === 1, col("l_suppkey"))).as("late_supp"))
    agg.filter(col("nsupp") > 1 && col("nlate") === 1)
      .join(Tables.t(spark, dir, "supplier"), col("s_suppkey") === col("late_supp"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """WITH per AS (
      |  SELECT l_orderkey, l_suppkey,
      |         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |                  THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY l_orderkey, l_suppkey),
      |agg AS (
      |  SELECT l_orderkey, count(*) AS nsupp, sum(late) AS nlate,
      |         max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      |  FROM per GROUP BY l_orderkey)
      |SELECT s_name, count(*) AS numwait
      |FROM agg JOIN supplier ON s_suppkey = late_supp
      |WHERE nsupp > 1 AND nlate = 1
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Global sales opportunity: NOT EXISTS anti-join + scalar avg subquery
    * (cntrycode from nationkey, no phone column). DF form: broadcast 1-row
    * average, left-anti join against recent orders. Ref q22.sql. */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.t(spark, dir, "customer")
    val avgBal = c.filter(col("c_acctbal") > 0.0).agg(avg("c_acctbal").as("ab"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(Tables.t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select((col("c_nationkey") % 10).cast("int").as("cntrycode"), col("c_acctbal"))
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
      .orderBy("cntrycode")
  }

  val q22Sql: String =
    """SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
      |FROM (SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode, c_acctbal
      |      FROM customer
      |      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                        AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')) AS custsale
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin

  /** DataFrame-API queries (rest run the shared SQL text via [[viaSql]]). */
  private val dfQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1" -> (q1 _), "q2" -> (q2 _), "q3" -> (q3 _), "q4" -> (q4 _),
    "q5" -> (q5 _), "q6" -> (q6 _), "q7" -> (q7 _), "q8" -> (q8 _),
    "q9" -> (q9 _), "q10" -> (q10 _), "q11" -> (q11 _), "q12" -> (q12 _),
    "q13" -> (q13 _), "q14" -> (q14 _), "q15" -> (q15 _), "q16" -> (q16 _),
    "q17" -> (q17 _), "q18" -> (q18 _), "q19" -> (q19 _), "q20" -> (q20 _),
    "q21" -> (q21 _), "q22" -> (q22 _))

  val oracle: Map[String, String] = Map(
    "q1" -> q1Sql, "q2" -> q2Sql, "q3" -> q3Sql, "q4" -> q4Sql,
    "q5" -> q5Sql, "q6" -> q6Sql, "q7" -> q7Sql, "q8" -> q8Sql,
    "q9" -> q9Sql, "q10" -> q10Sql, "q11" -> q11Sql, "q12" -> q12Sql,
    "q13" -> q13Sql, "q14" -> q14Sql, "q15" -> q15Sql, "q16" -> q16Sql,
    "q17" -> q17Sql, "q18" -> q18Sql, "q19" -> q19Sql, "q20" -> q20Sql,
    "q21" -> q21Sql, "q22" -> q22Sql)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    oracle.keys.map { name =>
      name -> dfQueries.getOrElse(name, viaSql(oracle(name)))
    }.toMap
}
