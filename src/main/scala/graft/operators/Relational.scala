package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator coverage beyond TPC-H (SURVEY.md §2.2): join types,
  * grouping sets, set ops, window functions, unnest, table functions,
  * subqueries, time-bucketed aggregation, sessionization, VALUES, CTEs.
  * Reference semantics: DataFusion's logical plan surface
  * (/root/reference/datafusion/expr/src/logical_plan/plan.rs — Join,
  * Aggregate w/ grouping sets, Window, Unnest, Values, SubqueryAlias...).
  *
  * Scale notes (100 TB): each query is declarative Catalyst — semi/anti joins
  * shuffle only the key column, full-outer pre-aggregates both sides before
  * joining (25-row join, not row-level), sessionization is a single shuffle
  * on user_id then linear window scans, set-ops shuffle the projected key
  * only. No driver-side loops anywhere.
  */
object Relational {

  private def li(spark: SparkSession, dir: String) = Tables.t(spark, dir, "lineitem")
  private def ord(spark: SparkSession, dir: String) = Tables.t(spark, dir, "orders")
  private def cust(spark: SparkSession, dir: String) = Tables.t(spark, dir, "customer")
  private def supp(spark: SparkSession, dir: String) = Tables.t(spark, dir, "supplier")
  private def ev(spark: SparkSession, dir: String) = Tables.t(spark, dir, "events")

  private def ts(s: String): Column = lit(s).cast("timestamp")

  // ------------------------------------------------------------- join types
  /** Left SEMI join: customers who placed a 1997 order. Only the key column
    * of `orders` is shuffled; duplicates never materialize. */
  def jSemi(spark: SparkSession, dir: String): DataFrame =
    cust(spark, dir)
      .join(ord(spark, dir)
          .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1998-01-01")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  val jSemiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |              AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** Left ANTI join: customers with no order on/after 1998-01-01. */
  def jAnti(spark: SparkSession, dir: String): DataFrame =
    cust(spark, dir)
      .join(ord(spark, dir).filter(col("o_orderdate") >= ts("1998-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  val jAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** RIGHT OUTER join (reference join.slt JoinType::Right): big-ticket
    * orders right-joined to customer — every customer appears, with NULL
    * order columns where no qualifying order exists. Spark plans the
    * preserved (customer) side as the stream side of the hash join, so at
    * 100 TB the filtered fact side builds/broadcasts and the dimension is
    * never dropped — the same plan LEFT join would give with sides
    * swapped, covered here because the reference exposes Right as its own
    * join type. */
  def jRight(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.t(spark, dir, "orders").filter(col("o_totalprice") > 350000)
    o.join(cust(spark, dir), col("o_custkey") === col("c_custkey"), "right")
      .select(col("c_custkey"), col("c_mktsegment"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy("c_custkey", "o_orderkey")
  }

  val jRightSql: String =
    """SELECT c_custkey, c_mktsegment, o_orderkey, round(o_totalprice, 2) AS price
      |FROM (SELECT * FROM orders WHERE o_totalprice > 350000) o
      |RIGHT JOIN customer ON o_custkey = c_custkey
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  /** FULL OUTER join of two pre-aggregated sides (customer/supplier counts
    * per nation). Aggregate-then-join: at 100 TB the join input is 25 rows
    * per side, not the fact tables. */
  def jFull(spark: SparkSession, dir: String): DataFrame = {
    val cn = cust(spark, dir).groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = supp(spark, dir).groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, cn("ck") === sn("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  val jFullSql: String =
    """SELECT coalesce(c.ck, s.sk) AS nationkey,
      |       coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier GROUP BY 1) s
      |ON c.ck = s.sk
      |ORDER BY nationkey""".stripMargin

  /** CROSS join (region × nation — both broadcastable dims). */
  def jCross(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "region").crossJoin(Tables.t(spark, dir, "nation"))
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")

  val jCrossSql: String =
    "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"

  // --------------------------------------------------- grouping sets family
  private val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** ROLLUP over (returnflag, linestatus) + grouping() markers. Partial
    * aggregation handles the rollup map-side; one shuffle total. */
  def gRollup(spark: SparkSession, dir: String): DataFrame =
    li(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(rev), 2).as("revenue"), count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("revenue"), col("n"), col("g_rf"), col("g_ls"))
      .orderBy("rf", "ls")

  val gRollupSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, count(*) AS n,
      |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
      |  CAST(grouping(l_linestatus) AS INTEGER) AS g_ls
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** CUBE over (orderstatus, orderpriority). */
  def gCube(spark: SparkSession, dir: String): DataFrame =
    ord(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  val gCubeSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Explicit GROUPING SETS — shared SQL text (identical in both dialects). */
  val gSetsSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |       round(sum(l_quantity), 2) AS qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  // ------------------------------------------------------------ set algebra
  private def buyers(spark: SparkSession, dir: String, y0: String, y1: String): DataFrame =
    ord(spark, dir)
      .filter(col("o_orderdate") >= ts(y0) && col("o_orderdate") < ts(y1))
      .select(col("o_custkey").as("custkey"))

  /** UNION ALL (bag semantics — duplicates preserved). */
  def sUnionAll(spark: SparkSession, dir: String): DataFrame =
    buyers(spark, dir, "1996-01-01", "1997-01-01")
      .union(buyers(spark, dir, "1997-01-01", "1998-01-01"))
      .orderBy("custkey")

  val sUnionAllSql: String =
    """SELECT o_custkey AS custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |UNION ALL
      |SELECT o_custkey AS custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |ORDER BY custkey""".stripMargin

  /** INTERSECT (distinct): customers buying in both years. */
  def sIntersect(spark: SparkSession, dir: String): DataFrame =
    buyers(spark, dir, "1996-01-01", "1997-01-01")
      .intersect(buyers(spark, dir, "1997-01-01", "1998-01-01"))
      .orderBy("custkey")

  val sIntersectSql: String =
    """SELECT o_custkey AS custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |INTERSECT
      |SELECT o_custkey AS custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |ORDER BY custkey""".stripMargin

  /** EXCEPT (distinct): 1996 buyers who did not buy in 1997. */
  def sExcept(spark: SparkSession, dir: String): DataFrame =
    buyers(spark, dir, "1996-01-01", "1997-01-01")
      .except(buyers(spark, dir, "1997-01-01", "1998-01-01"))
      .orderBy("custkey")

  val sExceptSql: String =
    """SELECT o_custkey AS custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |ORDER BY custkey""".stripMargin

  /** Global multi-column sort — the reference's sort_tpch benchmark shape
    * (benchmarks/src/sort_tpch.rs: end-to-end sort SQL on lineitem). Spark
    * executes it as sample → range-partition exchange → per-partition sort:
    * fully distributed, no single-task global sort (PlanAuditSpec asserts
    * the rangepartitioning exchange). */
  def srtLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), round(col("l_extendedprice"), 2).as("price"))
      .orderBy(asc("l_returnflag"), desc("l_shipdate"), asc("l_orderkey"),
        asc("l_linenumber"))

  val srtLineitemSql: String =
    """SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber,
      |       round(l_extendedprice, 2) AS price
      |FROM lineitem
      |ORDER BY l_returnflag ASC, l_shipdate DESC, l_orderkey, l_linenumber""".stripMargin

  /** sort_tpch Q3/Q11 shape (benchmarks/src/sort_tpch.rs:113-118,166-172):
    * high-cardinality VARCHAR sort key + thin payload. The reference keys
    * on l_comment (4.5M distinct); the reduced schema has no comment
    * column, so the key is derived — unique per line, so string
    * comparison (not the numeric source order) decides every position and
    * the order is total (§4). Same distributed range-sort as
    * [[srtLineitem]]; byte-wise binary collation both engines. */
  def srtVarchar(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .select(concat_ws("-", col("l_returnflag"), col("l_orderkey"),
        col("l_linenumber")).as("sort_key"), col("l_partkey"))
      .orderBy("sort_key")

  val srtVarcharSql: String =
    """SELECT concat_ws('-', l_returnflag, l_orderkey, l_linenumber) AS sort_key,
      |       l_partkey
      |FROM lineitem
      |ORDER BY sort_key""".stripMargin

  /** sort_tpch Q7/Q10 shape (benchmarks/src/sort_tpch.rs:137-150): three
    * sort keys + the WIDE payload (every other column). The scale hazard a
    * wide sort adds over a thin one is row size through the range-exchange
    * — at 100 TB the sampled range bounds keep per-partition volume even,
    * and payload width only raises the per-row shuffle cost linearly; no
    * operator materializes more than a partition. Keys include
    * (l_orderkey, l_linenumber) — the table's primary key — so the order
    * is total; money doubles ride rounded (§4). */
  def srtWide(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .select(col("l_linenumber"), col("l_suppkey"), col("l_orderkey"),
        col("l_partkey"), round(col("l_quantity"), 2).as("qty"),
        round(col("l_extendedprice"), 2).as("price"),
        round(col("l_discount"), 2).as("disc"),
        round(col("l_tax"), 2).as("tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .orderBy("l_linenumber", "l_suppkey", "l_orderkey")

  val srtWideSql: String =
    """SELECT l_linenumber, l_suppkey, l_orderkey, l_partkey,
      |       round(l_quantity, 2) AS qty, round(l_extendedprice, 2) AS price,
      |       round(l_discount, 2) AS disc, round(l_tax, 2) AS tax,
      |       l_returnflag, l_linestatus, l_shipdate
      |FROM lineitem
      |ORDER BY l_linenumber, l_suppkey, l_orderkey""".stripMargin

  /** sort_tpch --limit variant (benchmarks/src/sort_tpch.rs:73-74,228-229:
    * the runner appends `LIMIT n` to any sort query): ORDER BY + LIMIT
    * must NOT pay the global sort — Spark plans TakeOrderedAndProject
    * (per-partition bounded top-k, driver merge of ≤ k×partitions rows),
    * so at 100 TB the cost is one scan + k-sized heaps, no range exchange,
    * no full-data shuffle. PlanAuditSpec pins the TakeOrderedAndProject
    * and the absence of rangepartitioning. Tiebreak keys make the top-10
    * deterministic (§4). */
  def srtTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .select(round(col("l_extendedprice"), 2).as("price"),
        col("l_orderkey"), col("l_linenumber"))
      .orderBy(desc("price"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(10)

  val srtTopkSql: String =
    """SELECT round(l_extendedprice, 2) AS price, l_orderkey, l_linenumber
      |FROM lineitem
      |ORDER BY price DESC, l_orderkey, l_linenumber
      |LIMIT 10""".stripMargin

  /** EXCEPT ALL / INTERSECT ALL — multiset semantics (one survivor per
    * matched copy). Monthly buyer lists repeat custkeys, so the multiset
    * results genuinely differ from the distinct variants. */
  def sExceptAll(spark: SparkSession, dir: String): DataFrame =
    buyers(spark, dir, "1996-01-01", "1997-01-01")
      .exceptAll(buyers(spark, dir, "1997-01-01", "1998-01-01"))
      .orderBy("custkey")

  val sExceptAllSql: String =
    """SELECT o_custkey AS custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |EXCEPT ALL
      |SELECT o_custkey AS custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |ORDER BY custkey""".stripMargin

  def sIntersectAll(spark: SparkSession, dir: String): DataFrame =
    buyers(spark, dir, "1996-01-01", "1997-01-01")
      .intersectAll(buyers(spark, dir, "1997-01-01", "1998-01-01"))
      .orderBy("custkey")

  val sIntersectAllSql: String =
    """SELECT o_custkey AS custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |INTERSECT ALL
      |SELECT o_custkey AS custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |ORDER BY custkey""".stripMargin

  /** DISTINCT ON (reference sql/src/select.rs distinct_on; Postgres/DuckDB
    * syntax): first row per key in sort order — Spark has no DISTINCT ON,
    * and the row_number window (rn = 1) is its exact desugaring. Oracle
    * uses real DISTINCT ON. */
  def sDistinctOn(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_orderdate"), asc("o_orderkey"))
    ord(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").as("latest_date"))
      .orderBy("o_custkey")
  }

  val sDistinctOnSql: String =
    """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey,
      |  o_orderdate AS latest_date
      |FROM orders
      |ORDER BY o_custkey, o_orderdate DESC, o_orderkey""".stripMargin

  /** DISTINCT projection (hash-aggregate with no agg functions). */
  def sDistinct(spark: SparkSession, dir: String): DataFrame =
    li(spark, dir).select(col("l_returnflag"), col("l_linestatus"))
      .distinct().orderBy("l_returnflag", "l_linestatus")

  val sDistinctSql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --------------------------------------------------------------- windows
  /** Ranking family over suppliers per nation. The unique s_suppkey tiebreak
    * makes every ranking function deterministic. */
  def wRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("s_nationkey").orderBy(desc("s_acctbal"), asc("s_suppkey"))
    supp(spark, dir).select(
        col("s_nationkey"), col("s_suppkey"), round(col("s_acctbal"), 2).as("s_acctbal"),
        row_number().over(w).as("rn"), rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 4).as("prnk"),
        round(cume_dist().over(w), 4).as("cd"),
        ntile(4).over(w).as("quartile"))
      .orderBy("s_nationkey", "rn")
  }

  val wRankSql: String =
    """SELECT s_nationkey, s_suppkey, round(s_acctbal, 2) AS s_acctbal,
      |  row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
      |  round(percent_rank() OVER w, 4) AS prnk, round(cume_dist() OVER w, 4) AS cd,
      |  ntile(4) OVER w AS quartile
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)
      |ORDER BY s_nationkey, rn""".stripMargin

  /** lag/lead over per-user event time: previous/next value and gap. */
  def wLagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    ev(spark, dir).select(
        col("user_id"), col("event_id"), round(col("value"), 2).as("value"),
        round(lag("value", 1).over(w), 2).as("prev_value"),
        round(lead("value", 1).over(w), 2).as("next_value"),
        (unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w))).as("gap_us"))
      .orderBy("event_id")
  }

  val wLagLeadSql: String =
    """SELECT user_id, event_id, round(value, 2) AS value,
      |  round(lag(value, 1) OVER w, 2) AS prev_value,
      |  round(lead(value, 1) OVER w, 2) AS next_value,
      |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY event_id""".stripMargin

  /** Frame aggregates: running sum, sliding avg, first/last/nth over
    * explicit ROWS frames, per customer by order date. */
  def wFrames(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ord(spark, dir).select(
        col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total"),
        round(avg("o_totalprice").over(w.rowsBetween(-3, Window.currentRow)), 4).as("avg_4"),
        round(first("o_totalprice").over(full), 2).as("first_price"),
        round(last("o_totalprice").over(full), 2).as("last_price"),
        round(nth_value(col("o_totalprice"), 2).over(full), 2).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val wFramesSql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
      |  round(avg(o_totalprice) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS avg_4,
      |  round(first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS first_price,
      |  round(last_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price,
      |  round(nth_value(o_totalprice, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** RANGE frames (value-based, not row-count-based) — the time-series
    * "everything in the last hour" window. Reference supports ROWS/RANGE/
    * GROUPS (datafusion/expr/src/window_frame.rs:161); Spark has ROWS and
    * RANGE natively. GROUPS frames are a documented engine gap: Spark 4.1
    * has no GROUPS frame unit (SURVEY §2.3).
    *
    * Shared SQL text — interval-bounded RANGE parses identically in Spark
    * and DuckDB. Peer rows (equal ts) are all included regardless of
    * physical order, so the frame aggregates are deterministic without a
    * tiebreak in the ORDER BY. */
  val wRangeSql: String =
    """SELECT user_id, event_id,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
      |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2) AS sum_1h,
      |  count(*) OVER (PARTITION BY user_id ORDER BY ts
      |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h,
      |  count(*) OVER (PARTITION BY user_id ORDER BY ts
      |    RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING
      |              AND INTERVAL 30 MINUTE FOLLOWING) AS n_centered
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  /** j_natural — NATURAL JOIN (reference: DataFusion's planner expands
    * NATURAL to an equi-join over the shared column names; sqlparser
    * natural flag). The TPC-H schema prefixes every column, so the shared
    * key is exposed via renaming subqueries — which is exactly the
    * realistic use: NATURAL JOIN is resolved at ANALYSIS time from the
    * schemas, and the plan is the same broadcastable equi-join as an
    * explicit ON. Same text both engines. */
  val jNaturalSql: String =
    """SELECT n_name, count(*) AS n_cust,
      |       round(sum(acctbal), 2) AS total_acctbal
      |FROM (SELECT c_nationkey AS nationkey, c_acctbal AS acctbal
      |      FROM customer) c
      |NATURAL JOIN (SELECT n_nationkey AS nationkey, n_name FROM nation) n
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** j_using — JOIN ... USING (reference joins.slt:504-516, 1806, 2582:
    * DataFusion merges the USING columns into ONE output column). Distinct
    * from NATURAL JOIN (j_natural infers the key set; USING names it) and
    * the semantics trap lives on the OUTER legs: the merged key must be the
    * COALESCE of the two sides, so a right-only key still materializes in
    * the full-join output — planted here by restricting the two sides to
    * overlapping-but-different key ranges (left 5..24, right 0..9). The
    * multi-column leg pins USING (a, b) resolution. Same text both
    * engines; joins are aggregate-then-join so both sides are tiny
    * broadcastable frames regardless of fact scale. */
  val jUsingSql: String =
    """WITH c AS (SELECT c_nationkey AS k, count(*) AS n_cust
      |           FROM customer WHERE c_nationkey >= 5 GROUP BY 1),
      |     s AS (SELECT s_nationkey AS k, count(*) AS n_supp
      |           FROM supplier WHERE s_nationkey < 10 GROUP BY 1),
      |     o2 AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
      |             count(*) AS n_all FROM orders GROUP BY 1, 2),
      |     o3 AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
      |             count(*) AS n_even FROM orders
      |           WHERE o_orderkey % 2 = 0 GROUP BY 1, 2)
      |SELECT 'full' AS leg, CAST(k AS STRING) AS k1, '' AS k2,
      |       n_cust AS a, n_supp AS b
      |FROM c FULL JOIN s USING (k)
      |UNION ALL
      |SELECT 'left', CAST(k AS STRING), '', n_cust, n_supp
      |FROM c LEFT JOIN s USING (k)
      |UNION ALL
      |SELECT 'multi', st, pr, n_all, n_even
      |FROM o2 JOIN o3 USING (st, pr)
      |ORDER BY leg, k1, k2""".stripMargin

  /** srt_nulls — explicit NULLS FIRST / NULLS LAST ordering (reference
    * window_frame/sort handle null_ordering; sort.slt). This is a real
    * dialect trap: Spark's default is NULLS FIRST for ASC, DuckDB's is
    * NULLS LAST — identical queries silently disagree unless the null
    * placement is spelled out. Both rank columns ENCODE their null
    * ordering in values (the driver's compare re-sorts rows, so only
    * value-encoded orderings are actually verified); planted NULLs via a
    * deterministic CASE. */
  val srtNullsSql: String =
    """WITH t AS (SELECT o_orderkey, o_orderstatus,
      |             CASE WHEN o_custkey % 7 = 0 THEN NULL
      |                  ELSE o_totalprice END AS p
      |           FROM orders)
      |SELECT o_orderkey, o_orderstatus, round(p, 2) AS p,
      |  rank() OVER (PARTITION BY o_orderstatus
      |               ORDER BY p DESC NULLS LAST, o_orderkey) AS rnk_nl,
      |  rank() OVER (PARTITION BY o_orderstatus
      |               ORDER BY p ASC NULLS FIRST, o_orderkey) AS rnk_nf
      |FROM t
      |ORDER BY o_orderkey""".stripMargin

  /** w_named — the SQL-standard named WINDOW clause (reference: DataFusion
    * parses `WINDOW w AS (...)` via sqlparser and resolves window
    * references; window.slt): three named specs shared by several window
    * functions in one SELECT. Same text runs in Spark and DuckDB (viaSql),
    * so the clause itself is what's being verified; Catalyst merges the
    * two user_id-partitioned ordered specs into one shuffle exactly as
    * with inline windows. Integer measure for cross-engine FP determinism
    * (SURVEY §4). */
  val wNamedSql: String =
    """SELECT event_id, user_id,
      |  CAST(sum(v2) OVER w_user AS BIGINT) AS sum_by_user,
      |  rank() OVER w_ord AS rnk,
      |  round(avg(v2) OVER w_mov, 4) AS mov5
      |FROM (SELECT event_id, user_id, CAST(floor(value) AS BIGINT) AS v2
      |      FROM events) t
      |WINDOW w_user AS (PARTITION BY user_id),
      |       w_ord AS (PARTITION BY user_id ORDER BY event_id),
      |       w_mov AS (PARTITION BY user_id ORDER BY event_id
      |                 ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------- w_run_distinct
  /** Running COUNT(DISTINCT) over an ordered per-user window — "how many
    * distinct event types has this user touched so far", the
    * feature-engineering staple NO engine supports directly
    * (`count(DISTINCT) OVER (ORDER BY ...)` is rejected by Spark and
    * DuckDB alike, and the naive `collect_set` window holds every
    * already-seen value in per-row state — memory-unbounded on a hot
    * user). The scalable exact form is the FIRST-OCCURRENCE CUMSUM: flag
    * each (user, type)'s earliest row, then running-sum the flags over
    * the user's time order. One subtlety makes it ONE shuffle instead of
    * two: the obvious first-occurrence flag (`row_number() == 1` over a
    * (user, type) window) partitions by (user, type), which a user-only
    * exchange cannot satisfy — Catalyst would insert a SECOND exchange
    * for the running sum. Spelling the flag as a user-partitioned
    * type-then-time-ordered `lag` comparison keys BOTH windows on
    * user_id, so they share one exchange and differ only in sort
    * (plan-audited). The flag is NULL-SAFE on the type column: partition
    * start is detected via `lag` on the never-null event_id (not via the
    * lagged type being null), and the value comparison is `<=>` / IS
    * DISTINCT FROM — so k NULL-typed events count as ONE distinct type,
    * not k. The flagged set ("min-(ts,event_id) row of each distinct
    * value, NULL included") is invariant to where each engine sorts NULLs
    * in the type order, so Spark's NULLS FIRST vs DuckDB's NULLS LAST
    * default cannot diverge. O(1) per-row state, any cardinality; both
    * engines run the identical decomposition — hash-checked. */
  def wRunDistinct(spark: SparkSession, dir: String): DataFrame = {
    val wType = Window.partitionBy("user_id")
      .orderBy(asc("event_type"), asc("ts"), asc("event_id"))
    val wRun = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(Long.MinValue, 0)
    ev(spark, dir)
      .withColumn("first_seen",
        when(lag("event_id", 1).over(wType).isNull ||
          !(lag("event_type", 1).over(wType) <=> col("event_type")),
          1L).otherwise(0L))
      .withColumn("run_distinct_types", sum("first_seen").over(wRun))
      .select("user_id", "event_id", "event_type", "run_distinct_types")
      .orderBy("event_id")
  }

  val wRunDistinctSql: String =
    """SELECT user_id, event_id, event_type,
      |  CAST(sum(first_seen) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS run_distinct_types
      |FROM (SELECT *, CASE WHEN lag(event_id, 1) OVER w IS NULL
      |        OR lag(event_type, 1) OVER w IS DISTINCT FROM event_type
      |      THEN 1 ELSE 0 END AS first_seen
      |      FROM events
      |      WINDOW w AS (PARTITION BY user_id ORDER BY event_type, ts, event_id))
      |ORDER BY event_id""".stripMargin

  /** GROUP BY ALL + DISTINCT aggregates (reference group_by.slt:1945-1969,
    * aggregate.slt DISTINCT forms): the keys are inferred as every
    * non-aggregate select item — same text runs in both engines — and the
    * sum/avg/count DISTINCT variants plan as Spark's Expand + two-phase
    * aggregate, partial-deduplicating each partition's distinct values
    * before the shuffle (the same one-pass shape cb_multi_uniq pins).
    * Quantities are integer-valued doubles → distinct sums exact. */
  def gAll(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(DISTINCT l_quantity) AS BIGINT) AS sd,
        |  round(avg(DISTINCT l_quantity), 4) AS ad,
        |  count(DISTINCT l_linenumber) AS cd
        |FROM lineitem
        |GROUP BY ALL
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  val gAllSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(DISTINCT l_quantity) AS BIGINT) AS sd,
      |  round(avg(DISTINCT l_quantity), 4) AS ad,
      |  count(DISTINCT l_linenumber) AS cd
      |FROM lineitem
      |GROUP BY ALL
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------- unnest / table functions
  /** UNNEST with ordinality (posexplode) of the embedding array. Generates
    * rows per element without any shuffle — pure narrow transform. */
  def uUnnest(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .orderBy("vec_id", "pos")

  val uUnnestSql: String =
    """SELECT vec_id, CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
      |       unnest(embedding) AS val
      |FROM embeddings
      |ORDER BY vec_id, pos""".stripMargin

  /** UNNEST of STRUCT values into TOP-LEVEL columns (reference:
    * /root/reference/datafusion/sqllogictest/test_files/unnest.slt:36-55 —
    * structs and recursive struct/list combinations flatten to columns).
    * Spark's `inline` is that operator: an array of structs becomes rows
    * whose struct fields are top-level columns — here each customer expands
    * to typed (kind, v) measure rows, the flatten step of reading nested
    * lakehouse parquet. Narrow generate fused with the scan, no shuffle. */
  def uUnnestStruct(spark: SparkSession, dir: String): DataFrame =
    cust(spark, dir).select(col("c_custkey"), inline(array(
      struct(lit("acct").as("kind"), round(col("c_acctbal"), 2).as("v")),
      struct(lit("nation").as("kind"), col("c_nationkey").cast("double").as("v")))))
      .orderBy("c_custkey", "kind")

  val uUnnestStructSql: String =
    """SELECT c_custkey, u.kind AS kind, u.v AS v
      |FROM (SELECT c_custkey, unnest([
      |        {'kind': 'acct',   'v': round(c_acctbal, 2)},
      |        {'kind': 'nation', 'v': CAST(c_nationkey AS DOUBLE)}]) AS u
      |      FROM customer) t
      |ORDER BY c_custkey, kind""".stripMargin

  /** UNNEST of a MAP into (key, value) rows (unnest.slt's map cases). The
    * events `props` JSON parses to map<string,bigint> via from_json — a
    * schema projection Catalyst codegens, not a UDF — merged with typed
    * event measures through map_concat; explode emits one row per entry.
    * Narrow generate, no shuffle. */
  def uUnnestMap(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir).select(col("event_id"), explode(map_concat(
      from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.LongType)),
      map(lit("uid"), col("user_id"),
        lit("val"), floor(col("value")).cast("long")))))
      .orderBy("event_id", "key")

  val uUnnestMapSql: String =
    """WITH e AS (SELECT event_id, user_id, value AS ev_val, props FROM events)
      |SELECT event_id, key, value FROM (
      |  SELECT event_id, 'k' AS key,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS value FROM e
      |  UNION ALL SELECT event_id, 'uid', user_id FROM e
      |  UNION ALL SELECT event_id, 'val', CAST(floor(ev_val) AS BIGINT) FROM e) u
      |ORDER BY event_id, key""".stripMargin

  /** RECURSIVE UNNEST of nested lists (unnest.slt's list-of-list cases,
    * `recursive := true`): a constructed array<array<float>> flattens
    * through two position-tracked generate levels — the nested-repeated
    * parquet shape (e.g. per-document token lists per section) a lakehouse
    * flatten hits constantly. Both explodes are narrow generates fused in
    * one codegen stage, no shuffle. */
  def uUnnestNested(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(array(
        slice(col("embedding"), 1, 2), slice(col("embedding"), 3, 2)))
        .as(Seq("o_pos", "inner")))
      .select(col("vec_id"), col("o_pos"),
        posexplode(col("inner")).as(Seq("i_pos", "val")))
      .orderBy("vec_id", "o_pos", "i_pos")

  val uUnnestNestedSql: String =
    """WITH o AS (
      |  SELECT vec_id,
      |    CAST(unnest(range(2)) AS INTEGER) AS o_pos,
      |    unnest([embedding[1:2], embedding[3:4]]) AS inner_l
      |  FROM embeddings)
      |SELECT vec_id, o_pos,
      |       CAST(unnest(range(len(inner_l))) AS INTEGER) AS i_pos,
      |       unnest(inner_l) AS val
      |FROM o ORDER BY vec_id, o_pos, i_pos""".stripMargin

  /** OUTER unnest (reference unnest.slt PRESERVE-rows semantics /
    * LEFT JOIN LATERAL unnest): `explode_outer` keeps the parent row with a
    * NULL element when its array is empty OR NULL — the inner explode
    * silently drops both, which loses rows in flattening pipelines (a doc
    * with no tags vanishes from a per-tag rollup and its absence is
    * invisible). Same narrow Generate node, outer flag only. The oracle
    * reconstructs outer semantics as inner-unnest UNION ALL the
    * empty/NULL parents. */
  def uUnnestOuter(spark: SparkSession, dir: String): DataFrame = {
    val arr = when(col("n_regionkey") === 2, array().cast("array<int>"))
      .when(col("n_nationkey") === 0, lit(null).cast("array<int>"))
      .otherwise(array(col("n_regionkey"), col("n_regionkey") * 2))
    Tables.t(spark, dir, "nation")
      .select(col("n_nationkey"), explode_outer(arr).as("val"))
      .orderBy("n_nationkey", "val")
  }

  val uUnnestOuterSql: String =
    """WITH t AS (
      |  SELECT n_nationkey,
      |    CASE WHEN n_regionkey = 2 THEN CAST([] AS INTEGER[])
      |         WHEN n_nationkey = 0 THEN CAST(NULL AS INTEGER[])
      |         ELSE [n_regionkey, n_regionkey * 2] END AS arr
      |  FROM nation)
      |SELECT n_nationkey, CAST(unnest(arr) AS INTEGER) AS val
      |FROM t WHERE arr IS NOT NULL AND len(arr) > 0
      |UNION ALL
      |SELECT n_nationkey, CAST(NULL AS INTEGER) AS val
      |FROM t WHERE arr IS NULL OR len(arr) = 0
      |ORDER BY n_nationkey, val""".stripMargin

  /** generate_series table function = sequence() + explode. */
  def tGenerateSeries(spark: SparkSession, dir: String): DataFrame = {
    val _ = dir
    spark.range(0, 1).select(explode(sequence(lit(1L), lit(1000L), lit(7L))).as("n"))
      .orderBy("n")
  }

  val tGenerateSeriesSql: String =
    "SELECT CAST(n AS BIGINT) AS n FROM generate_series(1, 1000, 7) t(n) ORDER BY n"

  /** Timestamp-typed series (reference generate_series supports timestamp
    * ranges): sequence() with an interval step. */
  def tSeriesTs(spark: SparkSession, dir: String): DataFrame = {
    val _ = dir
    spark.range(0, 1).select(explode(sequence(
      lit("1995-01-01 00:00:00").cast("timestamp"),
      lit("1995-03-01 00:00:00").cast("timestamp"),
      expr("INTERVAL 36 HOURS"))).as("ts"))
      .orderBy("ts")
  }

  val tSeriesTsSql: String =
    """SELECT unnest(generate_series(TIMESTAMP '1995-01-01 00:00:00',
      |  TIMESTAMP '1995-03-01 00:00:00', INTERVAL 36 HOUR)) AS ts
      |ORDER BY ts""".stripMargin

  // ------------------------------------------------------------- subqueries
  /** Correlated + uncorrelated scalar subqueries: customers above BOTH their
    * nation's average and half the global average balance. Spark-first form:
    * the correlated subquery is the broadcast-joined per-nation aggregate
    * (exactly Catalyst's decorrelation), the global average a 1-row cross. */
  def subScalar(spark: SparkSession, dir: String): DataFrame = {
    val c = cust(spark, dir)
    val natAvg = c.groupBy(col("c_nationkey").as("nk"))
      .agg(avg("c_acctbal").as("nat_avg"))
    val globalAvg = c.agg(avg("c_acctbal").as("glob_avg"))
    c.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
      .crossJoin(broadcast(globalAvg))
      .filter(col("c_acctbal") > col("nat_avg") && col("c_acctbal") > col("glob_avg") * 0.5)
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("c_acctbal"))
      .orderBy("c_custkey")
  }

  val subScalarSql: String =
    """SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
      |                   WHERE c2.c_nationkey = c.c_nationkey)
      |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 0.5
      |ORDER BY c_custkey""".stripMargin

  /** Predicate subqueries — EXISTS / NOT EXISTS / IN / NOT IN (reference
    * subquery.slt; sub_scalar covers the scalar forms): the four
    * decorrelation shapes Catalyst rewrites to semi/anti joins — EXISTS →
    * left-semi on the correlation key, NOT EXISTS → left-anti, IN →
    * semi on the value column, NOT IN → null-aware anti. Same SQL text in
    * both engines; at scale each becomes one key-only shuffle (j_semi /
    * j_anti are the DataFrame-API faces of the same plans). */
  def subExistsIn(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(subExistsInSql)
  }

  val subExistsInSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_totalprice < 10000)
      |  AND c_nationkey IN (SELECT n_nationkey FROM nation
      |                      WHERE n_regionkey <> 2)
      |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
      |                        WHERE o_orderstatus = 'F'
      |                          AND o_totalprice < 30000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------- event-time analytics
  /** Tumbling 1-hour windows per event type (date_trunc binning). */
  def eTumbling(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")

  val eTumblingSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |       count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  // ------------------------------------------------------------- e_hopping
  /** Hopping (sliding) event-time windows via Spark's native `window(ts,
    * size, slide)` — each event lands in size/slide = 4 overlapping
    * 2-hour windows that hop every 30 minutes (rolling-rate dashboards,
    * trailing-window feature extraction). The generator is a NARROW
    * 4-way row expansion fused into the scan (no join against a window
    * table), then one partial-aggregated shuffle on (window, type) — the
    * same plan Structured Streaming shares for its sliding aggregates, so
    * this is also the batch oracle for st_sliding. Window starts are
    * epoch-aligned slide multiples; the DuckDB oracle reconstructs them
    * arithmetically (floor ts to the 30-min grid, step back k slides,
    * k = 0..3). */
  def eHopping(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  val eHoppingSql: String =
    """SELECT make_timestamp((epoch_us(ts) // 1800000000 - k.k) * 1800000000) AS w_start,
      |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events CROSS JOIN range(4) AS k(k)
      |GROUP BY 1, 2
      |ORDER BY w_start, event_type""".stripMargin

  /** Sessionization (gaps-and-islands): a new session starts after a >30 min
    * silence. One shuffle on user_id; two linear window passes; then a
    * partial-aggregatable groupBy. The canonical 100 TB formulation. */
  def eSession(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val gapUs = unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w))
    val marked = ev(spark, dir).withColumn("new_sess",
      when(gapUs.isNull || gapUs > 1800L * 1000000L, 1L).otherwise(0L))
    marked
      .withColumn("session_id", sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"),
        round(sum("value"), 2).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  val eSessionSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       min(ts) AS session_start, max(ts) AS session_end,
      |       round(sum(value), 2) AS session_value
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------- e_session_fn
  /** Sessionization via Spark's dedicated `session_window` operator (the
    * built-in dynamic-gap session aggregate; Structured Streaming shares
    * this exact operator with state-store-backed merging). Same semantics as
    * the gaps-and-islands e_session — session_window.start is the first
    * event's ts — so the oracle is the e_session oracle projected to the
    * start-keyed columns (session_window.end is last-event + gap, a
    * different convention from e_session's last-event end, so `end` is
    * deliberately not emitted). One shuffle on user_id, sessions merged
    * within partitions. */
  def eSessionFn(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  val eSessionFnSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start,
      |       count(*) AS n_events, round(sum(value), 2) AS session_value
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin

  // -------------------------------------------------------------- sql_params
  /** Parameterized SQL (the reference's PREPARE/placeholder surface,
    * sql/src/planner.rs infer_types for $1-style params; Spark 4 spells it
    * `spark.sql(text, args)` with named parameters). The parameter values
    * are bound by the engine, not string-interpolated — the oracle inlines
    * the same constants.
    *
    * PREPARE/EXECUTE lifecycle note: the reference additionally keeps a
    * named server-side statement object (sql/src/statement.rs `Prepare`,
    * executed later by name). Spark has no PREPARE statement — its
    * analogue is reusing the same SQL text with fresh `args`, which
    * re-binds and re-plans per call (plan caching happens in Catalyst's
    * plan cache, not a user-visible statement handle). The *binding*
    * semantics — typed engine-side substitution, no injection — are what
    * this query covers; the statement-object lifecycle is a client/session
    * feature Spark intentionally lacks. */
  def sqlParams(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |WHERE o_totalprice > :minPrice AND o_orderdate >= :fromDate
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      Map("minPrice" -> 150000.0,
        "fromDate" -> java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
  }

  val sqlParamsSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |WHERE o_totalprice > 150000.0
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------- sql_prepare
  /** PREPARE/EXECUTE named-statement lifecycle (reference
    * sqllogictest/test_files/prepare.slt; sql/src/statement.rs) via the
    * [[graft.Graft.prepare]]/executePrepared session registry — the
    * named-handle layer sql_params deliberately stopped short of (its
    * Scaladoc documents the gap this entry closes). The DuckDB oracle runs
    * a REAL `PREPARE …; EXECUTE name(args)`, so the whole lifecycle —
    * registration, engine-side typed binding, execution by name — is
    * hash-verified against an engine that implements the statement object
    * natively. Re-prepare replacement, multi-execute reuse, DEALLOCATE,
    * and the missing-statement/unbound-parameter error surfaces are
    * pinned in ErrorSurfaceSpec. */
  def sqlPrepare(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    graft.Graft.prepare(spark, "graft_rev_by_priority",
      """SELECT o_orderpriority, count(*) AS n,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders WHERE o_totalprice > :minPrice
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    graft.Graft.executePrepared(spark, "graft_rev_by_priority",
      Map("minPrice" -> 150000.0))
  }

  val sqlPrepareSql: String =
    """PREPARE graft_rev_by_priority AS
      |SELECT o_orderpriority, count(*) AS n,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM orders WHERE o_totalprice > $1
      |GROUP BY o_orderpriority ORDER BY o_orderpriority;
      |EXECUTE graft_rev_by_priority(150000.0)""".stripMargin

  // --------------------------------------------------------- s_union_by_name
  /** UNION BY NAME — position-independent set union (DataFusion
    * union_by_name / DuckDB UNION ALL BY NAME; Spark spells it
    * `unionByName`, here with allowMissingColumns so each leg's missing
    * column nulls in). */
  def sUnionByName(spark: SparkSession, dir: String): DataFrame = {
    val a = ord(spark, dir).filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("pri"),
        round(col("o_totalprice"), 2).as("price"))
    val b = ord(spark, dir).filter(col("o_orderkey") % 100 === 1)
      .select(round(col("o_totalprice"), 2).as("price"),
        col("o_orderkey").as("k")) // different order, no `pri`
    a.unionByName(b, allowMissingColumns = true)
      .orderBy("k")
  }

  val sUnionByNameSql: String =
    """SELECT k, pri, price FROM (
      |  SELECT o_orderkey AS k, o_orderpriority AS pri,
      |         round(o_totalprice, 2) AS price
      |  FROM orders WHERE o_orderkey % 100 = 0
      |  UNION ALL BY NAME
      |  SELECT round(o_totalprice, 2) AS price, o_orderkey AS k
      |  FROM orders WHERE o_orderkey % 100 = 1)
      |ORDER BY k""".stripMargin

  // --------------------------------------------------------------- w_groups
  /** GROUPS window frames, EMULATED (reference window_frame.rs:229 supports
    * ROWS/RANGE/GROUPS; Spark 4.1 has no GROUPS frame unit — round-1 gap,
    * now closed by desugaring): a GROUPS frame over peer groups equals a
    * ROWS frame over the per-peer-group partial aggregates, joined back to
    * the rows. Plan: one partial-aggregated groupBy (peer sums), a ROWS
    * window over the (small) distinct-key set, and an equi-join back — each
    * stage shuffles on (user_id[, minute]) only. The bundled DuckDB also
    * lacks GROUPS mode ("not implemented yet"), so the oracle is an
    * INDEPENDENT formulation — a dense_rank self-join over peer-group sums
    * (|rank_a − rank_b| ≤ 1) — not a copy of the Spark desugaring; matching
    * hashes check the semantics, not the construction.
    *
    * This is the general desugaring: GROUPS BETWEEN nPrec PRECEDING AND
    * nFoll FOLLOWING over any (partition, order) pair maps to a
    * ROWS(−nPrec, +nFoll) frame on the per-peer-group partials. */
  def wGroupsFrame(spark: SparkSession, dir: String,
      nPrec: Int, nFoll: Int): DataFrame = {
    val e = ev(spark, dir).withColumn("m", date_trunc("minute", col("ts")))
    val peers = e.groupBy("user_id", "m").agg(sum("value").as("s"))
    val w = Window.partitionBy("user_id").orderBy("m").rowsBetween(-nPrec, nFoll)
    val framed = peers.withColumn("gsum", sum("s").over(w))
      .select(col("user_id"), col("m"), round(col("gsum"), 2).as("gsum"))
    e.select(col("event_id"), col("user_id"), col("m"))
      .join(framed, Seq("user_id", "m"))
      .select(col("event_id"), col("user_id"), col("m"), col("gsum"))
      .orderBy("event_id")
  }

  def wGroups(spark: SparkSession, dir: String): DataFrame =
    wGroupsFrame(spark, dir, 1, 1)

  /** Asymmetric GROUPS frame (2 PRECEDING .. CURRENT GROUP) — exercises the
    * desugaring off the symmetric ±1 special case; the running 3-peer-group
    * sum shape of a trailing-window metric. */
  def wGroupsAsym(spark: SparkSession, dir: String): DataFrame =
    wGroupsFrame(spark, dir, 2, 0)

  private def wGroupsSqlFor(lo: Int, hi: Int): String =
    s"""WITH e AS (SELECT event_id, user_id, date_trunc('minute', ts) AS m, value
       |           FROM events),
       |g AS (SELECT user_id, m, sum(value) AS s FROM e GROUP BY user_id, m),
       |r AS (SELECT user_id, m, s,
       |        dense_rank() OVER (PARTITION BY user_id ORDER BY m) AS dr FROM g),
       |f AS (SELECT a.user_id, a.m, round(sum(b.s), 2) AS gsum
       |      FROM r a JOIN r b ON a.user_id = b.user_id
       |        AND b.dr - a.dr BETWEEN ${-lo} AND $hi
       |      GROUP BY a.user_id, a.m)
       |SELECT event_id, e.user_id, e.m, gsum
       |FROM e JOIN f ON e.user_id = f.user_id AND e.m = f.m
       |ORDER BY event_id""".stripMargin

  val wGroupsSql: String = wGroupsSqlFor(1, 1)
  val wGroupsAsymSql: String = wGroupsSqlFor(2, 0)

  // -------------------------------------------------------------- j_lateral
  /** LATERAL join — the correlated table-subquery join (reference: DataFusion
    * plans correlated subqueries via its decorrelation pass; Spark 4 has
    * first-class LATERAL). Top-2 orders per nation's customers: the lateral
    * subquery is correlated, ordered, and limited — the shape that forces
    * real decorrelation (Spark rewrites it to a ranked window join, which is
    * exactly the scale-safe plan). DuckDB runs the same SQL text. */
  val jLateralSql: String =
    """SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------- w_ignore_nulls
  /** IGNORE NULLS window functions (reference window_frame + built-in window
    * exprs support ignore-nulls): last-observation-carried-forward gap fill
    * — the canonical sensor/time-series repair. NULLs are planted
    * deterministically (event_id % 3), then filled with the most recent
    * non-null reading per user; first_value IGNORE NULLS anchors each row to
    * its user's first real reading. */
  def wIgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ev(spark, dir)
      .withColumn("reading",
        when(col("event_id") % 3 === 0, lit(null)).otherwise(round(col("value"), 2)))
      .select(col("user_id"), col("event_id"), col("ts"), col("reading"),
        last("reading", ignoreNulls = true).over(w).as("ffill"),
        first("reading", ignoreNulls = true).over(wAll).as("first_reading"))
      .orderBy("user_id", "event_id")
  }

  val wIgnoreNullsSql: String =
    """WITH r AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE round(value, 2) END AS reading
      |  FROM events)
      |SELECT user_id, event_id, ts, reading,
      |  last_value(reading IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
      |  first_value(reading IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_reading
      |FROM r ORDER BY user_id, event_id""".stripMargin

  /** As-of join — for each event, the most recent order of the same
    * customer at-or-before the event time. Spark has no ASOF JOIN operator;
    * the Spark-first formulation is the classic tagged-union + last-non-null
    * window: one sort per key partition, O(n log n), never the range
    * cross-join blowup (a naive `e.ts >= o.ts` theta-join is O(n·m) per
    * key). DuckDB HAS a dedicated ASOF operator, so the oracle exercises the
    * real thing against our plan — semantics hash-checked, not asserted.
    * Order side is pre-deduped to one row per (customer, date) so the match
    * is well-defined under ASOF's tie rules on both engines. */
  def jAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
    val o = Tables.t(spark, dir, "orders")
      .select(col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").as("ts"), col("o_orderkey"))
      .groupBy("user_id", "ts")
      .agg(max("o_orderkey").as("okey"))
    // tag=0 sorts orders before events at equal ts: ASOF `>=` matches them
    val tagged = o
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        col("okey"), lit(null).cast("long").as("event_id"))
      .unionByName(ev.select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast("long").as("okey"), col("event_id")))
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("matched", last("okey", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"),
        coalesce(col("matched"), lit(-1L)).as("okey"))
      .orderBy("event_id")
  }

  val jAsofSql: String =
    """WITH o AS (
      |  SELECT o_custkey AS user_id, o_orderdate AS ots,
      |         max(o_orderkey) AS okey
      |  FROM orders GROUP BY o_custkey, o_orderdate)
      |SELECT e.event_id, e.user_id, coalesce(o.okey, -1) AS okey
      |FROM events e ASOF LEFT JOIN o
      |  ON e.user_id = o.user_id AND e.ts >= o.ots
      |ORDER BY e.event_id""".stripMargin

  // --------------------------------------------------------- VALUES and CTEs
  /** Inline VALUES relation (LocalRelation — no scan at all). */
  def valuesInline(spark: SparkSession, dir: String): DataFrame = {
    val _ = dir
    import spark.implicits._
    Seq((1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta"))
      .toDF("id", "name").orderBy("id")
  }

  val valuesInlineSql: String =
    "SELECT * FROM (VALUES (1, 'alpha'), (2, 'beta'), (3, 'gamma'), (4, 'delta')) AS t(id, name) ORDER BY id"

  /** Chained CTEs — shared SQL text (identical in both dialects). */
  val cteBasicSql: String =
    """WITH cust_rev AS (
      |  SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY o_custkey),
      |banded AS (
      |  SELECT o_custkey, rev,
      |         CASE WHEN rev > 400000 THEN 'high'
      |              WHEN rev > 150000 THEN 'mid' ELSE 'low' END AS band
      |  FROM cust_rev)
      |SELECT band, count(*) AS n_cust, round(avg(rev), 2) AS avg_rev,
      |       round(sum(rev), 2) AS total_rev
      |FROM banded
      |GROUP BY band
      |ORDER BY band""".stripMargin

  /** QUALIFY-shaped query (reference: datafusion/sql/src/select.rs parses
    * QUALIFY): top-2 orders per customer. Spark 4.1 has no QUALIFY clause,
    * and window-then-filter is exactly what QUALIFY desugars to — the
    * DataFrame form IS the desugared plan; the DuckDB oracle uses the real
    * QUALIFY syntax, so the semantic equivalence is hash-checked. */
  def wQualify(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    ord(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  val wQualifySql: String =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
      |       row_number() OVER (PARTITION BY o_custkey
      |                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |FROM orders
      |QUALIFY rn <= 2
      |ORDER BY o_custkey, rn""".stripMargin

  /** WITH RECURSIVE (reference: datafusion/sql/src/cte.rs:50
    * `recursive_cte`). Spark 4.x executes recursive CTEs natively
    * (UnionLoop); the same text runs in DuckDB. Integer series + running
    * product — exercises both the recursive self-reference and an
    * accumulator carried across iterations. */
  val cteRecursiveSql: String =
    """WITH RECURSIVE seq(n, fib_a, fib_b) AS (
      |  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)
      |  UNION ALL
      |  SELECT n + 1, fib_b, fib_a + fib_b FROM seq WHERE n < 40
      |)
      |SELECT n, fib_a AS fib, n * n AS sq
      |FROM seq
      |ORDER BY n""".stripMargin

  // ------------------------------------------------------------- EXPLAIN
  /** EXPLAIN as a query (DataFusion exposes EXPLAIN / EXPLAIN ANALYZE in
    * SQL; Spark's SQL surface does the same). Rows-only: plan text is
    * engine-specific by nature. The plan must mention the parquet scan and
    * the pushed filter — RelationalSpec asserts both. */
  def explainPlan(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """EXPLAIN FORMATTED
        |SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin)
  }

  /** EXPLAIN ANALYZE (reference: datafusion/physical-plan/src/analyze.rs:42
    * AnalyzeExec — run the query, report per-operator runtime metrics). Spark
    * analogue: materialize, then walk the executed plan's SQLMetrics. Emits
    * one row per (operator, metric) with the measured value — rows-only by
    * nature (timings are nondeterministic); RelationalSpec asserts the scan
    * and aggregate operators report positive numOutputRows. */
  def explainAnalyze(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val df = Tables.t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"))
    // execute THIS queryExecution (a sink write would plan a separate
    // execution and leave these metric objects untouched); the result is a
    // 3-row aggregate so materializing on the driver is not a hot path
    df.collect()
    val plan = df.queryExecution.executedPlan
    def collectMetrics(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[(String, String, Long)] =
      p.metrics.toSeq.map { case (name, m) =>
        (p.nodeName, name, m.value)
      } ++ p.children.flatMap(collectMetrics) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          collectMetrics(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          collectMetrics(q.plan)
        case _ => Seq.empty
      })
    collectMetrics(plan).toDF("operator", "metric", "value")
      .orderBy("operator", "metric", "value")
  }

  /** Catalog DDL surface (reference: CREATE EXTERNAL TABLE + catalog in
    * datafusion/sql/src/statement.rs, datafusion/catalog/): CTAS into the
    * session catalog (`CREATE TABLE ... USING parquet`), then query the
    * managed table back. The oracle reads the source table directly, so the
    * whole create→catalog-resolve→scan round trip is hash-checked. DESCRIBE
    * TABLE / SHOW TABLES are spec-asserted (RelationalSpec). */
  def ddlTable(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    dropManaged(spark, "graft_nation")
    spark.sql("CREATE TABLE graft_nation USING PARQUET AS SELECT * FROM nation")
    spark.sql(
      """SELECT n_regionkey, count(*) AS n_nations,
        |       min(n_name) AS first_name
        |FROM graft_nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
  }

  val ddlTableSql: String =
    """SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** ddl_external — external-location table registration (reference
    * create_external_table.slt: `CREATE EXTERNAL TABLE ... STORED AS
    * PARQUET LOCATION` is DataFusion's PRIMARY table path; Spark spells it
    * `CREATE TABLE ... USING parquet LOCATION`). Registration writes no
    * data — the schema comes from the parquet footers and the catalog
    * entry is UNMANAGED, so DROP removes only metadata and the files
    * survive (RelationalSpec pins tableType=EXTERNAL and post-DROP file
    * survival). At 100 TB this is the zero-copy on-boarding path: a
    * catalog table over data in place, eligible for ANALYZE/CBO, without
    * an ingest rewrite. */
  def ddlExternal(spark: SparkSession, dir: String): DataFrame = {
    spark.sql("DROP TABLE IF EXISTS graft_supplier_ext")
    spark.sql(
      s"CREATE TABLE graft_supplier_ext USING PARQUET LOCATION '$dir/supplier.parquet'")
    spark.sql(
      """SELECT s_nationkey, count(*) AS n_supp,
        |       round(sum(s_acctbal), 2) AS total_bal
        |FROM graft_supplier_ext
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
  }

  val ddlExternalSql: String =
    """SELECT s_nationkey, count(*) AS n_supp,
      |       round(sum(s_acctbal), 2) AS total_bal
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** Clear a stale managed-table location left by a previous JVM (the
    * in-memory catalog forgets tables across sessions but their files
    * remain, and CTAS refuses to overwrite an existing location). */
  private[graft] def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new java.io.File(
      if (wh.getScheme == null) wh.getPath else new java.io.File(wh).getPath,
      table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
  }

  /** Bucketed co-located join — THE 100 TB join pattern (SURVEY §5): both
    * sides pre-bucketed on the join key at write time, so the join needs no
    * shuffle at all at read time, at any scale. The `merge` hint pins
    * sort-merge so the plan assertion (PlanAuditSpec: zero Exchange on
    * either join input) is deterministic rather than depending on the
    * broadcast threshold. Oracle = the same join over the raw tables. */
  def ddlBucketed(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    dropManaged(spark, "graft_orders_b")
    dropManaged(spark, "graft_customer_b")
    ord(spark, dir).write.format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_orders_b")
    cust(spark, dir).write.format("parquet")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_customer_b")
    spark.table("graft_orders_b").hint("merge")
      .join(spark.table("graft_customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("c_nationkey")
  }

  val ddlBucketedSql: String =
    """SELECT c_nationkey, count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** CREATE VIEW + query-through-view (reference statement.rs handles
    * CREATE VIEW): the view body carries a filter + projection; resolution,
    * inlining and pushdown happen through the catalog object. */
  def ddlView(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW graft_big_orders AS
                |SELECT o_custkey, o_totalprice FROM orders
                |WHERE o_totalprice > 200000""".stripMargin)
    spark.sql("""SELECT o_custkey, count(*) AS n,
                |       round(sum(o_totalprice), 2) AS total
                |FROM graft_big_orders
                |GROUP BY o_custkey HAVING count(*) >= 2
                |ORDER BY o_custkey""".stripMargin)
  }

  val ddlViewSql: String =
    """SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM (SELECT o_custkey, o_totalprice FROM orders
      |      WHERE o_totalprice > 200000)
      |GROUP BY o_custkey HAVING count(*) >= 2
      |ORDER BY o_custkey""".stripMargin

  /** SQL-defined function DDL (reference:
    * /root/reference/datafusion/sqllogictest/test_files/create_function.slt):
    * `CREATE FUNCTION ... RETURNS ... RETURN expr` registers a catalog
    * function whose body is a SQL expression; calls resolve through the
    * catalog and INLINE into the calling plan at analysis time — inside the
    * grouped aggregate below the function body fuses into the partial-agg
    * projection exactly as if written in place, so the UDF costs nothing at
    * 100 TB (no interpreted call boundary). Catalog resolution is
    * spec-asserted via SHOW USER FUNCTIONS (RelationalSpec). */
  def ddlFunction(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(p DOUBLE, d DOUBLE)
        |RETURNS DOUBLE RETURN p * (1.0 - d)""".stripMargin)
    spark.sql(
      """SELECT l_returnflag,
        |  round(sum(graft_disc_price(l_extendedprice, l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val ddlFunctionSql: String =
    """SELECT l_returnflag,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** INSERT INTO a managed catalog table (reference statement.rs
    * SqlToRel::insert_to_plan): CTAS the base, INSERT an additional derived
    * batch, query the union back through the catalog. */
  def ddlInsert(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    dropManaged(spark, "graft_region_copy")
    spark.sql(
      "CREATE TABLE graft_region_copy USING PARQUET AS SELECT * FROM region")
    spark.sql(
      """INSERT INTO graft_region_copy
        |SELECT r_regionkey + 100, upper(r_name) FROM region""".stripMargin)
    spark.sql(
      """SELECT r_regionkey, r_name FROM graft_region_copy
        |ORDER BY r_regionkey""".stripMargin)
  }

  val ddlInsertSql: String =
    """SELECT r_regionkey, r_name FROM (
      |  SELECT r_regionkey, r_name FROM region
      |  UNION ALL
      |  SELECT r_regionkey + 100, upper(r_name) FROM region)
      |ORDER BY r_regionkey""".stripMargin

  // --------------------------------------------------------- s_limit_offset
  /** LIMIT/OFFSET pagination (reference: logical-plan Limit { skip, fetch },
    * sql SELECT ... LIMIT n OFFSET m). Deterministic page: ties broken by
    * key. Scale shape: Spark plans a global TakeOrdered-style limit — only
    * offset+limit rows ever reach the driver-side final stage, the sort
    * itself is partial per partition; OFFSET deep paging (offset ≫ limit)
    * is an anti-pattern at 100 TB regardless of engine (keyset pagination
    * is the scale path) but the operator semantics are covered here. */
  def sLimitOffset(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "orders")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .offset(100).limit(20)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
        col("o_orderpriority"))

  val sLimitOffsetSql: String =
    """SELECT o_orderkey, round(o_totalprice, 2) AS price, o_orderpriority
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20 OFFSET 100""".stripMargin

  // --------------------------------------------------------- ddl_info_schema
  /** Catalog introspection — information_schema.tables/columns parity
    * (reference: datafusion/catalog/src/information_schema.rs builds the
    * same virtual tables from catalog metadata). One row per column of
    * every registered table: (table_name, column_name, ordinal_position,
    * data_type, is_nullable), the information_schema.columns shape.
    *
    * Catalog metadata lives on the driver in every engine (DataFusion's
    * information_schema provider iterates its in-memory catalog the same
    * way) — the listColumns materialization here is a few hundred rows of
    * schema, not data, so this is NOT a driver-side data collect. Rows-only
    * gate: DuckDB's information_schema types don't map 1:1; RelationalSpec
    * asserts the engine's own tables and key columns appear. */
  def ddlInfoSchema(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    import spark.implicits._
    val rows = Tables.all.sorted.flatMap { tn =>
      spark.catalog.listColumns(tn).collect().zipWithIndex.map { case (c, i) =>
        (tn, c.name, i + 1, c.dataType, c.nullable)
      }
    }
    rows.toDF("table_name", "column_name", "ordinal_position", "data_type",
        "is_nullable")
      .orderBy("table_name", "ordinal_position")
  }

  // ------------------------------------------------------------ ddl_describe
  /** DESCRIBE TABLE — the user-facing spelling of column introspection
    * (reference sqllogictest/test_files/describe.slt). Unlike
    * ddl_info_schema (rows-only: the FULL type surface doesn't map 1:1
    * across engines), this one is HASH-CHECKED: over region + lineitem the
    * type alphabet is exactly {bigint, int, double, string, timestamp-ish},
    * which the oracle maps from DuckDB's information_schema spellings with
    * one CASE. Timestamp flavor is GENERATION-DEPENDENT (the parquet
    * writer decides ntz-ness — the Tables.normalizeTs lesson), so both
    * sides collapse `timestamp`/`timestamp_ntz`/`timestamp_ltz` to the
    * one label `timestamp`: the hash gate then survives an instant-typed
    * regeneration instead of spuriously failing on the flavor spelling
    * (ADVICE r10 — the previous oracle hardcoded 'timestamp_ntz'). */
  def ddlDescribe(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    val tsNorm = when(col("data_type").startsWith("timestamp"),
      lit("timestamp")).otherwise(col("data_type")).as("data_type")
    spark.sql("DESCRIBE TABLE region")
      .select(lit("region").as("table_name"), col("col_name"), tsNorm)
      .unionAll(spark.sql("DESCRIBE TABLE lineitem")
        .select(lit("lineitem").as("table_name"), col("col_name"), tsNorm))
      .orderBy("table_name", "col_name")
  }

  val ddlDescribeSql: String =
    """SELECT table_name, column_name AS col_name,
      |  CASE data_type WHEN 'BIGINT' THEN 'bigint'
      |                 WHEN 'INTEGER' THEN 'int'
      |                 WHEN 'DOUBLE' THEN 'double'
      |                 WHEN 'VARCHAR' THEN 'string'
      |                 WHEN 'TIMESTAMP' THEN 'timestamp'
      |  END AS data_type
      |FROM information_schema.columns
      |WHERE table_name IN ('region', 'lineitem')
      |ORDER BY table_name, col_name""".stripMargin

  // ------------------------------------------------------------- g_pivot
  /** PIVOT: revenue by order-year × priority class via the dedicated
    * `RelationalGroupedDataset.pivot` operator (explicit value list — the
    * scale-safe form: no driver-side distinct-value scan; the plan is a
    * single hash aggregate with one output column per pivoted value, never
    * a shuffle per value). Reference: DataFusion expresses this shape as
    * CASE-sum aggregates (benchmarks/queries/q12-style pivots); the oracle
    * is exactly that desugaring. */
  def gPivot(spark: SparkSession, dir: String): DataFrame =
    ord(spark, dir)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(round(sum("o_totalprice"), 2))
      .select(col("yr"), col("`1-URGENT`").as("p1_urgent"),
        col("`2-HIGH`").as("p2_high"), col("`3-MEDIUM`").as("p3_medium"),
        col("`4-NOT SPECIFIED`").as("p4_notspec"), col("`5-LOW`").as("p5_low"))
      .orderBy("yr")

  val gPivotSql: String =
    """SELECT year(o_orderdate) AS yr,
      |  round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS p1_urgent,
      |  round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2) AS p2_high,
      |  round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2) AS p3_medium,
      |  round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2) AS p4_notspec,
      |  round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2) AS p5_low
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  // ------------------------------------------------------------ u_unpivot
  /** UNPIVOT (melt): wide lineitem metrics → long (metric, val) rows via the
    * dedicated `Dataset.unpivot` operator (Spark's Expand — one pass, no
    * join/union re-scan of the input). Oracle uses DuckDB's SQL-standard
    * UNPIVOT clause, so both engines run their native unpivot operator. */
  def uUnpivot(spark: SparkSession, dir: String): DataFrame =
    li(spark, dir).filter(col("l_orderkey") <= 200)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount")
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "val")
      .orderBy("l_orderkey", "l_linenumber", "metric")

  val uUnpivotSql: String =
    """SELECT l_orderkey, l_linenumber, metric, val
      |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |             l_discount FROM lineitem WHERE l_orderkey <= 200)
      |UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  // -------------------------------------------------------------- j_range
  /** Range (interval) join: orders against a small table of price bands
    * joined on `lo <= price < hi` — with one deliberately OVERLAPPING band,
    * so the join is a genuine interval join (an order can land in two
    * tiers), not a disguisable width_bucket. The band side is broadcast:
    * Spark plans BroadcastNestedLoopJoin, which for a dim-sized interval
    * table is the correct 100 TB plan (zero shuffle of the fact side; the
    * residual predicate is codegen'd). A large interval table would instead
    * be bucket-aligned to turn this into an equi-join on the bucket id —
    * that pattern is exercised by e_tumbling/ddl_bucketed. */
  def jRange(spark: SparkSession, dir: String): DataFrame = {
    val tiers = spark.createDataFrame(Seq(
      ("t1_small", 0.0, 50000.0), ("t2_mid", 50000.0, 150000.0),
      ("t3_large", 150000.0, 300000.0), ("t4_jumbo", 300000.0, 600000.0),
      ("t5_promo_window", 100000.0, 200000.0))).toDF("tier", "lo", "hi")
    ord(spark, dir)
      .join(broadcast(tiers),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"),
        round(min("o_totalprice"), 2).as("lo_price"),
        round(max("o_totalprice"), 2).as("hi_price"))
      .orderBy("tier")
  }

  val jRangeSql: String =
    """SELECT tier, count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue,
      |       round(min(o_totalprice), 2) AS lo_price,
      |       round(max(o_totalprice), 2) AS hi_price
      |FROM orders
      |JOIN (VALUES ('t1_small', 0.0, 50000.0), ('t2_mid', 50000.0, 150000.0),
      |             ('t3_large', 150000.0, 300000.0),
      |             ('t4_jumbo', 300000.0, 600000.0),
      |             ('t5_promo_window', 100000.0, 200000.0)) AS t(tier, lo, hi)
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY tier ORDER BY tier""".stripMargin

  // ------------------------------------------------------------- set_config
  /** SQL `SET` / `RESET` session-variable round-trip (reference:
    * /root/reference/datafusion/sqllogictest/test_files/set_variable.slt,
    * options.slt): a config is set through the SQL surface, read back
    * through `SET key`, proven to reach EXECUTION (the planned shuffle has
    * exactly the configured partition count once AQE coalescing is off),
    * and restored with `RESET`; the ANSI flag is flipped the same way and
    * shown to change semantics (1/0 yields NULL instead of an error). Every
    * value is deterministic, so the entry is fully oracled as constants.
    * All three configs are restored in a finally — the entry leaves the
    * session exactly as it found it (PlanAuditSpec additionally proves the
    * ANSI error under the restored default). */
  def setConfig(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def get(k: String): String = spark.sql(s"SET $k").head().getString(1)
    val sp = "spark.sql.shuffle.partitions"
    val ansi = "spark.sql.ansi.enabled"
    val aqe = "spark.sql.adaptive.enabled"
    val buf = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    // the builder default is cpu-count (environment-dependent), so the
    // round-trip rows record RELATIONS to it (restored? yes/no), never the
    // raw value — the oracle constants must hold on any machine
    val default = get(sp)
    try {
      spark.sql(s"SET $sp=7")
      spark.sql(s"SET $aqe=false")
      spark.sql(s"SET $ansi=false")
      buf += (("set", sp, get(sp)))
      val parts = Tables.t(spark, dir, "orders")
        .groupBy("o_orderstatus").count().rdd.getNumPartitions
      buf += (("observed_shuffle_parts", sp, parts.toString))
      val div = spark.sql("SELECT 1/0 AS d").head()
      buf += (("ansi_off_div0", ansi,
        if (div.isNullAt(0)) "null" else div.get(0).toString))
    } finally {
      spark.sql(s"RESET $sp"); spark.sql(s"RESET $aqe"); spark.sql(s"RESET $ansi")
    }
    buf += (("reset_restored_default", sp, (get(sp) == default).toString))
    buf += (("ansi_restored", ansi, get(ansi)))
    buf.toSeq.toDF("step", "conf_key", "conf_val").orderBy("step")
  }

  val setConfigSql: String =
    """SELECT * FROM (VALUES
      |  ('ansi_off_div0', 'spark.sql.ansi.enabled', 'null'),
      |  ('ansi_restored', 'spark.sql.ansi.enabled', 'true'),
      |  ('observed_shuffle_parts', 'spark.sql.shuffle.partitions', '7'),
      |  ('reset_restored_default', 'spark.sql.shuffle.partitions', 'true'),
      |  ('set', 'spark.sql.shuffle.partitions', '7')
      |) AS t(step, conf_key, conf_val) ORDER BY step""".stripMargin

  // ------------------------------------------------------------- ident_norm
  /** Identifier normalization (reference:
    * /root/reference/datafusion/sqllogictest/test_files/
    * ident_normalization.slt, identifiers.slt): quoted mixed-case
    * identifiers — including one with an embedded space — created by a
    * subquery, then resolved BOTH quoted-exact and unquoted-lower-case.
    * Both engines resolve identifiers case-insensitively (Spark:
    * spark.sql.caseSensitive=false default; DuckDB: case-insensitive
    * lookup with case-preserving storage), which the shared SQL pins.
    * Spark's ANSI double-quoted-identifier mode is enabled only for the
    * eager parse/analyze of this one statement and restored immediately
    * (double quotes otherwise read as string literals), so the SAME text
    * runs on both engines — the srt_nulls dialect-trap pattern. */
  def identNorm(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    val key = "spark.sql.ansi.doubleQuotedIdentifiers"
    val prior = spark.conf.get(key, "false")
    try {
      spark.conf.set(key, "true")
      spark.sql(identNormSql) // parse + analysis happen eagerly here
    } finally spark.conf.set(key, prior)
  }

  val identNormSql: String =
    """SELECT "MC"."OrderKey" AS ok,
      |       mc.orderkey AS ok_ci,
      |       "MC"."Total Price" AS total_price
      |FROM (SELECT o_orderkey AS "OrderKey",
      |             round(o_totalprice, 2) AS "Total Price"
      |      FROM orders WHERE o_orderkey <= 64) AS "MC"
      |ORDER BY ok""".stripMargin

  // ------------------------------------------------------------- s_wildcard
  /** Wildcard variants (reference:
    * /root/reference/datafusion/sqllogictest/test_files/wildcard.slt):
    * qualified `n.*` in the select list and star-expansion INSIDE an
    * expression (`concat_ws('|', n.*)` — the analyzer expands the star to
    * the relation's columns as function arguments). The oracle spells the
    * expansion explicitly, so DuckDB recomputes the same packed string
    * without needing star-in-argument support — hash-green proof that
    * Spark's expansion order is the declared column order. Narrow,
    * broadcast-joined, codegen'd. */
  def sWildcard(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """SELECT n.*, r.r_name,
        |  concat_ws('|', n.*) AS packed
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY n_nationkey""".stripMargin)
  }

  val sWildcardSql: String =
    """SELECT n.*, r.r_name,
      |  concat_ws('|', n_nationkey, n_name, n_regionkey) AS packed
      |FROM nation n JOIN region r ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin

  // ---------------------------------------------------- s_wildcard_exclude
  /** `SELECT * EXCLUDE(...)` / `SELECT * EXCEPT(...)` wildcard options
    * (reference: /root/reference/datafusion/sqllogictest/test_files/
    * select.slt:1212-1320 — both spellings, single bare-name and
    * parenthesized-list forms, nested one inside the other). Spark SQL has
    * neither spelling, so the user surface is this desugaring: keep the
    * star expansion's declared column order and drop the named columns,
    * with the reference's validation semantics — unknown column errors,
    * duplicate names in the list error, and excluding EVERY column yields
    * a legal zero-column frame (select.slt:1295-1312). Pure projection:
    * column pruning reaches the scan, no shuffle, codegen'd. */
  def starExclude(df: DataFrame, cols: String*): DataFrame = {
    val lower = cols.map(_.toLowerCase)
    require(lower.distinct.size == lower.size,
      s"EXCLUDE/EXCEPT list contains duplicate column names: ${cols.mkString(", ")}")
    val have = df.columns.map(_.toLowerCase).toSet
    val missing = cols.filterNot(c => have(c.toLowerCase))
    require(missing.isEmpty,
      s"EXCLUDE/EXCEPT names columns not in the relation: ${missing.mkString(", ")}")
    val excluded = lower.toSet
    df.select(df.columns.filterNot(c => excluded(c.toLowerCase)).map(col).toSeq: _*)
  }

  def sWildcardExclude(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.t(spark, dir, "orders").where(col("o_orderkey") <= 2000)
    // Nested, mirroring select.slt:1224-1231: bare-name EXCLUDE inside,
    // list-form EXCEPT outside (the two spellings share one desugar).
    starExclude(starExclude(o, "o_orderdate"), "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val sWildcardExcludeSql: String =
    """SELECT * EXCLUDE (o_custkey, o_totalprice)
      |FROM (SELECT * EXCLUDE (o_orderdate)
      |      FROM orders WHERE o_orderkey <= 2000)
      |ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------------------------- o_all
  /** `ORDER BY ALL [DESC]` (reference: /root/reference/datafusion/
    * sqllogictest/test_files/order.slt:1383-1415, DuckDB-dialect): sort by
    * every projected column left-to-right. Spark SQL has no ALL sort key,
    * so the user surface is this desugaring over the frame's declared
    * column list. Null placement follows the REFERENCE engine's defaults
    * (ASC NULLS LAST / DESC NULLS FIRST — order.slt:704,1297 show
    * DataFusion's DESC default is NULLS FIRST), NOT Spark's ASC NULLS
    * FIRST default. DIALECT SPLIT (review r15): DuckDB's null order is
    * direction-INDEPENDENT (always NULLS LAST by default), so a DuckDB
    * oracle for the DESC variant must spell `NULLS FIRST` explicitly
    * (`ORDER BY ALL DESC NULLS FIRST` — DuckDB accepts the modifier on
    * ALL; the fuzz tier does exactly this). On ASC the three engines'
    * placements coincide. Plans as one global sort — at scale a
    * range-partitioned TakeOrdered/Sort, same shape as any ORDER BY. */
  def orderByAll(df: DataFrame, descending: Boolean = false): DataFrame =
    df.orderBy(df.columns.map(c =>
      if (descending) col(c).desc_nulls_first else col(c).asc_nulls_last).toSeq: _*)

  def oAll(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    // GROUP BY ALL + ORDER BY ALL — the pairing the reference's DuckDB
    // dialect tests use; the count column participates in the sort.
    orderByAll(spark.sql(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        |FROM orders GROUP BY ALL""".stripMargin))
  }

  val oAllSql: String =
    """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
      |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin

  private def viaSql(q: String): (SparkSession, String) => DataFrame =
    (spark, dir) => { Tables.registerViews(spark, dir); spark.sql(q) }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j_semi" -> (jSemi _), "j_anti" -> (jAnti _), "j_full" -> (jFull _),
    "j_right" -> (jRight _),
    "j_cross" -> (jCross _), "j_asof" -> (jAsof _), "j_range" -> (jRange _),
    "g_rollup" -> (gRollup _), "g_cube" -> (gCube _), "g_sets" -> viaSql(gSetsSql),
    "g_all" -> (gAll _),
    "g_pivot" -> (gPivot _), "u_unpivot" -> (uUnpivot _),
    "s_union_all" -> (sUnionAll _), "s_intersect" -> (sIntersect _),
    "s_except" -> (sExcept _), "s_distinct" -> (sDistinct _),
    "s_except_all" -> (sExceptAll _), "s_intersect_all" -> (sIntersectAll _),
    "s_distinct_on" -> (sDistinctOn _), "srt_lineitem" -> (srtLineitem _),
    "srt_varchar" -> (srtVarchar _), "srt_wide" -> (srtWide _),
    "srt_topk" -> (srtTopk _),
    "w_rank" -> (wRank _), "w_lag_lead" -> (wLagLead _), "w_frames" -> (wFrames _),
    "w_range" -> viaSql(wRangeSql), "w_named" -> viaSql(wNamedSql),
    "w_run_distinct" -> (wRunDistinct _),
    "j_natural" -> viaSql(jNaturalSql), "j_using" -> viaSql(jUsingSql),
    "srt_nulls" -> viaSql(srtNullsSql),
    "w_qualify" -> (wQualify _),
    "w_ignore_nulls" -> (wIgnoreNulls _), "j_lateral" -> viaSql(jLateralSql),
    "e_session_fn" -> (eSessionFn _), "w_groups" -> (wGroups _),
    "w_groups_asym" -> (wGroupsAsym _),
    "sql_params" -> (sqlParams _), "sql_prepare" -> (sqlPrepare _),
    "s_union_by_name" -> (sUnionByName _),
    "u_unnest" -> (uUnnest _), "u_unnest_struct" -> (uUnnestStruct _),
    "u_unnest_map" -> (uUnnestMap _), "u_unnest_nested" -> (uUnnestNested _),
    "u_unnest_outer" -> (uUnnestOuter _),
    "t_generate_series" -> (tGenerateSeries _),
    "t_series_ts" -> (tSeriesTs _),
    "sub_scalar" -> (subScalar _), "sub_exists_in" -> (subExistsIn _),
    "e_tumbling" -> (eTumbling _), "e_hopping" -> (eHopping _),
    "e_session" -> (eSession _),
    "values_inline" -> (valuesInline _), "cte_basic" -> viaSql(cteBasicSql),
    "cte_recursive" -> viaSql(cteRecursiveSql),
    "explain_plan" -> (explainPlan _), "explain_analyze" -> (explainAnalyze _),
    "ddl_table" -> (ddlTable _), "ddl_bucketed" -> (ddlBucketed _),
    "ddl_external" -> (ddlExternal _),
    "ddl_view" -> (ddlView _), "ddl_insert" -> (ddlInsert _),
    "ddl_function" -> (ddlFunction _),
    "ddl_info_schema" -> (ddlInfoSchema _),
    "ddl_describe" -> (ddlDescribe _),
    "set_config" -> (setConfig _), "ident_norm" -> (identNorm _),
    "s_wildcard" -> (sWildcard _),
    "s_wildcard_exclude" -> (sWildcardExclude _),
    "o_all" -> (oAll _),
    "s_limit_offset" -> (sLimitOffset _))

  val oracle: Map[String, String] = Map(
    "j_semi" -> jSemiSql, "j_anti" -> jAntiSql, "j_full" -> jFullSql,
    "j_right" -> jRightSql,
    "j_cross" -> jCrossSql, "j_asof" -> jAsofSql, "j_range" -> jRangeSql,
    "g_rollup" -> gRollupSql, "g_cube" -> gCubeSql, "g_sets" -> gSetsSql,
    "g_all" -> gAllSql,
    "g_pivot" -> gPivotSql, "u_unpivot" -> uUnpivotSql,
    "s_union_all" -> sUnionAllSql, "s_intersect" -> sIntersectSql,
    "s_except" -> sExceptSql, "s_distinct" -> sDistinctSql,
    "s_except_all" -> sExceptAllSql, "s_intersect_all" -> sIntersectAllSql,
    "s_distinct_on" -> sDistinctOnSql, "srt_lineitem" -> srtLineitemSql,
    "srt_varchar" -> srtVarcharSql, "srt_wide" -> srtWideSql,
    "srt_topk" -> srtTopkSql,
    "w_rank" -> wRankSql, "w_lag_lead" -> wLagLeadSql, "w_frames" -> wFramesSql,
    "w_range" -> wRangeSql, "w_named" -> wNamedSql,
    "w_run_distinct" -> wRunDistinctSql,
    "j_natural" -> jNaturalSql, "j_using" -> jUsingSql,
    "srt_nulls" -> srtNullsSql,
    "w_qualify" -> wQualifySql,
    "w_ignore_nulls" -> wIgnoreNullsSql, "j_lateral" -> jLateralSql,
    "e_session_fn" -> eSessionFnSql, "w_groups" -> wGroupsSql,
    "w_groups_asym" -> wGroupsAsymSql,
    "sql_params" -> sqlParamsSql, "sql_prepare" -> sqlPrepareSql,
    "s_union_by_name" -> sUnionByNameSql,
    "u_unnest" -> uUnnestSql, "u_unnest_struct" -> uUnnestStructSql,
    "u_unnest_map" -> uUnnestMapSql, "u_unnest_nested" -> uUnnestNestedSql,
    "u_unnest_outer" -> uUnnestOuterSql,
    "t_generate_series" -> tGenerateSeriesSql,
    "t_series_ts" -> tSeriesTsSql,
    "sub_scalar" -> subScalarSql, "sub_exists_in" -> subExistsInSql,
    "e_tumbling" -> eTumblingSql, "e_hopping" -> eHoppingSql,
    "e_session" -> eSessionSql,
    "values_inline" -> valuesInlineSql, "cte_basic" -> cteBasicSql,
    "cte_recursive" -> cteRecursiveSql, "ddl_table" -> ddlTableSql,
    "ddl_bucketed" -> ddlBucketedSql, "ddl_external" -> ddlExternalSql,
    "ddl_view" -> ddlViewSql, "ddl_insert" -> ddlInsertSql,
    "ddl_function" -> ddlFunctionSql,
    "set_config" -> setConfigSql, "ident_norm" -> identNormSql,
    "s_wildcard" -> sWildcardSql,
    "s_wildcard_exclude" -> sWildcardExcludeSql,
    "o_all" -> oAllSql,
    "s_limit_offset" -> sLimitOffsetSql, "ddl_describe" -> ddlDescribeSql)
}
