package graft

import graft.operators.Tpch

/** Every TPC-H query runs, has stable schema, and (apart from queries whose
  * filters can legitimately select nothing at sf0.001) returns rows. The
  * value-level gate is the DuckDB oracle (scripts/check.py / driver t2). */
class TpchSpec extends SparkSpec {

  // Queries allowed to be empty at the tiny sf0.001 (selective HAVING/EXISTS).
  private val mayBeEmptyAtTinySf = Set("q7", "q18", "q20", "q21", "q22")

  Tpch.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmptyAtTinySf(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("q1 values match hand-computed aggregate") {
    import org.apache.spark.sql.functions._
    val df = Tpch.q1(spark, sf).filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
    val row = df.collect().head
    val raw = Tables.t(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp") &&
        col("l_returnflag") === "A" && col("l_linestatus") === "F")
    val exp = raw.agg(sum("l_quantity")).collect().head.getDouble(0)
    assert(math.abs(row.getAs[Double]("sum_qty") - exp) < 0.01)
    assert(row.getAs[Long]("count_order") == raw.count())
  }

  test("q1 plan pushes the shipdate filter to the parquet scan") {
    val plan = Tpch.q1(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"expected pushdown in plan:\n$plan")
  }
}
