package graft

import graft.operators.ClickBench

/** §2.3b: run + shape checks; value gate = DuckDB oracle. */
class ClickBenchSpec extends SparkSpec {
  ClickBench.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }

  test("cb_quantiles are ordered p50 <= p90 <= p99") {
    ClickBench.cbQuantiles(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
      assert(r.getAs[Double]("p90") <= r.getAs[Double]("p99"))
    }
  }

  test("cb_approx_pctl_grp: the approx_percentile variant tracks the exact tp95 per group") {
    // the oracled entry scores with EXACT percentile (q5's
    // APPROX_PERCENTILE_CONT sketch state can never hash-match across
    // engines); this pins the approx spelling — the one a 100 TB deployment
    // actually runs — to the exact result on the same groups
    import org.apache.spark.sql.functions._
    val rows = Tables.t(spark, sf01, "events")
      .filter(col("user_id") % 2 === 0 && col("value").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"),
        min("value").as("lo"), max("value").as("hi"),
        expr("percentile(value, 0.95)").as("exact95"),
        expr("approx_percentile(value, 0.95, 1000)").as("approx95"))
      .filter(col("c") > 1)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      val (ex, ap) = (r.getAs[Double]("exact95"), r.getAs[Double]("approx95"))
      assert(ap >= lo && ap <= hi, s"approx95 $ap outside group range [$lo, $hi]")
      // GK-sketch guarantee is on RANK error; on a value scale bound the
      // miss by a slice of the group's spread (loose, but fails on garbage)
      assert(math.abs(ap - ex) <= (hi - lo) * 0.25 + 1e-9,
        s"approx95 $ap too far from exact $ex in range [$lo, $hi]")
    }
  }
}
