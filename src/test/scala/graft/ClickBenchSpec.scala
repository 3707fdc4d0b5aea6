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
}
