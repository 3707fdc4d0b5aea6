package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._

/** Pipeline composites: value-level gate is the DuckDB oracle; these specs
  * cover the statistical/determinism properties the oracle can't. */
class PipelineSpec extends SparkSpec {

  test("p_e2e buckets every surviving doc exactly once") {
    val stats = Pipeline.pE2e(spark, sf)
    assert(stats.count() > 0)
    val total = stats.agg(sum("n_docs")).collect().head.getLong(0)
    assert(total <= Tables.t(spark, sf, "documents").count())
  }

  test("p_sample is deterministic and hits the per-source rates") {
    val a = Pipeline.pSample(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = Pipeline.pSample(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a == b, "content-hash sampling must be reproducible")

    val docs = Tables.t(spark, sf, "documents")
      .withColumn("even", expr("CAST(substring(source, 4, 10) AS INT)") % 2 === 0)
    val sampled = Pipeline.pSample(spark, sf)
      .withColumn("even", expr("CAST(substring(source, 4, 10) AS INT)") % 2 === 0)
    Seq(true -> 0.25, false -> 0.75).foreach { case (even, expected) =>
      val n = docs.filter(col("even") === even).count().toDouble
      val k = sampled.filter(col("even") === even).count().toDouble
      val rate = k / n
      assert(math.abs(rate - expected) < 0.12,
        s"even=$even rate $rate too far from $expected (n=$n)")
    }
  }
}
