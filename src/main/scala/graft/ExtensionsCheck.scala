package graft

import org.apache.spark.sql.SparkSession

/** Standalone check that the production wiring
  * (`spark.sql.extensions=graft.functions.GraftExtensions`, applied here
  * through the public [[Graft.configure]] entry point) registers the native
  * functions and the optimizer rule on a fresh session — the path a cluster
  * deployment uses (specs can only exercise register(), since the shared
  * test session exists before any extension conf could apply). */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = Graft.configure(SparkSession.builder()
        .master("local[2]")
        .appName("graft-extensions-check")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // assert configs whose DEFAULTS differ (AQE already defaults to true,
    // so checking it could never catch configure() dropping a line):
    // spark.sql.extensions has no default, and the JVM timezone is only
    // coincidentally UTC in some environments
    assert(spark.conf.get("spark.sql.extensions", "") ==
      "graft.functions.GraftExtensions",
      "Graft.configure did not set spark.sql.extensions")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "Graft.configure did not set the UTC session timezone")

    val g = spark.sql("SELECT gcd(12L, 8L) AS g, lcm(4L, 6L) AS l, " +
      "hamming_distance(5L, 3L) AS h, " +
      "cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c, " +
      "rolling_fingerprint('a b') AS fp").collect().head
    assert(g.getLong(0) == 4L && g.getLong(1) == 12L && g.getInt(2) == 2 &&
      math.abs(g.getDouble(3) - 1.0) < 1e-12)
    assert(g.getLong(4) == graft.functions.RollingFingerprint.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b")))

    // the native top-k aggregate resolves through the extension registry too
    val t = spark.sql(
      "SELECT topk_pairs(c, i, 2) AS t FROM VALUES (0.1D, 1L), (0.9D, 2L), " +
        "(0.5D, 3L) AS v(c, i)").collect().head
    val pairs = t.getSeq[org.apache.spark.sql.Row](0)
    assert(pairs.map(_.getLong(1)) == Seq(2L, 3L), s"topk via extensions: $pairs")

    // optimizer rule fires via extensions: hamming=0 join becomes equi-join
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "h")
    val joined = df.as("x").join(df.as("y"),
      org.apache.spark.sql.functions.expr("hamming_distance(x.h, y.h) = 0"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rule did not fire via extensions:\n$plan")

    println("EXTENSIONS-CHECK OK: functions + optimizer rule active via spark.sql.extensions")
    spark.stop()
  }
}
