package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark (SURVEY.md §6): headline queries over
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Materialization is a noop-format write — a full computation of every
  * output row with zero sink cost; `count()` would let Catalyst prune the
  * plan to whatever feeds a row count and under-measure wide queries. A
  * one-query warmup amortizes JVM/codegen startup out of the first number.
  */
object Bench {

  /** SURVEY §6 headline set: scan-heavy, join-heavy, subquery-heavy TPC-H
    * plus one of each LLM-pipeline family. */
  val Headline: Seq[String] = Seq(
    "q1", "q3", "q5", "q6", "q9", "q18",
    "d_exact", "d_minhash", "n_brute_topk", "x_quality")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Warm each query's generated code on the tiny SF: janino compilation of
    // the wide generated classes (e.g. the 128-buffer minhash aggregate) is
    // multi-second and one-time per plan shape — profiled 3/4 of the first
    // d_minhash run. Steady-state is what a long-lived cluster sees.
    val warmDir = "/root/testdata/sf0.001"
    Headline.foreach(n => runOnce(n, warmDir))

    // min of two runs: JIT deoptimization storms and GC pauses add seconds
    // of one-sided noise on a shared JVM; the minimum is the steady state.
    // clearCache first so operators with internal persist() (minhash family)
    // are timed cold — measuring their cache hits would flatter them.
    val results = Headline.map { n =>
      def cold(): Double = { spark.catalog.clearCache(); runOnce(n, sfDir) }
      val a = cold(); val b = cold()
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout gets wrapped in sbt [info] noise when run via `sbt runMain`, so
    // the canonical copy goes to a file the driver can read verbatim.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
