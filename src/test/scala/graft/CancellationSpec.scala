package graft

import java.util.concurrent.{Executors, TimeUnit}
import org.apache.spark.sql.functions._

/** Query cancellation (reference: benchmarks/src/cancellation.rs — the
  * engine must abandon a running query promptly and stay healthy). Spark's
  * unit of cancellation is the job group. */
class CancellationSpec extends SparkSpec {

  test("a running query cancels promptly and the session stays usable") {
    val sc = spark.sparkContext
    val pool = Executors.newSingleThreadExecutor()
    val started = new java.util.concurrent.CountDownLatch(1)
    val outcome = pool.submit(new java.util.concurrent.Callable[String] {
      override def call(): String = {
        sc.setJobGroup("graft-cancel-test", "unbounded work", true)
        try {
          started.countDown()
          // ~3.6G-row cartesian aggregate at sf0.01 — minutes of work
          val l = Tables.t(spark, sf01, "lineitem").select("l_orderkey")
          l.as("a").crossJoin(l.as("b"))
            .agg(avg(col("a.l_orderkey").cast("double") *
              col("b.l_orderkey").cast("double"))).collect()
          "finished"
        } catch {
          case _: Throwable => "cancelled"
        } finally sc.clearJobGroup()
      }
    })
    started.await(30, TimeUnit.SECONDS)
    Thread.sleep(1000) // let tasks actually launch
    val t0 = System.nanoTime()
    // cancel in a loop: AQE may run broadcast-build sub-jobs on separate
    // threads, so one cancel can land in the gap between jobs and miss —
    // repeated group cancellation is the robust client pattern
    var result: Option[String] = None
    while (result.isEmpty && (System.nanoTime() - t0) / 1e9 < 30) {
      sc.cancelJobGroup("graft-cancel-test")
      try result = Some(outcome.get(2, TimeUnit.SECONDS))
      catch { case _: java.util.concurrent.TimeoutException => }
    }
    val cancelSecs = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    assert(result.nonEmpty, "query did not terminate within 30s of cancellation")
    assert(result.get == "cancelled", s"query ${result.get} instead of being cancelled")
    assert(cancelSecs < 15, f"cancellation took $cancelSecs%.1f s")
    // the session must remain fully usable afterwards
    assert(Tables.t(spark, sf, "nation").count() == 25)
  }
}
