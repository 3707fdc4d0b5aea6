package graft

import org.apache.spark.sql.functions._

/** Query cancellation (Graft.cancellable / cancel / withTimeout) — the
  * reference benchmarks this surface in `benchmarks/src/cancellation.rs`:
  * a cancelled query must stop QUICKLY once the caller gives up, not run
  * its operator to completion. The probe query is a nested-loop cross
  * count (~1.6e10 output rows — minutes of work at local[4]); the specs
  * pin that cancellation lands within a small wall bound, the failure
  * surfaces in the caller's vocabulary, and the session stays fully
  * usable afterwards (group tags never leak onto the thread).
  */
class CancellationSpec extends SparkSpec {

  /** Minutes of work if left alone; interrupt-friendly (row batches). */
  private def slowCount(): Long =
    spark.range(125000).crossJoin(spark.range(125000))
      .agg(count(lit(1))).head().getLong(0)

  test("withTimeout: fast body returns its value, no exception") {
    val n = Graft.withTimeout(spark, timeoutMs = 120000) {
      spark.range(1000).agg(sum("id")).head().getLong(0)
    }
    assert(n == 499500L)
  }

  test("withTimeout: slow query is cancelled near the deadline and " +
    "surfaces as TimeoutException; session stays usable") {
    val t0 = System.nanoTime()
    val e = intercept[java.util.concurrent.TimeoutException] {
      Graft.withTimeout(spark, timeoutMs = 1500) { slowCount() }
    }
    val wallMs = (System.nanoTime() - t0) / 1000000L
    assert(e.getMessage.contains("1500 ms"), e.getMessage)
    assert(e.getCause != null, "cancellation cause was dropped")
    // deadline 1.5 s; generous stop bound well under the query's natural
    // minutes-long runtime — the reference's "cancels quickly" criterion
    assert(wallMs < 30000, s"took $wallMs ms to stop after cancellation")
    // the thread's group tag must be cleared: this query must NOT be
    // cancellable under the stale tag, and must succeed
    assert(spark.range(10).count() == 10L)
  }

  test("cancellable + cancel from another thread stops the running " +
    "action quickly; later work on the tagged thread unaffected") {
    @volatile var failure: Throwable = null
    @volatile var stoppedAtNs = 0L
    val worker = new Thread(() => {
      try Graft.cancellable(spark, "cancel-spec-tag") { slowCount(); () }
      catch { case t: Throwable => failure = t }
      finally stoppedAtNs = System.nanoTime()
    }, "cancel-spec-worker")
    worker.start()
    Thread.sleep(2000) // let the jobs actually launch
    val cancelNs = System.nanoTime()
    Graft.cancel(spark, "cancel-spec-tag")
    worker.join(30000)
    assert(!worker.isAlive, "worker did not stop within 30 s of cancel")
    assert(failure != null, "cancelled action did not raise")
    val stopMs = (stoppedAtNs - cancelNs) / 1000000L
    assert(stopMs < 30000, s"took $stopMs ms from cancel to stop")
    // cancelling an idle tag is a no-op, and the session still works
    Graft.cancel(spark, "cancel-spec-tag")
    assert(spark.range(10).count() == 10L)
  }
}
