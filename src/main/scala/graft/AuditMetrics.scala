package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-metrics accumulator shared by the audit mains (TpchAudit walls /
  * bucket, JobAudit walls): a decade wall is ATTRIBUTED, not guessed at —
  * a super-linear step between decades reads either as spill (memory/disk
  * spill bytes go nonzero), as I/O (input bytes outgrow CPU time), or as
  * genuine extra work (CPU time tracks the wall). Listener delivery is
  * async; callers snapshot after their GC-settle pause (≥1 s), which
  * bounds the undercount to the final in-flight events of a finished
  * query — noise at audit-scale walls. */
/** Shared env parsing for the audit mains. */
private[graft] object AuditEnv {
  /** Parse "k=v;k=v" conf-injection env vars (SPARK_GRAFT_JOB_CONF /
    * SPARK_GRAFT_TPCH_CONF). Empty segments (a stray `;;` or trailing
    * `;`) are skipped; a segment without '=' fails with a message naming
    * the variable and the bad segment instead of a bare MatchError after
    * the expensive ANALYZE has already run (review r15). */
  def applyConfs(spark: org.apache.spark.sql.SparkSession,
      envVar: String): Unit =
    sys.env.get(envVar).foreach(_.split(";").map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"$envVar: segment '$kv' is not k=v")
        spark.conf.set(kv.take(i).trim, kv.drop(i + 1).trim)
      })
}

private[graft] final class AuditMetrics extends SparkListener {
  val bytesRead = new AtomicLong
  val shuffleWrite = new AtomicLong
  val memSpill = new AtomicLong
  val diskSpill = new AtomicLong
  val runTimeMs = new AtomicLong
  val cpuTimeNs = new AtomicLong

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      bytesRead.addAndGet(m.inputMetrics.bytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      runTimeMs.addAndGet(m.executorRunTime)
      cpuTimeNs.addAndGet(m.executorCpuTime)
    }
  }

  def reset(): Unit = Seq(bytesRead, shuffleWrite, memSpill, diskSpill,
    runTimeMs, cpuTimeNs).foreach(_.set(0L))

  def report: String = {
    def gb(b: Long): String = f"${b / 1e9}%.1fGB"
    f"read=${gb(bytesRead.get)} shufW=${gb(shuffleWrite.get)} " +
      f"spillMem=${gb(memSpill.get)} spillDisk=${gb(diskSpill.get)} " +
      f"cpu=${cpuTimeNs.get / 1e9}%.0fs run=${runTimeMs.get / 1e3}%.0fs"
  }
}
