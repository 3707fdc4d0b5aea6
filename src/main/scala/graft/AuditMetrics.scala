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

  /** Host-state snapshot as a JSON object — shared by [[Bench]] and the
    * audit mains so every measurement artifact declares its own
    * environment (VERDICT r15 #6, extended to the audits in round 17 per
    * VERDICT r16 #3: the r16 driver bench read 9% high with a "clean"
    * load1 — load15 4.55 vs the clean-run ~1.7 was the tell, so the
    * documented contamination rule now keys on load15/PSI, and the audit
    * mains sample at START and END — a sweep that begins clean and ends
    * loaded was raced mid-run).
    *
    * Interpretation rule (SURVEY §6 / BASELINE.md): treat the artifact as
    * a CONTAMINATED UPPER BOUND when any of
    *   java_procs > 0  (a non-ancestor JVM shared the box at sample
    *     time — the sbt launcher parent is excluded below), or
    *   cpu_pressure_avg60 > 5  (anything was CPU-stalled >5% of the last
    *     minute — this JVM alone on a 32-core box reads ~0), or
    *   for the BENCH, end load15 > 3.5  (≈2× its clean reference of
    *     ~1.7; load1 is too twitchy to catch sustained ~9%
    *     contamination). The audit mains' own sustained 32-thread
    *     queries push END load15 past 20 legitimately, and their START
    *     load15 can carry a PREVIOUS run's decay on a measurement day —
    *     for audits the start check is load1 + PSI + java_procs.
    */
  def hostJson(cores: String): String = {
    def readFile(p: String): Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8")) catch { case _: Throwable => None }
    val load = readFile("/proc/loadavg").map(_.split("\\s+").take(3))
      .getOrElse(Array("-1", "-1", "-1"))
    // exclude this JVM AND its ancestor chain: a forked `sbt runMain`
    // always has the sbt launcher JVM as its parent, which is waiting,
    // not competing — counting it made every legitimate run read
    // java_procs=1 (BENCH_r16) and trained readers to ignore the field
    val excluded = {
      var pids = Set(ProcessHandle.current().pid())
      var p = ProcessHandle.current().parent()
      while (p.isPresent) { pids += p.get.pid(); p = p.get.parent() }
      pids
    }
    val javaProcs =
      try ProcessHandle.allProcesses().filter(p =>
          !excluded.contains(p.pid()) && p.info().command()
            .map[Boolean](_.contains("java")).orElse(false))
        .count()
      catch { case _: Throwable => -1L }
    val psi = readFile("/proc/pressure/cpu")
      .flatMap(_.linesIterator.find(_.startsWith("some")))
      .flatMap(_.split("\\s+").collectFirst {
        case kv if kv.startsWith("avg60=") => kv.stripPrefix("avg60=") })
      .getOrElse("-1")
    s"""{"load1":${load(0)},"load5":${load(1)},"load15":${load(2)},""" +
      s""""java_procs":$javaProcs,"cpu_pressure_avg60":$psi,""" +
      s""""cores":"$cores"}"""
  }
}

private[graft] final class AuditMetrics extends SparkListener {
  val bytesRead = new AtomicLong
  val shuffleWrite = new AtomicLong
  val memSpill = new AtomicLong
  val diskSpill = new AtomicLong
  val runTimeMs = new AtomicLong
  val cpuTimeNs = new AtomicLong
  // the run−cpu gap DECOMPOSED (round 17 — the q22 1000× wall showed a
  // 43% cpu/run gap no other query had, and "waiting, not working" needs
  // a name before it can be fixed): gc = jvmGCTime (counted in run, not
  // cpu), fetchWait = blocked on shuffle-block arrival, shufWriteWait =
  // blocked writing shuffle blocks. What remains after these three is
  // I/O wait in the scan (parquet reads show up in neither).
  val gcTimeMs = new AtomicLong
  val fetchWaitMs = new AtomicLong
  val shufWriteNs = new AtomicLong

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      bytesRead.addAndGet(m.inputMetrics.bytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      runTimeMs.addAndGet(m.executorRunTime)
      cpuTimeNs.addAndGet(m.executorCpuTime)
      gcTimeMs.addAndGet(m.jvmGCTime)
      fetchWaitMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
      shufWriteNs.addAndGet(m.shuffleWriteMetrics.writeTime)
    }
  }

  def reset(): Unit = Seq(bytesRead, shuffleWrite, memSpill, diskSpill,
    runTimeMs, cpuTimeNs, gcTimeMs, fetchWaitMs, shufWriteNs)
    .foreach(_.set(0L))

  def report: String = {
    def gb(b: Long): String = f"${b / 1e9}%.1fGB"
    f"read=${gb(bytesRead.get)} shufW=${gb(shuffleWrite.get)} " +
      f"spillMem=${gb(memSpill.get)} spillDisk=${gb(diskSpill.get)} " +
      f"cpu=${cpuTimeNs.get / 1e9}%.0fs run=${runTimeMs.get / 1e3}%.0fs " +
      f"gc=${gcTimeMs.get / 1e3}%.0fs fetchWait=${fetchWaitMs.get / 1e3}%.0fs " +
      f"shufWrite=${shufWriteNs.get / 1e9}%.0fs"
  }
}
