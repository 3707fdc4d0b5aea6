package graft

import org.apache.spark.sql.SparkSession

/** 100×-scale plan audit for the JOB suite (VERDICT r11 #2): re-asserts the
  * suite-wide join-web invariants PlanAuditSpec pins at sf0.1 — no
  * CartesianProduct, no BroadcastNestedLoopJoin, ≥2 broadcast builds,
  * predicates reaching the scans — on the FINAL (post-AQE) plans at a
  * ScaleGen directory, where size estimates shift and join orders can
  * flip. Join order IS the benchmark (reference benchmarks/src/imdb/); a
  * plan that only survives at toy scale is the exact failure JOB exists to
  * expose.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.JobAudit <scaleGenDir>
  * Prints one line per family (wall seconds + verdict) and a final
  * `[jobaudit] == N ok, M flipped`; exit 1 on any flip.
  *
  * SPARK_GRAFT_SHUFFLE sizes the shuffle width independently of the core
  * count (default: cpus). At 1000× the default is a trap this main itself
  * exposed: 600M lineitem rows over 32 shuffle partitions is ~19M rows
  * per sort-merge task — the per-task heap share (48 GB / 32 ≈ 1.5 GB)
  * OOMs mid-sort. The spill-aware rule from SURVEY §1 is to size
  * partitions to the DATA (≈ a few hundred MB each) and let AQE coalesce
  * the post-filter small ones back down — on a real cluster this is the
  * stock `2-3 × total cores` / `maxPartitionBytes` discipline; here it
  * means SPARK_GRAFT_SHUFFLE=256 for the 1000× directory.
  */
object JobAudit {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // shuffle files are only deleted when the driver GC collects their
      // ShuffleDependency (ContextCleaner is weak-reference driven); with
      // a 64 GB audit heap that GC may never come, so 25 families × a
      // fact-sized shuffle each accumulates >100 GB of dead shuffle files
      // on one box. Shorten the cleaner's periodic-GC interval and nudge
      // a GC after every family (below) so each family's shuffle space is
      // reclaimed before the next one runs.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_JOB_FILTER: comma-separated family subset (debugging);
    // SPARK_GRAFT_JOB_PLANS=1: print each final plan after its verdict;
    // SPARK_GRAFT_JOB_EXPLAIN=1: print the INITIAL physical plan without
    // executing — the join ORDER is static (Catalyst fixes it before
    // execution; AQE only swaps strategies/sides), so this inspects a
    // family whose execution exceeds a single box (disk/hours) for the
    // ordering defects the audit hunts, at zero data cost.
    val only = sys.env.get("SPARK_GRAFT_JOB_FILTER")
      .map(_.split(",").map(_.trim).toSet)
    val dumpPlans = sys.env.get("SPARK_GRAFT_JOB_PLANS").contains("1")
    val explainOnly = sys.env.get("SPARK_GRAFT_JOB_EXPLAIN").contains("1")
    if (explainOnly) {
      operators.Job.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.contains(n)) }
        .foreach { case (name, fn) =>
          println(s"[jobaudit-initial] $name:\n" +
            fn(spark, dir).queryExecution.executedPlan.toString)
        }
      spark.stop(); return
    }
    var flipped = 0
    val rows = operators.Job.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // the FINAL AQE plan — what actually ran at this scale
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // Scale invariants — deliberately weaker than PlanAuditSpec's sf0.1
      // bar of ≥2 broadcast builds: at 100× a LIKE-filtered mid-size dim
      // (no selectivity estimate) or a 30%-selective hub legitimately
      // outgrows the broadcast threshold and flips to a shuffle join,
      // which is exactly what a 1000-executor cluster wants (verified on
      // job_6a's 100× plan: the equality-filtered part dim still
      // broadcasts while customer-LIKE and the 4.5M-row orders join go
      // sort-merge). What must NEVER appear at any scale: a cartesian, a
      // nested-loop, a plan with no broadcast at all (the genuinely tiny
      // dims — nation, region, equality-filtered part — fit at every
      // scale), or filters not reaching the scans.
      // "no broadcast at all" only flags families that actually join a
      // genuinely tiny dim (nation/region — broadcastable at EVERY
      // scale). A family whose smallest relations are filtered part/
      // customer slices (job_27a: Brand#15 = ~800k rows at 1000×)
      // legitimately sees every build side outgrow the broadcast
      // threshold at the deployment decade — all-shuffle is the plan a
      // 1000-executor cluster wants there, not a flip.
      val hasTinyDim = {
        // word-boundary match, not space-padded substrings: a table name at
        // line start/end or tab-delimited must still arm the invariant.
        val sql = operators.Job.oracle(name)
        "\\b(nation|region)\\b".r.findFirstIn(sql).isDefined
      }
      val problems = Seq(
        (p.contains("CartesianProduct")) -> "CartesianProduct",
        (p.contains("BroadcastNestedLoopJoin")) -> "BroadcastNestedLoopJoin",
        (hasTinyDim && !p.contains("BroadcastHashJoin")) ->
          "no broadcast build despite a tiny dim",
        (!p.contains("PushedFilters: [")) -> "no pushed filters"
      ).collect { case (true, msg) => msg }
      val verdict = if (problems.isEmpty) "ok" else {
        flipped += 1; s"FLIPPED: ${problems.mkString("; ")}"
      }
      println(f"[jobaudit] $name%-10s $wall%8.2fs  $verdict")
      if (dumpPlans) println(s"[jobaudit-plan] $name:\n$p")
      // release this family's shuffle files (see conf note). Two passes
      // with a settle: the first GC enqueues the weak references, the
      // ContextCleaner drains them asynchronously — without the pause a
      // 20 GB family's files are still on disk when the next family's
      // shuffle starts, and back-to-back heavy families sum past the box.
      System.gc(); Thread.sleep(2000); System.gc(); Thread.sleep(2000)
      f""""$name":$wall%.2f"""
    }
    println(s"""[jobaudit-json] {${rows.mkString(",")}}""")
    println(s"[jobaudit] == ${rows.size - flipped} ok, $flipped flipped")
    spark.stop()
    if (flipped > 0) sys.exit(1)
  }
}
