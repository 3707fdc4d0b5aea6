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
    if (sys.env.get("SPARK_GRAFT_JOB_STATS").contains("1")) {
      statsMode(spark, dir, only); spark.stop(); return
    }
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
    // host state at START and END (VERDICT r16 #3): the r16 34-family
    // sweep's first ~11 families raced the end-of-round test suite and
    // nobody could tell from the artifact — now it says so itself
    val hostStart = AuditEnv.hostJson(cpus)
    // per-family task metrics (TpchAudit's attribution discipline): the
    // snapshot lands after the post-family GC settle, so the async
    // listener bus has drained
    val agg = new AuditMetrics
    spark.sparkContext.addSparkListener(agg)
    val rows = operators.Job.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      agg.reset()
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
      val problems = planProblems(name, p)
      val verdict = if (problems.isEmpty) "ok" else {
        flipped += 1; s"FLIPPED: ${problems.mkString("; ")}"
      }
      if (dumpPlans) println(s"[jobaudit-plan] $name:\n$p")
      // release this family's shuffle files (see conf note). Two passes
      // with a settle: the first GC enqueues the weak references, the
      // ContextCleaner drains them asynchronously — without the pause a
      // 20 GB family's files are still on disk when the next family's
      // shuffle starts, and back-to-back heavy families sum past the box.
      System.gc(); Thread.sleep(2000); System.gc(); Thread.sleep(2000)
      println(f"[jobaudit] $name%-10s $wall%8.2fs  $verdict  ${agg.report}")
      f""""$name":$wall%.2f"""
    }
    println(s"""[jobaudit-json] {${rows.mkString(",")},""" +
      s""""host":{"start":$hostStart,"end":${AuditEnv.hostJson(cpus)}}}""")
    println(s"[jobaudit] == ${rows.size - flipped} ok, $flipped flipped")
    spark.stop()
    if (flipped > 0) sys.exit(1)
  }

  /** Scale-invariant plan problems (shared by the main audit and the stats
    * mode's CBO leg): cartesian, nested-loop, a tiny-dim family with no
    * broadcast at all, filters not reaching the scans. The tiny-dim arm
    * uses a word-boundary match on the family's SQL (nation/region are
    * broadcastable at EVERY scale). */
  private def planProblems(name: String, p: String): Seq[String] = {
    val hasTinyDim =
      "\\b(nation|region)\\b".r.findFirstIn(operators.Job.oracle(name)).isDefined
    Seq(
      (p.contains("CartesianProduct")) -> "CartesianProduct",
      (p.contains("BroadcastNestedLoopJoin")) -> "BroadcastNestedLoopJoin",
      (hasTinyDim && !p.contains("BroadcastHashJoin")) ->
        "no broadcast build despite a tiny dim",
      (!p.contains("PushedFilters: [")) -> "no pushed filters"
    ).collect { case (true, msg) => msg }
  }

  /** STATS mode (SPARK_GRAFT_JOB_STATS=1) — the engine-native answer to
    * the r12 join-order finding (VERDICT r12 #1). The r12 fix hand-encoded
    * the hub-first order in the heavy-tail FROM texts because without CBO
    * statistics Spark's ReorderJoin is FROM-order-driven; a real user's
    * query won't arrive pre-ordered. This mode proves the stats pipeline
    * recovers the order from data, not syntax:
    *
    *  1. register the seven relational tables as CATALOG tables over the
    *     ScaleGen parquet (temp views carry no catalog stats — CBO reads
    *     `CatalogTable.stats`, so the tables must live in the catalog);
    *  2. `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS` (row counts
    *     feed join-size estimation; column min/max/ndv feed
    *     FilterEstimation for the date-range and equality gates — LIKE
    *     stacks are unestimated in Spark, so the recovered order leans on
    *     the estimable predicates plus relation sizes);
    *  3. per heavy-tail family, run (a) the shipped hand-ordered text with
    *     CBO OFF — the r12 reference plan — and (b) the ORIGINAL
    *     pre-reorder text ([[operators.Job.originalFrom]]) with
    *     `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled` ON,
    *     DP threshold 12 (the default) for families the DP covers, raised
    *     to 18 for the 14/17-relation webs (28a/29a) to measure where
    *     Spark's DP join reorder really stops;
    *  4. assert both runs return the SAME single MIN-row (the splice
    *     changes only FROM order, so any divergence is a planner bug),
    *     assert the CBO tree holds the main audit's scale invariants
    *     ([[planProblems]] — no cartesian/BNLJ, tiny dims broadcast,
    *     filters pushed), and report wall/planning-time ratios — the gate
    *     from the verdict is cbo-from-original within ~1.2× of
    *     hand-ordered.
    *
    * SPARK_GRAFT_JOB_HIST=1 additionally builds equi-height histograms
    * (better range selectivity, pricier ANALYZE). */
  def statsMode(spark: SparkSession, dir: String,
      only: Option[Set[String]]): Unit = {
    import operators.Job
    if (sys.env.get("SPARK_GRAFT_JOB_HIST").contains("1"))
      spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    // host state at the TRUE start — before the ANALYZE burst, which is
    // this process's own load and would false-flag the contamination rule
    val hostStart = AuditEnv.hostJson(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val tA = System.nanoTime()
    Graft.enableCbo(spark, dir) // the user-facing path — audited here
    println(f"[jobstats] analyze total ${(System.nanoTime() - tA) / 1e9}%.2fs")
    // SPARK_GRAFT_JOB_BCAST: broadcast-threshold override (bytes) for
    // bisecting enableCbo's Graft.cboBroadcastThreshold default (32 MB
    // after the r14 bisect) against Spark's 10 MB stock — how the r14
    // job_3a regression was attributed
    sys.env.get("SPARK_GRAFT_JOB_BCAST").foreach { v =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
    }
    // …and independently for the STATIC threshold alone (the static/
    // adaptive split bisect: estimate-driven vs runtime-measured builds)
    sys.env.get("SPARK_GRAFT_JOB_BCAST_STATIC").foreach(v =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    // SPARK_GRAFT_JOB_CONF="k=v;k=v": arbitrary session confs for the CBO
    // leg — how a single rule (e.g. spark.graft.cbo.measuredDimPlacement)
    // is attributed in an A/B without recompiling
    AuditEnv.applyConfs(spark, "SPARK_GRAFT_JOB_CONF")
    // SPARK_GRAFT_JOB_STATS_ALL=1 widens the sweep to EVERY family: the 27
    // families without a preserved worst-case FROM run the SHIPPED text on
    // both legs, measuring that enabling CBO session-wide REGRESSES nothing
    // (plan invariants re-checked per family either way) — the claim a
    // user of Graft.enableCbo actually relies on.
    val fams =
      if (sys.env.get("SPARK_GRAFT_JOB_STATS_ALL").contains("1"))
        Job.oracle.keys.toSeq.sorted
      else Job.originalFrom.keys.toSeq.sorted
    var worst = 0.0
    val rows = fams
      .filter(n => only.forall(_.contains(n)))
      .map { name =>
        val handSql = Job.oracle(name)
        val origSql = Job.originalFrom.get(name)
          .map(f => Job.withFromOrder(handSql, f)).getOrElse(handSql)
        val nRel = handSql.split("\nWHERE ", 2)(0).split("\nFROM ", 2)
          .lift(1).map(_.count(_ == ',') + 1).getOrElse(0)
        def run(sql: String, cbo: Boolean): (Double, Double, Seq[Any], String) = {
          spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
          spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
          spark.conf.set("spark.sql.cbo.joinReorder.dp.threshold",
            if (nRel > 12) "18" else "12")
          val p0 = System.nanoTime()
          val df = spark.sql(sql)
          df.queryExecution.executedPlan // force planning (incl. DP reorder)
          val plan = (System.nanoTime() - p0) / 1e9
          val e0 = System.nanoTime()
          val row = df.collect()(0).toSeq // 1-row MIN outputs in every family
          val finalPlan = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==").head
          (plan, (System.nanoTime() - e0) / 1e9, row, finalPlan)
        }
        // ALTERNATED min-of-N protocol (VERDICT r13 #5): single-pass walls
        // at 300×+ carry ±70% noise (page-cache boundary, residual shuffle
        // files), and running all hand legs before all CBO legs folds any
        // session drift INTO the ratio. Interleaving hand/CBO reps puts
        // both legs through the same cache/shuffle state; min-of-N then
        // reads the best-case of each, which is what plan quality means.
        val reps = sys.env.get("SPARK_GRAFT_JOB_STATS_REPS")
          .map(_.toInt).getOrElse(2)
        var wallHand = Double.MaxValue
        var wallCbo = Double.MaxValue
        var planCbo = 0.0
        var handPlan = ""
        var cboPlan = ""
        (1 to reps).foreach { _ =>
          val (_, h, rowHand, hp) = run(handSql, cbo = false)
          System.gc(); Thread.sleep(1000); System.gc()
          val (p, c, rowCbo, cp) = run(origSql, cbo = true)
          System.gc(); Thread.sleep(1000); System.gc()
          assert(rowHand == rowCbo,
            s"$name: CBO plan over the original FROM changed the RESULT: " +
              s"$rowHand vs $rowCbo")
          wallHand = math.min(wallHand, h); wallCbo = math.min(wallCbo, c)
          planCbo = p; handPlan = hp; cboPlan = cp
        }
        // SPARK_GRAFT_JOB_STATS_PLANS=1: dump both final plans (how the
        // job_33a miss was diagnosed — diff the join trees)
        if (sys.env.get("SPARK_GRAFT_JOB_STATS_PLANS").contains("1")) {
          println(s"[jobstats-plan] $name HAND:\n$handPlan")
          println(s"[jobstats-plan] $name CBO:\n$cboPlan")
        }
        // the CBO tree must hold the same scale invariants the main audit
        // pins — a result-correct plan with a cartesian/BNLJ or unpushed
        // filters would be a CBO regression this mode exists to catch
        val cboProblems = planProblems(name, cboPlan)
        assert(cboProblems.isEmpty,
          s"$name: CBO plan violates scale invariants: ${cboProblems.mkString("; ")}")
        val ratio = wallCbo / wallHand
        worst = math.max(worst, ratio)
        println(f"[jobstats] $name%-8s nRel=$nRel%2d hand=$wallHand%7.2fs " +
          f"cbo(orig FROM)=$wallCbo%7.2fs plan=$planCbo%6.2fs ratio=$ratio%5.2fx" +
          s" (min of $reps, alternated)")
        f""""$name":{"hand":$wallHand%.2f,"cbo":$wallCbo%.2f,"plan":$planCbo%.2f}"""
      }
    println(s"""[jobstats-json] {${rows.mkString(",")},"host":""" +
      s"""{"start":$hostStart,"end":${AuditEnv.hostJson(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))}}}""")
    println(f"[jobstats] == ${rows.size} families, worst cbo/hand ratio $worst%.2fx")
  }
}
