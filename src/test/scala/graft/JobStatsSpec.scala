package graft

import graft.operators.Job

/** The stats-mode inputs (VERDICT r12 #1): `Job.originalFrom` preserves the
  * PRE-round-12 worst-case FROM orders and `Job.withFromOrder` splices them
  * back into the shipped texts. The heavy measurement lives in JobAudit's
  * SPARK_GRAFT_JOB_STATS mode at 100× (BASELINE.md round-13); this spec
  * pins the machinery itself — the splice is total over the family set,
  * analyzable by Spark, and RESULT-identical to the shipped text (the
  * property the in-mode assert re-checks at scale).
  */
class JobStatsSpec extends SparkSpec {

  test("withFromOrder splices every original FROM into valid, analyzable " +
    "SQL over the same relations") {
    Tables.registerViews(spark, sf)
    Job.originalFrom.foreach { case (name, from) =>
      val shipped = Job.oracle(name)
      val spliced = Job.withFromOrder(shipped, from)
      assert(spliced != shipped, s"$name: splice was a no-op")
      assert(spliced.contains(s"FROM $from"), s"$name: FROM list not spliced")
      // same predicates/outputs: everything outside the FROM span unchanged
      assert(spliced.split("\nWHERE ", 2)(1) == shipped.split("\nWHERE ", 2)(1),
        s"$name: splice touched the WHERE clause")
      spark.sql(spliced).queryExecution.analyzed // analysis must not throw
    }
  }

  test("original-FROM text is result-identical to the shipped hub-first " +
    "text (job_19a, job_31a at sf0.001) — the splice changes plans, not " +
    "answers") {
    Tables.registerViews(spark, sf)
    Seq("job_19a", "job_31a").foreach { name =>
      val a = spark.sql(Job.oracle(name)).collect().toSeq
      val b = spark.sql(Job.withFromOrder(Job.oracle(name),
        Job.originalFrom(name))).collect().toSeq
      assert(a == b, s"$name: original FROM diverged: $a vs $b")
    }
  }

  test("withFromOrder fails loudly on a text without a FROM…WHERE span") {
    intercept[IllegalArgumentException] {
      Job.withFromOrder("SELECT 1", "orders o")
    }
  }

  test("Graft.enableCbo registers catalog tables with ROW-COUNT statistics " +
    "and turns on cost-based join reorder — the stats CBO actually reads") {
    val before = spark.conf.getOption("spark.sql.cbo.enabled")
    val beforeBcast = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      val n = Graft.enableCbo(spark, sf, tables = Seq("nation", "region"))
      assert(n == 2, s"enableCbo returned $n, expected the table count 2")
      assert(spark.conf.get("spark.sql.cbo.enabled") == "true")
      assert(spark.conf.get("spark.sql.cbo.joinReorder.enabled") == "true")
      // catalog stats present (rowCount is the CBO join-size input; a
      // temp view would have none — the r12 FROM-order finding's cause).
      // Fully-qualified name: suites in the shared session register temp
      // views that would otherwise shadow the catalog table here.
      val stats = spark.table("spark_catalog.default.nation")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == 25L),
        s"nation rowCount missing or wrong: ${stats.rowCount}")
    } finally {
      // shared session: other suites pin no-CBO plan shapes. Qualified
      // drops — a bare DROP TABLE would resolve (and drop) the temp VIEW
      // of the same name other suites registered.
      spark.sql("DROP TABLE IF EXISTS spark_catalog.default.nation")
      spark.sql("DROP TABLE IF EXISTS spark_catalog.default.region")
      spark.conf.set("spark.sql.cbo.enabled", before.getOrElse("false"))
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      beforeBcast.foreach { // enableCbo raises these session-wide now
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
