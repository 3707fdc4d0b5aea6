package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

/** The interactive shell (graft.Cli — reference: datafusion-cli). The loop
  * is driven with scripted input; assertions are on the captured output,
  * which is the shell's entire contract. */
class CliSpec extends SparkSpec {

  private def run(script: String): String = {
    val bytes = new ByteArrayOutputStream()
    val out = new PrintStream(bytes, true, "UTF-8")
    Cli.repl(spark, new BufferedReader(new StringReader(script)), out)
    new String(bytes.toByteArray, "UTF-8")
  }

  test("\\load + SQL: testdata registers as views and a query prints an " +
    "aligned table with a row count") {
    val o = run(
      s"""\\load $sf
         |SELECT n_name FROM nation WHERE n_nationkey < 2
         |ORDER BY n_name;
         |\\q
         |""".stripMargin)
    assert(o.contains("loaded nation") && o.contains("loaded orders"), o)
    assert(o.contains("| n_name"), o)
    assert(o.contains("2 row(s)"), o)
    val names = o.linesIterator.filter(_.startsWith("| ")).toSeq
    assert(names.exists(_.contains("NATION_0")), o)
  }

  test("multi-line buffering: a statement only runs at ';'") {
    val o = run(
      s"""\\load $sf
         |SELECT count(*) AS n
         |FROM region;
         |\\q
         |""".stripMargin)
    assert(o.contains("| n") && o.contains("| 5"), o)
    assert(o.contains("1 row(s)"), o)
  }

  test("display cap pushes LIMIT into the plan and marks the truncation") {
    val o = run(
      s"""\\load $sf
         |\\maxrows 3
         |SELECT o_orderkey FROM orders ORDER BY o_orderkey;
         |\\q
         |""".stripMargin)
    assert(o.contains("maxrows 3"), o)
    assert(o.contains("3 row(s) (display capped)"), o)
  }

  test("\\analyze wires Graft.enableCbo: catalog stats land, join reorder " +
    "enabled, a join still answers; bad dir errors in one line") {
    val before = spark.conf.getOption("spark.sql.cbo.enabled")
    val beforeBcast = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      val o = run(
        s"""\\analyze $sf
           |SELECT count(*) AS n
           |FROM spark_catalog.default.nation n, spark_catalog.default.region r
           |WHERE n.n_regionkey = r.r_regionkey;
           |\\analyze /no/such/dir_zzz
           |\\q
           |""".stripMargin)
      assert(o.contains("analyzed 7 tables"), o)
      assert(o.contains("| 25") && o.contains("1 row(s)"), o)
      assert(o.contains("Error:"), o)
      assert(spark.conf.get("spark.sql.cbo.enabled") == "true")
      val stats = spark.table("spark_catalog.default.orders")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined, "ANALYZE left no rowCount")
    } finally {
      Tables.all.filterNot(t => t == "events" || t == "documents" ||
        t == "embeddings").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS spark_catalog.default.$t"))
      spark.conf.set("spark.sql.cbo.enabled", before.getOrElse("false"))
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      beforeBcast.foreach { // enableCbo raises these session-wide now
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("\\analyze name=path registers arbitrary user tables (VERDICT r13 " +
    "#6) and warns when a \\load temp view shadows an analyzed table") {
    val keep = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      val o = run(
        s"""\\load $sf
           |\\analyze my_nation=$sf/nation.parquet nation=$sf/nation.parquet
           |SELECT count(*) AS n FROM spark_catalog.default.my_nation;
           |\\q
           |""".stripMargin)
      assert(o.contains("analyzed 2 tables"), o)
      // \load registered a temp view `nation` that shadows the analyzed
      // catalog table of the same name — the CLI must say so
      assert(o.contains("warning: temp view(s) shadow") &&
        o.contains("nation"), o)
      assert(!o.contains("my_nation,"), o) // unshadowed name not flagged
      assert(o.contains("| 25"), o)
      val stats = spark.table("spark_catalog.default.my_nation")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == 25L),
        s"user table stats missing: ${stats.rowCount}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS spark_catalog.default.my_nation")
      spark.sql("DROP TABLE IF EXISTS spark_catalog.default.nation")
      keep.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) =>
          if (k.startsWith("spark.sql.cbo")) spark.conf.set(k, "false")
          else spark.conf.unset(k)
      }
    }
  }

  test("errors keep the session healthy and print in one line") {
    val o = run(
      s"""SELECT * FROM no_such_table_xyz;
         |\\nosuchcmd
         |\\load /no/such/dir_xyz
         |SELECT 1 AS ok;
         |\\q
         |""".stripMargin)
    assert(o.contains("Error:"), o)
    assert(o.contains("unknown command"), o)
    // the loop survived all three failures and ran the last statement
    assert(o.contains("| ok") && o.contains("| 1"), o)
  }

  test("\\d lists views, \\d <name> describes, \\timing prints wall time") {
    val o = run(
      s"""\\load $sf
         |\\d
         |\\d nation
         |\\timing on
         |SELECT 1 AS t;
         |\\q
         |""".stripMargin)
    assert(o.linesIterator.exists(l => l.startsWith("nation") &&
      l.contains("temporary")), o)
    assert(o.contains("n_nationkey"), o)
    assert("""1 row\(s\) in \d+\.\d{3} s""".r.findFirstIn(o).nonEmpty, o)
  }
}
