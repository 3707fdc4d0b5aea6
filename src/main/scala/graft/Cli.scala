package graft

import java.io.{BufferedReader, InputStreamReader, PrintStream}

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Interactive SQL shell — the reference ships one as `datafusion-cli`
  * (`datafusion-cli/src/main.rs`: statements terminated by `;`,
  * backslash meta-commands, `\timing`). Spark's stock `spark-sql` shell is
  * the full-featured equivalent on a real deployment (see README —
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`); this
  * main exists so the library is ALSO self-contained interactively — no
  * Hive/metastore setup, every graft function and optimizer rule live via
  * `Graft.session()`, and the driver-testdata layout loads with one
  * meta-command.
  *
  * Surface (the `datafusion-cli` intersection, backslash-spelled like its
  * psql-derived commands):
  *   - SQL statements, multi-line, terminated by `;`
  *   - `\d` list tables · `\d name` describe one · `\load <dir>` register
  *     every `*.parquet` under the dir as a temp view named after the file
  *   - `\timing on|off` per-statement wall time · `\maxrows N` display cap
  *   - `\q` quit · `\?` help
  *
  * The loop is pure over (reader, printer) so CliSpec drives it with
  * scripted input and asserts on captured output; `main` binds stdin and a
  * `Graft.session()`.
  *
  * Scale note: display is the only collect — capped at `maxrows` via
  * LIMIT pushed INTO the plan (`df.limit(n)` → CollectLimitExec, which
  * stops the scan early), never a full collect truncated driver-side. */
object Cli {

  private val Help: String =
    """Commands:
      |  <sql> ;            run a SQL statement (multi-line until ';')
      |  \d                 list tables and views
      |  \d <name>          describe a table or view
      |  \load <dir>        register <dir>/*.parquet as temp views
      |  \analyze <dir>     catalog tables + ANALYZE + cost-based join reorder
      |  \analyze n=p [...] same, for arbitrary  name=path  parquet tables
      |  \timing on|off     toggle per-statement wall-clock timing
      |  \maxrows <n>       rows displayed per result (default 40)
      |  \q                 quit
      |  \?                 this help""".stripMargin

  /** One scripted/interactive session over `spark`. Never throws on a bad
    * statement — errors print as `Error: …` and the loop continues, the
    * session stays healthy (the reference CLI's contract). */
  def repl(spark: SparkSession, in: BufferedReader, out: PrintStream,
      prompt: Boolean = false): Unit = {
    var timing = false
    var maxRows = 40
    val buf = new StringBuilder
    var line: String = null
    if (prompt) out.print("graft> ")
    while ({ line = in.readLine(); line != null }) {
      val t = line.trim
      if (buf.isEmpty && (t.startsWith("\\") || t == "exit" || t == "quit")) {
        val parts = t.split("\\s+").toSeq
        parts.head match {
          case "\\q" | "exit" | "quit" => return
          case "\\?" => out.println(Help)
          case "\\d" if parts.size == 1 =>
            spark.catalog.listTables().collect().sortBy(_.name).foreach { tb =>
              out.println(s"${tb.name}\t${tb.tableType.toLowerCase}")
            }
          case "\\d" =>
            runSql(spark, s"DESCRIBE ${parts(1)}", out, Int.MaxValue,
              timing = false)
          case "\\load" if parts.size > 1 =>
            load(spark, parts(1), out)
          case "\\analyze" if parts.size > 1 =>
            // the stats path \load can't give: catalog tables carry the
            // row-count/column stats CBO join reorder reads (temp views
            // don't), so multi-join SQL typed here plans from DATA, not
            // FROM order (BASELINE.md round-13)
            try {
              val args = parts.drop(1)
              val named = args.filter(_.contains("="))
                .map { a => val Array(k, v) = a.split("=", 2); k -> v }
              // mixed spellings would silently drop the positional dir
              // (named args win) — surface that instead (ADVICE r14)
              if (named.nonEmpty && named.size < args.size)
                out.println("warning: positional argument(s) " +
                  s"${args.filterNot(_.contains("=")).mkString(", ")} " +
                  "ignored - name=path pairs take precedence")
              val (n, names) =
                if (named.nonEmpty)
                  (Graft.enableCbo(spark, named.toMap, dpThreshold = 12),
                    named.map(_._1))
                else (Graft.enableCbo(spark, args.head),
                  Graft.defaultCboTables)
              out.println(s"analyzed $n tables; " +
                "cost-based join reorder enabled")
              // a \load-created temp view outranks a same-named catalog
              // table at resolution, so unqualified SQL would keep
              // planning STAT-LESS while this session believes CBO is on
              val shadowed = names.filter(t =>
                spark.sessionState.catalog.getTempView(t).isDefined)
              if (shadowed.nonEmpty)
                out.println("warning: temp view(s) shadow the analyzed " +
                  s"catalog table(s): ${shadowed.mkString(", ")} - " +
                  "unqualified SQL resolves to the STAT-LESS views; " +
                  "qualify as spark_catalog.default.<name> or restart " +
                  "without \\load")
            } catch {
              case NonFatal(e) =>
                out.println(s"Error: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next()}")
            }
          case "\\timing" =>
            timing = parts.lift(1).contains("on")
            out.println(s"timing ${if (timing) "on" else "off"}")
          case "\\maxrows" if parts.size > 1 && parts(1).forall(_.isDigit) =>
            // toIntOption, not toInt: an all-digit value past Int.MaxValue
            // must degrade gracefully, never throw out of the REPL loop.
            parts(1).toIntOption match {
              case Some(n) => maxRows = n.max(1); out.println(s"maxrows $maxRows")
              case None => out.println(s"Error: maxrows out of range: ${parts(1)}")
            }
          case other =>
            out.println(s"Error: unknown command '$other' (\\? for help)")
        }
        if (prompt) out.print("graft> ")
      } else if (t.nonEmpty || buf.nonEmpty) {
        buf.append(line).append('\n')
        if (t.endsWith(";")) {
          val sql = buf.toString.trim.stripSuffix(";")
          buf.clear()
          if (sql.nonEmpty) runSql(spark, sql, out, maxRows, timing)
          if (prompt) out.print("graft> ")
        }
      } else if (prompt) out.print("graft> ")
    }
  }

  private def runSql(spark: SparkSession, sql: String, out: PrintStream,
      maxRows: Int, timing: Boolean): Unit =
    try {
      val t0 = System.nanoTime()
      val df = spark.sql(sql)
      // limit INTO the plan: CollectLimit stops the scan, so `SELECT *
      // FROM a_100tb_table` shows the first page instead of an OOM
      val capped =
        if (maxRows == Int.MaxValue) df.collect() else df.limit(maxRows + 1)
          .collect()
      val shown = capped.take(maxRows)
      val names = df.schema.fieldNames
      if (names.nonEmpty) {
        val cells = shown.map(_.toSeq.map(v =>
          if (v == null) "NULL" else v.toString))
        val widths = names.indices.map(i =>
          (names(i).length +: cells.map(_(i).length)).max)
        def fmt(vs: Seq[String]) =
          vs.zipWithIndex.map { case (v, i) => v.padTo(widths(i), ' ') }
            .mkString("| ", " | ", " |")
        out.println(fmt(names.toSeq))
        out.println(widths.map("-" * _).mkString("+-", "-+-", "-+"))
        cells.foreach(r => out.println(fmt(r)))
      }
      val more = if (capped.length > shown.length) " (display capped)" else ""
      val secs = (System.nanoTime() - t0) / 1e9
      out.println(s"${shown.length} row(s)$more" +
        (if (timing) f" in $secs%.3f s" else ""))
    } catch {
      case NonFatal(e) =>
        out.println(s"Error: ${Option(e.getMessage).getOrElse(e.toString)
          .linesIterator.take(4).mkString(" / ")}")
    }

  /** Register every `*.parquet` under `dir` (file or directory) as a view
    * named after the basename — the driver-testdata/ScaleGen layout. Goes
    * through the Hadoop FileSystem API like every other path touch in the
    * repo, so `\load hdfs://…` and `\load s3a://…` work unchanged. */
  private def load(spark: SparkSession, dir: String, out: PrintStream): Unit =
    try {
      val fs = sources.Fs.of(spark, dir)
      val entries = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(_.getPath.getName.endsWith(".parquet")).sortBy(_.getPath.getName)
      if (entries.isEmpty) { out.println(s"Error: no *.parquet in $dir"); return }
      entries.foreach { st =>
        val name = st.getPath.getName.stripSuffix(".parquet")
        spark.read.parquet(st.getPath.toString).createOrReplaceTempView(name)
        out.println(s"loaded $name")
      }
    } catch {
      case NonFatal(e) =>
        out.println(s"Error: ${Option(e.getMessage).getOrElse(e.toString)}")
    }

  def main(args: Array[String]): Unit = {
    val spark = Graft.session(appName = "graft-cli")
    spark.sparkContext.setLogLevel("WARN")
    val out = new PrintStream(System.out, true, "UTF-8")
    out.println("graft SQL shell — \\? for help, \\q to quit")
    args.headOption.foreach(load(spark, _, out))
    repl(spark, new BufferedReader(new InputStreamReader(System.in)), out,
      prompt = true)
    spark.stop()
  }
}
