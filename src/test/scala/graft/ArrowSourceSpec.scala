package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The from-scratch columnar DSv2 Arrow IPC provider
  * (graft.sources.arrow.ArrowDataSource): round-trip fidelity, null
  * handling, array columns, schema inference, the columnar scan path, and
  * column pruning. */
class ArrowSourceSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = new java.io.File(s"target/arrowspec/$name")
    d.getParentFile.mkdirs()
    d.getAbsolutePath
  }

  test("orders round-trips losslessly incl. timestamp-ntz micros") {
    val out = tmp("orders")
    val src = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    src.write.mode(SaveMode.Overwrite).format("graft-arrow").save(out)
    val back = spark.read.format("graft-arrow").load(out)
    assert(back.schema == src.schema,
      s"schema drift: ${back.schema} vs ${src.schema}")
    assert(back.count() == src.count())
    assert(src.exceptAll(back).isEmpty && back.exceptAll(src).isEmpty,
      "arrow round-trip changed values")
  }

  test("multi-batch files round-trip (row counts above the 4096 batch size)") {
    val out = tmp("lineitem")
    val src = Tables.t(spark, sf01, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    src.write.mode(SaveMode.Overwrite).format("graft-arrow").save(out)
    val back = spark.read.format("graft-arrow").load(out)
    assert(back.count() == src.count())
    assert(src.exceptAll(back).isEmpty && back.exceptAll(src).isEmpty)
  }

  test("float-array embeddings round-trip through list vectors") {
    val out = tmp("emb")
    val src = Tables.t(spark, sf, "embeddings").limit(50)
    src.write.mode(SaveMode.Overwrite).format("graft-arrow").save(out)
    val back = spark.read.format("graft-arrow").load(out)
    assert(back.count() == 50)
    val a = src.select(sum(expr("aggregate(embedding, 0D, (s, x) -> s + x)")))
      .collect()(0).getDouble(0)
    val b = back.select(sum(expr("aggregate(embedding, 0D, (s, x) -> s + x)")))
      .collect()(0).getDouble(0)
    assert(math.abs(a - b) < 1e-6, s"embedding payload drift: $a vs $b")
  }

  test("nulls survive the round-trip") {
    val out = tmp("nulls")
    import spark.implicits._
    val src = Seq((1L, Some("a"), Some(1.5)), (2L, None, None),
      (3L, Some("c"), Some(-2.5)))
      .toDF("id", "s", "d")
    src.write.mode(SaveMode.Overwrite).format("graft-arrow").save(out)
    val back = spark.read.format("graft-arrow").load(out)
    assert(back.filter(col("s").isNull).count() == 1)
    assert(back.filter(col("d").isNull).count() == 1)
    assert(src.exceptAll(back).isEmpty && back.exceptAll(src).isEmpty)
  }

  test("scan is columnar and prunes to the requested columns") {
    val out = tmp("prune")
    Tables.t(spark, sf, "orders").write
      .mode(SaveMode.Overwrite).format("graft-arrow").save(out)
    val df = spark.read.format("graft-arrow").load(out).select("o_orderkey")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // DSv2 BatchScan prints the pruned output columns in brackets
    assert(p.contains("[o_orderkey#") && !p.contains("o_custkey"),
      s"scan did not prune columns:\n$p")
    // the columnar batch feeds codegen directly — no per-row decode node
    assert(p.contains("ColumnarToRow"), s"scan is not columnar:\n$p")
  }
}
