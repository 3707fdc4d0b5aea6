package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The from-scratch DSv2 Avro provider (graft.sources.avro.AvroDataSource):
  * round-trip fidelity, null handling, array columns, schema inference, and
  * decode-level column pruning. */
class AvroSourceSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = new java.io.File(s"target/avrospec/$name")
    d.getParentFile.mkdirs()
    d.getAbsolutePath
  }

  test("orders round-trips losslessly incl. timestamp-ntz micros") {
    val out = tmp("orders")
    val src = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    src.write.mode(SaveMode.Overwrite).format("graft-avro").save(out)
    val back = spark.read.format("graft-avro").load(out)
    assert(back.schema == src.schema,
      s"schema drift: ${back.schema} vs ${src.schema}")
    assert(back.count() == src.count())
    assert(src.exceptAll(back).isEmpty && back.exceptAll(src).isEmpty,
      "avro round-trip changed values")
  }

  test("float-array embeddings round-trip") {
    val out = tmp("emb")
    val src = Tables.t(spark, sf, "embeddings").limit(50)
    src.write.mode(SaveMode.Overwrite).format("graft-avro").save(out)
    val back = spark.read.format("graft-avro").load(out)
    assert(back.count() == 50)
    val a = src.select(sum(expr("aggregate(embedding, 0D, (s, x) -> s + x)")))
      .collect()(0).getDouble(0)
    val b = back.select(sum(expr("aggregate(embedding, 0D, (s, x) -> s + x)")))
      .collect()(0).getDouble(0)
    assert(math.abs(a - b) < 1e-6, s"embedding payload drift: $a vs $b")
  }

  test("nulls survive the union[null, T] encoding") {
    val out = tmp("nulls")
    import spark.implicits._
    val src = Seq((1L, Some("a"), Some(1.5)), (2L, None, None), (3L, Some("c"), Some(-0.5)))
      .toDF("id", "s", "d")
    src.write.mode(SaveMode.Overwrite).format("graft-avro").save(out)
    val back = spark.read.format("graft-avro").load(out).orderBy("id").collect()
    assert(back(1).isNullAt(1) && back(1).isNullAt(2))
    assert(back(0).getString(1) == "a" && back(2).getDouble(2) == -0.5)
  }

  test("column pruning reaches the scan's readSchema") {
    val out = tmp("prune")
    Tables.t(spark, sf, "orders").write.mode(SaveMode.Overwrite)
      .format("graft-avro").save(out)
    val df = spark.read.format("graft-avro").load(out).select("o_orderkey")
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    val readCols = scans.head.scan.readSchema().fieldNames.toSeq
    assert(readCols == Seq("o_orderkey"),
      s"pruning failed — scan reads $readCols")
  }

  test("parallelism: one writer task per partition → one reader partition per file") {
    val out = tmp("parts")
    Tables.t(spark, sf, "orders").repartition(3)
      .write.mode(SaveMode.Overwrite).format("graft-avro").save(out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 3, s"expected 3 container files, got ${files.length}")
    val back = spark.read.format("graft-avro").load(out)
    assert(back.rdd.getNumPartitions == 3)
  }
}
