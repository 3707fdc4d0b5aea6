package graft

import graft.examples.Examples
import org.apache.spark.sql.functions._

/** The README's worked examples (graft.examples.Examples) must keep
  * running against the bundled testdata — a doc example that rots is
  * worse than none (VERDICT r11 #8). */
class ExamplesSpec extends SparkSpec {

  private def docs = Tables.t(spark, sf, "documents")
    .select(col("doc_id").as("id"), col("text").as("body"))
  private def vecs = Tables.t(spark, sf, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("emb"))

  test("text quality pipeline example: kept docs carry quality metrics") {
    val kept = Examples.textQualityPipeline(spark, docs)
    assert(kept.count() > 0, "gopher filter rejected everything")
    assert(kept.columns.contains("doc_id"))
  }

  test("dedup example: survivors unique per near-dup cluster, none lost") {
    val planted = operators.Dedup.withPlantedNear(
        Tables.t(spark, sf, "documents"))
      .select(col("doc_id").as("id"), col("text").as("body"))
    val survivors = Examples.dedupKeepRepresentatives(spark, planted)
    assert(survivors.count() > 0 && survivors.count() < planted.count(),
      "dedup example dropped nothing (planted dups exist)")
  }

  test("ann lifecycle example: k results per query from the stored index") {
    val served = Examples.annLifecycle(spark, vecs, vecs.limit(3),
      "target/examples_spec_ann")
    val perQ = served.groupBy("qid").count().collect()
    assert(perQ.length == 3 && perQ.forall(_.getLong(1) == 10L),
      s"expected 3 queries x 10 rows: ${perQ.mkString(",")}")
  }

  test("pack and leak-free split example: both frames materialize") {
    val (packed, split) = Examples.packAndSplit(spark, docs)
    assert(packed.count() > 0 && split.count() > 0)
    assert(split.columns.contains("split"))
  }
}
