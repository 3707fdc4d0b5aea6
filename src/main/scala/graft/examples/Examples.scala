package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AnnApi, DedupApi, MediaApi, PipelineApi, TextApi}

/** Worked examples — one per `graft.api` façade (VERDICT r11 #8), written
  * against frames with CALLER column names (never the gate's canonical
  * ones) so they demonstrate the real integration surface. Each compiles
  * with the build and runs in ExamplesSpec against the bundled testdata,
  * so the README can point here without the examples rotting.
  *
  * Run them all: `runMain graft.examples.Examples /root/testdata/sf0.001`.
  */
object Examples {

  /** TextApi: score quality, then keep only docs that pass the Gopher
    * rules — the standard first two stages of a pretraining filter. */
  def textQualityPipeline(spark: SparkSession, myDocs: DataFrame): DataFrame = {
    // myDocs has (id, body) — any names work, you declare them per call
    val scored = TextApi.quality(myDocs, idCol = "id", textCol = "body")
    val gopher = TextApi.gopherFilter(myDocs, idCol = "id", textCol = "body")
    scored.join(gopher.filter(col("keep")).select("doc_id"), "doc_id")
  }

  /** DedupApi: minhash near-dup pairs → transitive clusters → keep one
    * representative per cluster. `persistIntermediate = false` trades
    * recompute for zero cache footprint — the 100 TB spelling. */
  def dedupKeepRepresentatives(spark: SparkSession, myDocs: DataFrame): DataFrame = {
    val clusters = DedupApi.nearDupClusters(myDocs, minJaccard = 0.5,
      idCol = "id", textCol = "body", persistIntermediate = false)
    // one survivor per cluster: the smallest doc id
    val drop = clusters.groupBy("cluster_id")
      .agg(min("doc_id").as("keep_id"), collect_set("doc_id").as("members"))
      .select(explode(col("members")).as("doc_id"), col("keep_id"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select("doc_id")
    myDocs.join(drop.withColumnRenamed("doc_id", "id"), Seq("id"), "left_anti")
  }

  /** AnnApi: the full IVFADC lifecycle — train, encode, store, serve —
    * under an explicit metric. For cosine with non-unit embeddings,
    * L2-normalize first (see AnnApi.encodeIndex's contract). */
  def annLifecycle(spark: SparkSession, myVecs: DataFrame,
      myQueries: DataFrame, indexPath: String): DataFrame = {
    val metric = "l2" // or "cosine" (normalize first) or "ip"
    val quantizer = AnnApi.trainIvf(myVecs, cells = 16,
      idCol = "id", vecCol = "emb", metric = metric)
    val books = AnnApi.trainPq(myVecs, dim = 64, segments = 8, codebook = 16,
      idCol = "id", vecCol = "emb")
    val index = AnnApi.encodeIndex(myVecs, quantizer, books, segments = 8,
      idCol = "id", vecCol = "emb", metric = metric)
    AnnApi.writeIndex(index, indexPath)
    AnnApi.serveFromStore(myQueries, indexPath, quantizer, books,
      nprobe = 4, segments = 8, queryId = "id", queryVec = "emb",
      metric = metric)
  }

  /** PipelineApi: GPT-style sequence packing plus a leak-free train/val
    * split — near-dup documents never straddle the split. */
  def packAndSplit(spark: SparkSession, myDocs: DataFrame): (DataFrame, DataFrame) = {
    val packed = PipelineApi.pack(myDocs, idCol = "id", textCol = "body")
    val split = PipelineApi.splitLeakfree(myDocs, minJaccard = 0.5,
      idCol = "id", textCol = "body")
    (packed, split)
  }

  /** MediaApi: decode image bytes (PPM) into per-image features and find
    * near-duplicate images by perceptual hash. */
  def imageDedup(spark: SparkSession, myImages: DataFrame): DataFrame = {
    val hashes = MediaApi.imageHashes(myImages, idCol = "id", bytesCol = "png")
    MediaApi.imageDupPairs(hashes)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Graft.session("local[4]", "graft-examples")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"), col("text").as("body"))
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    println(s"quality+gopher: ${textQualityPipeline(spark, docs).count()} docs kept")
    println(s"dedup survivors: ${dedupKeepRepresentatives(spark, docs).count()}")
    val topk = annLifecycle(spark, vecs, vecs.limit(3), "target/examples_ann")
    println(s"ann top-k rows: ${topk.count()}")
    val (packed, split) = packAndSplit(spark, docs)
    println(s"packed: ${packed.count()} rows; split: ${split.count()} rows")
    spark.stop()
  }
}
