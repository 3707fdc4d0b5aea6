package graft

import graft.operators.{MediaRow, Multimodal}
import org.apache.spark.sql.functions._

/** §2.8: the multimodal plumbing around the stubbed decoder is real —
  * schema, batching, partition preservation, determinism. */
class MultimodalSpec extends SparkSpec {

  test("media frame has the binary payload + typed metadata schema") {
    val df = Multimodal.mediaFrame(spark, sf)
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("payload") == "binary")
    assert(types("width") == "int" && types("height") == "int")
    assert(df.filter(col("width") < 64 || col("width") >= 512).count() == 0)
  }

  test("m_decode_stub preserves row count and is deterministic") {
    val a = Multimodal.mDecodeStub(spark, sf).collect()
    val b = Multimodal.mDecodeStub(spark, sf).collect()
    assert(a.length == Tables.t(spark, sf, "documents").count())
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("decode pass is partition-local (no shuffle, partitions preserved)") {
    import spark.implicits._
    // partition count survives the decode pass (narrow transform)
    val media7 = Multimodal.mediaFrame(spark, sf).repartition(7).as[MediaRow]
    assert(Multimodal.decodeAll(media7).rdd.getNumPartitions == 7)
    // and the decode itself introduces no Exchange beyond the scan
    val decoded = Multimodal.decodeAll(Multimodal.mediaFrame(spark, sf).as[MediaRow])
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in decode:\n$plan")
  }

  test("checksum identifies identical payloads and separates distinct ones") {
    val feats = Multimodal.mDecodeStub(spark, sf)
    val n = feats.count()
    // corpus texts are all distinct → all checksums distinct
    assert(feats.select("checksum").distinct().count() == n)
    // and equal payloads hash equal: decode a copy, join, compare
    val again = Multimodal.mDecodeStub(spark, sf)
      .withColumnRenamed("checksum", "checksum2").select("doc_id", "checksum2")
    assert(feats.join(again, "doc_id")
      .filter(col("checksum") =!= col("checksum2")).count() == 0)
  }

  test("m_resize_stub samples half the bytes; m_frame_sample keeps every 4th frame") {
    val media = Multimodal.mediaFrame(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload").length).toMap
    Multimodal.mResizeStub(spark, sf).collect().foreach { r =>
      val full = media(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("n_sampled") == (full + 1) / 2)
    }
    val frames = Multimodal.mFrameSample(spark, sf)
    frames.collect().groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rows) =>
      val expect = (math.ceil(media(id) / 64.0).toInt + 3) / 4
      assert(rows.length == expect, s"doc $id: ${rows.length} frames, expected $expect")
      assert(rows.forall(_.getAs[Int]("frame_idx") % 4 == 0))
    }
  }

  test("histogram is a probability distribution over byte buckets") {
    val rows = Multimodal.mDecodeStub(spark, sf).collect()
    rows.foreach { r =>
      val h = r.getAs[String]("histogram").split(",").map(_.toDouble)
      assert(h.length == 8 && math.abs(h.sum - 1.0) < 0.01)
      assert(r.getAs[Double]("brightness") >= 0 && r.getAs[Double]("brightness") <= 255)
    }
  }
}
