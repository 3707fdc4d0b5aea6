package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A row of opaque media: payload bytes + typed metadata. */
case class MediaRow(doc_id: Long, payload: Array[Byte], format: String,
    width: Int, height: Int)

/** Decoded per-item features. */
case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: Long,
    brightness: Double, histogram: Seq[Double])

/** Multimodal column plumbing (SURVEY.md §2.8): image/audio/video handled as
  * opaque `binary` columns with typed metadata, decoded/feature-extracted in
  * batched partition-local passes — the Scala analogue of a Pandas-UDF
  * `mapInPandas` pipeline (same shape: schema in, batches through a
  * vectorized kernel, schema out; no shuffle, no driver involvement).
  *
  * The container has no image/audio codecs, so [[Multimodal.decodeStub]] is a
  * clearly-marked DETERMINISTIC STUB standing in for e.g. a JPEG decoder: it
  * consumes the real bytes and emits stable features (checksum, mean byte
  * value as "brightness", a byte-histogram as the "embedding"). Everything
  * around it — binary schema, metadata struct, batching, partition
  * preservation — is the real production plumbing and is spec-verified.
  *
  * 100 TB notes: payloads never leave their partition; the decode kernel is
  * per-batch (amortizing codec init exactly like Arrow batches do); output
  * rows are small fixed-width features, so the expensive bytes are dropped
  * before anything downstream shuffles.
  */
object Multimodal {

  val BatchSize = 64

  /** Assemble the media frame: documents' text bytes act as the opaque
    * payload; metadata derived deterministically from doc_id. */
  def mediaFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      when(col("doc_id") % 2 === 0, "img/fake-rgb").otherwise("img/fake-gray").as("format"),
      (lit(64) + pmod(col("doc_id"), lit(448))).cast("int").as("width"),
      (lit(64) + pmod(col("doc_id") * 7, lit(448))).cast("int").as("height"))

  /** ======== STUB: stands in for a real per-batch media decoder ========
    * A production build would decode `payload` with an image library here
    * (one codec init per batch). This stub derives deterministic features
    * from the raw bytes so the pipeline is fully testable without codecs. */
  def decodeStub(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val bytes = m.payload
      var checksum = 1469598103934665603L // FNV-1a over the payload
      var sum = 0L
      val hist = new Array[Double](8)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xFF
        checksum = (checksum ^ b) * 1099511628211L
        sum += b
        hist((b >> 5) & 7) += 1.0
        i += 1
      }
      val n = math.max(bytes.length, 1)
      MediaFeatures(m.doc_id, bytes.length, checksum,
        sum.toDouble / n, hist.map(_ / n).toSeq)
    }

  /** The batched partition-local decode pass (mapInPandas-shaped). */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BatchSize).flatMap(g => decodeStub(g.toSeq)))
  }

  /** m_decode_stub: end-to-end media pipeline. Rows-only gate (stub decode
    * has no SQL oracle); MultimodalSpec verifies determinism, counts,
    * partition preservation and checksum semantics. */
  def mDecodeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeAll(mediaFrame(spark, dir).as[MediaRow])
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("checksum"),
        round(col("brightness"), 4).as("brightness"),
        array_join(transform(col("histogram"), h => round(h, 4)), ",").as("histogram"))
      .orderBy("doc_id")
  }

  /** ======== STUB: stands in for a real resize kernel ========
    * Deterministic downsample: every stride-th byte, recomputed checksum.
    * Target dims derived from the metadata (half resolution). */
  def resizeStub(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val stride = 2
      var checksum = 1469598103934665603L
      var sum = 0L
      val hist = new Array[Double](8)
      var i = 0
      var n = 0
      while (i < m.payload.length) {
        val b = m.payload(i) & 0xFF
        checksum = (checksum ^ b) * 1099511628211L
        sum += b; hist((b >> 5) & 7) += 1.0; n += 1
        i += stride
      }
      MediaFeatures(m.doc_id, n, checksum,
        if (n == 0) 0.0 else sum.toDouble / n,
        hist.map(h => if (n == 0) 0.0 else h / n).toSeq)
    }

  /** m_resize_stub: the resize pass over the same media frame — payload
    * shrinks partition-locally BEFORE anything downstream shuffles (the
    * property that matters at 100 TB: resize early, move less). */
  def mResizeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaFrame(spark, dir).as[MediaRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => resizeStub(g.toSeq)))
      .toDF()
      .select(col("doc_id"), col("n_bytes").as("n_sampled"), col("checksum"),
        round(col("brightness"), 4).as("brightness"))
      .orderBy("doc_id")
  }

  /** m_frame_sample: treat the payload as a "video" of fixed-size frames,
    * keep every 4th frame (temporal subsampling), emit one row per kept
    * frame with a per-frame checksum. Row-explosion happens AFTER the
    * payload is cut down — output rows are small fixed-width records. */
  def mFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val FrameBytes = 64
    val EveryNth = 4
    mediaFrame(spark, dir).as[MediaRow]
      .mapPartitions(_.flatMap { m =>
        m.payload.grouped(FrameBytes).zipWithIndex
          .filter(_._2 % EveryNth == 0)
          .map { case (frame, idx) =>
            var checksum = 1469598103934665603L
            frame.foreach(b => checksum = (checksum ^ (b & 0xFF)) * 1099511628211L)
            (m.doc_id, idx, frame.length, checksum)
          }
      })
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_checksum")
      .orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_decode_stub" -> (mDecodeStub _), "m_resize_stub" -> (mResizeStub _),
    "m_frame_sample" -> (mFrameSample _))

  val oracle: Map[String, String] = Map.empty
}
