package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.streaming.{Event, Streaming}
import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** §2.9: Structured Streaming operators, file source → memory sink with an
  * AvailableNow trigger, checked for equivalence with the batch operators. */
class StreamingSpec extends SparkSpec {

  private lazy val streamDir: String = {
    val d = Paths.get("target/stream_in")
    Files.createDirectories(d)
    Files.copy(Paths.get(s"$sf/events.parquet"), d.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    d.toAbsolutePath.toString
  }

  /** Stream of events with the same ns→µs ts conversion as Tables.events. */
  private def eventStream: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.readStream.schema(schema).parquet(streamDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop() // no-op if AvailableNow already finished; avoids shutdown races
  }

  test("st_tumbling_agg matches the batch tumbling aggregate") {
    runToMemory(Streaming.tumblingAgg(eventStream), "tumbling", "append")
    val streamed = spark.table("tumbling")
    val batch = Relational.eTumbling(spark, sf)
    // append mode emits only watermark-closed windows; every emitted window
    // must match batch exactly, and most windows must have been emitted
    val joined = streamed.as("s").join(batch.as("b"),
      col("s.hour") === col("b.hour") && col("s.event_type") === col("b.event_type"))
    assert(joined.filter(col("s.n") =!= col("b.n") ||
      col("s.sum_value") =!= col("b.sum_value")).count() == 0)
    val emitted = streamed.count()
    val total = batch.count()
    assert(emitted >= total - 10, s"only $emitted of $total windows closed")
  }

  test("st_enrich stream-static broadcast join equals the batch join") {
    val dim = Tables.t(spark, sf, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    runToMemory(Streaming.enrich(eventStream, dim)
      .select("event_id", "user_id", "segment"), "enriched", "append")
    val streamed = spark.table("enriched")
    val batch = Tables.t(spark, sf, "events")
      .join(broadcast(dim), Seq("user_id"), "left")
      .select("event_id", "user_id", "segment")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // left join: events with no matching dim row must still flow through
    assert(streamed.filter(col("segment").isNull).count() ==
      batch.filter(col("segment").isNull).count())
  }

  test("st_join stream-stream range join equals the batch join") {
    val clicks = eventStream.filter(col("event_type") === "click")
    val purchases = eventStream.filter(col("event_type") === "purchase")
    runToMemory(Streaming.streamStreamJoin(clicks, purchases)
      .select("purchase_id", "click_id"), "ssjoin", "append")
    val streamed = spark.table("ssjoin")

    val ev = Tables.t(spark, sf, "events")
    val bc = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val bp = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val batch = bp.join(bc, expr(
      """user_id = c_user AND
        |click_ts <= purchase_ts AND
        |click_ts >= purchase_ts - INTERVAL 1 HOUR""".stripMargin))
      .select("purchase_id", "click_id")
    // inner stream-stream join with both sides watermarked: every batch
    // pair must be emitted once the watermark closes — with AvailableNow
    // over a finite file source some trailing pairs can stay buffered, so
    // assert subset + near-complete coverage and no duplicates
    assert(streamed.exceptAll(batch).count() == 0,
      "stream join emitted a pair the batch join doesn't have")
    val nStream = streamed.count(); val nBatch = batch.count()
    assert(nBatch > 0 && nStream >= (nBatch * 0.9).toLong,
      s"stream join emitted only $nStream of $nBatch pairs")
    assert(streamed.distinct().count() == nStream, "duplicate joined pairs")
  }

  test("st_session_state sessionization matches batch gaps-and-islands") {
    import spark.implicits._
    runToMemory(Streaming.sessionize(eventStream.as[Event]).toDF(),
      "sessions", "append")
    val streamed = spark.table("sessions")
    val batch = Relational.eSession(spark, sf)
    // closed sessions must be a subset of batch sessions with equal stats
    val joined = streamed.as("s").join(batch.as("b"),
      col("s.user_id") === col("b.user_id") &&
      col("s.session_start") === col("b.session_start"))
    assert(joined.count() == streamed.count(), "streamed session missing from batch")
    assert(joined.filter(col("s.n_events") =!= col("b.n_events")).count() == 0)
    // with a single AvailableNow batch the last session per user stays open:
    val users = streamed.select("user_id").distinct().count()
    assert(streamed.count() >= batch.count() - users,
      s"too few closed sessions: ${streamed.count()} vs batch ${batch.count()}")
  }

  test("st_session_state runs on the RocksDB state store (the 100 TB-grade provider)") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      runToMemory(Streaming.sessionize(eventStream.as[Event]).toDF(),
        "sessions_rocks", "append")
      val rocks = spark.table("sessions_rocks").count()
      assert(rocks > 0, "no sessions emitted under RocksDB state store")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("st_dedup streaming dropDuplicates equals batch distinct-by-key") {
    // feed the stream the events file TWICE → every event_id is a duplicate;
    // the streaming dedup must recover exactly the batch-distinct set
    val d = Paths.get("target/stream_dedup_in")
    Files.createDirectories(d)
    Files.copy(Paths.get(s"$sf/events.parquet"), d.resolve("a.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$sf/events.parquet"), d.resolve("b.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream.schema(schema)
      .parquet(d.toAbsolutePath.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    runToMemory(Streaming.dedupStream(stream), "dedup", "append")
    val streamed = spark.table("dedup")
    val batchN = Tables.t(spark, sf, "events").select("event_id").distinct().count()
    assert(streamed.count() == batchN,
      s"streaming dedup kept ${streamed.count()} of $batchN distinct events")
    assert(streamed.select("event_id").distinct().count() == batchN)
  }

  test("sessionizeBatch equals the declarative batch sessionization exactly") {
    import spark.implicits._
    val viaState = Streaming.sessionizeBatch(
      Tables.t(spark, sf, "events").select("event_id", "ts", "user_id", "event_type", "value")
        .as[Event]).toDF()
    val batch = Relational.eSession(spark, sf)
    assert(viaState.count() == batch.count())
    val j = viaState.as("s").join(batch.as("b"),
      col("s.user_id") === col("b.user_id") &&
      col("s.session_start") === col("b.session_start"))
    assert(j.count() == batch.count())
    assert(j.filter(col("s.n_events") =!= col("b.n_events") ||
      col("s.session_end") =!= col("b.session_end")).count() == 0)
  }
}
