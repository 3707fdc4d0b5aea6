package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * All queries take `(spark, sfDir)` and read parquet directly — at cluster
  * scale these would be catalog tables over partitioned object-store prefixes;
  * reading via `spark.read.parquet` keeps the same Catalyst scan node
  * (`FileSourceScanExec`) with predicate pushdown and column pruning intact.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two parquet generations: TIMESTAMP(NANOS)
    * (which Spark's reader rejects → read nanos-as-long, truncate to micros,
    * identical to what DuckDB — whose TIMESTAMP is µs — sees) and plain
    * TIMESTAMP(MICROS) without timezone (reads as TIMESTAMP_NTZ → cast to
    * the session-UTC instant type every consumer expects). Branch on the
    * LOADED type instead of assuming one generation: round 8 lost 57 suites
    * to the unconditional `ts div 1000` failing analysis on TIMESTAMP_NTZ. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", normalizeTs(raw.schema("ts").dataType))
  }

  /** ts-column normalizer shared by the batch reader and the streaming specs:
    * nanos-as-long → µs instant; NTZ µs → instant (session is pinned UTC, so
    * the wall-clock values are bit-identical to the DuckDB oracle's). */
  def normalizeTs(loaded: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    loaded match {
      case LongType         => expr("timestamp_micros(ts div 1000)")
      case TimestampNTZType => col("ts").cast(TimestampType)
      case _                => col("ts")
    }
  }

  /** Streaming read of an events-shaped parquet directory with the same
    * generation-adaptive ts handling as [[events]]. Streaming requires an
    * explicit schema, so the on-disk schema is probed with a one-off batch
    * read (footer-only — no data scan). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = spark.read.parquet(dir).schema
    spark.readStream.schema(onDisk).parquet(dir)
      .withColumn("ts", normalizeTs(onDisk("ts").dataType))
  }

  /** Register every table as a temp view named after itself, so query code
    * can use `spark.sql` with the same table names the DuckDB oracle sees. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
