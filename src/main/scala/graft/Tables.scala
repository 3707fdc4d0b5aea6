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

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's reader rejects;
    * read nanos as long and truncate to micros (identical to what DuckDB —
    * whose TIMESTAMP is µs — sees for the same file). */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Register every table as a temp view named after itself, so query code
    * can use `spark.sql` with the same table names the DuckDB oracle sees. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
