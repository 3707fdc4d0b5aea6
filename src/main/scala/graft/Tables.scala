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

  /** A provably-constant but NON-FOLDABLE partition key for SUMMARY-sized
    * windows (per-bucket offsets, ≤100-row vocab ranks, #sources shares):
    * every row lands in one partition — the design, since the frame is
    * model-sized by construction — while WindowExec's partitionSpec stays
    * non-empty, so its "No Partition Defined" WARN remains reserved for
    * ACCIDENTAL corpus-wide windows (the repo's loud-failure policy).
    * Spelled `pmod(c, 1)` — always 0 for any non-null numeric `c`, and no
    * optimizer rule reduces it: a plain `lit(0)` is stripped by
    * EliminateWindowPartitions, and `c * 0` is folded to 0 by
    * ReorderAssociativeOperator when `c` is an Aggregate output (both
    * verified against Spark 4.1 with planChangeLog, round 10), which
    * resurrects the WARN. The constant-0 contract is ENFORCED in code, not
    * by a docstring (ADVICE r10): `c` is coalesced to 0 (a null would hash
    * to its own partition) and truncated to LONG (pmod(1.5, 1) = 0.5 would
    * silently split the single summary partition), so ANY input column —
    * nullable, fractional — still lands every row in one frame. */
  def summaryKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{coalesce, lit, pmod}
    pmod(coalesce(c.cast("long"), lit(0L)), lit(1L))
  }
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
