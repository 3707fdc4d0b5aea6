package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end training-data pipeline composite (SURVEY §2.5–§2.7): the
  * operators composed the way a real corpus build uses them —
  *
  *   normalize → exact-dedup on normalized text → quality filter →
  *   per-source corpus stats
  *
  * in ONE Catalyst plan: the normalize/filter stages fuse into the scan
  * (narrow, codegen'd), dedup is the single hash shuffle, and the final
  * stats aggregate is partial-aggregated. Entirely SQL-expressible, so
  * unlike the individual fuzzy-dedup operators this composite is
  * hash-checked against DuckDB end to end. */
object Pipeline {

  def pE2e(spark: SparkSession, dir: String): DataFrame = {
    val norm = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9\\s]", ""), "\\s+", " ")).as("t"))
    val deduped = norm
      .groupBy("t")
      .agg(min("doc_id").as("doc_id"), min_by(col("source"), col("doc_id")).as("source"))
    deduped
      .withColumn("n_words", size(split(col("t"), " ")))
      .filter(col("n_words") >= 5)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        round(avg(length(col("t"))), 2).as("avg_chars"))
      .orderBy("source")
  }

  val pE2eSql: String =
    """WITH norm AS (
      |  SELECT doc_id, source,
      |    trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS t
      |  FROM documents),
      |deduped AS (
      |  SELECT t, min(doc_id) AS doc_id, arg_min(source, doc_id) AS source
      |  FROM norm GROUP BY t),
      |kept AS (
      |  SELECT source, t, len(string_split(t, ' ')) AS n_words
      |  FROM deduped WHERE len(string_split(t, ' ')) >= 5)
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(n_words) AS BIGINT) AS total_words,
      |       round(avg(length(t)), 2) AS avg_chars
      |FROM kept GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p_sample
  /** Deterministic stratified sampling — the source-mixing step of a corpus
    * build ("web at 25%, curated at 75%"). The keep decision is a pure
    * function of the document CONTENT (md5 prefix vs a per-source
    * threshold), so it is reproducible across runs and clusters, stable
    * under repartitioning, and needs no RNG state — the property that makes
    * a 100 TB mixing job restartable and auditable (`rand()` sampling is
    * none of those). Hex-prefix thresholds: '3f' ≈ 25%, 'bf' ≈ 75%; md5 hex
    * is lowercase in both engines so the string compare is portable.
    * Narrow filter, no shuffle. */
  def pSample(spark: SparkSession, dir: String): DataFrame = {
    val srcNum = expr("CAST(substring(source, 4, 10) AS INT)")
    val thr = when(srcNum % 2 === 0, lit("3f")).otherwise(lit("bf"))
    Tables.t(spark, dir, "documents")
      .filter(substring(md5(col("text").cast("binary")), 1, 2) <= thr)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  val pSampleSql: String =
    """SELECT doc_id, source FROM documents
      |WHERE substring(md5(text), 1, 2) <=
      |  CASE WHEN CAST(substring(source, 4, 10) AS INT) % 2 = 0
      |       THEN '3f' ELSE 'bf' END
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- p_token_budget
  /** Budget-constrained source mixing — the "N billion tokens per source"
    * allocation step of a corpus build: within each source, take documents
    * in priority order (longest first, deterministic tie-break) until the
    * source's token budget is exhausted. One window shuffle on `source`
    * (running token total), then a pure filter — the cumulative-sum
    * formulation needs no iteration and no driver state. Per-source budgets
    * derive from the source id (even sources 800 tokens, odd 400) the same
    * deterministic way p_sample derives its rates.
    *
    * 100 TB note: the window partitions by source, so a corpus with FEW
    * giant sources would skew; the production form adds a salt level
    * (budget per (source, shard) then a tiny per-source reconciliation
    * pass). At realistic source cardinality (domains, crawls, datasets) the
    * per-source window is the right single-shuffle plan. */
  def pTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val srcNum = expr("CAST(substring(source, 4, 10) AS INT)")
    val budget = when(srcNum % 2 === 0, lit(800)).otherwise(lit(400))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(desc("toks"), asc("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("toks"))
      .withColumn("cum_toks", sum("toks").over(w))
      .filter(col("cum_toks") <= budget)
      .select("source", "doc_id", "toks", "cum_toks")
      .orderBy("source", "cum_toks")
  }

  val pTokenBudgetSql: String =
    """WITH d AS (SELECT doc_id, source,
      |             len(string_split(text, ' ')) AS toks FROM documents),
      |c AS (SELECT doc_id, source, toks,
      |        sum(toks) OVER (PARTITION BY source
      |                        ORDER BY toks DESC, doc_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS cum_toks
      |      FROM d)
      |SELECT source, doc_id, CAST(toks AS INTEGER) AS toks,
      |       CAST(cum_toks AS BIGINT) AS cum_toks
      |FROM c
      |WHERE cum_toks <= CASE WHEN CAST(substring(source, 4, 10) AS INT) % 2 = 0
      |                       THEN 800 ELSE 400 END
      |ORDER BY source, cum_toks""".stripMargin

  // ---------------------------------------------------------------- p_pack
  /** Sequence packing — the pretraining step that lays documents out as one
    * continuous token stream and cuts it into fixed context windows
    * (GPT-style packing: a doc belongs to the window its first token lands
    * in; windows hold multiple short docs, long docs straddle). Output is
    * the per-window manifest (window_id, docs, token count) a loader needs.
    *
    * The naive spelling is a GLOBAL running token total — one window over
    * the full doc_id order = Exchange SinglePartition of the corpus, the
    * unscalable plan shape cb_h2o_win exists to avoid. This implementation
    * is a TWO-LEVEL PREFIX SCAN instead: (1) within-bucket cumulative sums
    * (window partitioned by bucket = doc_id / B — B-bounded partitions,
    * fully parallel), (2) per-bucket totals cumulated in a second window
    * over the BUCKET SUMMARY (n/B rows — the only single-partition step,
    * and it never touches the corpus), broadcast-joined back as offsets.
    * start(doc) = bucket_offset + within_bucket_cum − toks; window_id =
    * floor(start / L). Sizing rule: B ≈ √n balances the two levels (both
    * 10^5 at 10^10 docs); a deeper corpus recurses the summary level the
    * same way. PlanAuditSpec pins: corpus window hash-partitioned by
    * bucket, offsets broadcast, exactly one single-partition window (the
    * summary). The DuckDB oracle is the naive global cumsum — same
    * result, which is the point: the two-level scan is a pure plan
    * transformation. */
  val PackWindow = 2048
  val PackBucket = 100L

  def pPack(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Long.MinValue, 0)
    val d = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), floor(col("doc_id") / PackBucket).as("bucket"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val withCum = d.withColumn("cum", sum("toks").over(w))
    val bucketTotals = d.groupBy("bucket").agg(sum("toks").as("btoks"))
    val wb = org.apache.spark.sql.expressions.Window
      .orderBy("bucket").rowsBetween(Long.MinValue, -1)
    val offsets = bucketTotals
      .withColumn("boff", coalesce(sum("btoks").over(wb), lit(0L)))
      .select("bucket", "boff")
    withCum.join(broadcast(offsets), "bucket")
      .withColumn("start", col("boff") + col("cum") - col("toks"))
      .withColumn("window_id", floor(col("start") / PackWindow))
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("doc_lo"), max("doc_id").as("doc_hi"),
        sum("toks").as("win_toks"))
      .orderBy("window_id")
  }

  val pPackSql: String =
    s"""WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS toks
       |           FROM documents),
       |c AS (SELECT doc_id, toks,
       |        sum(toks) OVER (ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks
       |          AS start
       |      FROM d)
       |SELECT CAST(floor(start / $PackWindow) AS BIGINT) AS window_id,
       |       count(*) AS n_docs, min(doc_id) AS doc_lo, max(doc_id) AS doc_hi,
       |       CAST(sum(toks) AS BIGINT) AS win_toks
       |FROM c GROUP BY window_id ORDER BY window_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("p_e2e" -> (pE2e _), "p_sample" -> (pSample _),
      "p_token_budget" -> (pTokenBudget _), "p_pack" -> (pPack _))

  val oracle: Map[String, String] = Map("p_e2e" -> pE2eSql,
    "p_sample" -> pSampleSql, "p_token_budget" -> pTokenBudgetSql,
    "p_pack" -> pPackSql)
}
