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

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("p_e2e" -> (pE2e _), "p_sample" -> (pSample _),
      "p_token_budget" -> (pTokenBudget _))

  val oracle: Map[String, String] = Map("p_e2e" -> pE2eSql,
    "p_sample" -> pSampleSql, "p_token_budget" -> pTokenBudgetSql)
}
