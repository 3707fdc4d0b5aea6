package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7 (plan). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Tpch.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Tpch.queries ++ operators.Job.queries ++
      operators.Relational.queries ++
      operators.FunctionLib.queries ++ operators.NativeOps.queries ++
      operators.Dedup.queries ++ operators.Similarity.queries ++
      operators.TextAnalysis.queries ++ operators.ClickBench.queries ++
      operators.Multimodal.queries ++ operators.Pipeline.queries ++
      sources.Sources.queries

  /** DuckDB-runnable oracle SQL per query key (same column names/rounding as
    * the Spark side — SURVEY.md §4). Keys absent here get rows-only checks. */
  def oracleSql: Map[String, String] =
    operators.Tpch.oracle ++ operators.Job.oracle ++
      operators.Relational.oracle ++
      operators.FunctionLib.oracle ++ operators.NativeOps.oracle ++
      operators.Dedup.oracle ++ operators.Similarity.oracle ++
      operators.TextAnalysis.oracle ++ operators.ClickBench.oracle ++
      operators.Multimodal.oracle ++ operators.Pipeline.oracle ++
      sources.Sources.oracle
}
