package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ClickBench-shaped interactive analytics over `events` (the reference
  * benchmarks ClickBench: /root/reference/benchmarks/src/clickbench.rs).
  * Top-N heavy-hitter, distinct-count and quantile aggregations — the three
  * query shapes that dominate that suite.
  *
  * 100 TB notes: all three are single partial-aggregatable shuffles on a
  * bounded key (user or type); the top-N is a TakeOrderedAndProject (no
  * global sort materialization).
  */
object ClickBench {

  private def ev(spark: SparkSession, dir: String) = Tables.t(spark, dir, "events")

  /** Heavy hitters: top-10 users by event count. */
  def cbTopUsers(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .orderBy(desc("n"), asc("user_id"))
      .limit(10)

  val cbTopUsersSql: String =
    """SELECT user_id, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY user_id
      |ORDER BY n DESC, user_id LIMIT 10""".stripMargin

  /** Distinct users and events per type. */
  def cbUniqUsers(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("uniq_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")

  val cbUniqUsersSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS uniq_users, count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Value quantiles per event type (exact percentiles). */
  def cbQuantiles(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy("event_type")
      .agg(
        round(percentile(col("value"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value"), lit(0.9)), 4).as("p90"),
        round(percentile(col("value"), lit(0.99)), 4).as("p99"))
      .orderBy("event_type")

  val cbQuantilesSql: String =
    """SELECT event_type,
      |  round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS p50,
      |  round(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS p90,
      |  round(CAST(quantile_cont(value, 0.99) AS DOUBLE), 4) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cb_top_users" -> (cbTopUsers _), "cb_uniq_users" -> (cbUniqUsers _),
    "cb_quantiles" -> (cbQuantiles _))

  val oracle: Map[String, String] = Map(
    "cb_top_users" -> cbTopUsersSql, "cb_uniq_users" -> cbUniqUsersSql,
    "cb_quantiles" -> cbQuantilesSql)
}
