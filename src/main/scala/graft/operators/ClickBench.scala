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

  /** Value histogram: fixed-width bins (arithmetic binning — DuckDB has no
    * width_bucket, the explicit floor is portable), per event type. The
    * dashboard-histogram shape: one partial-aggregated shuffle. */
  def cbHistogram(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .withColumn("bin", floor(col("value") / 10.0).cast("int"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bin")

  val cbHistogramSql: String =
    """SELECT event_type, CAST(floor(value / 10.0) AS INTEGER) AS bin,
      |       count(*) AS n
      |FROM events GROUP BY event_type, bin
      |ORDER BY event_type, bin""".stripMargin

  /** Heavy hitters by DISTINCT reach (top event types per distinct-user
    * count, with per-type rates) — the ClickBench "top pages by unique
    * visitors" shape: two-level aggregate, count-distinct inside. */
  def cbTopByUniq(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("uniq"),
        count(lit(1)).as("n"),
        round(count(lit(1)).cast("double") / countDistinct("user_id"), 4)
          .as("events_per_user"))
      .orderBy(desc("uniq"), asc("event_type"))
      .limit(5)

  val cbTopByUniqSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS uniq, count(*) AS n,
      |  round(CAST(count(*) AS DOUBLE) / count(DISTINCT user_id), 4)
      |    AS events_per_user
      |FROM events GROUP BY event_type
      |ORDER BY uniq DESC, event_type LIMIT 5""".stripMargin

  /** JOB/IMDB-shaped query (reference: benchmarks/src/imdb/): a selective
    * multi-join where predicates sit on several dimensions at once and join
    * order dominates cost — Catalyst reorders from the filtered sides. */
  def jobLike(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "part")
      .filter(col("p_size") < 15 && col("p_type") =!= "PROMO")
      .join(Tables.t(spark, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
      .join(Tables.t(spark, dir, "supplier").filter(col("s_acctbal") > 0),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.t(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"),
        round(min("l_extendedprice"), 2).as("min_price"),
        round(max("l_extendedprice"), 2).as("max_price"))
      .orderBy("n_name")

  val jobLikeSql: String =
    """SELECT n_name, count(*) AS n,
      |  round(min(l_extendedprice), 2) AS min_price,
      |  round(max(l_extendedprice), 2) AS max_price
      |FROM part, lineitem, supplier, orders, nation
      |WHERE p_partkey = l_partkey AND l_suppkey = s_suppkey
      |  AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
      |  AND p_size < 15 AND p_type <> 'PROMO'
      |  AND s_acctbal > 0 AND o_orderpriority = '1-URGENT'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ------------------------------------------------------------- cb_h2o_gb
  /** h2o-ai groupby shapes not covered elsewhere (reference
    * benchmarks/queries/h2o/groupby.sql q6/q7): exact MEDIAN + stddev per
    * group and max−min range per group, keyed per user — the
    * order-statistic-per-high-cardinality-key aggregate. Exact percentile
    * buffers per group are the deliberate cost (h2o semantics); at 100 TB
    * the same query swaps `percentile` for `approx_percentile` (a_approx)
    * when error tolerance allows — both run as one partial-aggregated
    * shuffle on user_id. */
  def cbH2oGb(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy("user_id")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("median_v"),
        round(stddev_samp(col("value")), 4).as("sd_v"),
        round(max("value") - min("value"), 4).as("range_v"),
        count(lit(1)).as("n"))
      .orderBy("user_id")

  val cbH2oGbSql: String =
    """SELECT user_id,
      |  round(median(value), 4) AS median_v,
      |  round(stddev_samp(value), 4) AS sd_v,
      |  round(max(value) - min(value), 4) AS range_v,
      |  count(*) AS n
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // --------------------------------------------------------- cb_salted_uniq
  /** Salted exact distinct-count — the manual hot-key mitigation for
    * aggregates (AQE splits skewed JOIN partitions, not skewed AGGREGATE
    * keys, and partial aggregation cannot shrink a distinct: the whole
    * distinct set of a hot key lands in one reducer). Phase 1 groups by
    * (key, hash(member) % S): each hot key's distinct space is partitioned
    * across S reducers, each holding 1/S of the state; because the salt is
    * a function of the DISTINCT MEMBER, per-salt distinct counts sum to the
    * exact global distinct. `event_type` has 5 values over all events —
    * maximal key skew — and the result is hash-checked against a plain
    * COUNT(DISTINCT). */
  val SaltBuckets = 16

  def cbSaltedUniq(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("event_type"),
        pmod(xxhash64(col("user_id")), lit(SaltBuckets)).as("salt"))
      .agg(countDistinct("user_id").as("d"), count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(sum("d").as("uniq_users"), sum("c").as("n_events"))
      .orderBy("event_type")

  val cbSaltedUniqSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS uniq_users,
      |       count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cb_h2o_gb" -> (cbH2oGb _), "cb_salted_uniq" -> (cbSaltedUniq _),
    "cb_top_users" -> (cbTopUsers _), "cb_uniq_users" -> (cbUniqUsers _),
    "cb_quantiles" -> (cbQuantiles _), "cb_histogram" -> (cbHistogram _),
    "cb_top_by_uniq" -> (cbTopByUniq _), "job_like" -> (jobLike _))

  val oracle: Map[String, String] = Map(
    "cb_h2o_gb" -> cbH2oGbSql, "cb_salted_uniq" -> cbSaltedUniqSql,
    "cb_top_users" -> cbTopUsersSql, "cb_uniq_users" -> cbUniqUsersSql,
    "cb_quantiles" -> cbQuantilesSql, "cb_histogram" -> cbHistogramSql,
    "cb_top_by_uniq" -> cbTopByUniqSql, "job_like" -> jobLikeSql)
}
