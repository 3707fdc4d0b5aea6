package graft

import graft.operators.ClickBench

/** §2.3b: run + shape checks; value gate = DuckDB oracle. */
class ClickBenchSpec extends SparkSpec {
  ClickBench.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }

  test("cb_h2o_gb_sums: each grouping-sets rung matches its direct groupBy " +
    "(the ladder is one shuffle, not six scans glued together)") {
    import org.apache.spark.sql.functions._
    val rows = ClickBench.cbH2oGbSums(spark, sf01).collect()
    val gids = rows.map(_.getAs[Int]("gid")).toSet
    // six rungs: q1 (id1)=31, q2 (id1,id2)=15, q3 (id3)=55, q4 (id4)=59,
    // q5 (id6)=62, q10 (all six)=0
    assert(gids == Set(31, 15, 55, 59, 62, 0), s"unexpected rungs: $gids")
    // the q1 rung must equal a plain GROUP BY id1 sum
    val rung1 = rows.filter(_.getAs[Int]("gid") == 31)
      .map(r => r.getAs[String]("id1") -> r.getAs[Long]("sum_v1")).toMap
    val direct = Tables.t(spark, sf01, "events")
      .groupBy(col("event_type"))
      .agg(sum(floor(col("value")).cast("long")).as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rung1 == direct, s"q1 rung diverges: $rung1 vs $direct")
    // grouped-away keys are sentinels on the q1 rung
    rows.filter(_.getAs[Int]("gid") == 31).foreach { r =>
      assert(r.getAs[String]("id2") == "ALL" && r.getAs[Int]("id4") == -1 &&
        r.getAs[Long]("id6") == -1L)
    }
  }

  test("ea_distinct: forcing the hash aggregate's sort-based fallback " +
    "(the memory-pressure spill path) changes neither distinct count, and " +
    "the fallback genuinely fires") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val unforced = ClickBench.eaDistinct(spark, sf01).collect().head
    // Spark's own memory-pressure test hook: after N keys the aggregation
    // map is destructed into an UnsafeKVExternalSorter — the exact code
    // path a genuine UnsafeFixedWidthAggregationMap allocation failure
    // takes (checkFallbackForBytesToBytesMap) — then refills and spills
    // again. 5000 against ~15k distinct pairs per task forces a few REAL
    // spill-merge cycles per task. (A 0 threshold respills per row —
    // tens of thousands of sorter merges — and OOMs even small inputs;
    // that is the hook abused, not memory pressure simulated.)
    val conf = "spark.sql.TungstenAggregate.testFallbackStartsAt"
    spark.conf.set(conf, "5000,5000")
    try {
      val df = ClickBench.eaDistinct(spark, sf01)
      val forced = df.collect().head
      assert(forced == unforced,
        s"spill path changed the answer: $forced vs $unforced")
      def fallbacks(p: SparkPlan): Long =
        p.metrics.collect { case ("numTasksFallBacked", m) => m.value }.sum +
          p.children.map(fallbacks).sum + (p match {
            case a: AdaptiveSparkPlanExec => fallbacks(a.executedPlan)
            case q: QueryStageExec => fallbacks(q.plan)
            case _ => 0L
          })
      val fell = fallbacks(df.queryExecution.executedPlan)
      assert(fell > 0, "sort-based fallback did not fire on any task")
    } finally spark.conf.unset(conf)
  }

  test("cb_quantiles are ordered p50 <= p90 <= p99") {
    ClickBench.cbQuantiles(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
      assert(r.getAs[Double]("p90") <= r.getAs[Double]("p99"))
    }
  }

  test("cb_approx_pctl_grp: the approx_percentile variant tracks the exact tp95 per group") {
    // the oracled entry scores with EXACT percentile (q5's
    // APPROX_PERCENTILE_CONT sketch state can never hash-match across
    // engines); this pins the approx spelling — the one a 100 TB deployment
    // actually runs — to the exact result on the same groups
    import org.apache.spark.sql.functions._
    val rows = Tables.t(spark, sf01, "events")
      .filter(col("user_id") % 2 === 0 && col("value").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"),
        min("value").as("lo"), max("value").as("hi"),
        expr("percentile(value, 0.95)").as("exact95"),
        expr("approx_percentile(value, 0.95, 1000)").as("approx95"))
      .filter(col("c") > 1)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      val (ex, ap) = (r.getAs[Double]("exact95"), r.getAs[Double]("approx95"))
      assert(ap >= lo && ap <= hi, s"approx95 $ap outside group range [$lo, $hi]")
      // GK-sketch guarantee is on RANK error; on a value scale bound the
      // miss by a slice of the group's spread (loose, but fails on garbage)
      assert(math.abs(ap - ex) <= (hi - lo) * 0.25 + 1e-9,
        s"approx95 $ap too far from exact $ex in range [$lo, $hi]")
    }
  }
}
