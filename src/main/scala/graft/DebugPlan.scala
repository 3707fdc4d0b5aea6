package graft

import org.apache.spark.sql.SparkSession

/** Plan-debugging main (round 16): dump a JOB family's optimized LOGICAL
  * plan under CBO — the exact tree the post-reorder rules
  * (MeasuredDimPlacement / ResidualJoinPlacement / FactMergeGuard)
  * receive — plus per-join child estimates. This is how the
  * FactMergeGuard gates were diagnosed (BASELINE.md r16: the bushy
  * self-merge's leg estimate sat below the first fact floor, and
  * JoinEstimation priced the bushy product BELOW the linear thread,
  * proving an estimate-margin gate circular).
  *
  * Usage: runMain graft.DebugPlan <scaleDir> <family>
  */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val fam = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.enableCbo(spark, dir)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    // GRAFT_RULES=off: disable the three post-reorder rules to isolate
    // the DP's own tree from the rules' rewrites
    if (sys.env.get("GRAFT_RULES").contains("off")) {
      spark.conf.set(functions.MeasuredDimPlacement.flag, "false")
      spark.conf.set(functions.ResidualJoinPlacement.flag, "false")
      spark.conf.set(functions.FactMergeGuard.flag, "false")
    }
    val handSql = operators.Job.oracle(fam)
    val sql = operators.Job.originalFrom.get(fam)
      .map(f => operators.Job.withFromOrder(handSql, f)).getOrElse(handSql)
    val df = spark.sql(sql)
    val opt = df.queryExecution.optimizedPlan
    println("=== OPTIMIZED LOGICAL ===")
    println(opt.treeString)
    println("=== STATS PER JOIN NODE ===")
    opt.foreach {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        println(s"Join cond=${j.condition} hint=${j.hint}")
        println(s"  left  ${j.left.getClass.getSimpleName} est=${j.left.stats.sizeInBytes}")
        println(s"  right ${j.right.getClass.getSimpleName} est=${j.right.stats.sizeInBytes}")
      case _ =>
    }
    spark.stop()
  }
}
