package graft

import graft.functions.MeasuredDimPlacement
import graft.operators.Job
import org.apache.spark.sql.catalyst.expressions.EqualTo
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LeafNode, LogicalPlan}

/** VERDICT r14 #1: the MeasuredDimPlacement optimizer rule closes the
  * job_3a CBO miss (LIKE-blind DP ordering). Spark's FilterEstimation
  * gives LIKE/contains no selectivity, so the DP orders the pattern-gated
  * part dim LAST; the rule MEASURES the filtered dim (cached count) and,
  * when the measured bytes clear the broadcast threshold, sinks the dim
  * join to the lowest covering point of the fact side with a BROADCAST
  * hint — the hand-ordered text's plan, derived from data. This spec pins
  * (a) the plan change — under CBO the part⋈lineitem join sits at the
  * BOTTOM (its subtree scans only part + one lineitem role, no orders)
  * and carries the broadcast hint; (b) the gates — no pattern predicate /
  * measured-above-threshold / kill switch each leave the plan alone; and
  * (c) result identity rule-on vs rule-off (pure inner-join reassociation
  * plus a strategy hint). The wall-clock story (1.4–1.6× → 1.00× at 100×,
  * alternated min-of-3) lives in BASELINE.md round-15. */
class MeasuredDimPlacementSpec extends SparkSpec {

  private val cboTables = Seq("part", "orders", "lineitem")

  private def leafNames(plan: LogicalPlan): Seq[String] =
    plan.collect { case l: LeafNode => l.toString }

  /** Joins whose condition carries a p_partkey equality (the part dim
    * edge in job_3a's web). */
  private def partJoins(plan: LogicalPlan): Seq[Join] =
    plan.collect {
      case j @ Join(_, _, _, Some(c), _)
          if c.exists {
            case EqualTo(a, b) =>
              (a.references ++ b.references).exists(_.name == "p_partkey")
            case _ => false
          } => j
    }

  private def withCbo[A](body: => A): A = {
    val db = "spark_catalog.default"
    val before = Seq("spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      MeasuredDimPlacement.flag).map(k => k -> spark.conf.getOption(k))
    try {
      cboTables.foreach(spark.catalog.dropTempView)
      Graft.enableCbo(spark, sf, tables = cboTables)
      body
    } finally {
      cboTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $db.$t"))
      before.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) =>
          if (k.startsWith("spark.sql.cbo")) spark.conf.set(k, "false")
          else spark.conf.unset(k)
      }
      Tables.registerViews(spark, sf)
    }
  }

  test("under CBO the LIKE-gated part dim sinks to the bottom of the fact " +
    "side with a broadcast hint (the job_3a geometry)") {
    withCbo {
      spark.conf.set(MeasuredDimPlacement.flag, "true")
      val plan = spark.sql(Job.job3aSql).queryExecution.optimizedPlan
      val pjs = partJoins(plan)
      assert(pjs.nonEmpty, s"no join carries the p_partkey equality:\n$plan")
      // the LOWEST part join must scan only part + one lineitem role —
      // the fact is reduced before orders/l2 ever join
      val lowest = pjs.last
      val leaves = leafNames(lowest)
      assert(!leaves.exists(_.contains("orders")),
        s"part join still sits above the orders fanout:\n$plan")
      assert(pjs.exists(j => j.hint.leftHint.exists(_.strategy.nonEmpty) ||
        j.hint.rightHint.exists(_.strategy.nonEmpty)),
        s"no broadcast hint on the measured dim join:\n$plan")
      // physical confirmation: a BroadcastHashJoin on the partkey edge
      val phys = spark.sql(Job.job3aSql).queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastHashJoin") &&
        phys.contains("p_partkey"), s"no broadcast build on part:\n$phys")
    }
  }

  test("kill switch off: the plan is untouched") {
    withCbo {
      spark.conf.set(MeasuredDimPlacement.flag, "true")
      val on = spark.sql(Job.job3aSql).queryExecution.optimizedPlan
      spark.conf.set(MeasuredDimPlacement.flag, "false")
      val off = spark.sql(Job.job3aSql).queryExecution.optimizedPlan
      assert(on.canonicalized != off.canonicalized,
        "rule never fired — the on/off plans are identical, the spec is vacuous")
      assert(partJoins(off).forall(_.hint.leftHint.isEmpty) &&
        partJoins(off).forall(_.hint.rightHint.isEmpty),
        s"flag off but a hint survived:\n$off")
    }
  }

  test("measured size above the broadcast threshold: no rewrite (the " +
    "measurement gates, not the pattern alone)") {
    withCbo {
      spark.conf.set(MeasuredDimPlacement.flag, "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val gated = spark.sql(Job.job3aSql).queryExecution.optimizedPlan
      spark.conf.set(MeasuredDimPlacement.flag, "false")
      val off = spark.sql(Job.job3aSql).queryExecution.optimizedPlan
      assert(gated.canonicalized == off.canonicalized,
        s"rule fired despite a 1-byte threshold:\n$gated")
    }
  }

  test("no unestimable pattern on the dim: no rewrite (equality filters " +
    "are FilterEstimation's job, not ours)") {
    withCbo {
      // same web, but the part gate is an estimable equality — the DP
      // already sees its selectivity; the rule must stay out of the way
      val sql = Job.job3aSql.replace("p.p_name LIKE '%red%'",
        "p.p_type = 'PROMO'")
      spark.conf.set(MeasuredDimPlacement.flag, "true")
      val on = spark.sql(sql).queryExecution.optimizedPlan
      spark.conf.set(MeasuredDimPlacement.flag, "false")
      val off = spark.sql(sql).queryExecution.optimizedPlan
      assert(on.canonicalized == off.canonicalized,
        s"rule fired on an estimable predicate:\n$on")
    }
  }

  test("near-unique gate matches column stats by exprId only — an ALIASED " +
    "key (fresh exprId, borrowed name) must not inherit the real column's " +
    "uniqueness (review r15). Unit-level because the alias paths that " +
    "reach the rule in SQL also carry a cast, which bails earlier") {
    withCbo {
      import org.apache.spark.sql.catalyst.expressions.AttributeReference
      import org.apache.spark.sql.execution.datasources.LogicalRelation
      import org.apache.spark.sql.types.LongType
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val rel = spark.table("part").queryExecution.optimizedPlan
        .collectFirst { case r: LogicalRelation => r }.get
      val real = rel.output.collectFirst {
        case a: AttributeReference if a.name == "p_partkey" => a
      }.get
      // the genuine unique key, looked up by its own exprId: passes
      assert(MeasuredDimPlacement.nearUniqueOn(rel, real),
        "ANALYZE'd p_partkey should read as near-unique")
      // same NAME, fresh exprId — exactly what `p_size AS p_partkey`
      // produces; a name-based fallback would return true here
      val impostor = AttributeReference("p_partkey", LongType)()
      assert(!MeasuredDimPlacement.nearUniqueOn(rel, impostor),
        "an aliased key must not borrow uniqueness by name")
    }
  }

  test("session-identity guard: when the active session's catalog no " +
    "longer resolves the plan's relation to the SAME table (location + " +
    "createTime), the measurement bails and the plan is untouched " +
    "(ADVICE r15 — a same-named table in another session/catalog must " +
    "never be counted on this plan's behalf)") {
    withCbo {
      spark.conf.set(MeasuredDimPlacement.flag, "true")
      // capture the ANALYZED plan now: its LogicalRelation pins today's
      // CatalogTable (createTime T0)
      val df = spark.sql(Job.job3aSql)
      df.queryExecution.analyzed
      // re-create `part` at the same location — same data, NEW createTime:
      // the catalog the measurement would consult now disagrees with the
      // captured relation's identity, exactly the cross-session hazard
      val db = "spark_catalog.default"
      spark.sql(s"DROP TABLE $db.part")
      Thread.sleep(5) // createTime is millis — guarantee it moves
      spark.sql(s"CREATE TABLE $db.part USING parquet LOCATION '$sf/part.parquet'")
      val guarded = df.queryExecution.optimizedPlan
      assert(partJoins(guarded).forall(j =>
        j.hint.leftHint.isEmpty && j.hint.rightHint.isEmpty),
        s"measurement ran against a table the catalog re-bound:\n$guarded")
      // ...and no broadcast hint leaked onto ANY join in the plan (the
      // per-part-join assert above could miss a hint the sink spliced
      // deeper into the fact side)
      val hinted = guarded.collect {
        case j: Join if j.hint != JoinHint.NONE => j
      }
      assert(hinted.isEmpty,
        s"stale-relation plan carries a join hint:\n$guarded")
    }
  }

  test("near-knee lane (VERDICT r15 #2): an ESTIMABLE dim leg whose " +
    "estimate lands just over the broadcast threshold is re-checked by " +
    "measurement, and the true-size-fits case gets the broadcast hint " +
    "the static estimate denied (the q19/q16 class-2 decade shape)") {
    withCbo {
      // length(p_name) > 9 is NOT a pattern predicate (no LIKE/contains),
      // and FilterEstimation scores it 1.0 — the estimate carries only the
      // estimable p_size half while the TRUE selectivity is ~0.41 of it
      // (the part vocab's length distribution). Threshold = estimate/2
      // puts the estimate at 2× the knee (inside the 4× re-check window)
      // and the truth at ~0.81× the knee: only a measured count can see
      // the build fits.
      val sql = "SELECT count(*) AS n FROM lineitem JOIN part " +
        "ON l_partkey = p_partkey WHERE p_size <= 25 AND length(p_name) > 9"
      spark.conf.set(MeasuredDimPlacement.flag, "false")
      val off = spark.sql(sql).queryExecution.optimizedPlan
      // the knee window tests the JOIN CHILD's (column-pruned) estimate —
      // that is what join selection compares against the threshold
      val legEst = partJoins(off).flatMap(j => Seq(j.left, j.right))
        .filter(_.output.exists(_.name == "p_partkey"))
        .map(_.stats.sizeInBytes).min
      assert(legEst > 0, "no part-side join child found")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (legEst / 2).toString)
      spark.conf.set(MeasuredDimPlacement.flag, "true")
      val on = spark.sql(sql).queryExecution.optimizedPlan
      val hinted = partJoins(on).exists(j =>
        j.hint.leftHint.exists(_.strategy.nonEmpty) ||
          j.hint.rightHint.exists(_.strategy.nonEmpty))
      assert(hinted, s"near-knee measurement did not hint the dim join:\n$on")
      // control: with the re-check window collapsed (factor 1 → the
      // estimate is never 'near' the knee) the rule must stay out
      spark.conf.set(MeasuredDimPlacement.kneeFactorKey, "1")
      try {
        val narrow = spark.sql(sql).queryExecution.optimizedPlan
        assert(partJoins(narrow).forall(j =>
          j.hint.leftHint.isEmpty && j.hint.rightHint.isEmpty),
          s"hint applied outside the knee window:\n$narrow")
      } finally spark.conf.unset(MeasuredDimPlacement.kneeFactorKey)
      // result identity on vs off
      spark.conf.set(MeasuredDimPlacement.flag, "false")
      val offRows = spark.sql(sql).collect().toSeq
      spark.conf.set(MeasuredDimPlacement.flag, "true")
      assert(spark.sql(sql).collect().toSeq == offRows)
    }
  }

  test("rule on vs off: identical results (reassociation + a strategy " +
    "hint change nothing but the plan)") {
    withCbo {
      spark.conf.set(MeasuredDimPlacement.flag, "false")
      val off = spark.sql(Job.job3aSql).collect().toSeq
      spark.conf.set(MeasuredDimPlacement.flag, "true")
      val on = spark.sql(Job.job3aSql).collect().toSeq
      assert(on == off, s"rule changed the result: $on vs $off")
      assert(off.nonEmpty)
    }
  }

  test("non-CBO sessions are untouched (gated on joinReorder like the " +
    "residual rule)") {
    val before = spark.conf.getOption("spark.sql.cbo.joinReorder.enabled")
    try {
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      Graft.installResidualPlacement(spark)
      val plan = spark.sql(Job.job3aSql).queryExecution.optimizedPlan
      assert(partJoins(plan).forall(j =>
        j.hint.leftHint.isEmpty && j.hint.rightHint.isEmpty),
        s"rule fired without CBO:\n$plan")
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.cbo.joinReorder.enabled", v)
      case None => spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    }
  }
}
