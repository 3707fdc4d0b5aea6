package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, EqualNullSafe, EqualTo, Expression, LessThan, LessThanOrEqual, Like, Literal, MultiLikeBase, PredicateHelper, RLike, StringPredicate}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project, SHUFFLE_HASH}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.IntegerType

/** Optimizer rules for graft's native expressions (SURVEY.md §2.10).
  *
  * `hamming_distance(a, b) = 0` is exactly `a = b`, but Catalyst cannot see
  * through the black-box expression: a join conditioned on it has no
  * extractable equi-join keys and plans as a broadcast-nested-loop /
  * cartesian product — O(n·m) comparisons. Rewriting to `a = b` lets the
  * planner extract join keys and hash-partition both sides — the difference
  * between an impossible and a linear plan at 100 TB. (DataFusion's
  * equivalence machinery does the analogous extraction in
  * /root/reference/datafusion/physical-expr/src/equivalence/.)
  */
object HammingZeroAsEquality extends Rule[LogicalPlan] {
  private val zero = Literal(0, IntegerType)
  private val one = Literal(1, IntegerType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case EqualTo(HammingDistance(a, b), `zero`) => EqualTo(a, b)
    case EqualTo(`zero`, HammingDistance(a, b)) => EqualTo(a, b)
    case LessThanOrEqual(HammingDistance(a, b), `zero`) => EqualTo(a, b)
    case LessThan(HammingDistance(a, b), `one`) => EqualTo(a, b)
  }
}

/** Post-join-reorder placement of joins carrying NON-EQUI residuals — the
  * round-13 job_33a finding (BASELINE.md r13): Spark's cost-based DP join
  * reorder costs only the EQUI edges, so when a join web links two subtrees
  * through `equi AND non-equi` (JOB 33a's hub self-join, `o1.o_orderkey <
  * o2.o_orderkey`), the reordered tree can make the two sides meet only at
  * the TOP — after each side has already fanned out through its fact joins
  * — even though evaluating the inequality at the lowest meeting point
  * would halve the intermediate before any fanout. (DataFusion's planner
  * places such residuals at the lowest subsuming join natively —
  * /root/reference/datafusion/optimizer/src/push_down_filter.rs.)
  *
  * The rewrite is pure inner-join reassociation: for an inner join whose
  * condition holds BOTH an equi conjunct (the sunk join can still hash) and
  * a non-equi conjunct, sink the whole join below one side's fanout joins
  * to the LOWEST descendant whose output still covers the condition's
  * host-side references. Attribute exprIds are globally unique and every
  * predicate keeps all its references in scope, so the multiset result is
  * unchanged at any data; only intermediate sizes move. Intervening
  * Projects are widened to carry the moved side's output, and the original
  * output is restored by a top Project.
  *
  * Runs in the `User Provided Optimizers` batch (after `Join Reorder` —
  * the only public injection point that sees the reordered tree; the
  * `SparkSessionExtensions` hooks all run before CBO). Registered by
  * [[graft.Graft.enableCbo]] via `spark.experimental.extraOptimizations`
  * and gated below on the join-reorder conf plus its own kill switch, so
  * sessions that never opted into CBO never see it.
  */
object ResidualJoinPlacement extends Rule[LogicalPlan]
    with JoinSinkSupport {

  val flag = "spark.graft.cbo.residualPlacement"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled(flag)) plan
    else plan.transformDown {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if hint == JoinHint.NONE && cond.deterministic &&
            hasEquiAndNonEqui(j, cond) =>
        sinkInto(left, right, cond)
          .orElse(sinkInto(right, left, cond))
          .map(rebuilt => Project(j.output, rebuilt))
          .getOrElse(j)
    }

  /** Gate: the condition has at least one hash-joinable equality SPANNING
    * the join's two sides AND at least one spanning non-equi conjunct. The
    * spans() requirement on the equality matters (ADVICE r14): a
    * single-side equality like `a.x = 5` is a filter, not a join key — a
    * join sunk on its strength has no hashable key and plans as a nested
    * loop at depth. */
  private def hasEquiAndNonEqui(j: Join, cond: Expression): Boolean = {
    def spans(e: Expression): Boolean =
      e.references.intersect(j.left.outputSet).nonEmpty &&
        e.references.intersect(j.right.outputSet).nonEmpty
    val conjuncts = splitConjunctivePredicates(cond)
    conjuncts.exists {
      case e @ (EqualTo(_, _) | EqualNullSafe(_, _)) => spans(e)
      case _ => false
    } && conjuncts.exists { e =>
      spans(e) && !e.isInstanceOf[EqualTo] && !e.isInstanceOf[EqualNullSafe]
    }
  }
}

/* Round-14 measured dead-end, recorded so it is not retried: a second rule
 * ("ResidualCoreSink") was built to finish the job_33a story by sinking the
 * residual-carrying core below the sibling fanout joins ("reduce the fact
 * before expanding it"), stats-gated on mover-rows < sibling-rows. The gate
 * is provably circular: the only case where the sink would beat the DP's
 * order is when the TRUE core cardinality is smaller than the DP's
 * estimate (the non-equi credit JoinEstimation lacks) — but the gate reads
 * the SAME estimate the DP used, so it refuses exactly when it would help
 * and would only fire where the DP, given the same numbers, already chose
 * correctly. Measured at 100×: the gate refused (core est 6.7M vs part
 * sibling 333k — and the TRUE core is ~3.3M, so the refusal was also
 * substantively right; job_33a's residual gap was the part slice sitting
 * just above the 10 MB broadcast threshold, fixed in Graft.enableCbo).
 * See BASELINE.md round-14. */

/** Post-join-reorder placement of PATTERN-GATED dims by MEASURED
  * selectivity — the round-14 job_3a finding (BASELINE.md r14): Spark's
  * `FilterEstimation` assigns LIKE / contains / regexp predicates NO
  * selectivity, so the cost-based DP sees a LIKE-filtered dim at full
  * table size and orders it LAST — the reordered tree sort-merges the
  * full fact through its fanout joins before the one join that would have
  * reduced it. (DataFusion costs filtered cardinalities into its reorder —
  * /root/reference/datafusion/optimizer/src/optimize_projections/ +
  * the selectivity hooks in datafusion/physical-expr/src/analysis.rs —
  * which is exactly the signal Spark's DP is missing here.)
  *
  * A default LIKE selectivity guess was rejected (it mis-ranks every
  * NOT-LIKE family the other way — BASELINE r14); instead this rule
  * MEASURES. For an inner equi-join whose one side is a dim leg
  * (Projects over a Filter over a catalog-stats relation) gated by at least one
  * pattern conjunct the estimator cannot see, it runs a one-off COUNT of
  * the filtered dim (column-pruned parquet scan of just the predicate
  * columns; TABLESAMPLE above a size bound; cached per session ×
  * (table, predicate, stats) so repeated plans pay nothing) and, when the
  * measured bytes clear the broadcast threshold AND the dim joins on a
  * near-unique key (catalog ndv ≈ rowCount — the sunk join cannot fan
  * out), sinks the join to the lowest covering descendant of the fact
  * side with a BROADCAST hint. That is precisely the plan the hand-ordered
  * text encodes — reduce the fact before its fanout, build-side the dim —
  * derived from data instead of syntax. When the DP already placed the
  * dim lowest but the full-size estimate denied the broadcast, the hint
  * is applied in place (no sink), avoiding the fact-side shuffle a
  * sort-merge join on a non-hub key would force.
  *
  * Correctness: the sink is the same pure inner-join reassociation as
  * [[ResidualJoinPlacement]] (globally-unique exprIds, every predicate
  * stays in scope — multiset result unchanged at any data); the hint only
  * picks a physical strategy. Runs in `User Provided Optimizers` (after
  * `Join Reorder`), registered by [[graft.Graft.enableCbo]], gated on the
  * join-reorder conf + its own kill switch — non-CBO sessions never see
  * it, and the measurement only ever touches pattern-gated CATALOG dims
  * under the size bound (facts are excluded by `measure.maxTableBytes`).
  */
object MeasuredDimPlacement extends Rule[LogicalPlan] with JoinSinkSupport {

  val flag = "spark.graft.cbo.measuredDimPlacement"
  /** Tables larger than this (32g default) are never measured — the bound
    * that excludes FACTS from measurement entirely; it is deliberately far
    * above dim size because the sampling bound below, not this one, is
    * what keeps plan time flat. */
  val maxTableBytesKey = "spark.graft.cbo.measure.maxTableBytes"
  /** Above this size (256m default) the measurement uses TABLESAMPLE
    * (1 PERCENT) ×100 — a selectivity estimate, not an exact count, which
    * is all the broadcast decision needs. The default is small on purpose:
    * first sight of a novel pattern predicate runs SYNCHRONOUSLY inside
    * the optimizer, so an un-sampled count must stay dim-cheap — review
    * r15 flagged the old 4g default as a plan-time stall on a cold ~4 GB
    * table (the 1% sample reads ~none of it instead). */
  val sampleAboveBytesKey = "spark.graft.cbo.measure.sampleAboveBytes"
  /** Round-16 (VERDICT r15 #2): the rule also re-checks ESTIMABLE dim legs
    * whose post-filter ESTIMATE lands within this factor ABOVE the
    * broadcast threshold (default 4×). The class-2 decade finding (q19/q16
    * at 1000×): a disjunctive-but-estimable predicate's estimate lands
    * just over the knee, the static planner exchanges a multi-GB fact,
    * and AQE flips the join back to broadcast at runtime — proof the TRUE
    * build fit all along, but the exchange is already materialized. A
    * measured count at plan time is the static-side version of AQE's
    * runtime evidence. Estimates far above the threshold are not
    * re-checked: measurement only pays for itself where the estimate is
    * within error of the decision boundary. */
  val kneeFactorKey = "spark.graft.cbo.measure.kneeFactor"

  /** Guards against a measurement query re-entering the rule (its plan is
    * joinless so it cannot match, but the guard makes that a non-issue). */
  private val measuring = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }
  /** session → (table|predicate|stats fingerprint → measured row count).
    * Weak-keyed so a dropped session takes its measurements with it; the
    * fingerprint includes the catalog stats, so a re-ANALYZE (new data)
    * invalidates naturally. */
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Long]]())

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled(flag) || measuring.get()) plan
    else plan.transformDown {
      case j @ Join(left, right, Inner, Some(cond), JoinHint.NONE)
          if cond.deterministic =>
        place(j, left, right, moverIsRight = true)
          .orElse(place(j, right, left, moverIsRight = false))
          .getOrElse(j)
    }

  private val bcastRight = JoinHint(None, Some(HintInfo(Some(BROADCAST))))

  private def place(j: Join, host: LogicalPlan, mover: LogicalPlan,
      moverIsRight: Boolean): Option[LogicalPlan] = {
    val cond = j.condition.get
    def hintInPlace: LogicalPlan =
      if (moverIsRight) j.copy(hint = bcastRight)
      else j.copy(hint = JoinHint(Some(HintInfo(Some(BROADCAST))), None))
    for {
      (pred, rel) <- dimLeg(mover)
      if hasUnestimablePattern(pred) || nearKnee(mover)
      key <- moverJoinKey(cond, mover, host)
      if nearUniqueOn(rel, key)
      rows <- measure(rel, pred)
      bytes = rows * rowBytes(mover, rel)
      if bytes >= 0 && bytes <= conf.autoBroadcastJoinThreshold
    } yield {
      if (spanningConjunctsAllEqui(j, cond))
        sinkHinted(host, mover, cond)
          .map(rebuilt => Project(j.output, rebuilt))
          .getOrElse(hintInPlace) // already lowest: broadcast in place
      else
        // spanning NON-equi residuals alongside the equality (q19's
        // brand×size×quantity disjunction): PLACEMENT is
        // ResidualJoinPlacement's lane, which is why RJP is registered
        // BEFORE this rule (Graft.installResidualPlacement) — by the time
        // this branch runs, RJP has already sunk the join as low as it
        // covers (or declined), so only the join STRATEGY is hinted in
        // place; BroadcastHashJoin keeps the residual as its join filter,
        // so semantics are untouched
        hintInPlace
    }
  }

  /** Post-filter estimate within (threshold, kneeFactor × threshold] —
    * close enough to the broadcast decision boundary that estimation
    * error plausibly flipped it; worth one measured count. */
  private def nearKnee(mover: LogicalPlan): Boolean = {
    val t = conf.autoBroadcastJoinThreshold
    t > 0 && {
      val factor =
        try conf.getConfString(kneeFactorKey, "4").toDouble
        catch { case scala.util.control.NonFatal(_) => 4.0 }
      val est = mover.stats.sizeInBytes
      est > t && est <= BigInt((t * factor).toLong)
    }
  }

  /** Projects over a Filter over a single catalog relation — the dim-leg
    * shape pushdown leaves behind. */
  private def dimLeg(p: LogicalPlan): Option[(Expression, LogicalRelation)] =
    p match {
      case Project(_, c) => dimLeg(c)
      case Filter(pred, c) if pred.deterministic => leafRel(c).map(pred -> _)
      case _ => None
    }

  private def leafRel(p: LogicalPlan): Option[LogicalRelation] = p match {
    case Project(_, c) => leafRel(c)
    case r: LogicalRelation if r.catalogTable.isDefined => Some(r)
    case _ => None
  }

  /** At least one conjunct FilterEstimation cannot score: LIKE / regexp /
    * the simplified contains/startswith/endswith forms / LIKE ALL-ANY
    * stacks (NOT LIKE sits inside a Not and is found by the traversal). */
  private def hasUnestimablePattern(pred: Expression): Boolean =
    pred.exists {
      case _: Like | _: RLike | _: StringPredicate | _: MultiLikeBase => true
      case _ => false
    }

  /** Every conjunct spanning both sides must be an equality (a spanning
    * non-equi residual is [[ResidualJoinPlacement]]'s case, not ours). */
  private def spanningConjunctsAllEqui(j: Join, cond: Expression): Boolean = {
    def spans(e: Expression): Boolean =
      e.references.intersect(j.left.outputSet).nonEmpty &&
        e.references.intersect(j.right.outputSet).nonEmpty
    val spanning = splitConjunctivePredicates(cond).filter(spans)
    spanning.nonEmpty && spanning.forall {
      case EqualTo(_, _) | EqualNullSafe(_, _) => true
      case _ => false
    }
  }

  /** The mover-side attribute of a spanning equality (the dim's join
    * key); None when no equality has a bare attribute on the mover. */
  private def moverJoinKey(cond: Expression, mover: LogicalPlan,
      host: LogicalPlan): Option[AttributeReference] =
    splitConjunctivePredicates(cond).collectFirst {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if mover.outputSet.contains(a) && host.outputSet.contains(b) => a
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if mover.outputSet.contains(a) && host.outputSet.contains(b) => a
    }

  /** ndv ≥ 0.9 × rowCount on the join key → the key is (near-)unique and
    * the sunk join cannot multiply the fact side. Requires ANALYZE'd
    * column stats — absent stats means no rewrite, the safe default.
    * Lookup is by exprId ONLY: a pass-through projection keeps the base
    * column's exprId so the hit is exact, while an ALIASED/derived key
    * carries a fresh exprId — a name fallback there would let
    * `SELECT p_size AS p_partkey` borrow the real p_partkey's uniqueness
    * and sink a fanning join (review r15), so a miss means no rewrite. */
  private[graft] def nearUniqueOn(rel: LogicalRelation,
      key: AttributeReference): Boolean = {
    val st = rel.stats
    (for {
      rows <- st.rowCount
      colStat <- st.attributeStats.find(_._1.exprId == key.exprId).map(_._2)
      ndv <- colStat.distinctCount
    } yield rows > 0 && ndv * 10 >= rows * 9).getOrElse(false)
  }

  private def avgRowBytes(rel: LogicalRelation): Long = {
    val st = rel.stats
    st.rowCount.filter(_ > 0)
      .map(rc => (st.sizeInBytes / rc).toLong.max(1L)).getOrElse(Long.MaxValue)
  }

  /** Per-row bytes of the leg's PROJECTED output (what the broadcast
    * build actually carries), not the full table width — the full-width
    * form rejected q19-style hints whose pruned build fits with room to
    * spare (round 16). Falls back to full width when column stats are
    * unusable — conservative: over-estimating only suppresses a hint. */
  private def rowBytes(mover: LogicalPlan, rel: LogicalRelation): Long =
    try {
      org.apache.spark.sql.catalyst.plans.logical.statsEstimation
        .EstimationUtils.getSizePerRow(mover.output, rel.stats.attributeStats)
        .toLong
    } catch { case scala.util.control.NonFatal(_) => avgRowBytes(rel) }

  /** Run (or recall) the COUNT of the filtered dim. Any failure — the
    * predicate not round-tripping through SQL text, a dropped table, a
    * missing session — returns None and the plan is left alone.
    *
    * The optimizer hands a rule no session, so the count runs through
    * `SparkSession.active` — which in a multi-session JVM can be a
    * DIFFERENT session than the one owning this plan (ADVICE r15). Before
    * measuring, the active session's catalog must resolve the relation's
    * identifier to the SAME table (location + createTime identity);
    * otherwise a same-named table in another session's catalog would be
    * counted and the broadcast/sink decision based on the wrong data —
    * bail to None instead. The db-qualified quotedString also skips any
    * same-named temp view at resolution time. */
  private def measure(rel: LogicalRelation, pred: Expression): Option[Long] =
    try {
      val spark = SparkSession.active
      val ct = rel.catalogTable.get
      val resolved = spark.sessionState.catalog.getTableMetadata(ct.identifier)
      if (resolved.location != ct.location ||
        resolved.createTime != ct.createTime) return None
      val tbl = ct.identifier.quotedString
      val st = rel.stats
      if (st.sizeInBytes > maxBytes(maxTableBytesKey, "32g")) return None
      val predSql = pred.transform {
        case a: AttributeReference => a.withQualifier(Nil)
      }.sql
      val sampled = st.sizeInBytes > maxBytes(sampleAboveBytesKey, "256m")
      val key = s"$tbl|$predSql|${st.sizeInBytes}|${st.rowCount}|$sampled"
      val perSession = cache.synchronized {
        var m = cache.get(spark)
        if (m == null) {
          m = new java.util.concurrent.ConcurrentHashMap[String, Long]()
          cache.put(spark, m)
        }
        m
      }
      // bound the per-session map: a long-lived session planning thousands
      // of distinct pattern predicates (a fuzzer, an ad-hoc notebook) must
      // not grow it unboundedly — dropping measurements only re-runs counts
      if (perSession.size > 10000) perSession.clear()
      Option(perSession.get(key)).orElse {
        measuring.set(true)
        try {
          val from =
            if (sampled) s"$tbl TABLESAMPLE (1 PERCENT)" else tbl
          val n = spark.sql(s"SELECT count(*) FROM $from WHERE $predSql")
            .head().getLong(0)
          val est = if (sampled) n * 100 else n
          logInfo(s"graft.MeasuredDimPlacement: $tbl WHERE $predSql → " +
            s"$est rows${if (sampled) " (1% sample ×100)" else ""}")
          perSession.put(key, est)
          Some(est)
        } finally measuring.set(false)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def maxBytes(key: String, default: String): Long =
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      conf.getConfString(key, default))

  /** sinkInto with the spliced join carrying a broadcast-the-mover hint
    * (the mover lands on the right in [[JoinSinkSupport.placeAt]]). */
  private def sinkHinted(host: LogicalPlan, mover: LogicalPlan,
      cond: Expression): Option[LogicalPlan] =
    sinkInto(host, mover, cond, bcastRight)
}

/** Post-join-reorder LINEARIZATION of bushy bare-fact merges — the
  * round-15 job_19a finding (BASELINE.md r15/r16): Spark's cost-based DP,
  * costing a multi-role fact web from multi-key ndv products, can join two
  * BARE fact roles directly (job_19a: the unfiltered single-column l1
  * lineitem role sort-merged against the weakly-filtered l2 role — 60M ⋈
  * 13M on the orderkey at 100×) BEFORE that bushy product ever meets the
  * reduced orders⋈customer spine, paying a full bare-fact exchange the
  * hand-ordered left-deep tree never pays. (The reference's planner costs
  * filtered cardinalities into its reorder and picks the left-deep thread
  * here — /root/reference/datafusion/optimizer/src/join_reorder lineage;
  * Spark's JoinEstimation under-costs the bushy merge.)
  *
  * The rewrite is pure inner-join reassociation (the ResidualJoinPlacement
  * correctness argument: globally-unique exprIds, every conjunct keeps its
  * references in scope, multiset result unchanged at any data): for
  * `spine ⋈ (B ⋈ C)` where B and C are both BARE roles of the SAME
  * catalog fact table (Project/Filter chains over one relation, each
  * above the fact floor), re-thread as `(spine ⋈ keep) ⋈ mover` with
  * mover = the larger role — each role now meets the spine before meeting
  * its sibling, the hand text's shape. Fires only when every multi-side
  * conjunct is a bare attribute equality (a pure equi web — a spanning
  * non-equi residual is ResidualJoinPlacement's case) and both
  * re-threaded joins keep a hashable spanning equality, and only when the
  * spine is itself a JOINED subtree — the joined-spine gate is the
  * termination proof: after one application the inner join's spine side
  * contains a Join, so neither new node can match again. (Without the
  * gate, a pure 3-role self-join — fact a ⋈ fact b ⋈ fact c above the
  * floor — re-matches its own output with the roles rotated and rewrites
  * forever; ADVICE r16, pinned by FactMergeGuardSpec's 3-role test.)
  *
  * Registered by [[graft.Graft.installResidualPlacement]] in the
  * post-reorder slot, gated on the join-reorder conf + its own kill
  * switch like its siblings. */
object FactMergeGuard extends Rule[LogicalPlan] with JoinSinkSupport {

  val flag = "spark.graft.cbo.factMergeGuard"
  /** Tables above this size count as facts whose bushy self-merge is
    * worth linearizing. The default (16g) is a measured knee, not a
    * guess (BASELINE.md r16): at a 6.3 GB fact (100×) the linear thread
    * measured 1.12× of the bushy plan (the product exchange is still
    * cheap; the extra SMJ sort steps dominate), at a 63 GB fact (1000×)
    * it measured 0.85× (the 10×-bigger product exchange dominates, and
    * the family flips from 1.05× to 0.94× of hand-ordered). 16g sits
    * between the two measured decades — re-bisect per deployment like
    * the 32 MB broadcast knee. */
  val factFloorKey = "spark.graft.cbo.factFloorBytes"
  /** Floor for the INFLATION variant's bare fact role (256m default) —
    * only separates facts from dims; the variant's real gates are the
    * estimate-based inflation + improvement pair below, which are
    * scale-free (exchanging a 7× inflated intermediate loses at any
    * data size). */
  val roleFloorKey = "spark.graft.cbo.factRoleFloorBytes"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled(flag)) plan
    else plan.transformDown {
      case j @ Join(l, r, Inner, Some(cond), JoinHint.NONE)
          if cond.deterministic =>
        linearize(j, l, r, cond).orElse(linearize(j, r, l, cond)).getOrElse(j)
    }

  /** Project/Filter chain over a single relation — a bare fact ROLE, not a
    * joined subtree. */
  private def bareLeg(p: LogicalPlan): Option[LogicalRelation] = p match {
    case Project(_, ch) => bareLeg(ch)
    case Filter(c, ch) if c.deterministic => bareLeg(ch)
    case r: LogicalRelation => Some(r)
    case _ => None
  }

  /** See through PURE-PRUNING Projects (all-attribute lists) above the
    * bushy join — column pruning leaves one between every join pair.
    * Aliasing Projects are NOT stripped: the conjuncts above reference
    * the aliased outputs, which would not exist below. The rewrite's
    * top `Project(j.output, …)` restores the original projection, so
    * dropping the pruning layer only lets a few extra key columns flow
    * one join higher. */
  private def stripPruning(p: LogicalPlan): LogicalPlan = p match {
    case Project(list, ch) if list.forall(_.isInstanceOf[AttributeReference]) =>
      stripPruning(ch)
    case x => x
  }

  private def isBareEquality(e: Expression): Boolean = e match {
    case EqualTo(_: AttributeReference, _: AttributeReference) => true
    case EqualNullSafe(_: AttributeReference, _: AttributeReference) => true
    case _ => false
  }

  private def linearize(j: Join, spine: LogicalPlan, bushy: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = stripPruning(bushy) match {
    case bj @ Join(b, c, Inner, Some(bc), JoinHint.NONE) if bc.deterministic =>
      val floor = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        conf.getConfString(factFloorKey, "16g"))
      val conjs = splitConjunctivePredicates(cond) ++
        splitConjunctivePredicates(bc)
      val groups = Seq(spine.outputSet, b.outputSet, c.outputSet)
      def multiSide(e: Expression): Boolean =
        groups.count(g => e.references.intersect(g).nonEmpty) > 1
      if (!conjs.forall(e => !multiSide(e) || isBareEquality(e))) return None
      // the floor tests the UNDERLYING TABLE, not the filtered leg
      // estimate: a weakly-filtered role of a multi-GB fact is still a
      // fact role (job_19a's l2 leg estimates 222 MB at 100× — under any
      // sensible floor — while its table is 6.3 GB)
      val sameFactTable = (for {
        relB <- bareLeg(b); relC <- bareLeg(c)
        idB <- relB.catalogTable.map(_.identifier)
        idC <- relC.catalogTable.map(_.identifier)
      } yield idB == idC &&
        relB.stats.sizeInBytes > floor).getOrElse(false)
      if (!sameFactTable) return inflationVariant(j, spine, bj, b, c, conjs)
      // the spine must be a JOINED subtree (round-17, ADVICE r16): with a
      // bare role of the SAME fact as the "spine" (a pure 3-role
      // self-join, fact a ⋈ (fact b ⋈ fact c)), the rewritten tree
      // Join(Join(spine, keep), mover) re-matches with the roles rotated
      // — spine' = mover, bushy' = Join(spine, keep), both legs bare
      // same-fact — and transformDown re-applies the rule to its own
      // output in the SAME pass, unbounded (each fire adds a pruning
      // Project that stripPruning sees through) until the optimizer
      // stack overflows. The termination argument below ("the inner
      // join's spine side contains a Join") only holds when the original
      // spine was a join — this gate makes it hold always. Nothing is
      // lost: with no reduced spine to thread through, both shapes
      // exchange the same bare roles on the same keys anyway.
      if (bareLeg(spine).nonEmpty) return None

      /** Re-thread with `keep` joined to the spine and the other leg on
        * top; None when either re-threaded join would lose its hashable
        * spanning equality (never trade a bushy merge for a nested
        * loop). Returns the candidate tree plus the DP's OWN estimate of
        * the new inner intermediate. */
      def candidate(keep: LogicalPlan, mover: LogicalPlan)
          : Option[(LogicalPlan, BigInt)] = {
        val (innerConds, topConds) = conjs.partition(
          _.references.subsetOf(spine.outputSet ++ keep.outputSet))
        for {
          _ <- Some(())
          if innerConds.exists(e => isBareEquality(e) &&
            e.references.intersect(spine.outputSet).nonEmpty &&
            e.references.intersect(keep.outputSet).nonEmpty)
          if topConds.exists(e => isBareEquality(e) &&
            e.references.intersect(mover.outputSet).nonEmpty &&
            (e.references -- mover.outputSet).nonEmpty)
          innerCond <- innerConds.reduceOption(
            org.apache.spark.sql.catalyst.expressions.And(_, _))
          topCond <- topConds.reduceOption(
            org.apache.spark.sql.catalyst.expressions.And(_, _))
        } yield {
          val inner = Join(spine, keep, Inner, Some(innerCond), JoinHint.NONE)
          (Project(j.output,
            Join(inner, mover, Inner, Some(topCond), JoinHint.NONE)),
            inner.stats.sizeInBytes)
        }
      }
      // NOT gated on estimates: an estimate-margin gate here is provably
      // circular (the round-14 ResidualCoreSink lesson, re-measured round
      // 16 — JoinEstimation prices the bushy self-merge at 1.4 GB and the
      // spine thread at 2.9 GB on job_19a, i.e. the same under-costing
      // that produced the bushy tree also vetoes its repair). The
      // justification is STRUCTURAL: the two roles are exchanged on the
      // hub key once each in EITHER shape, but the bushy form then
      // re-exchanges BOTH multi-GB intermediates on the merged multi-key
      // combination before meeting the spine (job_19a's physical plan:
      // `Exchange hashpartitioning(l_orderkey, l_orderkey, o_orderkey,
      // o_orderkey)` on both sides), while the linear thread reuses the
      // spine's single-key partitioning end-to-end — strictly fewer
      // exchanged bytes at any cardinality. Mover = the larger role, so
      // the unreduced one attaches last (the hand-text discipline).
      val cands = Seq(
        if (b.stats.sizeInBytes >= c.stats.sizeInBytes) candidate(c, b)
        else candidate(b, c),
        if (b.stats.sizeInBytes >= c.stats.sizeInBytes) candidate(b, c)
        else candidate(c, b)).flatten
      cands.headOption.map { case (tree, innerEst) =>
        logInfo(s"graft.FactMergeGuard: linearized a bushy same-fact " +
          s"role merge (bushy est ${bushy.stats.sizeInBytes}B, inner est " +
          s"${innerEst}B; legs ${b.stats.sizeInBytes}B/${c.stats.sizeInBytes}B)")
        tree
      }
    case _ => None
  }

  /** INFLATION variant — the second face of the same cost-model class,
    * found by the round-16 100× sweep on the recalibrated data
    * (BASELINE r16): the DP attaches a bare fact ROLE to a dim SUBTREE
    * on a non-hub key (job_19a: l3 ⋈ the supplier⋈nation⋈l4 chain on
    * the suppkey), INFLATING the role's bytes ~7× with dim columns
    * BEFORE its hub-key reduction — the top join then exchanges the
    * inflated product. Spark's reorder cost is ROW-weighted
    * (`joinReorder.card.weight` = 0.7), so a join that shrinks rows but
    * multiplies bytes looks good to the DP; the exchange pays bytes.
    * The gates use only LEAF-ADJACENT estimates (the role leg, the
    * small subtree, and their single join — the estimates
    * JoinEstimation gets roughly right), never a constructed deep
    * intermediate: an "is the re-thread smaller" gate was tried and is
    * circular AGAIN (measured while building this: JoinEstimation
    * prices spine⋈l3 at 643M rows — 10× both inputs — through the
    * duplicated transitive-closure keys, so the repair always looks
    * worse than the defect). The shipped gates:
    *  - the subtree is SMALLER than the role (est < role bytes) yet its
    *    join with the role INFLATES (product est ≥ 2× role bytes) — a
    *    genuinely REDUCING small side (the job_3a star shape) shrinks
    *    the product instead, so it never fires here; an inflating small
    *    side is decoration (wide dim columns fanned onto the role),
    *    safe to postpone until after the spine reduction;
    *  - the role keeps a hashable spanning equality to the spine
    *    (inner) and the subtree to the role's columns (top), so no
    *    nested loop can appear.
    * Termination: re-matching the rewritten tree swaps spine and
    * subtree roles, and the subtree-smaller-than-role gate reverses —
    * the spine (> role, else it could not have absorbed it) can never
    * qualify as the small side. */
  private def inflationVariant(j: Join, spine: LogicalPlan, bushy: Join,
      b: LogicalPlan, c: LogicalPlan,
      conjs: Seq[Expression]): Option[LogicalPlan] = {
    val roleFloor = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(conf.getConfString(roleFloorKey, "256m"))
    def attempt(bare: LogicalPlan, other: LogicalPlan): Option[LogicalPlan] =
      for {
        rel <- bareLeg(bare)
        if bareLeg(other).isEmpty // a plain fact⋈fact hub join is not ours
        // the spine must be a JOINED subtree — with a bare role as the
        // "spine" the rewrite degenerates into manufacturing a new bushy
        // role merge out of the tree it just fixed (observed: the first
        // firing's fixed tree re-matched with l3 as spine and pulled l1
        // back out into an l1⋈l3 product)
        if bareLeg(spine).isEmpty
        if rel.catalogTable.isDefined
        if rel.stats.sizeInBytes > roleFloor
        // decoration signature: small side + inflating product
        if other.stats.sizeInBytes < bare.stats.sizeInBytes
        if bushy.stats.sizeInBytes >= bare.stats.sizeInBytes * 2
        // the spine must OUTWEIGH the role — this is the monotone measure
        // that makes the FixedPoint terminate (found the hard way: round
        // 16's first sweep re-run blew the optimizer stack on job_24a —
        // without it, `spine > role` on one side and `other < role` on
        // the other let two symmetric configs recreate each other
        // forever, each wrap adding a Project until transformDown
        // overflowed). A reverse fire would need the old small side to
        // outweigh the role it was smaller than — contradiction.
        if spine.stats.sizeInBytes > bare.stats.sizeInBytes
        (innerConds, topConds) = conjs.partition(
          _.references.subsetOf(spine.outputSet ++ bare.outputSet))
        if innerConds.exists(e => isBareEquality(e) &&
          e.references.intersect(spine.outputSet).nonEmpty &&
          e.references.intersect(bare.outputSet).nonEmpty)
        if topConds.exists(e => isBareEquality(e) &&
          e.references.intersect(other.outputSet).nonEmpty &&
          (e.references -- other.outputSet).nonEmpty)
        innerCond <- innerConds.reduceOption(
          org.apache.spark.sql.catalyst.expressions.And(_, _))
        topCond <- topConds.reduceOption(
          org.apache.spark.sql.catalyst.expressions.And(_, _))
      } yield {
        logInfo(s"graft.FactMergeGuard: re-threaded an inflated fact role " +
          s"(role ${bare.stats.sizeInBytes}B, small side " +
          s"${other.stats.sizeInBytes}B, product " +
          s"${bushy.stats.sizeInBytes}B — postponed behind the spine)")
        Project(j.output,
          Join(Join(spine, bare, Inner, Some(innerCond), JoinHint.NONE),
            other, Inner, Some(topCond), JoinHint.NONE))
      }
    attempt(c, b).orElse(attempt(b, c))
  }
}

/** Post-reorder join-ALGORITHM preference for fact⋈fact hub joins — the
  * round-17 q9/q18 finding (BASELINE.md r17): at the deployment decade,
  * sort-merge pays fact-scale SORT passes on both sides of every big
  * equi join, and for the q9/q18 shape — a SMALL build side probed by a
  * fact or fact-product 4–10× its row count — shuffled-hash reads 0.50×
  * (q9 103.8 → 52.1 s) and 0.36× (q18 95.5 → 34.4 s), same shuffled
  * bytes, CPU halved (the sorts were the cost). The blanket conf
  * (`spark.sql.join.preferSortMergeJoin=false`) is REJECTED: it also
  * flips q12-shaped joins — build = the UNFILTERED 150M-row side, probe
  * = a small filtered slice — into a measured 1.62× regression, because
  * the build cost amortizes over too few probe rows.
  *
  * So the rule is STATS-GATED on exactly that asymmetry: for an inner
  * equi join (hint-free, both sides above the broadcast window) where
  * catalog stats say (probe rows) ≥ probeRatio × (build rows) AND the
  * build side's per-partition slice fits task memory with margin, add a
  * SHUFFLE_HASH hint on the build side. The hint only picks a physical
  * strategy — results are untouched at any data. Spill guard: SHJ
  * forfeits sort-spill graceful degradation, so the per-task build bound
  * (`buildPerTaskMaxBytes`, default 128m against a multi-GB task heap —
  * the A/B's zero-spill 250 MB builds had 2 GB/task) is a hard gate, and
  * the broadcast-window clearance (build est > 8× the static threshold)
  * keeps the hint from ever FORCING a shuffle where the planner or AQE
  * would have broadcast.
  *
  * Runs LAST in the extraOptimizations sequence: the placement rules
  * (RJP/MDP/FMG) only match hint-free joins, so strategy hints must land
  * after every re-thread has settled. Registered by
  * [[graft.Graft.installResidualPlacement]], gated on the join-reorder
  * conf + its own kill switch like its siblings. */
object HashProbePreference extends Rule[LogicalPlan] with JoinSinkSupport {

  val flag = "spark.graft.cbo.hashProbePreference"
  /** Probe-to-build row-count ratio floor (default 4 — q9's weakest
    * winning join builds 150M orders rows against a ≥600M-row probe;
    * q12's losing join builds 150M against ~25M and must be excluded;
    * the knee is somewhere in (1, 4] and 4 is the measured-safe side). */
  val probeRatioKey = "spark.graft.cbo.shj.probeRatio"
  /** Per-task hash-build byte bound (default 128m): build est ÷ shuffle
    * width must fit task memory with margin, because a SHJ build that
    * doesn't fit fails the task where SMJ would have spilled the sort. */
  val buildMaxKey = "spark.graft.cbo.shj.buildPerTaskMaxBytes"

  private val shjLeft = JoinHint(Some(HintInfo(Some(SHUFFLE_HASH))), None)
  private val shjRight = JoinHint(None, Some(HintInfo(Some(SHUFFLE_HASH))))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled(flag)) plan
    else plan.transformDown {
      case j @ Join(l, r, Inner, Some(cond), JoinHint.NONE)
          if cond.deterministic =>
        hinted(j, l, r, cond).getOrElse(j)
    }

  private def hinted(j: Join, l: LogicalPlan, r: LogicalPlan,
      cond: Expression): Option[Join] = {
    val spanningEqui = splitConjunctivePredicates(cond).exists { e =>
      (e match {
        case EqualTo(_: AttributeReference, _: AttributeReference) => true
        case EqualNullSafe(_: AttributeReference, _: AttributeReference) => true
        case _ => false
      }) && e.references.intersect(l.outputSet).nonEmpty &&
        e.references.intersect(r.outputSet).nonEmpty
    }
    if (!spanningEqui) return None
    val ratio =
      try conf.getConfString(probeRatioKey, "4").toDouble
      catch { case scala.util.control.NonFatal(_) => 4.0 }
    val buildMax = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      conf.getConfString(buildMaxKey, "128m"))
    val width = math.max(1, conf.numShufflePartitions)
    val t = conf.autoBroadcastJoinThreshold
    def attempt(build: LogicalPlan, probe: LogicalPlan,
        hint: JoinHint): Option[Join] =
      for {
        rowsB <- build.stats.rowCount
        rowsP <- probe.stats.rowCount
        if rowsB > 0
        // the measured asymmetry: the build must amortize over ≥ratio×
        // more probe rows (q9/q18 pass at 4–10×, q12 reads ~0.17 and
        // is correctly excluded)
        if BigDecimal(rowsP) >= BigDecimal(rowsB) * ratio
        // clear of the broadcast window — never force a shuffle where a
        // broadcast was available (t <= 0 means broadcast is disabled,
        // so there is nothing to shadow)
        if t <= 0 || build.stats.sizeInBytes > BigInt(t) * 8
        // the spill guard: per-task build slice must fit with margin
        if build.stats.sizeInBytes / width <= buildMax
      } yield {
        logInfo(s"graft.HashProbePreference: SHUFFLE_HASH hint (build " +
          s"$rowsB rows / ${build.stats.sizeInBytes}B over width $width, " +
          s"probe $rowsP rows)")
        j.copy(hint = hint)
      }
    // prefer the smaller-rows side as the build
    val lFirst = (for { lr <- l.stats.rowCount; rr <- r.stats.rowCount }
      yield lr <= rr).getOrElse(true)
    if (lFirst) attempt(l, r, shjLeft).orElse(attempt(r, l, shjRight))
    else attempt(r, l, shjRight).orElse(attempt(l, r, shjLeft))
  }
}

/** Shared machinery: splice `Join(S, mover, cond)` at the lowest
  * descendant S of a host subtree that still covers the condition's
  * host-side references, descending only through inner joins (hint-free),
  * Projects (widened to carry the mover's columns) and Filters. */
private[functions] trait JoinSinkSupport extends PredicateHelper {
  this: Rule[LogicalPlan] =>

  protected def enabled(flag: String): Boolean =
    conf.getConfString("spark.sql.cbo.joinReorder.enabled", "false") == "true" &&
      conf.getConfString(flag, "true") == "true"

  /** `host` with the mover spliced at the lowest covering descendant;
    * None when no STRICT descendant covers the references (the join
    * already sits at its lowest valid position — the no-op that makes the
    * fixed point converge). */
  protected def sinkInto(host: LogicalPlan, mover: LogicalPlan,
      cond: Expression, hint: JoinHint = JoinHint.NONE): Option[LogicalPlan] = {
    val needed = cond.references -- mover.outputSet
    if (needed.subsetOf(host.outputSet)) descend(host, mover, cond, needed, hint)
    else None
  }

  private def descend(node: LogicalPlan, mover: LogicalPlan,
      cond: Expression, needed: AttributeSet,
      hint: JoinHint): Option[LogicalPlan] =
    node match {
      case jn @ Join(l, r, Inner, _, JoinHint.NONE) =>
        if (needed.subsetOf(l.outputSet))
          Some(jn.copy(left = placeAt(l, mover, cond, needed, hint)))
        else if (needed.subsetOf(r.outputSet))
          Some(jn.copy(right = placeAt(r, mover, cond, needed, hint)))
        else None
      case p @ Project(list, child) if needed.subsetOf(child.outputSet) =>
        // widen to carry the moved side's columns up to the original join's
        // position (they were flowing above it already, so net plan width
        // above the old top is unchanged)
        descend(child, mover, cond, needed, hint)
          .map(nc => p.copy(projectList = list ++ mover.output, child = nc))
      case f: Filter =>
        descend(f.child, mover, cond, needed, hint).map(nc => f.copy(child = nc))
      case _ => None
    }

  /** Splice at the lowest covering point within `node` (which covers
    * `needed`): deeper if a child still covers, else join right here. */
  private def placeAt(node: LogicalPlan, mover: LogicalPlan,
      cond: Expression, needed: AttributeSet, hint: JoinHint): LogicalPlan =
    descend(node, mover, cond, needed, hint)
      .getOrElse(Join(node, mover, Inner, Some(cond), hint))
}
