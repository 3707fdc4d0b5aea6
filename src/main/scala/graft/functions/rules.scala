package graft.functions

import org.apache.spark.sql.catalyst.expressions.{AttributeSet, EqualNullSafe, EqualTo, Expression, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
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
      cond: Expression): Option[LogicalPlan] = {
    val needed = cond.references -- mover.outputSet
    if (needed.subsetOf(host.outputSet)) descend(host, mover, cond, needed)
    else None
  }

  private def descend(node: LogicalPlan, mover: LogicalPlan,
      cond: Expression, needed: AttributeSet): Option[LogicalPlan] =
    node match {
      case jn @ Join(l, r, Inner, _, JoinHint.NONE) =>
        if (needed.subsetOf(l.outputSet))
          Some(jn.copy(left = placeAt(l, mover, cond, needed)))
        else if (needed.subsetOf(r.outputSet))
          Some(jn.copy(right = placeAt(r, mover, cond, needed)))
        else None
      case p @ Project(list, child) if needed.subsetOf(child.outputSet) =>
        // widen to carry the moved side's columns up to the original join's
        // position (they were flowing above it already, so net plan width
        // above the old top is unchanged)
        descend(child, mover, cond, needed)
          .map(nc => p.copy(projectList = list ++ mover.output, child = nc))
      case f: Filter =>
        descend(f.child, mover, cond, needed).map(nc => f.copy(child = nc))
      case _ => None
    }

  /** Splice at the lowest covering point within `node` (which covers
    * `needed`): deeper if a child still covers, else join right here. */
  private def placeAt(node: LogicalPlan, mover: LogicalPlan,
      cond: Expression, needed: AttributeSet): LogicalPlan =
    descend(node, mover, cond, needed)
      .getOrElse(Join(node, mover, Inner, Some(cond), JoinHint.NONE))
}
