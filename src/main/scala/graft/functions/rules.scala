package graft.functions

import org.apache.spark.sql.catalyst.expressions.{EqualTo, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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
