package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §4.3 path (c), the `Rule[LogicalPlan]` leg):
  * rewrites the universal grouped-top-k idiom
  *
  * {{{ df.withColumn("rk", row_number().over(partitionBy(keys).orderBy(o)))
  *       .filter($"rk" <= k).drop("rk") }}}
  *
  * into the native [[TopKPerKey]] operator whenever the rank column is
  * projected away. The window formulation shuffles EVERY row and fully
  * sorts every partition before discarding all but k; TopKPerKey reduces
  * each map partition to ≤ k rows per key in bounded heaps BEFORE the
  * exchange — the rewrite is what makes the idiom (as users naturally
  * write it) survive a 100× scale-up without each call site opting into
  * the custom API.
  *
  * Match conditions (all required for semantics preservation):
  *  - the Window computes exactly ONE expression, a `row_number()`;
  *  - the filter bounds that rank from above by a positive int literal
  *    (`<= k`, `< k+1`, `= 1`, or the flipped forms) — inferred
  *    `isnotnull(rank)` conjuncts are discarded (row_number is never
  *    null), any other conjunct must not reference the rank and is kept
  *    as a residual Filter;
  *  - the Project above references the rank column nowhere (the idiom's
  *    `.drop`) — TopKPerKey returns rows, not ranks;
  *  - the partition spec is non-empty (global top-k already has
  *    TakeOrderedAndProject) and the order spec is non-empty.
  *
  * Tie semantics are unchanged in distribution: row_number picks
  * arbitrary winners among order-equal rows and so does the bounded
  * heap; queries needing determinism already carry tie-free orderings
  * (the oracle gate enforces that library-wide).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** `rank bounded above by k` in the shapes the analyzer/optimizer
    * leaves behind. Returns (rankAttr, k). */
  private object RankBound {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) => Some((a, k))
      case LessThan(a: Attribute, IntegerLiteral(k)) => Some((a, k - 1))
      case EqualTo(a: Attribute, IntegerLiteral(1)) => Some((a, 1))
      case EqualTo(IntegerLiteral(1), a: Attribute) => Some((a, 1))
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) => Some((a, k))
      case GreaterThan(IntegerLiteral(k), a: Attribute) => Some((a, k - 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w: Window))
        if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber, _), _)
            if w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
          val rank = alias.toAttribute
          val conjuncts = splitConjunctivePredicates(cond)
          val bounds = conjuncts.collect {
            case RankBound(a, k) if a.exprId == rank.exprId => k
          }
          val residual = conjuncts.filter {
            case RankBound(a, _) if a.exprId == rank.exprId => false
            case IsNotNull(a: Attribute) if a.exprId == rank.exprId => false
            case _ => true
          }
          val projReferencesRank =
            projList.exists(_.references.exists(_.exprId == rank.exprId))
          val residualReferencesRank =
            residual.exists(_.references.exists(_.exprId == rank.exprId))
          if (bounds.size == 1 && bounds.head >= 1 &&
              !projReferencesRank && !residualReferencesRank) {
            val topk = TopKPerKey.normalized(w.partitionSpec, w.orderSpec,
              bounds.head, w.child)
            Project(projList,
              residual.reduceOption(And).map(Filter(_, topk)).getOrElse(topk))
          } else p
        case _ => p
      }
  }
}
