package graft.plans

import graft.functions.CosineSim
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Norm-bound optimizer rule for `cosine_sim` predicates (SURVEY §4 item 2).
  *
  * Cosine similarity is scale-invariant, so no per-row norm test can prune a
  * threshold in (-1, 1] — the *complete* norm bound on the value is the
  * static range cos ∈ [-1, 1] plus the literal side's norm, both decidable
  * at plan time. The rule exploits exactly that:
  *
  *  1. Literal-side norm fold (any expression context): if one argument is
  *     a literal vector that is null or has zero norm, `cosine_sim` is null
  *     for every row — fold the call to `Literal(null)`. The per-row kernel
  *     (O(d) per row, d=64 here) disappears from the plan entirely.
  *  2. Range bound (filter conjuncts): a comparison against a threshold
  *     outside [-1, 1] is statically decided. The impossible direction
  *     (`cos >= τ`, τ > 1) becomes `false`, which Catalyst's PruneFilters
  *     then collapses to an empty LocalRelation — the table scan itself is
  *     eliminated, the strongest possible pruning. The certain direction
  *     (`cos >= τ`, τ ≤ -1) reduces to `IsNotNull(cos)`, preserving the
  *     SQL null semantics of the original comparison.
  *
  * Both rewrites are null-exact: a conjunct is only replaced at the top
  * level of a Filter condition, where `null` and `false` filter identically
  * (never under NOT, where they would not).
  *
  * Injected at session build via GraftExtensions (injectOptimizerRule) or
  * at runtime into an existing session via `install` — it lands in the
  * operator-optimization fixed point, so ConstantFolding first canonicalizes
  * thresholds to double literals and PruneFilters consumes the `false` this
  * rule produces within the same batch.
  */
object CosineBoundRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Squared norm of a literal float-vector argument, if statically known.
    * Returns Some(-1) for a null literal (cosine is null regardless of the
    * other side); None when the side is not a clean foldable vector (rows
    * with null *elements* are left to runtime). */
  private def litNormSq(e: Expression): Option[Double] = e match {
    case Literal(null, _) => Some(-1.0)
    case Literal(a: ArrayData, ArrayType(FloatType, _)) =>
      var s = 0.0
      var i = 0
      val n = a.numElements()
      var hasNull = false
      while (i < n) {
        if (a.isNullAt(i)) hasNull = true
        else { val x = a.getFloat(i).toDouble; s += x * x }
        i += 1
      }
      if (hasNull) None else Some(s)
    case _ => None
  }

  /** cosine_sim provably null for all rows (null or zero-norm literal side). */
  private def alwaysNull(c: CosineSim): Boolean =
    litNormSq(c.left).exists(_ <= 0.0) || litNormSq(c.right).exists(_ <= 0.0)

  /** cosine_sim, possibly wrapped in round(·, k): rounding keeps the value
    * inside [-1, 1] and is null exactly when the cosine is null, so every
    * static decision below holds through the wrapper (the engine's own
    * queries compare `round(cosine_sim(...), k)` for determinism). */
  private object CosLike {
    def unapply(e: Expression): Option[CosineSim] = e match {
      case c: CosineSim           => Some(c)
      case Round(c: CosineSim, _, _) => Some(c)
      case _ => None
    }
  }

  /** Canonicalize `cos OP τ` / `τ OP cos` to (cos, τ, greater?, strict?). */
  private object CosVsLit {
    def unapply(e: Expression): Option[(CosineSim, Double, Boolean, Boolean)] = e match {
      case GreaterThanOrEqual(CosLike(c), Literal(t: Double, DoubleType)) => Some((c, t, true, false))
      case GreaterThan(CosLike(c), Literal(t: Double, DoubleType))        => Some((c, t, true, true))
      case LessThanOrEqual(CosLike(c), Literal(t: Double, DoubleType))    => Some((c, t, false, false))
      case LessThan(CosLike(c), Literal(t: Double, DoubleType))           => Some((c, t, false, true))
      case GreaterThanOrEqual(Literal(t: Double, DoubleType), CosLike(c)) => Some((c, t, false, false))
      case GreaterThan(Literal(t: Double, DoubleType), CosLike(c))        => Some((c, t, false, true))
      case LessThanOrEqual(Literal(t: Double, DoubleType), CosLike(c))    => Some((c, t, true, false))
      case LessThan(Literal(t: Double, DoubleType), CosLike(c))           => Some((c, t, true, true))
      case _ => None
    }
  }

  /** Decide a canonicalized comparison from cos ∈ [-1, 1]. */
  private def decide(c: CosineSim, t: Double, greater: Boolean, strict: Boolean): Option[Expression] = {
    val impossible =
      if (greater) (strict && t >= 1.0) || (!strict && t > 1.0)
      else (strict && t <= -1.0) || (!strict && t < -1.0)
    val certain =
      if (greater) (strict && t < -1.0) || (!strict && t <= -1.0)
      else (strict && t > 1.0) || (!strict && t >= 1.0)
    if (impossible) Some(Literal.FalseLiteral)
    else if (certain) Some(IsNotNull(c))
    else None
  }

  private def rewriteConjunct(e: Expression): Expression = e match {
    case CosVsLit(c, t, greater, strict) => decide(c, t, greater, strict).getOrElse(e)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val folded = plan.transformAllExpressions {
      case c: CosineSim if alwaysNull(c) => Literal(null, DoubleType)
    }
    folded.transform {
      case f @ Filter(cond, child) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val rewritten = conjuncts.map(rewriteConjunct)
        if (rewritten == conjuncts) f else Filter(rewritten.reduce(And), child)
    }
  }

  /** Append the rule to an existing session's optimizer (idempotent) — for
    * sessions the library did not construct (e.g. the driver's). Sessions
    * built with GraftExtensions get it via injectOptimizerRule instead. */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(this))
      exp.extraOptimizations = exp.extraOptimizations :+ this
  }
}
