package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression,
  GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein,
  Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: thresholded Levenshtein predicates run BANDED.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) dynamic program
  * per row and then compares — but Spark's 3-arg `levenshtein(a, b, k)`
  * evaluates only the 2k+1-wide diagonal band (O(k·min(|a|,|b|))) and
  * returns −1 beyond the threshold. For a fuzzy-match filter over long
  * strings at corpus scale the difference is the whole row budget; users
  * writing the natural predicate should get the banded plan for free.
  *
  * Rewrites (integer literal k, threshold not already present):
  *   - `lev(a,b) <= k` (k ≥ 0)  →  `lev(a,b,k) >= 0`
  *   - `lev(a,b) <  k` (k ≥ 1)  →  `lev(a,b,k−1) >= 0`
  *   - `k >= lev(a,b)` / `k > lev(a,b)` — the mirrored forms likewise.
  *
  * Semantics are identical including nulls: the banded form is null iff an
  * input is null, exactly like the unbanded comparison; out-of-band rows
  * yield −1 ≥ 0 = false, exactly the original false. k < 0 (always-false)
  * and k-as-column forms are left for constant folding / unchanged.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`, or
  * imperatively through `GraftExtensions.register` (experimental
  * extraOptimizations) — either way it runs with the other resolved-plan
  * optimizer batches.
  */
object ThresholdLevenshteinRewrite extends Rule[LogicalPlan] {

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 0 => banded(l, r, k)
      case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 1 => banded(l, r, k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 0 => banded(l, r, k)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 1 => banded(l, r, k - 1)
    }
}
