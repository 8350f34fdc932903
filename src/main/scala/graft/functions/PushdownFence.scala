package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that the optimizer must not move: it evaluates to
  * exactly its child, but reports `deterministic = false`, so Catalyst's
  * predicate-pushdown rules (which only move deterministic conjuncts) leave
  * any filter containing it where the query wrote it.
  *
  * Why it exists (r17, guide §4.4's technique applied to Column exprs): a
  * deterministic filter over [[graft.ops.Fanout.forCpu]]'s round-robin
  * exchange is pushed below the exchange onto the SCAN — which on a
  * narrow-split input is a single task, so a CPU-heavy predicate
  * (tokenize/regex per row) runs single-threaded on one core while the
  * fan-out above it sits idle. Fencing the predicate keeps it on the fanned
  * side of the exchange. The profiler measured the worst case on x56's
  * quality gate: a 2.5 s single-task scan+filter stage that fences to
  * ~0.1 s across 32 tasks.
  *
  * Use ONLY on expensive predicates directly above a deliberate exchange:
  * a fenced filter also blocks pushdown past JOINS and into the parquet
  * scan, so fencing a cheap selective predicate (id ranges, column
  * null-checks) would destroy real scan pruning for no gain.
  *
  * Retry/speculation-safe despite the nondeterminism marker: the expression
  * IS a pure function of its input row (the marker only constrains the
  * optimizer), and the exchange below it keeps its own determinism
  * contract (sort-before-repartition).
  */
case class PushdownFence(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def foldable: Boolean = false

  override def dataType: DataType = child.dataType

  override def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eval = child.genCode(ctx)
    ev.copy(code = eval.code, isNull = eval.isNull, value = eval.value)
  }

  override protected def withNewChildInternal(newChild: Expression): PushdownFence =
    copy(child = newChild)

  override def prettyName: String = "pushdown_fence"
}

object PushdownFence {

  /** Column-API entry point: `df.filter(fence(expensivePredicate))`. */
  def fence(c: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      PushdownFence(org.apache.spark.sql.GraftExpressionBridge.toExpression(c)))
}
