package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe over a STRING key — the corpus-side
  * half of incremental dedup (filter a new batch against the keys of an
  * already-ingested corpus without shuffling the batch).
  *
  * The serialized filter ships inside the expression (plan-embedded, like a
  * broadcast literal) and is deserialized ONCE per executor task via a
  * transient lazy — per row the probe is two xxhash-style probes into a bit
  * array, fully inside whole-stage codegen. A Scala UDF closing over a
  * broadcast BloomFilter computes the same thing but boxes every row and
  * breaks the codegen span — on a 100 TB scan that difference is the whole
  * game. No false negatives (callers may trust `false`); false positives are
  * resolved by the verify join in
  * [[graft.extensions.IncrementalDedup.dropSeen]].
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires STRING, got ${other.catalogString}")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Bytes-level probe — must mirror how [[graft.extensions.IncrementalDedup]]
    * INSERTS keys (putBinary of UTF-8 bytes). */
  def probe(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the expression instance itself so generated code reuses the
    // executor-deserialized filter instead of re-reading bytes per row
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  def mightContain(key: Column, bloom: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      BloomMightContain(
        org.apache.spark.sql.GraftExpressionBridge.toExpression(key),
        out.toByteArray))
  }
}
