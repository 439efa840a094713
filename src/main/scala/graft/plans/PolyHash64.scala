package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash over a string's code points:
  * `acc = acc * 31 + codePoint` in wrapping 64-bit arithmetic.
  *
  * The document-fingerprinting primitive (rolling hash) that composed
  * built-ins can't express without an array materialization per row
  * (transform + aggregate allocates; this is a tight loop). Registered
  * as the SQL function `poly_hash64` via [[GraftExtensions]].
  */
case class PolyHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash64 requires STRING, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PolyHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PolyHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)

  override def prettyName: String = "poly_hash64"
}

object PolyHash64 {
  /** Static hot loop invoked from both interpreted and generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = acc * 31L + cp
      i += Character.charCount(cp)
    }
    acc
  }
}
