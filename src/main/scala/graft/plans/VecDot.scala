package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd vector dot product over `array<float>`/`array<double>`
  * columns — the per-pair hot op of every similarity-search plan
  * (brute-force ANN, LSH/IVF probe scoring, embedding near-dup,
  * k-means assignment).
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function
  * formulation, which is CodegenFallback: the lambda evaluates
  * interpreted with per-element boxing (NOTES.md round-2 fact 9
  * measured HOF minhash 14× slower than codegen'd equivalents). This
  * is one tight JVM loop per pair with no allocation.
  *
  * Bit-compatible with the HOF version: elements promote to double
  * BEFORE multiplication and accumulate left-to-right, so every
  * existing oracle-checked cosine is unchanged. Null semantics also
  * match `zip_with` poisoning: mismatched lengths or a null element
  * yield NULL. Registered as the SQL function `vec_dot` via
  * [[GraftExtensions]].
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires ARRAY<FLOAT|DOUBLE> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (aF, bF) = (elemIsFloat(left), elemIsFloat(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecDot")
      s"""
         |java.lang.Double $tmp = graft.plans.VecDot.dotBoxed($a, $b, $aF, $bF);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  /** Static hot loop shared by interpreted and generated code.
    * Left-to-right accumulation; null on length mismatch or null
    * element (matching zip_with's null poisoning).
    */
  def dotBoxed(a: ArrayData, b: ArrayData,
               aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
