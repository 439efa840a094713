package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Pass-through optimizer barrier: evaluates `child` unchanged but
  * reports itself NON-DETERMINISTIC, so Catalyst will neither push a
  * Filter through the Project that computes it nor collapse/duplicate
  * it into consumers.
  *
  * Why this exists: `PushPredicateThroughNonJoin` substitutes a
  * projected alias into the pushed predicate REGARDLESS of the
  * expression's cost. A filter on a derived column like
  * `governance_action` (whose lineage is two levenshtein-based
  * similarity scores) is re-inlined into the join condition below —
  * the join then evaluates the whole scoring chain per candidate pair
  * a second time (measured 3.5× on the MDM steward queries at 10×
  * scale). Wrapping the expensive root in NoInline pins it to exactly
  * one evaluation per row in its own projection; downstream filters
  * compare the materialized column.
  *
  * The value IS deterministic — only the flag lies — so results,
  * retries, and replays are unaffected; the flag is purely an
  * optimizer fence (the same trick as guarding with `rand() <= 1`,
  * without paying for a RNG or obscuring the plan).
  */
case class NoInline(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): NoInline =
    copy(child = newChild)
  override def prettyName: String = "no_inline"
}

object NoInline {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.functions.call_function
  /** Column-level entry point (via the registered SQL function, the
    * same route as the other graft expressions).
    */
  def apply(spark: SparkSession, c: Column): Column = {
    GraftExtensions.register(spark) // idempotent
    call_function("no_inline", c)
  }
}
