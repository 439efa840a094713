package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ordered SQL workflow runner — the reference's warehouse query
  * runner (`transform_check.py:50-128`) re-expressed over spark.sql +
  * temp views: transforms run as multi-statement SQL, quality-checks
  * and tests are violation-count queries that fail the workflow when
  * any violations surface.
  */
object SqlWorkflow {

  sealed trait Step { def name: String; def sql: String }
  /** DDL/DML-style transform: statements run in order, last result
    * registered as a temp view named after the step. */
  final case class Transform(name: String, sql: String) extends Step
  /** Violation query: first column of first row must be 0. */
  final case class QualityCheck(name: String, sql: String) extends Step
  /** Same convention as QualityCheck (the reference distinguishes
    * "tests" from "quality checks" only by directory). */
  final case class TestStep(name: String, sql: String) extends Step

  final case class StepResult(step: String, kind: String, violations: Long,
                              passed: Boolean)

  final case class WorkflowFailed(step: String, violations: Long)
    extends RuntimeException(s"workflow step $step failed: $violations violations")

  /** Run steps in order; transforms register views, checks assert 0
    * violations (raise-on-violation, `transform_check.py:67-82`).
    * Returns per-step results when all pass.
    */
  def run(spark: SparkSession, steps: Seq[Step]): Seq[StepResult] =
    steps.map {
      case Transform(name, sql) =>
        val statements = sql.split(";").map(_.trim).filter(_.nonEmpty)
        val frames = statements.map(spark.sql)
        frames.last.createOrReplaceTempView(name)
        StepResult(name, "transform", 0L, passed = true)
      case step @ (_: QualityCheck | _: TestStep) =>
        val kind = step match {
          case _: QualityCheck => "quality_check"
          case _ => "test"
        }
        val violations = spark.sql(step.sql).collect()(0).get(0) match {
          case n: Number => n.longValue()
          case other => sys.error(s"check ${step.name} returned non-numeric: $other")
        }
        if (violations > 0) throw WorkflowFailed(step.name, violations)
        StepResult(step.name, kind, violations, passed = true)
    }
}
