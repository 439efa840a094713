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

  /** Per-step bounded retry with exponential backoff — the
    * reference's Step Functions task retry policy
    * (`step_functions/Tests.json:15-28`: IntervalSeconds 60,
    * MaxAttempts 3, BackoffRate 2; also the Glue job retry policy).
    * `retryOn` decides which failures are TRANSIENT: by default every
    * exception except [[WorkflowFailed]] — a violation count is
    * deterministic, so re-running the same check burns three backoff
    * waits to fail identically (the reference's Catch → Pipeline
    * Failed edge, not its Retry edge). `sleep` is injectable so specs
    * exercise the schedule without real waits.
    */
  final case class RetryPolicy(maxAttempts: Int = 3,
                               intervalSeconds: Double = 60.0,
                               backoffRate: Double = 2.0,
                               retryOn: Throwable => Boolean =
                                 !_.isInstanceOf[WorkflowFailed],
                               sleep: Long => Unit = Thread.sleep) {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
  }

  object RetryPolicy {
    /** Single attempt — the pre-retry behavior (fail fast). */
    val none: RetryPolicy = RetryPolicy(maxAttempts = 1)
  }

  private[graft] def withRetry[A](policy: RetryPolicy, step: String)(body: => A): A = {
    var attempt = 1
    var wait = policy.intervalSeconds
    while (true) {
      try return body
      catch {
        // an interrupt is a cancellation, not a transient failure:
        // swallowing it into a backoff sleep would lose the interrupt
        // and turn a cancel into a 60s wait — restore the flag, rethrow
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        // NonFatal: never retry VM-fatal errors (OutOfMemoryError,
        // NoClassDefFoundError) — retryOn only classifies the
        // non-fatal ones as transient vs deterministic
        case scala.util.control.NonFatal(e)
            if attempt < policy.maxAttempts && policy.retryOn(e) =>
          System.err.println(
            s"[workflow] step $step attempt $attempt/${policy.maxAttempts} " +
              s"failed (${e.getClass.getSimpleName}: ${e.getMessage}); " +
              f"retrying in $wait%.0fs")
          policy.sleep((wait * 1000).toLong)
          wait *= policy.backoffRate
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** Run steps in order; transforms register views, checks assert 0
    * violations (raise-on-violation, `transform_check.py:67-82`).
    * Each step runs under `retry` (default: single attempt — pass
    * [[RetryPolicy]]() for the reference's 3×/60 s/2.0 schedule).
    * Returns per-step results when all pass.
    */
  def run(spark: SparkSession, steps: Seq[Step],
          retry: RetryPolicy = RetryPolicy.none): Seq[StepResult] =
    steps.map { s =>
      withRetry(retry, s.name) {
        s match {
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
              case other =>
                sys.error(s"check ${step.name} returned non-numeric: $other")
            }
            if (violations > 0) throw WorkflowFailed(step.name, violations)
            StepResult(step.name, kind, violations, passed = true)
        }
      }
    }
}
