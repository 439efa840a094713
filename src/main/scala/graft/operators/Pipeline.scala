package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.{Failure, Success, Try}

/** Driver-side pipeline orchestrator — the Step Functions workflow
  * (`step_functions/Tests.json:1-230`) re-expressed as ordered stages
  * in ONE SparkSession: stage boundaries are action boundaries, not
  * process boundaries, so intermediate frames can stay cached instead
  * of round-tripping through S3 as the reference does.
  */
object Pipeline {

  /** One stage: produce a frame, optionally gate on it.
    * `gate` mirrors the governance-gate lambda (PASS iff quality
    * ratio ≥ threshold, `dq-governance-gate/lambda_function.py:106`):
    * returning false aborts the pipeline (the reference's SNS-alert +
    * Fail branch).
    */
  final case class Stage(
      name: String,
      run: (SparkSession, Map[String, DataFrame]) => DataFrame,
      gate: DataFrame => Boolean = _ => true,
      retries: Int = 3,
      retryBackoffMs: Long = 0L)

  sealed trait Outcome
  final case class Succeeded(results: Map[String, DataFrame],
                             lineage: Seq[LineageRecord]) extends Outcome
  final case class GateFailed(stage: String, results: Map[String, DataFrame],
                              lineage: Seq[LineageRecord]) extends Outcome
  final case class StageFailed(stage: String, error: Throwable,
                               lineage: Seq[LineageRecord]) extends Outcome

  /** Lineage row shape (ref write_data_lineage/lambda_function.py:16-43). */
  final case class LineageRecord(
      pipelineName: String, pipelineStage: String, datasetName: String,
      transformationType: String, status: String, attempt: Int)

  /** Execute stages in order. Each stage sees all prior results by
    * stage name. Retry policy mirrors the Glue task states
    * (3 attempts, backoff — `step_functions/Tests.json:15-28`).
    */
  def run(spark: SparkSession, pipelineName: String,
          stages: Seq[Stage]): Outcome = {
    var results = Map.empty[String, DataFrame]
    val lineage = scala.collection.mutable.ArrayBuffer.empty[LineageRecord]

    for (stage <- stages) {
      var attempt = 0
      var done = false
      var lastError: Throwable = null
      while (!done && attempt < math.max(1, stage.retries)) {
        attempt += 1
        Try(stage.run(spark, results)) match {
          case Success(df) =>
            done = true
            results += stage.name -> df
            lineage += LineageRecord(pipelineName, stage.name, stage.name,
              "spark_stage", "SUCCESS", attempt)
            if (!stage.gate(df)) {
              lineage += LineageRecord(pipelineName, stage.name, stage.name,
                "governance_gate", "GATE_FAILED", attempt)
              return GateFailed(stage.name, results, lineage.toSeq)
            }
          case Failure(e) =>
            lastError = e
            lineage += LineageRecord(pipelineName, stage.name, stage.name,
              "spark_stage", "FAILED", attempt)
            if (attempt < stage.retries && stage.retryBackoffMs > 0)
              Thread.sleep(stage.retryBackoffMs * (1L << (attempt - 1)))
        }
      }
      if (!done) return StageFailed(stage.name, lastError, lineage.toSeq)
    }
    Succeeded(results, lineage.toSeq)
  }

  /** Lineage records as a DataFrame for the audit sink (S7+S11). */
  def lineageDf(spark: SparkSession, records: Seq[LineageRecord]): DataFrame = {
    import spark.implicits._
    records.toDF()
  }
}
