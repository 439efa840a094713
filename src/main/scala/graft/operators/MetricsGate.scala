package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted-metrics governance gate — the reference's
  * `lambda/dq-governance-gate/lambda_function.py` re-expressed over a
  * lake path: each validation run persists its metrics as a
  * single-file JSON under `base/run_id=<id>/` (S11), and the gate
  * reads the LATEST run back from storage (latest-by-sort over run
  * prefixes, `lambda_function.py:30-34`) and decides PASS/FAIL on the
  * persisted values (`lambda_function.py:52-120`) — NOT on an
  * in-session frame. That read-back is the point: the gate must see
  * what the lake sees, surviving process boundaries between the ETL
  * job and the governance check.
  */
object MetricsGate {

  /** One run's metrics → `base/run_id=<runId>/` as single-file JSON.
    * coalesce(1) inside is safe: metrics frames are 1-row audit
    * records.
    */
  def persistRun(metrics: DataFrame, basePath: String, runId: String): Unit =
    Tables.writeJsonSingleFile(metrics, s"$basePath/run_id=$runId")

  /** Latest run prefix by lexicographic sort, descending — run ids are
    * sortable (zero-padded / timestamp-shaped), exactly the lambda's
    * `sorted(runs, reverse=True)[0]` over S3 CommonPrefixes. This is a
    * driver-side control-plane listing of RUN DIRECTORIES (one per
    * run), not of data files — O(runs), independent of data scale.
    * Listing goes through the Hadoop FileSystem API so the gate works
    * against any scheme the session can reach (file/hdfs/s3a), not
    * just the local filesystem.
    */
  def latestRunPath(basePath: String): String = {
    val dirs = Tables.listChildDirNames(basePath, "run_id=").sorted.reverse
    require(dirs.nonEmpty, s"No metrics runs found under $basePath")
    s"$basePath/${dirs.head}"
  }

  /** Read the latest persisted metrics and evaluate the governance
    * decision (`lambda_function.py:52-120`): quality_ratio =
    * records_valid / records_read (0 when empty), quality_score =
    * round(ratio×100, 2), PASS iff ratio ≥ threshold. The lambda's
    * FAIL branch reports `freshness_ok: false` (its literal quirk —
    * freshness is a placeholder `true` but the fail response hardcodes
    * false); mirrored for fidelity.
    */
  def evaluate(spark: SparkSession, basePath: String,
               threshold: Double = 0.9): DataFrame = {
    val metrics = spark.read.json(latestRunPath(basePath))
    val ratioRaw = when(col("records_read") > 0,
      col("records_valid").cast("double") / col("records_read"))
      .otherwise(lit(0.0))
    metrics
      .withColumn("_ratio", ratioRaw)
      .select(
        when(col("_ratio") >= threshold, "PASS").otherwise("FAIL").as("decision"),
        when(col("_ratio") >= threshold, lit(null).cast("string"))
          .otherwise(lit("QUALITY_GATE_FAILED")).as("reason"),
        round(col("_ratio"), 4).as("quality_ratio"),
        round(col("_ratio") * 100, 2).as("quality_score"),
        (col("_ratio") >= threshold).as("freshness_ok"))
  }

  /** The round trip as a Pipeline gate: true iff the persisted latest
    * run passes. For use as `Pipeline.Stage(gate = ...)` so a bad
    * persisted run aborts the pipeline (the reference's SNS-alert +
    * Fail branch).
    */
  def passesGate(spark: SparkSession, basePath: String,
                 threshold: Double = 0.9): Boolean =
    evaluate(spark, basePath, threshold)
      .select("decision").head().getString(0) == "PASS"
}
