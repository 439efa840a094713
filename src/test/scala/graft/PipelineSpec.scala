package graft

import graft.operators.Pipeline
import graft.operators.Pipeline._
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stages run in order and see prior results") {
    val out = Pipeline.run(spark, "p", Seq(
      Stage("one", (s, _) => Seq(1, 2, 3).toDF("x")),
      Stage("two", (_, prev) => prev("one").withColumn("y", col("x") * 2))))
    out match {
      case Succeeded(results, lineage) =>
        assert(results("two").agg(sum("y")).as[Long].collect()(0) === 12)
        assert(lineage.map(_.pipelineStage) === Seq("one", "two"))
        assert(lineage.forall(_.status === "SUCCESS"))
      case other => fail(s"expected success, got $other")
    }
  }

  test("failing gate aborts the pipeline (governance-gate semantics)") {
    var ranThird = false
    val out = Pipeline.run(spark, "p", Seq(
      Stage("metrics", (s, _) => Seq((100L, 80L)).toDF("total", "valid"),
        gate = df => {
          val r = df.collect()(0)
          r.getLong(1).toDouble / r.getLong(0) >= 0.9 // ref threshold 0.9
        }),
      Stage("curate", (s, _) => { ranThird = true; Seq(1).toDF("x") })))
    out match {
      case GateFailed(stage, _, lineage) =>
        assert(stage === "metrics")
        assert(lineage.last.status === "GATE_FAILED")
        assert(!ranThird)
      case other => fail(s"expected gate failure, got $other")
    }
  }

  test("persisted-metrics gate round trip: latest run decides, bad run aborts") {
    import graft.operators.MetricsGate
    val base = java.nio.file.Files.createTempDirectory("graft_gate_spec_").toString
    // run_001 passes, run_002 (latest) fails — the gate must see run_002
    MetricsGate.persistRun(
      Seq((100L, 95L, "run_001")).toDF("records_read", "records_valid", "run_id"),
      base, "run_001")
    MetricsGate.persistRun(
      Seq((100L, 10L, "run_002")).toDF("records_read", "records_valid", "run_id"),
      base, "run_002")
    assert(MetricsGate.latestRunPath(base).endsWith("run_id=run_002"))
    val decision = MetricsGate.evaluate(spark, base).collect()(0)
    assert(decision.getString(0) === "FAIL")
    assert(decision.getString(1) === "QUALITY_GATE_FAILED")
    assert(decision.getDouble(2) === 0.1)

    // wired as a Pipeline stage gate: the PERSISTED artifact aborts the run
    var ranNext = false
    val out = Pipeline.run(spark, "p", Seq(
      Stage("validate", (s, _) => Seq(1).toDF("x"),
        gate = _ => MetricsGate.passesGate(spark, base)),
      Stage("curate", (s, _) => { ranNext = true; Seq(1).toDF("x") })))
    assert(out.isInstanceOf[GateFailed] && !ranNext)

    // a newer good run flips the same gate to PASS
    MetricsGate.persistRun(
      Seq((100L, 95L, "run_003")).toDF("records_read", "records_valid", "run_id"),
      base, "run_003")
    assert(MetricsGate.passesGate(spark, base))
  }

  test("transient stage failures are retried (ref 3-attempt policy)") {
    var attempts = 0
    val out = Pipeline.run(spark, "p", Seq(
      Stage("flaky", (s, _) => {
        attempts += 1
        if (attempts < 3) sys.error("transient")
        Seq(1).toDF("x")
      }, retries = 3)))
    assert(out.isInstanceOf[Succeeded])
    assert(attempts === 3)
    val Succeeded(_, lineage) = out: @unchecked
    assert(lineage.map(_.status) === Seq("FAILED", "FAILED", "SUCCESS"))
  }

  test("exhausted retries surface StageFailed") {
    val out = Pipeline.run(spark, "p", Seq(
      Stage("dead", (s, _) => sys.error("boom"), retries = 2)))
    out match {
      case StageFailed("dead", e, lineage) =>
        assert(e.getMessage === "boom")
        assert(lineage.size === 2)
      case other => fail(s"expected stage failure, got $other")
    }
  }

  test("lineageDf materializes audit records") {
    val recs = Seq(LineageRecord("p", "s1", "d1", "spark_stage", "SUCCESS", 1))
    val df = Pipeline.lineageDf(spark, recs)
    assert(df.count() === 1)
    assert(df.columns.contains("transformationType"))
  }
}
