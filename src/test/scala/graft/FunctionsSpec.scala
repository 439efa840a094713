package graft

import graft.functions.Functions._
import graft.sources.Tables
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).collect()(0).getString(0)

  test("normalizeText lowers, strips punctuation, collapses whitespace") {
    assert(one(normalizeText(lit("  Hello,   WORLD!! 42 "))) === "hello world 42")
    assert(one(normalizeText(lit("a-b_c"))) === "abc")
  }

  test("tokenSortRatio is order-insensitive and 100 for permutations") {
    assert(one(tokenSortRatio(lit("new york taxi"), lit("taxi new york"))) === "100.0")
    assert(one(tokenSortRatio(lit(""), lit(""))) === "100.0")
    val partial = one(tokenSortRatio(lit("acme corp"), lit("acme corporation"))).toDouble
    assert(partial > 50 && partial < 100)
  }

  test("recordHash is stable and null-safe") {
    val df = Seq(("a", Some(1)), ("a", None)).toDF("s", "i")
    val hashes = df.select(recordHash(Seq(col("s"), col("i"))).as("h"))
      .as[String].collect()
    assert(hashes(0) !== hashes(1))       // null vs 1 differ
    assert(hashes(0).length === 64)       // sha2-256 hex
    // same input → same hash (determinism)
    val again = df.select(recordHash(Seq(col("s"), col("i"))).as("h")).as[String].collect()
    assert(hashes.toSeq === again.toSeq)
  }

  test("confidence buckets and governance actions (ref fuzzy_match.py:72-89)") {
    val df = Seq(96.0, 85.0, 50.0).toDF("score")
      .select(confidenceBucket(col("score")).as("b"))
      .withColumn("a", governanceAction(col("b")))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq === Seq(
      ("HIGH", "AUTO_MERGE"), ("MEDIUM", "STEWARD_REVIEW"), ("LOW", "NO_ACTION")))
  }

  test("longestString survivorship prefers the longer value") {
    val df = Seq(("short", "much longer value"), ("also longer here", "x"))
      .toDF("a", "b").select(longestString(col("a"), col("b")).as("g"))
    assert(df.as[String].collect().toSeq === Seq("much longer value", "also longer here"))
  }

  test("exactSum is invariant to partitioning (FP associativity guard)") {
    val vals = (1 to 10000).map(i => i * 0.01)
    val a = vals.toDF("v").repartition(1).agg(exactSum(col("v"))).as[Double].collect()(0)
    val b = vals.toDF("v").repartition(37).agg(exactSum(col("v"))).as[Double].collect()(0)
    assert(a === b)
  }

  test("normalizeColumnNames cleans and dedupes") {
    val df = Seq((1, 2, 3)).toDF("Some Col!", "some_col", "OTHER##x")
    assert(Tables.normalizeColumnNames(df).columns.toSeq ===
      Seq("some_col", "some_col_1", "other_x"))
  }

  test("requireCols throws on missing columns") {
    val df = Seq(1).toDF("a")
    Tables.requireCols(df, Seq("a"))
    intercept[IllegalArgumentException] {
      Tables.requireCols(df, Seq("a", "missing"))
    }
  }
}
