package graft

import graft.functions.Functions.normalizeText
import graft.operators.TextDedup
import graft.plans.GraftExtensions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The codegen'd MinHashSigs expression must be bit-identical to the
  * composed-builtin derivation it replaced (explode shingles → md5 →
  * min over digest segments) — the DuckDB oracle re-derives that
  * exact formula.
  */
class MinHashSigsSpec extends SparkSpec {
  import spark.implicits._

  test("expression matches the exploded composed-builtin derivation bit-for-bit") {
    val docs = Tables.table(spark, sfDir, "documents")
    val viaExpr = TextDedup.minhashSignatures(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val sigCols = (0 until 6).map(i =>
      min(substring(col("_h"), 1 + 5 * i, 5)).as(s"sig_$i"))
    val viaExplode = docs
      .withColumn("_norm", normalizeText(col("text")))
      .withColumn("_sh", explode(TextDedup.shingleExpr("_norm", 5)))
      .withColumn("_h", md5(col("_sh")))
      .groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaExpr.nonEmpty && viaExpr === viaExplode)
  }

  test("short and repetitive texts shingle like shingleExpr") {
    val d = Seq((1L, "ab"), (2L, "aaaaaaaa"), (3L, "abcdef")).toDF("doc_id", "text")
    val viaExpr = TextDedup.minhashSignatures(d, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val sigCols = (0 until 6).map(i =>
      min(substring(col("_h"), 1 + 5 * i, 5)).as(s"sig_$i"))
    val viaExplode = d
      .withColumn("_norm", normalizeText(col("text")))
      .withColumn("_sh", explode(TextDedup.shingleExpr("_norm", 5)))
      .withColumn("_h", md5(col("_sh")))
      .groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaExpr === viaExplode)
  }

  test("null text rows are dropped, matching explode semantics") {
    val d = Seq((1L, Some("hello world text")), (2L, None))
      .toDF("doc_id", "text")
    val out = TextDedup.minhashSignatures(d, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("registered SQL function works with literal args") {
    GraftExtensions.register(spark)
    val r = Seq("some normalized text").toDF("t")
      .selectExpr("minhash_sigs(t, 6, 5) AS s")
      .selectExpr("size(s)").as[Int].head()
    assert(r === 6)
  }

  test("non-literal or null shape args raise AnalysisException, not CCE/NPE") {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq((1, "some text")).toDF("id", "text")
    df.createOrReplaceTempView("mh_arg_check")
    val nonFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sigs(text, id) FROM mh_arg_check").collect()
    }
    assert(nonFoldable.getMessage.contains("minhash_sigs"))
    val nullLit = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT packed_shingles(text, CAST(NULL AS INT)) FROM mh_arg_check").collect()
    }
    assert(nullLit.getMessage.contains("packed_shingles"))
  }

  test("xx64 twin: seed-i xxhash64 minima, unsigned order, null/shingle parity") {
    GraftExtensions.register(spark)
    // value contract: element i = unsigned-min over distinct shingles
    // of XXH64(shingle, seed = i) — re-derive with Spark's builtin
    // xxhash64 impossible (fixed seed 42), so re-derive in-process
    val d = Seq((1L, "the quick brown fox"), (2L, "ab"), (3L, "aaaaaaaa"))
      .toDF("doc_id", "text")
    val got = TextDedup.minhashSignaturesXx64(d, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (0 until 6).map(i => r.getLong(i + 1))).toMap
    def expected(text: String): Seq[Long] = {
      val norm = text.toLowerCase.replaceAll("[^a-z0-9 ]", "")
        .replaceAll("\\s+", " ").trim
      val count = math.max(norm.length - 4, 1)
      val shingles = (0 until count)
        .map(i => norm.substring(i, math.min(i + 5, norm.length))).distinct
      (0 until 6).map { k =>
        shingles.map(sh => org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(
            org.apache.spark.unsafe.types.UTF8String.fromString(sh), k.toLong))
          .reduce((a, b) => if (java.lang.Long.compareUnsigned(a, b) < 0) a else b)
      }
    }
    assert(got(1L) === expected("the quick brown fox"))
    assert(got(2L) === expected("ab"))
    assert(got(3L) === expected("aaaaaaaa"))
    // null rows drop, like the md5 path
    val withNull = Seq((1L, Some("hello world")), (2L, None)).toDF("doc_id", "text")
    assert(TextDedup.minhashSignaturesXx64(withNull, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("xx64 pair pipeline: exact-dup pairs identical to md5 path; near-dup recall holds") {
    val d0 = Tables.table(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val n = d0.count()
    def pairSet(df: org.apache.spark.sql.DataFrame, xx: Boolean): Set[(Long, Long)] = {
      val pairs =
        if (xx) TextDedup.lshCandidatePairs(
          TextDedup.lshBandsXx64(
            TextDedup.minhashSignaturesXx64(df, "doc_id", "text"), "doc_id"), "doc_id")
        else TextDedup.lshCandidatePairs(
          TextDedup.lshBands(
            TextDedup.minhashSignatures(df, "doc_id", "text"), "doc_id"), "doc_id")
      pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // exact duplicates: identical text → identical signatures in ANY
    // hash family → the (d, d+20000) pair set must be COMPLETE and
    // equal between the families
    val exact = d0.unionByName(
      d0.select((col("doc_id") + 20000).as("doc_id"), col("text")))
    val exactWanted = d0.select("doc_id").as[Long].collect()
      .map(id => (id, id + 20000)).toSet
    assert((pairSet(exact, xx = false) & exactWanted) === exactWanted)
    assert((pairSet(exact, xx = true) & exactWanted) === exactWanted)
    // planted near-dups (text + " copy"): banding is probabilistic and
    // hash-family-dependent — candidate SETS legitimately differ (the
    // verification jaccard decides truth) — but recall of the planted
    // high-jaccard pairs must hold in both families
    val near = d0.unionByName(d0.select(
      (col("doc_id") + 10000).as("doc_id"),
      concat(col("text"), lit(" copy")).as("text")))
    def recall(s: Set[(Long, Long)]): Long =
      s.count { case (a, b) => b == a + 10000 }
    assert(recall(pairSet(near, xx = false)) >= (n * 95) / 100)
    assert(recall(pairSet(near, xx = true)) >= (n * 95) / 100)
  }

  test("long band keys (md5 sigs + xxhash64 buckets) give EXACTLY the md5-band pair set") {
    // the registered dd_minhash_pairs_xx64 path: band-key equality
    // must be slice equality regardless of key function, so the pair
    // set is deterministic — exact equality, not just recall, and on
    // the planted-duplicate corpus, not just the raw table
    val d0 = Tables.table(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val planted = d0.unionByName(d0.select(
      (col("doc_id") + 10000).as("doc_id"),
      concat(col("text"), lit(" copy")).as("text")))
    val sigs = TextDedup.minhashSignatures(planted, "doc_id", "text")
    def pairs(bands: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      TextDedup.lshCandidatePairs(bands, "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaMd5 = pairs(TextDedup.lshBands(sigs, "doc_id"))
    val viaXx = pairs(TextDedup.lshBandsXx64(sigs, "doc_id"))
    assert(viaXx.nonEmpty && viaXx === viaMd5)
  }

  test("xx64 signature stage: scan-side, no KEY shuffle, single expression instance") {
    val docs = Tables.table(spark, sfDir, "documents")
    val plan = TextDedup.minhashSignaturesXx64(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the signature never moves data BY KEY; the only exchange allowed
    // is Tables.spreadScan's round-robin parallelism floor, which is
    // the identity on an adequately-split scan (any table at scale)
    assert(!plan.contains("hashpartitioning"), s"unexpected key shuffle:\n$plan")
    assert(plan.sliding("minhash_sigs_xx64".length)
      .count(_ == "minhash_sigs_xx64") === 1, plan)
  }

  test("signature stage explains with no KEY shuffle below it") {
    val docs = Tables.table(spark, sfDir, "documents")
    val plan = TextDedup.minhashSignatures(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), s"unexpected key shuffle:\n$plan")
    // the expression must appear exactly once (no per-column re-inline)
    assert(plan.sliding("minhash_sigs".length).count(_ == "minhash_sigs") === 1, plan)
  }
}
