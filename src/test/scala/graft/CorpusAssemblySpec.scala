package graft

import graft.operators.{Sampling, TextAnalysis}
import graft.plans.GraftExtensions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing, RAG chunking, and the true Damerau–Levenshtein
  * expression: the invariants the DuckDB oracles can't see (plan
  * shape, determinism under repartitioning, the OSA-vs-true-DL
  * distinction, reconstruction properties).
  */
class CorpusAssemblySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet")

  // ───────────────────────── packPlan ─────────────────────────

  private lazy val manifest = Sampling.packPlan(
    docs.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("_tok")),
    "doc_id", col("_tok"), seqLen = 128, shards = 4, seed = "specpack")
    .cache()

  test("packPlan: offsets are the exact in-shard prefix sums and " +
    "positions are dense") {
    val rows = manifest
      .select("shard", "pack_pos", "token_offset", "n_tokens")
      .collect()
      .groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        "pack_pos must be dense 1..n per shard")
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getLong(2) == cum,
          s"token_offset must equal the running token sum, got $r")
        cum += r.getLong(3)
      }
    }
  }

  test("packPlan: sequence spans match integral division of the " +
    "offset range") {
    manifest.collect().foreach { r =>
      val off = r.getAs[Long]("token_offset")
      val tok = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("first_seq") == off / 128)
      assert(r.getAs[Long]("last_seq") == (off + tok - 1) / 128)
      assert(r.getAs[Long]("n_seqs") ==
        (off + tok - 1) / 128 - off / 128 + 1)
    }
  }

  test("packPlan: decomposed cumsum equals the single-window " +
    "formulation and is repartition-invariant") {
    val base = docs.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("_tok"))
    // naive single-window reference: one window per shard
    val keyed = base.select(col("doc_id"),
      greatest(col("_tok").cast("long"), lit(1L)).as("n_tokens"),
      md5(concat(lit("specpack"), col("doc_id").cast("string"))).as("_skey"))
      .select(col("doc_id"), col("n_tokens"),
        pmod(conv(substring(col("_skey"), 1, 6), 16, 10).cast("long"),
          lit(4L)).as("shard"),
        substring(col("_skey"), 7, 26).as("_okey"))
    val w = Window.partitionBy(col("shard")).orderBy(col("_okey"), col("doc_id"))
    val naive = keyed.select(col("doc_id"), col("shard"), col("n_tokens"),
      row_number().over(w).cast("long").as("pack_pos"),
      coalesce(sum(col("n_tokens"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("token_offset"))
    val got = manifest
      .select("doc_id", "shard", "n_tokens", "pack_pos", "token_offset")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "decomposition must equal the sequential per-shard packing")

    val repart = Sampling.packPlan(
      base.repartition(13), "doc_id", col("_tok"),
      seqLen = 128, shards = 4, seed = "specpack")
    assert(repart.exceptAll(manifest).isEmpty &&
      manifest.exceptAll(repart).isEmpty,
      "manifest must not depend on input partitioning")
  }

  // ───────────────────────── chunkDocs ─────────────────────────

  test("chunkDocs: stride-aligned windows reconstruct the document") {
    val chunks = TextAnalysis.chunkDocs(
      docs.select("doc_id", "text"), "doc_id", "text",
      chunkChars = 200, stride = 150)
    // non-overlapping prefix of each chunk (chunk_len vs stride) glues
    // back to the original text
    val rebuilt = chunks
      .withColumn("_piece", expr("substring(chunk_text, 1, 150)"))
      .groupBy("doc_id")
      .agg(concat_ws("", collect_list(struct(col("chunk_id"), col("_piece"))
        .getField("_piece"))).as("_joined"),
        max(col("chunk_id")).as("_maxc"), count(lit(1)).as("_n"))
    // collect_list order is nondeterministic → re-derive via sort
    val ordered = chunks.orderBy("doc_id", "chunk_id")
      .select(col("doc_id"), expr("substring(chunk_text, 1, 150)").as("p"))
      .as[(Long, String)].collect()
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).mkString }
    val originals = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(ordered.nonEmpty)
    ordered.foreach { case (id, glued) =>
      assert(glued == originals(id), s"doc $id must reassemble from chunks")
    }
    // every chunk except the last is full-length or the doc is short
    val counts = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("chunk_id").as("mx"))
      .collect()
    counts.foreach(r => assert(r.getLong(1) == r.getLong(2) + 1,
      "chunk ids must be dense 0..n-1"))
  }

  test("chunkDocs: NULL text behaves as empty — one empty chunk, doc never lost") {
    val out = TextAnalysis.chunkDocs(
      Seq((1L, Option.empty[String]), (2L, Some("ab"))).toDF("doc_id", "text"),
      "doc_id", "text", chunkChars = 5, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk_text", "chunk_len")
      .as[(Long, Long, String, Int)].collect().toSeq
    assert(out == Seq((1L, 0L, "", 0), (2L, 0L, "ab", 2)))
  }

  test("chunkDocs: empty document still yields one empty chunk") {
    val one = TextAnalysis.chunkDocs(
      Seq((1L, ""), (2L, "ab")).toDF("doc_id", "text"),
      "doc_id", "text", chunkChars = 5, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk_text", "chunk_len")
      .as[(Long, Long, String, Int)].collect().toSeq
    assert(one == Seq((1L, 0L, "", 0), (2L, 0L, "ab", 2)))
  }

  // ─────────────────── damerau_levenshtein ───────────────────

  test("damerau_levenshtein: true DL, not OSA, and agrees between " +
    "interpreted and codegen paths") {
    GraftExtensions.register(spark)
    val cases = Seq(
      ("CA", "ABC", 2),        // true DL; OSA answers 3
      ("ab", "ba", 1),         // adjacent transposition
      ("kitten", "sitting", 3),
      ("", "", 0),
      ("", "abc", 3),
      ("abc", "", 3),
      ("same", "same", 0),
      ("abcdef", "abcfad", 3))
    val df = cases.toDF("a", "b", "want")
    val got = df.selectExpr("want", "damerau_levenshtein(a, b) AS got")
      .as[(Int, Int)].collect()
    got.foreach { case (want, d) => assert(d == want) }
    // interpreted path (codegen off) must agree
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.selectExpr("want", "damerau_levenshtein(a, b) AS got")
        .as[(Int, Int)].collect()
      interp.foreach { case (want, d) => assert(d == want) }
    }
    // null semantics: null in → null out
    val n = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b").selectExpr("damerau_levenshtein(a, b)").collect()
    assert(n.head.isNullAt(0))
    // symmetric
    val sym = df.selectExpr(
      "damerau_levenshtein(a, b) = damerau_levenshtein(b, a) AS eq")
      .as[Boolean].collect()
    assert(sym.forall(identity))
  }

  test("damerau_levenshtein: banded 3-arg form agrees with exact below " +
    "the cap and returns cap+1 above it") {
    GraftExtensions.register(spark)
    // deterministic fuzz: pairs of short strings over a small alphabet
    // (high collision/transposition density), plus targeted shapes
    val rnd = new scala.util.Random(0x5eed)
    def word(): String =
      (0 until (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString
    val pairs = Seq.tabulate(4000)(_ => (word(), word())) ++ Seq(
      ("CA", "ABC"), ("ab", "ba"), ("", "abcdefgh"), ("abcdefgh", ""),
      ("abcd", "abcd"), ("aaaa", "bbbb"))
    val df = pairs.toDF("a", "b")
    for (cap <- Seq(0, 1, 2, 3, 5)) {
      val bad = df.selectExpr("a", "b",
          "damerau_levenshtein(a, b) AS exact",
          s"damerau_levenshtein(a, b, $cap) AS capped")
        .where(s"capped <> least(exact, ${cap + 1})")
        .collect()
      assert(bad.isEmpty,
        s"cap=$cap disagreements: ${bad.take(5).mkString(", ")}")
    }
  }

  test("damerau_levenshtein: supplementary code points count as one") {
    GraftExtensions.register(spark)
    val emoji = "a😀b" // a😀b — 4 UTF-16 units, 3 code points
    val d = Seq((emoji, "ab")).toDF("a", "b")
      .selectExpr("damerau_levenshtein(a, b)").as[Int].head()
    assert(d == 1, "one code-point delete, not two char edits")
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
