package graft

import graft.operators.{Multimodal, Similarity, TextAnalysis, TextDedup}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.table(spark, sfDir, "documents")
  private lazy val emb = Tables.table(spark, sfDir, "embeddings")

  // NB: the synthetic documents table's `lang` label does not reflect
  // actual text language (all docs are English-ish word soup), so
  // language-ID is tested on real-language samples instead.
  test("languageId classifies real-language samples") {
    val samples = Seq(
      ("en", "the cat sat on the mat and looked out of the window for hours"),
      ("es", "el perro corre por la calle y los gatos duermen en una casa"),
      ("de", "der hund läuft und die katze ist ein tier zu hause"),
      ("fr", "le chien court dans les rues et est une bête des villes"),
      ("zh", "中文文本处理是自然语言处理的重要组成部分")).toDF("expected", "text")
    val out = samples.withColumn("pred", TextAnalysis.languageId($"text"))
    assert(out.filter($"pred" =!= $"expected").count() === 0)
  }

  test("exact dedup removes injected identical copies and keeps min ids") {
    val corpus = docs.select("doc_id", "text")
      .unionByName(docs.select(($"doc_id" + 20000).as("doc_id"), $"text"))
    val deduped = TextDedup.dedupExact(corpus, "doc_id", "text")
    assert(deduped.count() === docs.count())
    assert(deduped.filter($"doc_id" >= 20000).count() === 0)
  }

  test("minhash LSH recalls injected near-duplicates") {
    val d = docs.select("doc_id", "text", "lang")
    val corpus = d.unionByName(d.select(($"doc_id" + 10000).as("doc_id"),
      concat($"text", lit(" copy")).as("text"), $"lang"))
    val pairs = TextDedup.lshCandidatePairs(
      TextDedup.lshBands(
        TextDedup.minhashSignatures(corpus, "doc_id", "text"), "doc_id"), "doc_id")
    val planted = pairs.filter($"id_2" === $"id_1" + 10000).count()
    // near-identical docs (one appended token) should mostly collide
    assert(planted.toDouble / d.count() > 0.8, s"LSH recall $planted/${d.count()}")
  }

  test("ngram jaccard scores injected near-dups close to 1") {
    val d = docs.select("doc_id", "text", "lang")
    val corpus = d.unionByName(d.select(($"doc_id" + 10000).as("doc_id"),
      concat($"text", lit(" copy")).as("text"), $"lang"))
    val pairs = TextDedup.ngramJaccardPairs(corpus, "doc_id", "text", "lang", 0.5)
    val planted = pairs.filter($"id_2" === $"id_1" + 10000)
    assert(planted.count() === d.count())
    assert(planted.agg(min("jaccard")).as[Double].collect()(0) > 0.7)
  }

  test("simhash gives identical fingerprints to identical texts") {
    val corpus = docs.select("doc_id", "text")
      .unionByName(docs.select(($"doc_id" + 20000).as("doc_id"), $"text"))
    val fp = TextDedup.simhash16(corpus, "doc_id", "text")
    val joined = fp.as("a").join(fp.as("b"),
      col("a.doc_id") + 20000 === col("b.doc_id"))
    assert(joined.filter(col("a.simhash") =!= col("b.simhash")).count() === 0)
  }

  test("brute-force ANN: self-similarity is 1 and ranking is descending") {
    val q = emb.filter($"vec_id" < 3)
    val top = Similarity.bruteForceTopK(
      emb.unionByName(emb.select(($"vec_id" + 10000).as("vec_id"), $"embedding", $"label")),
      q, "vec_id", "embedding", 5)
    // each query's top hit is its injected identical copy at cos 1.0
    val first = top.filter($"rank" === 1).collect()
    assert(first.forall(r => r.getAs[Long]("cand_id") == r.getAs[Long]("query_id") + 10000))
    assert(first.forall(_.getAs[Double]("cos_sim") === 1.0))
    // per-query ranks strictly increase with non-increasing cosine
    val perQ = top.filter($"query_id" === 0).orderBy("rank")
      .select("cos_sim").as[Double].collect()
    assert(perQ.toSeq === perQ.sorted(Ordering[Double].reverse).toSeq)
  }

  test("LSH ANN returns a subset of brute-force candidates with matching scores") {
    val q = emb.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 500)
      .select($"query_id", $"cand_id", $"cos_sim".as("bf_cos"))
    val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", 64, 10, numPlanes = 4)
    val joined = lsh.join(brute, Seq("query_id", "cand_id"), "left")
    assert(joined.filter($"bf_cos".isNull).count() === 0)
    assert(joined.filter($"cos_sim" =!= $"bf_cos").count() === 0)
  }

  test("multimodal plumbing: features are deterministic and partition-invariant") {
    val media = Multimodal.fromText(docs, "doc_id", "text", "image")
    val a = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(media.repartition(7)).orderBy("media_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall(f => f.frame_offsets.split(",").length === 4))
    assert(a.forall(f => f.content_md5.length === 32))
    val resized = Multimodal.resizeMeta(media, 224, 224)
    assert(resized.select("meta.width").distinct().as[Int].collect().toSeq === Seq(224))
  }
}
