package graft

import graft.operators.{Multimodal, Sampling, Similarity, TextAnalysis, TextDedup}
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

  test("dedupIncremental: corpus dups drop, fresh docs survive once") {
    val d = docs.select("doc_id", "text")
    val batch = d.select(($"doc_id" + 30000).as("doc_id"), $"text")
      .unionByName(d.select(($"doc_id" + 40000).as("doc_id"),
        concat($"text", lit(" fresh")).as("text")))
      .unionByName(d.select(($"doc_id" + 50000).as("doc_id"),
        concat($"text", lit(" fresh")).as("text")))
    val out = TextDedup.dedupIncremental(d, batch, "doc_id", "text")
    // every surviving row is the min-id (+40000) copy of a fresh doc
    assert(out.count() === d.count())
    assert(out.filter($"doc_id" < 40000 || $"doc_id" >= 50000).count() === 0)
  }

  test("dedupIncrementalBloom equals the plain anti-join and actually prunes") {
    val d = docs.select("doc_id", "text")
    val batch = d.filter($"doc_id" < 50)
      .select(($"doc_id" + 30000).as("doc_id"), $"text")
      .unionByName(d.filter($"doc_id" < 50)
        .select(($"doc_id" + 40000).as("doc_id"),
          concat($"text", lit(" fresh")).as("text")))
    val plain = TextDedup.dedupIncremental(d, batch, "doc_id", "text")
    val bloom = TextDedup.dedupIncrementalBloom(d, batch, "doc_id", "text")
    // bit-identical result: blooms have no false negatives, so the
    // prefilter can only add harmless corpus rows to the anti-join
    assert(plain.exceptAll(bloom).isEmpty && bloom.exceptAll(plain).isEmpty)
    // the prefilter predicate reaches the plan (scan-side cut, not a
    // post-shuffle filter)
    val p = bloom.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(2000))
    // and it genuinely prunes: a 50-doc batch bloom at fpp=0.01 keeps
    // ~50 true matches + ~1% of the other corpus fingerprints
    val fp = org.apache.spark.sql.functions.md5(
      graft.functions.Functions.normalizeText($"text"))
    val kept = {
      import org.apache.spark.sql.functions.{call_function, lit, xxhash64}
      val n = 50L
      val bits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, 0.01)
      val bf = TextDedup.dedupExact(batch, "doc_id", "text")
        .withColumn("fingerprint", fp)
        .select(call_function("bloom_agg", xxhash64($"fingerprint"),
          lit(n), lit(bits)).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      d.select(fp.as("fingerprint"))
        .filter(call_function("bloom_might_contain", lit(bf),
          xxhash64($"fingerprint"))).count()
    }
    val corpusN = d.count()
    assert(kept < corpusN / 2,
      s"bloom prefilter kept $kept of $corpusN corpus fingerprints")
  }

  test("dedupIncrementalBloom: empty batch short-circuits to an empty result") {
    val d = docs.select("doc_id", "text")
    val out = TextDedup.dedupIncrementalBloom(
      d, d.filter($"doc_id" < 0), "doc_id", "text")
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("doc_id", "text"))
  }

  test("topTerms: counts match a direct groupBy and the boundary is deterministic") {
    val toy = Seq("b b b c", "a a c", "a b c").toDF("text")
    val top = TextAnalysis.topTerms(toy, "text", 2).collect()
    // b:4, a:3, c:3 — the a/c tie at the k-boundary breaks token-asc
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("b", 4L), ("a", 3L)))
  }

  test("chunkDocuments: windows cover every token and overlap by exactly `overlap`") {
    val toy = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(toy, "text", "doc_id",
      chunkSize = 64, overlap = 16).orderBy("chunk_id").collect()
    // 100 tokens, stride 48 → starts 0, 48, 96
    assert(chunks.length === 3)
    val texts = chunks.map(_.getAs[String]("chunk_text"))
    assert(texts(0).split(" ").length === 64)
    assert(texts(1).split(" ").length === 52) // tokens 49..100
    assert(texts(2).split(" ").length === 4)  // tokens 97..100
    // consecutive chunks share exactly the 16-token overlap
    assert(texts(0).split(" ").takeRight(16).toSeq ===
      texts(1).split(" ").take(16).toSeq)
    // concatenating stride-sized prefixes reconstructs the token stream
    val rebuilt = chunks.flatMap(_.getAs[String]("chunk_text").split(" ").take(48))
    assert(rebuilt.toSeq === (1 to 100).map(i => s"t$i"))
  }

  test("withUnigramLogProb: uniform tokens score ln(1/V) and rare-token docs score lower") {
    val toy = Seq((1L, "x x x x"), (2L, "x x x y")).toDF("doc_id", "text")
    val out = TextAnalysis.withUnigramLogProb(toy, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // corpus: x appears 7 of 8 times, y once. doc 1 = mean ln(7/8);
    // doc 2 mixes three ln(7/8) with one ln(1/8) → strictly lower.
    assert(math.abs(out(1L) - math.log(7.0 / 8.0)) < 1e-6)
    assert(out(2L) < out(1L))
  }

  test("approx_percentile stays within its accuracy contract of the exact percentile") {
    // the sketch twin of a11_percentiles for 100 TB: exact percentile
    // buffers every value per group; approx_percentile holds a bounded
    // sketch. Contract: rank error <= 1/accuracy of the row count.
    val li = Tables.table(spark, sfDir, "lineitem")
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 100)").as("approx"),
      count(lit(1)).as("n")).collect()(0)
    val (exact, approx, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    val rankTolerance = (n / 100 + 1).toInt
    val sorted = li.select("l_extendedprice").orderBy("l_extendedprice")
      .collect().map(_.getDouble(0))
    val exactRank = sorted.indexWhere(_ >= approx)
    assert(math.abs(exactRank - n / 2.0) <= rankTolerance + 1,
      s"approx=$approx exact=$exact rank=$exactRank n=$n")
  }

  test("packSequences matches an independent sequential walk and keeps id order") {
    val d = docs.withColumn("n_tokens", TextAnalysis.wsTokenCount($"text"))
    val packed = TextAnalysis.packSequences(d, "doc_id", "n_tokens", "lang", 512)
    // independent driver-side walk: pack = floor(tokens-before / 512)
    // in id order within each language
    val rows = packed.select("lang", "doc_id", "n_tokens", "pack_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    rows.groupBy(_._1).values.foreach { langRows =>
      var before = 0L
      langRows.sortBy(_._2).foreach { case (_, _, n, packId) =>
        assert(packId === before / 512, s"before=$before n=$n")
        before += n
      }
    }
    // a doc never lands in an earlier pack than a smaller-id doc
    val stats = packed.groupBy("lang", "pack_id")
      .agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
    stats.collect().groupBy(_.getString(0)).values.foreach { g =>
      g.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) < b.getLong(2))
        case _ =>
      }
    }
  }

  test("vocabStats: approx sketch agrees with exact within its error bound") {
    val exact = TextAnalysis.vocabStats(docs, "text", "doc_id").collect()(0)
    val approx = TextAnalysis.vocabStats(docs, "text", "doc_id", approx = true)
      .collect()(0)
    assert(exact.getLong(0) === approx.getLong(0)) // total is exact either way
    val (e, a) = (exact.getLong(1).toDouble, approx.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
  }

  test("duplicatePassages: a shared mid-document passage is found, unique context is not") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val doc1 = (1 to 5).map(i => s"u$i").mkString(" ") + " " + shared + " " +
      (1 to 5).map(i => s"v$i").mkString(" ")
    val doc2 = (1 to 5).map(i => s"w$i").mkString(" ") + " " + shared + " " +
      (1 to 5).map(i => s"x$i").mkString(" ")
    val out = TextDedup.duplicatePassages(
      Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text"), "doc_id", "text",
      windowTokens = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 22 tokens → 13 windows; only the 3 windows fully inside the
    // 12-token shared passage repeat across docs
    assert(out(1L) === ((13L, 3L, 0.2308)))
    assert(out(2L) === ((13L, 3L, 0.2308)))
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

  test("ngram oversized blocks are observable and excluded consistently") {
    val d = docs.select("doc_id", "text", "lang")
    // cap below the largest lang block so the guard binds
    val maxSize = 50
    val over = TextDedup.ngramOversizedBlocks(d, "text", "lang", maxSize)
    val overLangs = over.select("lang").as[String].collect().toSet
    assert(overLangs.nonEmpty, "expected at least one lang block over the cap")
    // every block is either processed (pairs may reference it) or listed
    val pairs = TextDedup.ngramJaccardPairs(d, "doc_id", "text", "lang", 0.1,
      maxBlockSize = maxSize, allowBlockExclusion = true)
    val pairedLangs = pairs
      .join(d.select($"doc_id".as("id_1"), $"lang"), "id_1")
      .select("lang").as[String].collect().toSet
    assert(pairedLangs.intersect(overLangs).isEmpty,
      s"capped blocks leaked into the pair join: ${pairedLangs.intersect(overLangs)}")
  }

  test("ngram block exclusion is LOUD by default: all-blocks-excluded fails, opt-in returns empty") {
    val d = docs.select("doc_id", "text", "lang")
    // cap below EVERY lang block: the all-blocks-excluded case a big
    // corpus hits — without opt-in this must FAIL with a routing
    // message, never return an empty result that reads as
    // "no duplicates" (VERDICT r12)
    val loud = intercept[Exception] {
      TextDedup.ngramJaccardPairs(d, "doc_id", "text", "lang", 0.1,
        maxBlockSize = 1).count()
    }
    val msg = Option(loud.getMessage).getOrElse("") +
      Option(loud.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxBlockSize"), s"unhelpful failure: $msg")
    val loudC = intercept[Exception] {
      TextDedup.ngramContainmentPairs(d, "doc_id", "text", "lang", 0.9,
        maxBlockSize = 1).count()
    }
    val msgC = Option(loudC.getMessage).getOrElse("") +
      Option(loudC.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msgC.contains("maxBlockSize"), s"unhelpful failure: $msgC")
    // the explicit opt-in accepts per-block exactness: with every
    // block over the cap, empty-by-contract (observable via
    // ngramOversizedBlocks, which must name them all)
    assert(TextDedup.ngramJaccardPairs(d, "doc_id", "text", "lang", 0.1,
      maxBlockSize = 1, allowBlockExclusion = true).count() === 0L)
    val langs = d.select("lang").distinct().count()
    assert(TextDedup.ngramOversizedBlocks(d, "text", "lang", 1).count() === langs)
  }

  test("dupClusters: transitive chains collapse to the component minimum") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 10-11,
    // and an isolated pair joined out of order
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("id_1", "id_2")
    val clusters = TextDedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(clusters(_) == 1L), clusters)
    assert(clusters(10L) === 10L && clusters(11L) === 10L)
    assert(clusters(20L) === 20L && clusters(21L) === 20L)
    assert(clusters.size === 8)
  }

  test("lshStarPairs: component-identical to the all-pairs band graph, far fewer edges") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val bands = TextDedup.lshBands(
      TextDedup.minhashSignatures(corpus, "doc_id", "text"), "doc_id")
    val allPairs = TextDedup.lshCandidatePairs(bands, "doc_id")
    val starPairs = TextDedup.lshStarPairs(bands, "doc_id")
    assert(starPairs.count() <= allPairs.count())
    // identical doc_id -> cluster_id map under either edge set
    val viaAll = TextDedup.dupClusters(allPairs)
      .as[(Long, Long)].collect().toMap
    val viaStar = TextDedup.dupClusters(starPairs)
      .as[(Long, Long)].collect().toMap
    assert(viaStar === viaAll)
  }

  test("scrubPii counts and redacts planted emails and phone numbers") {
    val rows = Seq(
      (1, "write to alice.smith@corp.example.org today"),
      (2, "call +1 (555) 867-5309 or 555 123 4567 now"),
      (3, "no contact info here at all")).toDF("id", "text")
    val out = graft.operators.TextAnalysis.scrubPii(rows, "text")
      .orderBy("id").collect()
    assert(out(0).getAs[Int]("n_emails") === 1)
    assert(out(0).getAs[String]("clean_text").contains("[EMAIL]"))
    assert(!out(0).getAs[String]("clean_text").contains("@"))
    assert(out(1).getAs[Int]("n_phones") === 2)
    assert(!out(1).getAs[String]("clean_text").exists(_.isDigit))
    assert(out(2).getAs[Int]("n_emails") === 0)
    assert(out(2).getAs[Int]("n_phones") === 0)
    assert(out(2).getAs[String]("clean_text") === "no contact info here at all")
  }

  test("repetitionRatio separates boilerplate from varied text") {
    val rows = Seq(
      (1, ("spam and eggs " * 50).trim),            // heavy repetition
      (2, "the quick brown fox jumps over a lazy dog near riverbank")) // varied
      .toDF("id", "text")
    val out = graft.operators.TextAnalysis.repetitionRatio(rows, "text")
      .orderBy("id").collect()
    val rep = out(0).getAs[Double]("repetition_ratio")
    val varied = out(1).getAs[Double]("repetition_ratio")
    assert(rep > 0.9, s"boilerplate scored $rep")
    assert(varied < 0.2, s"varied text scored $varied")
  }

  test("contaminationPairs flags a planted eval-doc copy with maximal overlap") {
    val evalSet = docs.filter($"doc_id" < 10).select("doc_id", "text")
    // plant a verbatim copy of eval doc 3 into the corpus at id 30000
    val corpus = docs.select("doc_id", "text").unionByName(
      docs.filter($"doc_id" === 3)
        .select(lit(30000L).as("doc_id"), $"text"))
    val pairs = TextDedup.contaminationPairs(corpus, evalSet, "doc_id", "text")
    val planted = pairs.filter($"doc_id" === 30000 && $"eval_id" === 3)
      .select("n_common").as[Long].collect()
    assert(planted.length === 1 && planted(0) > 100,
      s"planted copy overlap: ${planted.toSeq}")
  }

  test("hash sampling is deterministic, rate-accurate, and stratified") {
    val s1 = graft.operators.Sampling.sampleByHash(docs, "doc_id", 30)
      .select("doc_id").as[Long].collect().toSet
    val s2 = graft.operators.Sampling.sampleByHash(
      docs.repartition(7), "doc_id", 30)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2, "sample changed under repartitioning")
    val rate = s1.size.toDouble / docs.count()
    assert(rate > 0.2 && rate < 0.4, s"30% sample kept $rate")
    val strat = graft.operators.Sampling.stratifiedSample(
      docs, "doc_id", "lang", Map("en" -> 100), defaultPct = 0)
    assert(strat.filter($"lang" =!= "en").count() === 0)
    assert(strat.count() === docs.filter($"lang" === "en").count())
  }

  test("splitAssign: disjoint-exhaustive, rate-accurate, seed-independent of sampling") {
    val split = graft.operators.Sampling.splitAssign(
      docs, "doc_id", trainPct = 80, valPct = 10, seed = "s1")
    // every row gets exactly one split label (exhaustive by construction)
    assert(split.count() === docs.count())
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet === Set("train", "val", "test"), byLabel.toString)
    val n = docs.count().toDouble
    assert(byLabel("train") / n > 0.7 && byLabel("train") / n < 0.9, byLabel.toString)
    // deterministic under repartitioning
    val again = graft.operators.Sampling.splitAssign(
      docs.repartition(7), "doc_id", 80, 10, seed = "s1")
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
    // split assignment is independent of a hash sample with a different
    // seed: the sampled subset's train share matches the global share
    // (correlated bits would skew it)
    val sampled = graft.operators.Sampling.sampleByHash(docs, "doc_id", 30)
    val sampledTrain = graft.operators.Sampling
      .splitAssign(sampled, "doc_id", 80, 10, seed = "s1")
      .filter($"split" === "train").count().toDouble / sampled.count()
    assert(sampledTrain > 0.7 && sampledTrain < 0.9,
      s"train share within sample: $sampledTrain")
  }

  test("tfidfRetrieve ranks a planted term-heavy doc first") {
    val planted = docs.select($"doc_id", $"text").unionByName(
      Seq((99999L, "zebra zebra zebra zebra quartz")).toDF("doc_id", "text"))
    val top = TextAnalysis.tfidfRetrieve(planted, "doc_id", "text",
      Seq("zebra"), k = 5).collect()
    assert(top.head.getLong(0) === 99999L, top.mkString(";"))
    val scores = top.map(_.getDouble(1))
    assert(scores.toSeq === scores.sorted(Ordering[Double].reverse).toSeq)
  }

  test("tokenBudgetRates: measured rates land the sample near the token budget") {
    val withT = docs.withColumn("tokens", TextAnalysis.regexTokenCount($"text"))
    val shares = Map("en" -> 0.5, "es" -> 0.2, "de" -> 0.15, "fr" -> 0.1, "zh" -> 0.05)
    val rates = graft.operators.Sampling.tokenBudgetRates(
      withT, "lang", $"tokens", 5000L, shares)
    assert(rates.keySet === shares.keySet)
    assert(rates.values.forall(r => r > 0 && r <= 100), rates.toString)
    // pure function of the data — identical under repartitioning
    assert(rates === graft.operators.Sampling.tokenBudgetRates(
      withT.repartition(7), "lang", $"tokens", 5000L, shares))
    // the sampled corpus lands near the budget (floor loss + 100-bucket
    // hash granularity are the only slack)
    val sampled = graft.operators.Sampling
      .stratifiedSample(withT, "doc_id", "lang", rates, defaultPct = 0)
      .agg(sum($"tokens")).head.getLong(0)
    info(s"sampled tokens = $sampled (budget 5000)")
    assert(sampled > 2500 && sampled < 9000, s"sampled $sampled vs budget 5000")
  }

  test("shuffledPositions: exact permutation, partitioning-invariant, seed-sensitive") {
    val n = docs.count()
    val pos = graft.operators.Sampling.shuffledPositions(docs, "doc_id", "seedA")
    // positions are exactly 1..n (contiguous, no gaps or collisions)
    assert(pos.select("pos").as[Long].collect().sorted.toSeq === (1L to n).toSeq)
    // same seed under different physical partitioning → same mapping
    val again = graft.operators.Sampling.shuffledPositions(
      docs.repartition(7), "doc_id", "seedA")
    assert(pos.exceptAll(again).isEmpty && again.exceptAll(pos).isEmpty)
    // a different seed permutes differently (not the identity relabel)
    val other = graft.operators.Sampling.shuffledPositions(docs, "doc_id", "seedB")
      .withColumnRenamed("pos", "pos_b")
    val same = pos.join(other, "doc_id").filter($"pos" === $"pos_b").count()
    assert(same < n / 2, s"seedA and seedB agree on $same/$n positions")
  }

  test("prefix-filtered Jaccard join equals the all-pairs form pair-for-pair") {
    val corpus = docs.select($"doc_id", $"text", $"lang").unionByName(
      docs.select(($"doc_id" + 10000).as("doc_id"),
        concat($"text", lit(" copy")).as("text"), $"lang"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val allPairs = pairs(TextDedup.ngramJaccardPairs(
      corpus, "doc_id", "text", "lang", threshold = 0.5))
    val prefix = pairs(TextDedup.ngramJaccardPairsPrefix(
      corpus, "doc_id", "text", "lang", threshold = 0.5))
    assert(prefix === allPairs)
    assert(prefix.nonEmpty)
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

  test("int8 quantization: true tinyint codes, saturated range, high top-k recall") {
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    // codes are a REAL array<tinyint> (1 byte/dim at rest — the 4×
    // memory claim), and every vector saturates its max-abs component
    // to exactly ±127 (the symmetric-scale invariant)
    val qz = emb.select($"vec_id",
      Similarity.quantizeInt8($"embedding").as("q"))
    assert(qz.schema("q").dataType.asInstanceOf[ArrayType].elementType === ByteType)
    val absMax = qz.select(
      array_max(transform($"q", c => abs(c.cast("int")))).as("m"))
    assert(absMax.filter($"m" =!= 127).count() === 0)
    assert(qz.select(array_max(transform($"q", _.cast("int"))).as("hi"))
      .filter($"hi" > 127).count() === 0)

    // quantized top-k ordering stays close to exact float cosine
    val q = emb.filter($"vec_id" < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10))
    val quant = pairs(Similarity.quantizedTopK(emb, q, "vec_id", "embedding", 10))
    val recall = (exact & quant).size.toDouble / exact.size
    info(s"int8 recall@10 = $recall")
    assert(recall >= 0.7, s"int8 recall@10 degraded: $recall")
  }

  test("simhash64: identical texts collide, near-dups are close, unrelated are far") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy cat again and again today"),
      (4L, "completely unrelated legal boilerplate concerning maritime insurance claims"))
      .toDF("doc_id", "text")
    val fp = TextDedup.simhash64(d, "doc_id", "text")
    val m = fp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L)) // identical text → identical fingerprint
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L))) // one-word change ≪ unrelated
    assert(ham(m(1L), m(3L)) <= 16)
    // the Column-side hamming agrees with the JVM-side one
    val pairs = fp.as("a").crossJoin(fp.as("b"))
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"),
        TextDedup.simhashHamming($"a.simhash64", $"b.simhash64").as("h"))
      .filter($"i" === 1 && $"j" === 3).head()
    assert(pairs.getInt(2) === ham(m(1L), m(3L)))
  }

  test("kmeans centroids converge to planted clusters and drive IVF recall") {
    // two well-separated direction clusters in 4-d
    val cluster1 = (0 until 20).map(i => (i.toLong, Array(10f + i % 3, 1f, 0f, 0f)))
    val cluster2 = (0 until 20).map(i => (100L + i, Array(0f, 1f, 10f + i % 3, 0f)))
    val data = (cluster1 ++ cluster2).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(data, "vec_id", "embedding", k = 2, iters = 4)
      .collect().map(r => r.getSeq[Double](1))
    assert(cents.length === 2)
    // one centroid per planted cluster: dominant axis 0 vs axis 2
    val doms = cents.map(v => v.zipWithIndex.maxBy(_._1)._2).sorted
    assert(doms.toSeq === Seq(0, 2))
    // IVF with kmeans cells: neighbors of a cluster-1 query are all cluster-1
    val q = data.filter($"vec_id" === 0L)
    val topk = Similarity.ivfTopK(data, q, "vec_id", "embedding", k = 5,
      centroidsOverride = Some(Similarity.kmeansCentroids(data, "vec_id", "embedding", 2, 4)))
    val cands = topk.select("cand_id").as[Long].collect()
    assert(cands.length === 5 && cands.forall(_ < 100L))
  }

  test("sample-trained kmeans keeps IVF recall at a 10% training sample") {
    // planted-cluster corpus: 8 direction clusters in 16-d, 400 points.
    // Cluster structure is what makes "recall parity" a meaningful
    // claim — on structureless vectors IVF cells are arbitrary and
    // nprobe=1 recall is noise either way. A 10% hash-sample keeps
    // ~5 points per cluster, plenty to re-find the 8 centroids.
    val pts = (0 until 400).map { i =>
      val c = i % 8
      val v = Array.fill(16)(0f)
      v(2 * c) = 10f + (i % 7) * 0.3f
      v(2 * c + 1) = 1f + (i % 5) * 0.2f
      (i.toLong, v)
    }
    val corpus = pts.toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" < 16)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 10))
    def ivfRecall(pct: Int): Double = {
      val cents = Similarity.kmeansCentroids(
        corpus, "vec_id", "embedding", k = 8, iters = 3, samplePct = pct)
      val got = pairs(Similarity.ivfTopK(corpus, q, "vec_id", "embedding",
        k = 10, centroidsOverride = Some(cents)))
      (exact & got).size.toDouble / exact.size
    }
    val full = ivfRecall(100)
    val sampled = ivfRecall(10)
    info(s"IVF recall@10: full-trained=$full, 10%-sample-trained=$sampled")
    // parity: sampling the TRAINING set must not collapse recall —
    // cell means over a uniform sample estimate the same centroids
    assert(sampled >= full - 0.1, s"sample-trained recall $sampled vs full $full")
    // determinism: hash-sampling is partitioning-invariant
    val again = Similarity.kmeansCentroids(
      corpus.repartition(7), "vec_id", "embedding", k = 8, iters = 3, samplePct = 10)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val first = Similarity.kmeansCentroids(
      corpus, "vec_id", "embedding", k = 8, iters = 3, samplePct = 10)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(again === first)
  }

  test("semDedup prunes same-cell near-dups by lowest-id-wins, keeps uniques") {
    // two planted direction clusters + exact twins of cluster-1 points
    val c1 = (0 until 10).map(i => (i.toLong, Array(10f + i % 3, 1f, 0f, 0f)))
    val c2 = (0 until 10).map(i => (100L + i, Array(0f, 1f, 10f + i % 3, 0f)))
    val twins = c1.map { case (id, v) => (1000L + id, v) }
    val corpus = (c1 ++ c2 ++ twins).toDF("vec_id", "embedding")
    val res = Similarity.semDedup(corpus, "vec_id", "embedding",
      k = 2, iters = 3, threshold = 0.999)
    val rows = res.collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(rows.length === 30)
    val keepOf = rows.map(r => r._1 -> r._3).toMap
    // every exact twin (higher id) is pruned; its original is judged
    // only against OTHER lower-id vectors
    assert(twins.forall { case (id, _) => !keepOf(id) })
    // cluster-2 has no twins and is angularly spread: vec 100 (lowest
    // id overall in its cell) always survives
    assert(keepOf(100L))
    // twins land in the SAME cell as their originals (identical
    // vectors score identically against every centroid)
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    assert(c1.forall { case (id, _) => cellOf(id) === cellOf(1000L + id) })
    // partitioning-invariant (the pruning rule is order-free)
    val again = Similarity.semDedup(corpus.repartition(7), "vec_id", "embedding",
      k = 2, iters = 3, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(again === rows.toSet)
  }

  test("semDedupBucketed: exact copies always prune; prunes only what semDedup prunes") {
    val c1 = (0 until 10).map(i => (i.toLong, Array(10f + i % 3, 1f, 0f, 0f)))
    val c2 = (0 until 10).map(i => (100L + i, Array(0f, 1f, 10f + i % 3, 0f)))
    val twins = c1.map { case (id, v) => (1000L + id, v) }
    val corpus = (c1 ++ c2 ++ twins).toDF("vec_id", "embedding")
    def prunedOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(!$"keep").select("vec_id").as[Long].collect().toSet
    val exact = prunedOf(Similarity.semDedup(corpus, "vec_id", "embedding",
      k = 2, iters = 3, threshold = 0.999))
    val bucketed = prunedOf(Similarity.semDedupBucketed(corpus, "vec_id",
      "embedding", dim = 4, k = 2, iters = 3, threshold = 0.999))
    // identical vectors share every LSH bucket: no planted twin escapes
    assert(twins.map(_._1).toSet.subsetOf(bucketed))
    // sub-blocking can only LOSE pairs, never invent them
    assert(bucketed.subsetOf(exact))
  }

  test("prototypePrune drops exactly floor(pct) most-prototypical per cell") {
    val c1 = (0 until 13).map(i => (i.toLong, Array(10f, 1f + i * 0.5f, 0f, 0f)))
    val c2 = (0 until 7).map(i => (100L + i, Array(0f, 1f + i * 0.5f, 10f, 0f)))
    val corpus = (c1 ++ c2).toDF("vec_id", "embedding")
    val res = Similarity.prototypePrune(corpus, "vec_id", "embedding",
      k = 2, iters = 3, prunePct = 25)
    val rows = res.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.length === 20)
    // per cell: pruned count = floor(|cell| * 25 / 100)
    val byCell = rows.groupBy(_._2)
    byCell.foreach { case (_, cell) =>
      val pruned = cell.count(!_._4)
      assert(pruned === cell.length * 25 / 100,
        s"cell of ${cell.length} pruned $pruned")
    }
    // the pruned ones are the TOP of the centroid-cos ranking: every
    // pruned vector scores >= every kept vector in its cell (modulo
    // the id tiebreak at equal scores)
    byCell.foreach { case (_, cell) =>
      val prunedMin = cell.filter(!_._4).map(_._3).minOption.getOrElse(2.0)
      val keptMax = cell.filter(_._4).map(_._3).maxOption.getOrElse(-2.0)
      assert(prunedMin >= keptMax - 1e-9)
    }
    // prunePct = 0 keeps everything
    val none = Similarity.prototypePrune(corpus, "vec_id", "embedding",
      k = 2, iters = 3, prunePct = 0)
    assert(none.filter(!$"keep").count() === 0)
  }

  test("temperatureSampledMixture: tau=1 is the uniform hash sample; tau>1 up-samples") {
    val rows = ((0 until 90).map(i => (i.toLong, "big")) ++
      (100 until 110).map(i => (i.toLong, "small"))).toDF("id", "stratum")
    // tau=1 → q_i = n_i → pct_i = 100·budget/N for EVERY stratum: the
    // temperature mixture degenerates to the plain uniform hash sample
    val t1 = Sampling.temperatureSampledMixture(rows, "id", "stratum", 1.0, 50)
      .select("id").as[Long].collect().toSet
    val uniform = Sampling.sampleByHash(rows, "id", 50)
      .select("id").as[Long].collect().toSet
    assert(t1 === uniform)
    // tau=2 → sqrt weighting: the small stratum's pct saturates at 100
    // (every row kept) while the big stratum is subsampled
    val t2 = Sampling.temperatureSampledMixture(rows, "id", "stratum", 2.0, 50)
    val byStratum = t2.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("small") === 10L) // saturated
    assert(byStratum("big") < 90L && byStratum("big") > 0L)
    // partitioning-invariant (rates are a pure function of counts)
    val again = Sampling.temperatureSampledMixture(
      rows.repartition(7), "id", "stratum", 2.0, 50)
      .select("id").as[Long].collect().toSet
    assert(again === t2.select("id").as[Long].collect().toSet)
  }

  test("boilerplateScrub removes frequent segments in place; pure boilerplate drops out") {
    val d = Seq(
      (1L, "Alpha beta gamma"),
      (2L, "beta delta"),
      (3L, "Beta")).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateScrub(d, "doc_id", "text",
      segTokens = 1, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // "beta" recurs in 3 distinct docs (case-folded) → scrubbed; order
    // of the survivors is preserved
    assert(out(1L) === ("alpha gamma", 1L))
    assert(out(2L) === ("delta", 1L))
    // doc 3 is pure boilerplate → no row at all
    assert(!out.contains(3L))
    // below the doc threshold nothing is removed
    val none = TextAnalysis.boilerplateScrub(d, "doc_id", "text",
      segTokens = 1, minDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(none.values.forall(_ === 0L) && none.size === 3)
  }

  test("unigramEntropy: uniform text maxes, repeated text zeroes, ln(k) exact") {
    val d = Seq(
      (1L, "a b c d"),        // uniform over 4 → ln 4
      (2L, "a a a a"),        // single token → 0
      (3L, "a a b b"))        // uniform over 2 → ln 2
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.unigramEntropy(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) === math.rint(math.log(4) * 1e6) / 1e6)
    assert(out(2L) === 0.0)
    assert(out(3L) === math.rint(math.log(2) * 1e6) / 1e6)
  }

  test("luhnCcDetect: checksum separates real cards from 16-digit noise") {
    val d = Seq(
      (1L, "pay with 4539148803436467 now"),          // Luhn-valid
      (2L, "random run 4539148803436468 here"),       // checksum fails
      (3L, "order 12345 and 370000000000002 thanks"), // 15-digit Amex test, valid
      (4L, "no digits at all"),
      (5L, "junk 12345678901234567890123456 x")).toDF("doc_id", "text") // 26-digit run
    val out = graft.operators.TextAnalysis.luhnCcDetect(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_cc_candidates") === 1)
    assert(out(1L).getAs[Int]("n_cc_valid") === 1)
    assert(out(1L).getAs[String]("clean_text") === "pay with [CC] now")
    assert(out(2L).getAs[Int]("n_cc_candidates") === 1)
    assert(out(2L).getAs[Int]("n_cc_valid") === 0)
    // the short 12345 run is below the 13-digit floor; the Amex test
    // number passes Luhn
    assert(out(3L).getAs[Int]("n_cc_candidates") === 1)
    assert(out(3L).getAs[Int]("n_cc_valid") === 1)
    assert(out(4L).getAs[Int]("n_cc_candidates") === 0)
    assert(out(4L).getAs[String]("clean_text") === "no digits at all")
    // an over-long (26-digit) run is NOT a card candidate — a greedy
    // \d{13,19} would count it AND leave a 7-digit raw tail — but the
    // scrub still removes the whole run
    assert(out(5L).getAs[Int]("n_cc_candidates") === 0)
    assert(out(5L).getAs[String]("clean_text") === "junk [CC] x")
  }

  test("c4Clean: each line rule and page rule trips on its own violation") {
    val d = Seq(
      (1L, "the cat sat on the mat.\nthe dog ran far away!\nbirds fly very high today?"),
      // line rules: unpunctuated / short / javascript lines removed in place
      (2L, "the cat sat on the mat.\nno terminal punct here at all\ntoo short.\n" +
        "uses javascript for the menu bar.\nthe dog ran far away!\nbirds fly very high today?"),
      // page rules: each of these kills the whole page
      (3L, "the cat sat on the mat.\nthe dog ran far away!\nvar x = { a }."),
      (4L, "the cat sat on the mat.\nLorem Ipsum dolor sit amet friend.\nthe dog ran far away!"),
      (5L, "only one good line survives here.\nnope\nnah")) // < 3 kept lines
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L).getAs[String]("clean_text") === d.collect()
      .find(_.getLong(0) == 1L).get.getString(1))
    // doc 2: exactly the three rule-violating lines removed, order kept
    assert(out(2L).getAs[String]("clean_text") ===
      "the cat sat on the mat.\nthe dog ran far away!\nbirds fly very high today?")
    assert(out(2L).getAs[Int]("n_lines") === 6)
    assert(out(2L).getAs[Int]("n_lines_kept") === 3)
  }

  test("substringScrub keeps canonical first occurrences, drops pure duplicates") {
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact duplicate → drops out
      (3L, "omega alpha beta gamma delta"), // shares no ALIGNED segment → intact
      (4L, "zeta eta theta iota alpha beta gamma delta")) // aligned dup tail
      .toDF("doc_id", "text")
    val out = TextDedup.substringScrub(d, "doc_id", "text", segTokens = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1 is canonical for "alpha beta gamma delta"
    assert(out(1L) === ("alpha beta gamma delta", 0L))
    // doc 2 loses its only segment → vanishes
    assert(!out.contains(2L))
    // doc 3's segments are ["omega alpha beta gamma", "delta"] —
    // position alignment means neither matches doc 1's segment
    assert(out(3L) === ("omega alpha beta gamma delta", 0L))
    // doc 4's second aligned segment duplicates doc 1's first → scrubbed
    assert(out(4L) === ("zeta eta theta iota", 1L))
  }

  test("randomProjection: partition-invariant and norm-preserving in JL expectation") {
    import graft.operators.Similarity
    val p = Similarity.randomProjection(emb, "vec_id", "embedding")
    assert(p.columns.length === 17)
    // pure function of the row → partitioning can't change anything
    val again = Similarity.randomProjection(
      emb.repartition(7), "vec_id", "embedding")
    assert(p.collect().toSet === again.collect().toSet)
    // Achlioptas: E‖Rx/√k‖² = ‖x‖² — the corpus-mean ratio of
    // projected to original squared norm concentrates near 1
    val projNormSq = (0 until 16)
      .map(j => col(s"proj_$j") * col(s"proj_$j"))
      .reduce(_ + _)
    val ratio = p.join(emb, "vec_id")
      .select((projNormSq /
        call_function("vec_dot", col("embedding"), col("embedding"))).as("r"))
      .agg(avg(col("r"))).head.getDouble(0)
    assert(ratio > 0.7 && ratio < 1.3, s"norm ratio $ratio")
  }

  test("projected ANN: exact duplicates stay rank 1; cosine error inside the JL noise band") {
    import graft.operators.Similarity
    val planted = emb.select("vec_id", "embedding")
      .unionByName(emb.filter($"vec_id" === 3L)
        .select(($"vec_id" + 10000).as("vec_id"), $"embedding"))
    val p = Similarity.randomProjection(planted, "vec_id", "embedding")
    val pv = p.select($"vec_id",
      array((0 until 16).map(j => col(s"proj_$j")): _*).as("pvec"))
    val top = Similarity.bruteForceTopK(pv, pv.filter($"vec_id" === 3L),
      "vec_id", "pvec", k = 10)
    val first = top.filter($"rank" === 1).head()
    // the duplicate projects identically → cosine exactly 1 at rank 1
    assert(first.getAs[Long]("cand_id") === 10003L)
    assert(first.getAs[Double]("cos_sim") === 1.0)
    // the JL guarantee is cosine PRESERVATION (sd ≈ 1/√16 per pair),
    // not neighbor-identity recall on near-random synthetic vectors —
    // assert the mean absolute cosine estimation error over every
    // (query < 5) × candidate pair is inside the JL noise band
    val full = Similarity.bruteForceTopK(
      emb.select("vec_id", "embedding"),
      emb.filter($"vec_id" < 5).select("vec_id", "embedding"),
      "vec_id", "embedding", k = 600)
      .select($"query_id", $"cand_id", $"cos_sim".as("cos_full"))
    val reduced = Similarity.bruteForceTopK(
      pv.filter($"vec_id" < 10000), pv.filter($"vec_id" < 5),
      "vec_id", "pvec", k = 600)
      .select($"query_id", $"cand_id", $"cos_sim".as("cos_proj"))
    val mae = full.join(reduced, Seq("query_id", "cand_id"))
      .agg(avg(abs($"cos_full" - $"cos_proj"))).head.getDouble(0)
    assert(mae < 0.3, s"mean |cos error| $mae")
  }

  test("sourceOverlapMatrix counts shared fingerprints per unordered source pair") {
    val d = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "Alpha beta GAMMA", "s2"), // same fingerprint, different source
      (3L, "alpha beta gamma", "s3"), // third source, same fingerprint
      (4L, "delta epsilon", "s1"),
      (5L, "delta epsilon", "s2"),
      (6L, "delta epsilon", "s1"),    // same-source dup: no pair contribution
      (7L, "unique text here", "s3")) // unshared: absent
      .toDF("doc_id", "text", "source")
    val out = TextDedup.sourceOverlapMatrix(d, "text", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // fingerprint A spans {s1,s2,s3} → 3 pairs; fingerprint B spans
    // {s1,s2} → 1 pair (the s1 dup collapses in the distinct)
    assert(out === Map(
      ("s1", "s2") -> 2L, // A and B both span s1-s2
      ("s1", "s3") -> 1L,
      ("s2", "s3") -> 1L))
    // no cross-source duplication at all → empty matrix
    val none = TextDedup.sourceOverlapMatrix(
      Seq((1L, "a b", "s1"), (2L, "c d", "s2")).toDF("doc_id", "text", "source"),
      "text", "source")
    assert(none.count() === 0L)
  }

  test("stratumCap caps each stratum at the quota with salted-rank order") {
    val rows = (1L to 200L).map(i => (i, s"s${i % 4}")).toDF("id", "stratum")
    val out = Sampling.stratumCap(rows, "id", "stratum", cap = 10, seed = "t1")
    val byStratum = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum.values.forall(_ === 10L) && byStratum.size === 4)
    // positions within each stratum are exactly 1..cap and match the
    // plain-window rank (the decomposition is exact)
    import org.apache.spark.sql.expressions.Window
    val expect = rows
      .withColumn("skey", md5(concat(lit("t1"), $"id".cast("string"))))
      .withColumn("pos", row_number().over(
        Window.partitionBy($"stratum").orderBy($"skey", $"id")))
      .filter($"pos" <= 10)
      .select($"id", $"pos".cast("long"))
    assert(out.select("id", "pos").except(expect).count() === 0)
    assert(expect.except(out.select("id", "pos")).count() === 0)
  }

  test("gopherRules: each published rule trips on its own violation") {
    val d = Seq(
      (1L, "the cat and dog is here today for fun now"), // passes all
      (2L, "too short"),                                 // word count
      (3L, "a b c d e f g h i j"),                       // mean word len < 3
      (4L, "the cat ### and ### dog ### is ### the ### end ### now ### ok"), // symbols
      (5L, "1 2 3 4 5 6 7 8 9 10 11 12 the is"),         // alpha ratio
      (6L, "cat dog bird fish wolf bear lion tiger den")) // no stopwords
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(d, "text", minWords = 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("gopher_pass"))
    assert(!out(2L).getAs[Boolean]("rule_word_count"))
    assert(!out(3L).getAs[Boolean]("rule_mean_word_len"))
    assert(!out(4L).getAs[Boolean]("rule_symbol_ratio"))
    assert(!out(5L).getAs[Boolean]("rule_alpha_words"))
    assert(!out(6L).getAs[Boolean]("rule_stopwords"))
    // the failing docs fail ONLY their targeted rule's conjunction
    assert((2L to 6L).forall(i => !out(i).getAs[Boolean]("gopher_pass")))
  }

  test("ngramContainmentPairs finds doc-in-doc pairs that Jaccard structurally misses") {
    val small = "the quick brown fox jumps over the lazy dog tonight"
    val big = small + " " + Seq.tabulate(40)(i => s"filler$i word$i more$i").mkString(" ")
    val d = Seq(
      (1L, small, "en"),
      (2L, big, "en"),                       // contains doc 1 verbatim
      (3L, "completely different content about spark plans", "en"))
      .toDF("doc_id", "text", "lang")
    val cont = TextDedup.ngramContainmentPairs(d, "doc_id", "text", "lang",
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont === Set((1L, 2L)))
    // Jaccard at the same corpus: |small| / |big| caps J well below 0.9
    val jac = TextDedup.ngramJaccardPairs(d, "doc_id", "text", "lang",
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.isEmpty)
    // identical docs reach containment 1.0 exactly
    val twin = Seq((1L, small, "en"), (2L, small, "en"))
      .toDF("doc_id", "text", "lang")
    val t = TextDedup.ngramContainmentPairs(twin, "doc_id", "text", "lang", 0.99)
      .collect()
    assert(t.length === 1 && t.head.getDouble(2) === 1.0)
  }

  test("dsirScores separates target-like from raw-typical documents") {
    // target docs share a distinctive vocabulary; the off-target docs
    // use a disjoint one; mixed docs sit in between
    val target = (0 until 20).map(i => (i.toLong, "alpha beta gamma delta", "tgt"))
    val other = (100 until 120).map(i => (i.toLong, "omega sigma rho tau", "raw"))
    val d = (target ++ other).toDF("doc_id", "text", "kind")
    val res = TextAnalysis.dsirScores(d, "doc_id", "text",
      isTarget = $"kind" === "tgt", threshold = 0.0)
    val rows = res.collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(3)))
    // every target doc scores strictly above every off-target doc, and
    // the zero threshold separates them exactly
    val tgtScores = rows.filter(_._1 < 100).map(_._2)
    val rawScores = rows.filter(_._1 >= 100).map(_._2)
    assert(tgtScores.min > rawScores.max)
    assert(rows.filter(_._1 < 100).forall(_._3))
    assert(rows.filter(_._1 >= 100).forall(!_._3))
    // partitioning-invariant: decimal sums + rounded logs
    val again = TextAnalysis.dsirScores(d.repartition(7), "doc_id", "text",
      $"kind" === "tgt", 0.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(again === rows.map(r => (r._1, r._2)).toSet)
  }

  test("ccnetBuckets: per-language rank-exact terciles, common-token docs head") {
    // per lang: 6 docs — 3 made of the lang's common tokens, 3 with
    // one rare token each (lower mean log-prob under the lang LM)
    val rows = for {
      lang <- Seq("aa", "bb")
      i <- 0 until 6
    } yield {
      val id = (if (lang == "aa") 0 else 100) + i.toLong
      val text = if (i < 3) s"common$lang common$lang common$lang"
                 else s"common$lang common$lang rare$lang$i"
      (id, text, lang)
    }
    val res = TextAnalysis.ccnetBuckets(rows.toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang")
    val out = res.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    // each lang splits 2/2/2 — terciles are per-language, not global
    Seq("aa", "bb").foreach { l =>
      val buckets = out.filter(_._2 == l).map(_._3)
      assert(buckets.count(_ == "head") === 2)
      assert(buckets.count(_ == "middle") === 2)
      assert(buckets.count(_ == "tail") === 2)
    }
    // the common-token docs outrank the rare-token docs: no rare doc
    // in head, no common doc in tail
    val byId = out.map(r => r._1 -> r._3).toMap
    Seq(0L, 100L).foreach { base =>
      assert(byId(base) === "head") // first common doc, id tiebreak
      assert((3 until 6).forall(i => byId(base + i) !== "head"))
    }
  }

  test("decontaminate flags exactly the docs sharing long runs with the eval set") {
    val evalText = "the secret benchmark answer sequence is forty two exactly"
    val d = Seq(
      (1L, evalText),                                   // the eval doc itself
      (2L, "prefix words then " + evalText + " and a suffix"), // contaminated
      (3L, "entirely unrelated training document content here")) // clean
      .toDF("doc_id", "text")
    val res = TextDedup.decontaminate(d, d.filter($"doc_id" === 1L),
      "doc_id", "text", minCommon = 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(res.size === 3)
    assert(res(2L)._2 && res(2L)._1 >= 20) // shares the full eval run
    assert(!res(3L)._2)                     // clean doc: below threshold
    assert(!res(1L)._2 && res(1L)._1 === 0L) // self-pair excluded → 0
  }

  test("epochPlan caps at maxEpochs and floors planned tokens") {
    val d = Seq(("a", 100L), ("a", 50L), ("b", 30L)).toDF("src", "tokens")
    // budget 10× the corpus: capped at 4 epochs per stratum
    val capped = Sampling.epochPlan(d, "src", $"tokens", budgetTokens = 1800L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(capped.toSet === Set(("a", 150L, 4.0, 600L), ("b", 30L, 4.0, 120L)))
    // budget half the corpus: fractional epoch, floored tokens
    val fracRows = Sampling.epochPlan(d, "src", $"tokens", budgetTokens = 90L)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getLong(3)))
    assert(fracRows.forall(_._2 === 0.5))
    assert(fracRows.map(_._1).toSet === Set("a", "b"))
    assert(fracRows.find(_._1 == "a").get._3 === 75L)
    assert(fracRows.find(_._1 == "b").get._3 === 15L)
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
    // text payloads are not images: the header probe must say so
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(f => f.image_format.isEmpty && f.width.isEmpty && f.height.isEmpty))
  }

  // Minimal but REAL image fixtures: only the header bytes the parsers
  // read (signature + dimension fields), hand-assembled per spec.
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = Array(0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt,
      w >>> 24, (w >>> 16) & 0xff, (w >>> 8) & 0xff, w & 0xff,
      h >>> 24, (h >>> 16) & 0xff, (h >>> 8) & 0xff, h & 0xff,
      8, 2, 0, 0, 0)
    (sig ++ ihdr).map(_.toByte)
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xff, 0xd8)
    // APP0 segment (len 16) the walker must skip before finding SOF0
    val app0 = Array(0xff, 0xe0, 0x00, 0x10) ++ Array.fill(14)(0)
    val sof0 = Array(0xff, 0xc0, 0x00, 0x11, 8,
      h >>> 8, h & 0xff, w >>> 8, w & 0xff, 3)
    (soi ++ app0 ++ sof0).map(_.toByte)
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] =
    (Array('G'.toInt, 'I'.toInt, 'F'.toInt, '8'.toInt, '9'.toInt, 'a'.toInt,
      w & 0xff, w >>> 8, h & 0xff, h >>> 8, 0, 0) ++ Array.fill(4)(0)).map(_.toByte)

  test("audio: WAV header round-trip, real PCM decode, and meta fill") {
    // 0.5s of a 440 Hz sine at amplitude 0.5, PCM16 mono 16 kHz
    val sr = 16000
    val n = sr / 2
    val pcm = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      bb.putShort((math.sin(2 * math.Pi * 440 * i / sr) * 0.5 * 32767).toShort)
    }
    val wav = Multimodal.wavFromPcmBytes(pcm, sr)

    val h = Multimodal.AudioHeader.probe(wav).get
    assert(h.format === "wav" && h.channels === 1 &&
      h.sampleRate === sr && h.bitsPerSample === 16)
    assert(h.nFrames === n && h.durationMs === 500L)
    // non-audio payloads are rejected, not misparsed
    assert(Multimodal.AudioHeader.probe("not a wav".getBytes).isEmpty)

    val media = Seq((1L, wav), (2L, "plain text bytes".getBytes)).toDF("media_id", "content")
    val feats = Multimodal.extractAudioFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    // a sine of amplitude a has RMS a/sqrt(2): the only way to know
    // this is to actually decode the samples
    assert(math.abs(feats(1L).rms.get - 0.5 / math.sqrt(2)) < 0.001)
    assert(math.abs(feats(1L).peak.get - 0.5) < 0.001)
    assert(feats(2L).format.isEmpty && feats(2L).rms.isEmpty)

    val withMeta = Multimodal.withAudioMeta(
      Multimodal.fromText(docs.limit(3), "doc_id", "text", "audio")
        .withColumn("content", lit(wav)))
    val metas = withMeta.select("meta.duration_ms", "meta.sample_rate").distinct().collect()
    assert(metas.length === 1 &&
      metas(0).getLong(0) === 500L && metas(0).getInt(1) === sr)
  }

  test("video: AVI container round-trip, real frame-chunk sampling, corrupt rejection") {
    val frames = (0 until 7).map(i => Array.fill[Byte](96)(i.toByte))
    val avi = Multimodal.aviFromFrames(frames, width = 8, height = 4, fps = 10)
    // header round-trip: the parser reads back exactly what was built
    val info = Multimodal.VideoHeader.probe(avi).get
    assert(info.width === 8 && info.height === 4)
    assert(info.nFrames === 7 && info.fps === 10)
    assert(info.durationMs === 700)
    // frame sampling extracts the REAL chunk payloads at even stride
    val sampled = Multimodal.sampleVideoFrames(avi, k = 3)
    assert(sampled.map(_._1) === Seq(0, 3, 6))
    sampled.foreach { case (i, f) => assert(f.toSeq === frames(i).toSeq) }
    // odd-length frames get RIFF word-alignment padding and still walk
    val odd = Multimodal.aviFromFrames(Seq(Array.fill[Byte](5)(1), Array.fill[Byte](3)(2)), 2, 1)
    assert(Multimodal.sampleVideoFrames(odd, 10).map(_._2.length) === Seq(5, 3))
    // corrupt/non-AVI payloads are rejected, not mis-parsed
    assert(Multimodal.VideoHeader.probe("not a video".getBytes).isEmpty)
    assert(Multimodal.VideoHeader.probe(avi.take(20)).isEmpty)
  }

  test("corrupt chunk sizes terminate the RIFF walks instead of hanging") {
    // a declared chunk size like 0xFFFFFFF8 used to truncate to a
    // negative Int and make the walk step 0/negative — one malformed
    // record with valid magic would stall the executor forever
    def withEvilSize(b: Array[Byte], off: Int): Array[Byte] = {
      val evil = b.clone()
      evil(off) = 0xf8.toByte; evil(off + 1) = 0xff.toByte
      evil(off + 2) = 0xff.toByte; evil(off + 3) = 0xff.toByte
      evil
    }
    val frames = (0 until 3).map(i => Array.fill[Byte](16)(i.toByte))
    val avi = Multimodal.aviFromFrames(frames, width = 4, height = 2)
    // corrupt the hdrl LIST size (offset 16) AND its list type, so the
    // walk must step over the chunk using the evil size → must return
    val evilHdr = withEvilSize(avi, 16); evilHdr(20) = 'x'.toByte
    assert(Multimodal.VideoHeader.probe(evilHdr) === None)
    // corrupt the first frame chunk's size → sampling must return
    val moviFrameSizeOff = avi.length - frames.map(f => 8 + f.length).sum + 4
    val evilFrames = withEvilSize(avi, moviFrameSizeOff)
    assert(Multimodal.sampleVideoFrames(evilFrames, 10).isEmpty)

    val wav = Multimodal.wavFromPcmBytes(Array.fill[Byte](64)(3))
    // corrupt the fmt chunk size (offset 16) → probe must return
    assert(Multimodal.AudioHeader.probe(withEvilSize(wav, 16)) === None)
    // features over a corrupt payload mixed into a batch still complete
    val media = Seq((1L, evilHdr), (2L, avi)).toDF("media_id", "content")
    val vf = Multimodal.extractVideoFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(vf(1L).width.isEmpty && vf(2L).width.contains(4))
  }

  test("image header parsing: true dimensions from PNG/JPEG/GIF bytes") {
    import graft.operators.Multimodal.ImageHeader
    assert(ImageHeader.probe(pngBytes(640, 480)).contains(ImageHeader.Info("png", 640, 480)))
    assert(ImageHeader.probe(jpegBytes(1920, 1080)).contains(ImageHeader.Info("jpeg", 1920, 1080)))
    assert(ImageHeader.probe(gifBytes(320, 200)).contains(ImageHeader.Info("gif", 320, 200)))
    assert(ImageHeader.probe("not an image".getBytes).isEmpty)
    assert(ImageHeader.probe(null).isEmpty)
    // truncated payloads must not throw
    assert(ImageHeader.probe(pngBytes(640, 480).take(10)).isEmpty)
    assert(ImageHeader.probe(jpegBytes(1920, 1080).take(7)).isEmpty)
  }

  test("imageAHashes + imageNearDupPairs: near-identical images pair, unrelated don't") {
    import java.awt.image.BufferedImage
    def png(img: BufferedImage): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bo)
      bo.toByteArray
    }
    def gradient(w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((255 * x / w) << 16) | ((255 * y / h) << 8) | 128)
      img
    }
    val base = gradient(64, 64)
    // near-dup: the same gradient with a small corner patch changed
    val tweaked = gradient(64, 64)
    for (y <- 0 until 4; x <- 0 until 4) tweaked.setRGB(x, y, 0xffffff)
    // unrelated: inverted gradient (structurally different everywhere)
    val other = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64)
      other.setRGB(x, y, ((255 - 255 * x / 64) << 16) | 200)
    val media = Seq(
      (1L, png(base)), (2L, png(tweaked)), (3L, png(other)),
      (4L, "not an image".getBytes))
      .toDF("media_id", "content")
    val hashes = Multimodal.imageAHashes(media).collect()
      .map(h => h.media_id -> h.ahash).toMap
    // real decode: image payloads hash, non-image payloads don't
    assert(hashes(1).isDefined && hashes(3).isDefined && hashes(4).isEmpty)
    // determinism: same bytes → same hash under repartitioning
    val again = Multimodal.imageAHashes(media.repartition(5)).collect()
      .map(h => h.media_id -> h.ahash).toMap
    assert(again === hashes)
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated image paired: $pairs")
  }

  test("audioNearDupPairs: perturbed track pairs, different frequency doesn't") {
    def sine(freq: Double, samples: Int, jitter: Int = 0): Array[Byte] = {
      val out = new Array[Byte](samples * 2)
      for (i <- 0 until samples) {
        val v = (math.sin(2 * math.Pi * freq * i / 16000) * 12000).toInt +
          (if (jitter != 0 && i % 97 == 0) jitter else 0)
        out(2 * i) = (v & 0xff).toByte
        out(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      out
    }
    // amplitude-modulated tones so the block-RMS profile has structure
    def am(freq: Double, samples: Int, jitter: Int = 0): Array[Byte] = {
      val base = sine(freq, samples, jitter)
      for (i <- 0 until samples) {
        val env = 0.2 + 0.8 * math.abs(math.sin(math.Pi * 7 * i / samples))
        val v = (((base(2 * i) & 0xff) | (base(2 * i + 1) << 8)).toShort * env).toInt
        base(2 * i) = (v & 0xff).toByte; base(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      base
    }
    val media = Seq(
      (1L, Multimodal.wavFromPcmBytes(am(440, 16000))),
      (2L, Multimodal.wavFromPcmBytes(am(440, 16000, jitter = 300))),
      (3L, Multimodal.wavFromPcmBytes(sine(440, 16000))), // flat envelope
      (4L, "not audio".getBytes))
      .toDF("media_id", "content")
    val hashes = Multimodal.audioHashes(media).collect()
      .map(h => h.media_id -> h.audio_hash).toMap
    assert(hashes(1).isDefined && hashes(3).isDefined && hashes(4).isEmpty)
    val pairs = Multimodal.audioNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"perturbed twin missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"different envelope paired: $pairs")
  }

  test("videoNearDupPairs: position-aligned frame hashing pairs the tweaked copy") {
    val (w, h) = (32, 24)
    def frame(shift: Int, invert: Boolean = false): Array[Byte] = {
      val f = new Array[Byte]((w * h * 3))
      for (y <- 0 until h; x <- 0 until w) {
        val lum = if (invert) 255 - (255 * x / w) else (255 * ((x + shift) % w) / w)
        val p = (y * w + x) * 3
        f(p) = lum.toByte; f(p + 1) = lum.toByte; f(p + 2) = lum.toByte
      }
      f
    }
    def avi(frames: Seq[Array[Byte]]) = Multimodal.aviFromFrames(frames, w, h)
    val baseFrames = (0 until 8).map(i => frame(i))
    val tweaked = baseFrames.map { f =>
      val c = f.clone(); c(0) = 127.toByte; c(1) = 127.toByte; c
    }
    val unrelated = (0 until 8).map(i => frame(i, invert = true))
    val media = Seq(
      (1L, avi(baseFrames)), (2L, avi(tweaked)), (3L, avi(unrelated)),
      (4L, "not a video".getBytes))
      .toDF("media_id", "content")
    val fh = Multimodal.videoFrameHashes(media, sampleK = 4).collect()
    assert(fh.count(_.media_id == 1L) === 4)
    assert(!fh.exists(_.media_id == 4L))
    val pairs = Multimodal.videoNearDupPairs(media, sampleK = 4,
      maxHamming = 3, minMatchingFrames = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"tweaked copy missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"inverted video paired: $pairs")
  }

  test("extractFeatures and withImageMeta surface real dimensions end-to-end") {
    val media = Seq(
      (1L, "image", pngBytes(640, 480)),
      (2L, "image", jpegBytes(1920, 1080)),
      (3L, "image", "plain text".getBytes))
      .toDF("media_id", "kind", "content")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.lit(null).cast("int").as("width"),
        org.apache.spark.sql.functions.lit(null).cast("int").as("height"),
        org.apache.spark.sql.functions.lit(null).cast("long").as("duration_ms"),
        org.apache.spark.sql.functions.lit(null).cast("int").as("sample_rate")))
    val feats = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(feats(0).image_format === Some("png"))
    assert((feats(0).width, feats(0).height) === (Some(640), Some(480)))
    assert(feats(1).image_format === Some("jpeg"))
    assert((feats(1).width, feats(1).height) === (Some(1920), Some(1080)))
    assert(feats(2).image_format === None)

    val withMeta = Multimodal.withImageMeta(media).orderBy("media_id")
      .select("meta.width", "meta.height").collect()
    assert((withMeta(0).get(0), withMeta(0).get(1)) === (640, 480))
    assert((withMeta(1).get(0), withMeta(1).get(1)) === (1920, 1080))
    assert(withMeta(2).isNullAt(0) && withMeta(2).isNullAt(1))
  }

  test("pqTopK: planted duplicate attains the minimum ADC distance; codes partition-invariant") {
    val dup = emb.filter($"vec_id" === 3L)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding", $"label")
    val corpus = emb.unionByName(dup)
    val out = Similarity.pqTopK(corpus, corpus.filter($"vec_id" === 3L),
      "vec_id", "embedding", k = 10)
    val rows = out.collect()
    assert(rows.length === 10)
    // the exact copy shares every subspace code with the query, so its
    // ADC distance is the reconstructed-self distance — the global min
    val minDist = rows.map(_.getAs[Double]("approx_dist")).min
    val dupRow = rows.find(_.getAs[Long]("cand_id") === 10003L).get
    assert(dupRow.getAs[Double]("approx_dist") === minDist)

    // codebooks + codes are deterministic and partition-invariant
    val books1 = Similarity.pqCodebooks(emb, "vec_id", "embedding")
    val books2 = Similarity.pqCodebooks(emb.repartition(13), "vec_id", "embedding")
    assert(books1.flatten.map(_.toSeq) === books2.flatten.map(_.toSeq))
    val c1 = Similarity.pqEncode(emb, "vec_id", "embedding", books1)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val c2 = Similarity.pqEncode(emb.repartition(7), "vec_id", "embedding", books1)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(c1 === c2)
    // codes are within the codebook range
    assert(c1.forall(t => Seq(t._2, t._3, t._4, t._5).forall(c => c >= 0 && c < 16)))
  }

  test("ivfPqTopK: results stay inside the probed cell; duplicate attains min ADC") {
    val dup = emb.filter($"vec_id" === 7L)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding", $"label")
    val corpus = emb.unionByName(dup)
    val out = Similarity.ivfPqTopK(corpus, corpus.filter($"vec_id" === 7L),
      "vec_id", "embedding", k = 10).collect()
    assert(out.nonEmpty && out.length <= 10)
    // an exact copy routes to the same coarse cell, has identical
    // residual → identical codes → the minimum ADC distance
    val minDist = out.map(_.getAs[Double]("approx_dist")).min
    val dupRow = out.find(_.getAs[Long]("cand_id") === 10007L).get
    assert(dupRow.getAs[Double]("approx_dist") === minDist)
    // nprobe=1: every scored candidate shares the query's cell
    assert(out.map(_.getAs[Int]("cell")).distinct.length === 1)
  }

  test("bigramLogProb: analytic chain value; typical text outscores rare-word soup") {
    // corpus = "a a a" + "a a": c1(a)=5, N=5, V=1, c2(a,a)=3
    // unigram start: ln((5+1)/(5+1)) = 0; conditional:
    // p = 0.9*(3/5) + (1-0.9)*((5+1)/(5+1)) → ln rounded 9 dp
    val d = Seq((1L, "a a a"), (2L, "a a")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val p = 0.9 * (3.0 / 5.0) + (1.0 - 0.9) * (6.0 / 6.0)
    val c9 = math.rint(math.log(p) * 1e9) / 1e9
    assert(out(1L) === ((3L, math.rint((0.0 + 2 * c9) / 3.0 * 1e6) / 1e6)))
    assert(out(2L) === ((2L, math.rint((0.0 + c9) / 2.0 * 1e6) / 1e6)))

    // the chain's unigram start term is what penalizes rare-word soup
    // (conditional-only scoring would rank it HIGHER than prose)
    val corpus = ((1 to 10).map(i => (i.toLong, "the cat sat on the mat")) :+
      (99L, "zyx qwv jkl pqm")).toDF("doc_id", "text")
    val scores = TextAnalysis.bigramLogProb(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(99L))
    // single-token docs keep their unigram term; empty docs drop out
    val tiny = Seq((1L, "a b"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val terms = TextAnalysis.bigramLogProb(tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(terms === Map(1L -> 2L, 2L -> 1L))
  }

  test("sketches: HLL union rollup within tolerance; CMS one-sided + eps bounds hold") {
    import graft.operators.Sketches
    val toks = docs.select($"lang",
      explode(TextAnalysis.wordTokens($"text")).as("token"))
      .filter($"token" =!= "")
    val gate = Sketches.hllDistinctGate(toks, "lang", "token").collect()
    assert(gate.forall(_.getAs[Boolean]("hll_within_tol")))
    assert(gate.exists(_.getAs[String]("lang") == "__ALL__"))
    // the union row gates the SKETCH rollup, not a sum of strata —
    // overlapping vocabularies make sum(strata) > global distinct
    val exactPerLang = gate.filter(_.getAs[String]("lang") != "__ALL__")
      .map(_.getAs[Long]("n_exact")).sum
    val exactGlobal = gate.find(_.getAs[String]("lang") == "__ALL__").get
      .getAs[Long]("n_exact")
    assert(exactPerLang > exactGlobal)
    // the rollup row is identified by the BOOLEAN, not the label —
    // and a stratum whose key is entirely NULL gates as a genuine
    // boolean (estimate 0 == exact 0), never NULL
    assert(gate.count(_.getAs[Boolean]("is_global")) === 1)
    val withNulls = toks.unionByName(spark.range(3).select(
      lit("nullonly").as("lang"), lit(null).cast("string").as("token")))
    val g2 = Sketches.hllDistinctGate(withNulls, "lang", "token").collect()
    val nl = g2.find(_.getAs[String]("lang") == "nullonly").get
    assert(nl.getAs[Long]("n_exact") === 0L)
    assert(nl.getAs[Boolean]("hll_within_tol"))

    // CMS: never undercounts (deterministic), overestimate within
    // eps*N at the chosen confidence
    val top = TextAnalysis.topTerms(docs, "text", 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.select(explode(TextAnalysis.wordTokens($"text")).as("t"))
      .filter($"t" =!= "").count()
    val est = Sketches.cmsEstimates(docs, "text", top.map(_._1).toSeq,
      eps = 0.0005, confidence = 0.999, seed = 42)
    top.foreach { case (t, exact) =>
      assert(est(t) >= exact, s"CMS undercounted $t")
      assert(est(t) <= exact + math.ceil(0.0005 * n).toLong,
        s"CMS overshoot on $t: ${est(t)} vs $exact (N=$n)")
    }
  }

  test("bm25Retrieve: tf saturation and length normalization behave") {
    val d = Seq(
      (1L, "alpha beta gamma delta"),                    // 1 hit, len 4
      (2L, "alpha alpha alpha beta gamma delta"),        // 3 hits, len 6
      (3L, "alpha " + ("pad " * 40).trim),               // 1 hit, len 41
      (4L, "no match here at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25Retrieve(d, "doc_id", "text",
      Seq("alpha"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // more occurrences → higher score; longer doc → penalized
    assert(out(2L) > out(1L))
    assert(out(1L) > out(3L))
    assert(!out.contains(4L))
    // saturation: tripling tf must NOT triple the score (k1 bounds it)
    assert(out(2L) < out(1L) * 3.0)
  }

  test("rpv2Signals: each fraction trips on its own planted pattern") {
    val d = Seq(
      (1L, "THE CAT sat on the mat"),      // 2/6 all-caps
      (2L, "123 456 cat"),                 // 2/3 no-alpha
      (3L, "spam spam spam spam"),         // 1/4 unique
      (4L, "Lorem ipsum lorem ipsum x"),   // 2 lorem-ipsum hits
      (5L, "code { x } end"),              // 2/14 curly chars
      (6L, "ab cdef"))                     // mean word length 3.0
      .toDF("doc_id", "text")
    val out = TextAnalysis.rpv2Signals(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("frac_all_caps_words") === 0.3333)
    assert(out(2L).getAs[Double]("frac_no_alph_words") === 0.6667)
    assert(out(3L).getAs[Double]("frac_unique_words") === 0.25)
    assert(out(4L).getAs[Int]("lorem_ipsum_count") === 2)
    assert(out(5L).getAs[Double]("frac_curly_bracket") === 0.1429)
    assert(out(6L).getAs[Double]("mean_word_length") === 3.0)
    // sanity on the corpus: fractions live in [0, 1]
    val c = TextAnalysis.rpv2Signals(docs, "doc_id", "text")
    val bad = c.filter(
      $"frac_all_caps_words" < 0 || $"frac_all_caps_words" > 1 ||
        $"frac_no_alph_words" < 0 || $"frac_no_alph_words" > 1 ||
        $"frac_unique_words" < 0 || $"frac_unique_words" > 1 ||
        $"frac_curly_bracket" < 0 || $"frac_curly_bracket" > 1).count()
    assert(bad === 0)
  }

  test("mmrRerank: diversity demotes the near-copy; λ=100 degenerates to relevance order") {
    import graft.operators.Similarity
    // query 0 = e1; candidates: 10/11 both ≈ e1 (near-copies of each
    // other), 12 = diagonal-ish (less relevant, diverse)
    def v(parts: (Int, Double)*): Seq[Float] = {
      val a = Array.fill(64)(0.001f)
      parts.foreach { case (i, x) => a(i) = x.toFloat }
      a.toSeq
    }
    val d = Seq(
      (0L, v(0 -> 1.0)),                 // the query
      (10L, v(0 -> 1.0, 1 -> 0.05)),     // near-copy A (most relevant)
      (11L, v(0 -> 1.0, 1 -> 0.06)),     // near-copy B (≈ A)
      (12L, v(0 -> 0.6, 5 -> 0.8))       // diverse, lower relevance
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(d.filter($"vec_id" > 0), d.filter($"vec_id" === 0),
        "vec_id", "embedding", poolK = 3, outK = 3, lambdaPct = 50)
      .orderBy("pos").collect().map(_.getLong(2))
    // pick 1 = most relevant near-copy; pick 2 must be the DIVERSE
    // candidate, not the other near-copy
    assert(out(0) === 10L, out.mkString(","))
    assert(out(1) === 12L, out.mkString(","))
    assert(out(2) === 11L, out.mkString(","))
    // λ = 100: pure relevance — near-copies first
    val rel = Similarity.mmrRerank(d.filter($"vec_id" > 0), d.filter($"vec_id" === 0),
        "vec_id", "embedding", poolK = 3, outK = 3, lambdaPct = 100)
      .orderBy("pos").collect().map(_.getLong(2))
    assert(rel.toSeq === Seq(10L, 11L, 12L), rel.mkString(","))
    // repartition invariance (the collapsed pool row is a pure
    // function of the candidate set)
    val shuffled = Similarity.mmrRerank(d.filter($"vec_id" > 0).repartition(5),
        d.filter($"vec_id" === 0), "vec_id", "embedding", 3, 3, 50)
      .orderBy("pos").collect().map(_.getLong(2))
    assert(shuffled.toSeq === out.toSeq)
  }

  test("ppsSample: expected size ≈ k, certain rows kept, repartition/seed behavior") {
    import graft.operators.Sampling
    val base = Sampling.ppsSample(docs, "doc_id", "n_chars", expectK = 50, seed = "pps9")
    val n = base.count()
    // Poisson spread: |n − k| within ~4√k
    assert(math.abs(n - 50L) <= 30L, s"sample size $n far from 50")
    // p_keep honest: every kept row carries min(1, k·w/W) and w > 0
    assert(base.filter($"p_keep" <= 0 || $"p_keep" > 1).count() === 0)
    // partitioning-invariant (pure function of the row + one global sum)
    val shuffled = Sampling.ppsSample(
      docs.repartition(13), "doc_id", "n_chars", expectK = 50, seed = "pps9")
    assert(base.select("doc_id").exceptAll(shuffled.select("doc_id")).isEmpty)
    assert(shuffled.select("doc_id").exceptAll(base.select("doc_id")).isEmpty)
    // different seed → different sample (overwhelmingly)
    val other = Sampling.ppsSample(docs, "doc_id", "n_chars", expectK = 50, seed = "pps10")
    assert(other.select("doc_id").exceptAll(base.select("doc_id")).count() > 0)
    // a row whose k·w ≥ W is ALWAYS kept (probability clamps to 1)
    val d = (1L to 9L).map((_, 10L)) :+ ((10L, 100000L))
    val heavy = Sampling.ppsSample(
      d.toDF("id", "w"), "id", "w", expectK = 5, seed = "x")
    assert(heavy.filter($"id" === 10L).count() === 1L)
    assert(heavy.filter($"id" === 10L).head().getAs[Double]("p_keep") === 1.0)
  }

  test("weightedSampleTopK: sub-microscopic weights clamp inside BIGINT range") {
    import graft.operators.Sampling
    // w = 1e-9 drives ln(u)/w·10¹² to ~-10²¹ — far past Long.MinValue;
    // the ±9·10¹⁸ clamp must keep every key a valid BIGINT (ADVICE
    // r10: unclamped, non-ANSI Spark wrapped, ANSI threw, DuckDB
    // errored — three behaviors) with ties broken by id
    val d = Seq((1L, 1.0e-9), (2L, 2.0e-9), (3L, 100.0)).toDF("doc_id", "w")
    val out = Sampling.weightedSampleTopK(d, "doc_id", "w", k = 3, seed = "cl")
      .orderBy("rank").collect()
    assert(out.length === 3)
    assert(out.head.getLong(1) === 3L, "the real weight must rank first")
    out.foreach(r =>
      assert(math.abs(r.getLong(2)) <= 9200000000000000000L,
        s"key ${r.getLong(2)} escaped the clamp"))
    // the two clamped keys tie at the floor and break by id
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 1L, 2L))
  }

  test("weightedSampleTopK: exactly k, deterministic across partitioning, " +
    "weight-biased, seed-sensitive") {
    import graft.operators.Sampling
    val base = Sampling.weightedSampleTopK(docs, "doc_id", "n_chars",
      k = 100, seed = "aes1").collect()
    assert(base.length === 100)
    assert(base.map(_.getInt(0)).toSeq === (1 to 100)) // dense ranks
    // partitioning-invariant: same 100 docs in the same order
    val shuffled = Sampling.weightedSampleTopK(docs.repartition(13),
      "doc_id", "n_chars", k = 100, seed = "aes1").collect()
    assert(base.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      shuffled.map(r => (r.getInt(0), r.getLong(1))).toSeq)
    // different seed → different sample (overwhelmingly)
    val other = Sampling.weightedSampleTopK(docs, "doc_id", "n_chars",
      k = 100, seed = "aes2").collect()
    assert(other.map(_.getLong(1)).toSet != base.map(_.getLong(1)).toSet)
    // weighted inclusion: sampled docs skew heavy — the sample's mean
    // n_chars must exceed the corpus mean (A-ES inclusion ∝ weight)
    val ids = base.map(_.getLong(1)).toSet
    val stats = docs.filter($"n_chars" > 0)
      .select(avg($"n_chars").as("mu"),
        avg(when($"doc_id".isin(ids.toSeq: _*), $"n_chars")).as("mu_s"))
      .head()
    assert(stats.getDouble(1) > stats.getDouble(0),
      s"sample mean ${stats.getDouble(1)} ≤ corpus mean ${stats.getDouble(0)}")
    // a dominant weight is (virtually) always included
    val d = ((1L to 99L).map((_, 1L)) :+ ((100L, 1000000L)))
      .toDF("id", "w")
    val heavy = Sampling.weightedSampleTopK(d, "id", "w", k = 5, seed = "x")
      .collect().map(_.getLong(1)).toSet
    assert(heavy.contains(100L))
  }

  test("pmiPairs: hand-derived lift on planted co-occurrence; vocab cap; ordering invariants") {
    // 4 docs; vocab (top-3 by df): a(4), b(3), c(2); d appears once
    // and must fall off the top-3 vocab cap
    val d = Seq(
      (1L, "a b c"),
      (2L, "a b"),
      (3L, "a c d"),
      (4L, "a b zz")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairs(d, "doc_id", "text", topVocab = 3, minPair = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    // lift(a,b) = 1e6·4·3/(4·3) = 1e6; lift(b,c) = 1e6·4·1/(3·2)
    assert(out(("a", "b")).getAs[Long]("lift_ppm") === 1000000L)
    assert(out(("a", "c")).getAs[Long]("n_ab") === 2L)
    assert(out(("b", "c")).getAs[Long]("lift_ppm") === 666666L)
    // corpus invariants: t1 < t2 everywhere, counts consistent
    val c = TextAnalysis.pmiPairs(docs, "doc_id", "text", topVocab = 16, minPair = 5)
    assert(c.filter($"t1" >= $"t2").count() === 0)
    assert(c.filter($"n_ab" > $"n_a" || $"n_ab" > $"n_b").count() === 0)
    assert(c.filter($"n_ab" < 5).count() === 0)
  }

  test("blocklistGate: exact-token hits, no substring false positives, C4 drop rule") {
    val d = Seq(
      (1L, "the Slow cat is slow"),     // 2 hits (case-normalized), 1 term
      (2L, "a slower catalog update"),  // substring "slow" must NOT trip
      (3L, "dup dup slow"),             // 3 hits, 2 distinct terms
      (4L, "clean text only")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistGate(d, "doc_id", "text",
        Seq("slow", "dup", "spam"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_block_hits") === 2L)
    assert(out(1L).getAs[Long]("n_block_terms") === 1L)
    assert(!out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Long]("n_block_hits") === 0L)
    assert(out(2L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[Long]("n_block_hits") === 3L)
    assert(out(3L).getAs[Long]("n_block_terms") === 2L)
    assert(out(3L).getAs[Double]("block_frac") === 1.0)
    assert(out(4L).getAs[Boolean]("keep"))
    // corpus sanity: hit fraction bounded, keep ⇔ zero hits
    val c = TextAnalysis.blocklistGate(docs, "doc_id", "text",
      Seq("slow", "dup", "spam"))
    assert(c.filter($"block_frac" < 0 || $"block_frac" > 1).count() === 0)
    assert(c.filter($"keep" =!= ($"n_block_hits" === 0)).count() === 0)
  }

  test("topNgramFracs: repeated phrase dominates, ties break smallest, short docs zero") {
    val d = Seq(
      // "b c" occurs 3×, len 3, total chars 15 → 9/15
      (1L, "a b c b c b c d"),
      // all bigrams distinct, each count 1: tie → smallest gram "a b"
      (2L, "a b c d"),
      // 1 token: no bigram at all
      (3L, "solo"),
      (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.topNgramFracs(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("frac_top_2gram") ===
      math.rint(9.0 / 15.0 * 1e4) / 1e4)
    // doc 2: count 1 × len 3 / total 7
    assert(out(2L).getAs[Double]("frac_top_2gram") ===
      math.rint(3.0 / 7.0 * 1e4) / 1e4)
    assert(out(3L).getAs[Double]("frac_top_2gram") === 0.0)
    assert(out(4L).getAs[Double]("frac_top_2gram") === 0.0)
    // trigram of doc 1: "b c b" and "c b c" both 2× → tie picks
    // "b c b"; len 5, count 2, total 15
    assert(out(1L).getAs[Double]("frac_top_3gram") ===
      math.rint(10.0 / 15.0 * 1e4) / 1e4)
    // pure cycle: "x y" 4× × 3 chars over 15 total = 0.8 exactly
    val rep = Seq((9L, "x y x y x y x y")).toDF("doc_id", "text")
    val r = TextAnalysis.topNgramFracs(rep, "doc_id", "text")
      .collect().head
    assert(r.getAs[Double]("frac_top_2gram") === 0.8)
  }

  test("invertedIndex: caps postings, windowed order, minDf filter, tf exact") {
    val d = Seq(
      (1L, "alpha beta alpha"),          // alpha tf=2
      (2L, "alpha gamma"),
      (3L, "alpha alpha alpha beta"),    // alpha tf=3
      (4L, "alpha delta"),
      (5L, "rare")                       // df=1 term, filtered at minDf=2
    ).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(d, "doc_id", "text",
      maxPostings = 3, minDf = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    // alpha: df 4, occurrences 2+1+3+1 = 7, postings capped to 3 and
    // ordered tf desc then doc asc: 3:3, 1:2, then doc 2 before doc 4
    val a = idx("alpha")
    assert(a.getAs[Long]("df") === 4L)
    assert(a.getAs[Long]("n_occurrences") === 7L)
    assert(a.getAs[String]("postings") === "3:3,1:2,2:1")
    // beta: df 2, both tf=1 → doc order tiebreak
    assert(idx("beta").getAs[String]("postings") === "1:1,3:1")
    // df=1 terms are filtered out
    assert(!idx.contains("rare") && !idx.contains("gamma"))
  }

  test("hllSketchState: union merge is batch-boundary invariant") {
    import graft.operators.Sketches
    val ev = Tables.events(spark, sfDir)
      .select(to_date($"ts").as("day"), $"user_id", $"event_id")
    val whole = Sketches.finalizeSketchState(
      Sketches.hllSketchState(ev, Seq("day"), "user_id"), "est")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // split on an arbitrary predicate and merge: HLL union is
    // register-wise max, so the merged estimate must equal the
    // one-shot estimate EXACTLY — not approximately
    val merged = Sketches.finalizeSketchState(
      Sketches.mergeSketchStates(
        Sketches.hllSketchState(ev.filter($"event_id" % 2 === 0), Seq("day"), "user_id"),
        Sketches.hllSketchState(ev.filter($"event_id" % 2 =!= 0), Seq("day"), "user_id"),
        Seq("day")), "est")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(merged === whole)
    // and the estimate gates against the exact distinct at lgK=12
    val exact = ev.groupBy($"day").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    exact.foreach { case (day, n) =>
      assert(math.abs(whole(day) - n) / n.toDouble <= 0.05,
        s"estimate off >5% on $day: ${whole(day)} vs $n")
    }
  }

  test("hashedNgramScore: feature count, bias-only docs, integer-exact logit") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "alpha beta gamma"), // 3 unigrams + 2 bigrams = 5 features
      (2L, "solo"),             // 1 feature
      (3L, ""),                 // 0 features: bias-only row survives
      (4L, "alpha beta gamma")) // identical to doc 1 -> identical logit
      .toDF("doc_id", "text")
    val w = TextAnalysis.syntheticWeights(spark, 64)
    val got = TextAnalysis.hashedNgramScore(docs, "doc_id", "text", w, 64, -100L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L)._1 === 5L && got(2L)._1 === 1L && got(3L)._1 === 0L)
    assert(got(3L)._2 === -100L && !got(3L)._3)
    assert(got(4L) === got(1L), "same text must score identically")
    // recompute doc 1 driver-side from the weight table
    val wm = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bp(g: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).take(3).map("%02x".format(_)).mkString
      wm(java.lang.Long.parseLong(h, 16) % 64)
    }
    val grams = Seq("alpha", "beta", "gamma", "alpha_beta", "beta_gamma")
    assert(got(1L)._2 === grams.map(bp).sum - 100L)
    assert(got(1L)._3 === (got(1L)._2 > 0))
  }

  test("refineTopK: pool subset, exact scores, full-pool refine equals brute force") {
    import graft.operators.Similarity
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val q = e.filter($"vec_id" < 3)
    val pool = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 20)
    val poolSet = pool.select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Similarity.refineTopK(pool, e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2), r.getInt(3)))
    // refined pairs come from the pool, exactly 5 per query, ranks 1..5
    assert(refined.forall { case (p, _, _) => poolSet.contains(p) })
    refined.groupBy(_._1._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1 to 5)) }
    // refine scores are the EXACT cosines brute force computes
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    refined.foreach { case (p, cos, _) => assert(bf(p) === cos) }
    // a refine over the FULL brute-force pool reproduces brute force
    // top-5 exactly (pool recall 100% -> refine == exact search)
    val fullPool = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 200)
    val viaRefine = Similarity.refineTopK(fullPool, e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val direct = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(viaRefine === direct)
  }

  test("gramMatrix equals the hand-computed outer-product sum") {
    val df = Seq(
      Seq(1.0f, 2.0f, -1.0f),
      Seq(0.5f, 0.0f, 3.0f)).toDF("embedding")
    val got = Similarity.gramMatrix(df, "embedding", dim = 3,
      quantScale = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // quantized rows: (10, 20, -10) and (5, 0, 30)
    val q = Seq(Seq(10L, 20L, -10L), Seq(5L, 0L, 30L))
    val want = (for { i <- 0 until 3; j <- i until 3 } yield
      (i + 1, j + 1) -> q.map(v => v(i) * v(j)).sum).toMap
    assert(got === want)
  }

  test("gramMatrix is partitioning-invariant (integer accumulation)") {
    val a = Similarity.gramMatrix(emb.repartition(1), "embedding", 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = Similarity.gramMatrix(emb.repartition(13), "embedding", 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a === b && a.size === 64 * 65 / 2)
  }

  test("pcaTopComponent recovers a planted dominant direction; " +
    "projection variance beats every coordinate axis") {
    // planted: strong variance along (1,1,0,...)/√2, weak orthogonal
    // noise along deterministic unit axes
    val dim = 8
    val rows = (0 until 200).map { i =>
      val major = (i % 21).toDouble - 10.0 // spread -10..10
      val minor = ((i * 7) % 5).toDouble / 10.0 - 0.2
      val v = Array.ofDim[Float](dim)
      v(0) = (major / math.sqrt(2) / 10.0).toFloat
      v(1) = (major / math.sqrt(2) / 10.0).toFloat
      v(2 + i % 6) = (minor / 10.0).toFloat
      v.toSeq
    }
    val df = rows.toDF("embedding").withColumn("id",
      monotonically_increasing_id())
    val gram = Similarity.gramMatrix(df, "embedding", dim)
    val comp = Similarity.pcaTopComponent(gram, dim)
    val cosPlanted = math.abs((comp(0) + comp(1)) / math.sqrt(2))
    assert(cosPlanted > 0.99,
      s"component ${comp.toSeq} not aligned with planted axis")
    // projection variance along pc1 ≥ variance along each raw axis
    val proj = Similarity.pcaProject(df, "id", "embedding", comp)
      .collect().map(_.getDouble(1))
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val pcVar = variance(proj.toSeq)
    val axes = (0 until dim).map { a =>
      variance(rows.map(_(a).toDouble))
    }
    assert(axes.forall(_ <= pcVar + 1e-9),
      s"pc1 var $pcVar < some axis var ${axes.max}")
    // deterministic: same inputs, same component bit-for-bit
    val comp2 = Similarity.pcaTopComponent(
      Similarity.gramMatrix(df.repartition(7), "embedding", dim), dim)
    assert(comp.toSeq === comp2.toSeq)
  }
}
