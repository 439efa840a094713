package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank contract: the rank update is the textbook power
  * iteration, deterministic under repartitioning (the decimal-sum
  * recipe), and structure-sensitive in the directions that matter
  * (hubs above leaves, symmetric vertices equal).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: star hub outranks leaves; symmetric leaves tie; mass ≈ 1") {
    // star: 0 — {1,2,3,4}
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("id_1", "id_2")
    val r = Graph.pageRank(pairs, "id_1", "id_2", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(r(1L) === r(2L) && r(2L) === r(3L) && r(3L) === r(4L))
    assert(r(0L) > r(1L))
    // no dangling mass in a symmetrized graph: Σrank stays ~1 up to
    // the 9 dp per-step rounding
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("pageRank: path endpoints tie below the middle; repartition-invariant") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_1", "id_2")
    val base = Graph.pageRank(pairs, "id_1", "id_2", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(base(1L) === base(3L))
    assert(base(2L) > base(1L))
    // decimal sums make the result independent of the input layout
    val shuffled = Graph.pageRank(pairs.repartition(7), "id_1", "id_2", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(shuffled === base)
  }

  test("pageRank: first iteration matches the hand-derived fixed-point update") {
    // edge 1—2 plus 2—3: deg(1)=1, deg(2)=2, deg(3)=1, n=3,
    // fixed-point r0 = 1e12 div 3 = 333333333333
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_1", "id_2")
    val r = Graph.pageRank(pairs, "id_1", "id_2", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val u = Graph.FpUnit
    val r0 = u / 3                  // 333333333333
    val cFromDeg1 = r0 / 1          // from 1 or 3
    val cFromDeg2 = r0 / 2          // 166666666666, floor
    def step(s: Long): Double =
      ((15 * u / (100 * 3)) + (85 * s / 100)).toDouble / u.toDouble
    assert(r(1L) === step(cFromDeg2))
    assert(r(3L) === step(cFromDeg2))
    assert(r(2L) === step(2 * cFromDeg1))
  }

  test("triangleStats: planted triangle + pendant — counts, lcc, no-triangle rows") {
    // triangle {1,2,3} plus pendant 4 hanging off 3
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_1", "id_2")
    val r = Graph.triangleStats(pairs, "id_1", "id_2")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L))
    assert(r(1L) === ((2L, 1L, 1.0)))       // deg 2, one triangle, lcc 2·1/(2·1)=1
    assert(r(2L) === ((2L, 1L, 1.0)))
    assert(r(3L) === ((3L, 1L, 1.0 / 3.0))) // deg 3, lcc 2·1/(3·2)
    assert(r(4L) === ((1L, 0L, 0.0)))       // pendant: tri 0, lcc pinned 0.0
  }

  test("triangleStats: K4 = 4 triangles/node, lcc 1; duplicate+reversed edges collapse") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    // feed each edge twice, half reversed — the symmetrize+distinct
    // must collapse them before degrees are counted
    val noisy = (k4 ++ k4.map(_.swap)).toDF("id_1", "id_2")
    val r = Graph.triangleStats(noisy, "id_1", "id_2")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    (1L to 4L).foreach { n => assert(r(n) === ((3L, 3L, 1.0))) }
  }

  test("census super-cluster cap: degenerate bucket dropped, correctness-SF answers untouched") {
    // a hot LSH bucket is a b-clique whose census cost is C(b,3):
    // synthetic bands with one bucket over CensusMaxBucketSize and
    // one small must yield pairs ONLY from the small bucket
    import graft.operators.TextDedup
    val big = (1L to Graph.CensusMaxBucketSize + 1L)
      .map(i => (i, 0, "hot"))
    val small = Seq((900L, 1, "cold"), (901L, 1, "cold"))
    val bands = (big ++ small).toDF("doc_id", "band_id", "band_hash")
    val pairs = TextDedup.lshCandidatePairs(bands, "doc_id",
      maxBucketSize = Graph.CensusMaxBucketSize)
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((900L, 901L)),
      "oversized bucket must be excluded from the census pair graph")
    // on the real correctness-SF corpus the cap must NOT bind — the
    // registered graph_triangle_stats answer (and its DuckDB oracle,
    // which carries no cap clause) is unchanged by the cap
    val corpus = graft.queries.LlmQueries.nearDupCorpus(spark, sfDir)
    val realBands = TextDedup.lshBands(
      TextDedup.minhashSignatures(
        TextDedup.dedupExact(corpus, "doc_id", "text"), "doc_id", "text"),
      "doc_id")
    val uncapped = TextDedup.lshCandidatePairs(realBands, "doc_id").count()
    val capped = TextDedup.lshCandidatePairs(realBands, "doc_id",
      maxBucketSize = Graph.CensusMaxBucketSize).count()
    assert(capped === uncapped,
      s"cap ${Graph.CensusMaxBucketSize} must not bind at correctness SFs")
    // headroom margin at the LARGEST oracle SF (ADVICE r14): the
    // non-binding claim above only exercises the spec SF; the sf0.1
    // max bucket (116 when measured) must stay ≤ cap/2 so corpus
    // drift toward the cap is flagged BEFORE the cap silently starts
    // excluding buckets from the registered census answer
    val bigSf = Seq("/root/testdata/sf0.1", "/root/testdata/sf0.01", sfDir)
      .find(d => new java.io.File(s"$d/documents.parquet").exists).get
    val bigBands = TextDedup.lshBands(
      TextDedup.minhashSignatures(
        TextDedup.dedupExact(
          graft.queries.LlmQueries.nearDupCorpus(spark, bigSf),
          "doc_id", "text"), "doc_id", "text"),
      "doc_id")
    val maxBucket = bigBands.groupBy("band_id", "band_hash")
      .agg(count(lit(1)).as("b")).agg(max(col("b"))).first().getLong(0)
    assert(maxBucket <= Graph.CensusMaxBucketSize / 2,
      s"max LSH bucket $maxBucket at $bigSf is within 2x of the census " +
        s"cap ${Graph.CensusMaxBucketSize} — re-adjudicate the cap before " +
        "it binds on oracle answers")
  }

  test("triangleStats: degree-ordered orientation is repartition-invariant") {
    // hub 0 with leaves 1..6, one closed pair (1,2): exercises the
    // deg-tie and hub-vs-leaf orientation branches
    val pairs = ((1L to 6L).map(l => (0L, l)) :+ ((1L, 2L))).toDF("id_1", "id_2")
    val base = Graph.triangleStats(pairs, "id_1", "id_2").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(base(0L)._2 === 1L && base(1L)._2 === 1L && base(2L)._2 === 1L)
    assert(base(3L)._2 === 0L)
    val shuffled = Graph.triangleStats(pairs.repartition(7), "id_1", "id_2")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(shuffled === base)
  }
}
