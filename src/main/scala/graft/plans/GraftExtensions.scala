package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SparkSessionExtensions): registers the
  * custom Catalyst expressions as SQL functions. Install with
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("poly_hash64"),
      new ExpressionInfo(classOf[PolyHash64].getName, "poly_hash64"),
      (children: Seq[Expression]) => PolyHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      GraftExtensions.buildMinHashSigs))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs_xx64"),
      new ExpressionInfo(classOf[MinHashSigsXx64].getName, "minhash_sigs_xx64"),
      GraftExtensions.buildMinHashSigsXx64))
    ext.injectFunction((
      new FunctionIdentifier("packed_shingles"),
      new ExpressionInfo(classOf[PackedShingles].getName, "packed_shingles"),
      GraftExtensions.buildPackedShingles))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sorted"),
      new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted"),
      (children: Seq[Expression]) => JaccardSorted(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("overlap_sorted"),
      new ExpressionInfo(classOf[OverlapSorted].getName, "overlap_sorted"),
      (children: Seq[Expression]) => OverlapSorted(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName,
        "damerau_levenshtein"),
      GraftExtensions.buildDamerauLevenshtein))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairsAgg].getName, "topk_pairs"),
      GraftExtensions.buildTopKPairs))
    ext.injectFunction((
      new FunctionIdentifier("freq_items"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "freq_items"),
      GraftExtensions.buildFreqItems))
    ext.injectFunction((
      new FunctionIdentifier("no_inline"),
      new ExpressionInfo(classOf[NoInline].getName, "no_inline"),
      (children: Seq[Expression]) => NoInline(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      GraftExtensions.buildBloomAgg))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      GraftExtensions.buildBloomMightContain))
  }
}

object GraftExtensions {

  /** Evaluate a trailing argument as a non-null integer literal, or
    * raise a proper AnalysisException naming the function and
    * parameter (instead of the opaque ClassCastException/NPE a column
    * reference or NULL literal would otherwise produce — these args
    * shape the output schema, so they must fold at analysis time).
    */
  private def foldableInt(fn: String, param: String, e: Expression): Int = {
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        "NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> s"`$fn`", "paramName" -> s"`$param`",
          "paramType" -> "\"INT\""))
    e.eval() match {
      case n: Number => n.intValue
      case _ =>
        throw new org.apache.spark.sql.AnalysisException(
          "INTERNAL_ERROR",
          Map("message" ->
            s"$fn: argument '$param' must be a non-null integer literal"))
    }
  }

  /** minhash_sigs(text[, numHashes[, shingleSize]]) — trailing args
    * must be integer literals (they shape the output schema).
    */
  private[plans] val buildMinHashSigs: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      def lit(i: Int, name: String, default: Int): Int = children.lift(i)
        .map(e => foldableInt("minhash_sigs", name, e)).getOrElse(default)
      MinHashSigs(children.head, lit(1, "numHashes", 6), lit(2, "shingleSize", 5))
    }

  /** minhash_sigs_xx64(text[, numHashes[, shingleSize]]) — the
    * long-signature production twin; same literal-arg contract.
    */
  private[plans] val buildMinHashSigsXx64: Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      def lit(i: Int, name: String, default: Int): Int = children.lift(i)
        .map(e => foldableInt("minhash_sigs_xx64", name, e)).getOrElse(default)
      MinHashSigsXx64(children.head,
        lit(1, "numHashes", 6), lit(2, "shingleSize", 5))
    }

  /** damerau_levenshtein(a, b[, k]) — with the optional literal
    * threshold k the banded DP runs: exact distance when ≤ k, k+1
    * otherwise (the join-scale form; see the expression's scaladoc).
    */
  private[plans] val buildDamerauLevenshtein: Seq[Expression] => Expression =
    (children: Seq[Expression]) => DamerauLevenshtein(
      children(0), children(1),
      children.lift(2).map(e => foldableInt("damerau_levenshtein", "k", e))
        .getOrElse(Int.MaxValue))

  /** topk_pairs(keyLong, payloadLong, k) — bounded-heap top-k
    * aggregate (see [[TopKPairsAgg]]); k must be an integer literal.
    */
  private[plans] val buildTopKPairs: Seq[Expression] => Expression =
    (children: Seq[Expression]) => TopKPairsAgg(
      children(0), children(1), foldableInt("topk_pairs", "k", children(2)))

  /** freq_items(itemLong, k) — Misra–Gries frequent-items sketch
    * (see [[MisraGriesAgg]]); k must be an integer literal.
    */
  private[plans] val buildFreqItems: Seq[Expression] => Expression =
    (children: Seq[Expression]) => MisraGriesAgg(
      children(0), foldableInt("freq_items", "k", children(1)))

  /** packed_shingles(text[, shingleSize]) — size must be a literal. */
  private[plans] val buildPackedShingles: Seq[Expression] => Expression =
    (children: Seq[Expression]) => PackedShingles(children.head,
      children.lift(1).map(e => foldableInt("packed_shingles", "shingleSize", e))
        .getOrElse(5))

  /** bloom_agg(xxhash64_value, estimatedNumItems, numBits) — Spark's
    * own BloomFilterAggregate (the engine uses it for runtime join
    * filters), surfaced as a registered function so operators can
    * hand-apply the same semijoin-pushdown trick where the optimizer
    * can't see it (e.g. the probe side of an anti-join). Returns the
    * serialized filter as binary.
    */
  private[plans] val buildBloomAgg: Seq[Expression] => Expression =
    (children: Seq[Expression]) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        children(0), children(1), children(2))

  /** bloom_might_contain(serialized_filter, xxhash64_value) — the
    * matching probe predicate (no false negatives; false-positive
    * rate set by the build's numBits).
    */
  private[plans] val buildBloomMightContain: Seq[Expression] => Expression =
    (children: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children(0), children(1))

  /** Per-session registration for sessions built without extensions
    * (e.g. the driver-owned Verify session). Idempotent — and
    * actually-idempotent: already-registered names are skipped so a
    * per-operator register call doesn't spam "function replaced"
    * warnings into every log.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(new FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    add("poly_hash64", children => PolyHash64(children.head))
    add("minhash_sigs", buildMinHashSigs)
    add("minhash_sigs_xx64", buildMinHashSigsXx64)
    add("packed_shingles", buildPackedShingles)
    add("jaccard_sorted", children => JaccardSorted(children(0), children(1)))
    add("overlap_sorted", children => OverlapSorted(children(0), children(1)))
    add("vec_dot", children => VecDot(children(0), children(1)))
    add("damerau_levenshtein", buildDamerauLevenshtein)
    add("topk_pairs", buildTopKPairs)
    add("freq_items", buildFreqItems)
    add("no_inline", children => NoInline(children.head))
    add("bloom_agg", buildBloomAgg)
    add("bloom_might_contain", buildBloomMightContain)
  }
}
