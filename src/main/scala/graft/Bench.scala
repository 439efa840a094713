package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * - `value` is the HEADLINE-set total at SPARK_GRAFT_SF_DIR — the
  *   cross-round comparable number (same 16 queries since r4).
  * - `queries` carries per-query seconds for the FULL registry at
  *   SPARK_GRAFT_SF_DIR (min across successful BENCH_REPEAT runs), so
  *   no query has correctness without a recorded wall-time. Queries
  *   whose every repeat failed/timed out are listed in `failed` — a
  *   transient failure in one repeat never masks a valid measurement
  *   from another, and a fully-failed query is visible, not silently
  *   dropped from the totals.
  * - `gc_ms` (top level and per sweep) is each reported run's
  *   overlapped JVM GC time — the heap-pressure axis that explains
  *   cross-environment wall-time gaps without re-run archaeology.
  * - `scale` / `scale30` are derived-scale sweeps: every query
  *   re-timed at 10× and 30× data ([[graft.sources.ScaledCorpus]]),
  *   cheapest-first under a wall-clock budget with a per-query cap,
  *   and `cliffs` lists queries whose per-row cost grew >2× —
  *   superlinear operators that correctness checks can't see.
  *   Skips/caps are REPORTED, never silent.
  *
  * The driver records only the TAIL of the printed line, so the JSON
  * keys are ordered least- to most-important: the big per-query dicts
  * come first and the headline/summary numbers are at the END of the
  * line, surviving any truncation. The complete JSON is additionally
  * written to `target/bench.json`.
  *
  * Queries are materialized through the noop sink — count() lets
  * Spark's count-star shortcut skip projection work and would
  * under-measure; noop executes the full plan including expression
  * evaluation.
  */
object Bench {

  /** Headline set: one representative per operator family, ordered
    * roughly cheap → expensive.
    */
  val headline: Seq[String] = Seq(
    "daily_revenue",       // scan → filter → group agg
    "p01_cast_projection", // projection throughput
    "v01_rule_annotate",   // rule-engine projection
    "e2e_curated",         // validate + double broadcast join
    "a04_extended_metrics",// join + wide agg
    "j04_semi_exists",     // semi join
    "w01_latest_per_key",  // window dedupe
    "scd2_merge",          // SCD2 merge pipeline
    "mdm_match_pairs",     // blocked fuzzy self-join
    "ta_quality_scores",   // regex-heavy text projection
    "dd_minhash_pairs",    // shingle explode + LSH self-join
    "ann_topk",            // brute-force vector search
    "ta_rolling_hash",     // custom codegen'd expression
    "ev_window_agg",       // tumbling window agg
    "ev_sessions",         // gaps-and-islands windowing
    "ev_asof_join")        // as-of join

  /** Run one query to the noop sink under a cancellable job group;
    * returns seconds, or -1 on timeout (jobs cancelled), -2 on error.
    */
  /** One query's measurement: wall seconds (sentinel -1 timeout / -2
    * error) plus the JVM-wide GC time the run overlapped. gc_ms makes
    * cross-environment gaps diagnosable from the JSON alone — a query
    * that is 3× slower in a shared long-lived JVM with gc_ms ≈ the
    * wall gap is heap-pressure-bound, not plan-regressed.
    */
  final case class Timing(sec: Double, gcMs: Long, errMsg: Option[String] = None)

  private def totalGcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  private def timedRun(spark: SparkSession, name: String, dir: String,
                       capSec: Int): Timing = {
    val fn = SparkEntry.queries(name)
    val group = s"bench-$name"
    val gc0 = totalGcMs
    val t0 = System.nanoTime()
    val runner = new Thread(() => {
      // job group is thread-local: set it on the thread that submits
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    }, group)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    runner.setDaemon(true)
    runner.setUncaughtExceptionHandler((_, e) => err.set(e))
    runner.start()
    runner.join(capSec * 1000L)
    if (runner.isAlive) {
      spark.sparkContext.cancelJobGroup(group)
      // a streaming query ignores job-group cancellation (it blocks in
      // awaitTermination, not in a job) — stop any active streams so a
      // capped ev_stream_* query can't keep running and pollute the
      // timings of everything after it
      spark.streams.active.foreach { q =>
        try q.stop() catch { case _: Exception => () }
      }
      runner.join(30000L) // drain cancellation
      System.err.println(s"[bench] $name exceeded ${capSec}s cap, cancelled")
      Timing(-1.0, totalGcMs - gc0)
    } else if (err.get != null) {
      // record the failure's first line IN the artifact: round 10's 30×
      // sweep cascade (24 consecutive -2.0s) was undiagnosable because
      // the messages lived only on a lost console
      val msg = Option(err.get.getMessage).getOrElse(err.get.getClass.getName)
        .linesIterator.nextOption().getOrElse("").take(160)
      System.err.println(s"[bench] $name failed: ${err.get}")
      err.get.printStackTrace()
      Timing(-2.0, totalGcMs - gc0, Some(msg))
    } else Timing((System.nanoTime() - t0) / 1e9, totalGcMs - gc0)
  }

  private def jsonDict(entries: Iterable[(String, Double)]): String =
    entries.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""

  /** Queries whose wall-time is fixed micro-batch + checkpoint
    * overhead, not data cost (Structured Streaming: each runs a real
    * readStream→writeStream with its own checkpoint dir). Their
    * variance across repeats is low and min-of-N buys nothing, so the
    * repeat loop runs them ONCE — ~55 s of the sf0.1 pass at r10 —
    * and the saved wall-clock funds the scale sweeps under the global
    * deadline.
    */
  private def isStreamingFixedOverhead(name: String): Boolean =
    name.contains("_stream_") || name == "corpus_stream_gate" ||
      name == "scd2_stream_merge"

  /** Sweep-excluded names beyond the `_coarse` MDM twins:
    * dd_ngram_prefix is output-quadratic BY SEMANTICS (exact pair
    * enumeration; the declared corpus-scale route is MinHash/LSH —
    * dd_minhash_pairs, 10×-clean). It was the registry's only 10×
    * cliff and burned a full per-query cap timeout every sweep while
    * measuring nothing new; it stays fully oracle-gated at the bench
    * SF. Reported in `excluded_sweep`, never silent.
    */
  private val excludedSweep: Seq[String] = Seq("dd_ngram_prefix")

  def main(args: Array[String]): Unit = {
    val benchStart = System.nanoTime()
    def globalElapsed: Double = (System.nanoTime() - benchStart) / 1e9
    // Global wall-clock deadline for the WHOLE bench run: the driver
    // kills the process at its own outer timeout (round 10's 1800 s
    // 30× budget pushed the run past it → BENCH_r10.json rc=124,
    // parsed null — a dead artifact). 2400 s + ~200 s of sbt/JVM
    // startup fits the 2599 s a driver run has proven to allow.
    // Sweeps truncate GRACEFULLY at the deadline (skips reported with
    // their prior), so the JSON line is always emitted.
    val deadlineSec = sys.env.getOrElse("BENCH_DEADLINE_SEC", "2400").toDouble
    def deadlineLeft: Double = deadlineSec - globalElapsed
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-bench", cpus)
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1000000).selectExpr("sum(id)").collect() // JVM/codegen warmup

    // BENCH_QUERIES narrows the set ("all" or comma-separated names)
    // for focused profiling; default is the whole registry.
    val selected: Seq[String] = sys.env.get("BENCH_QUERIES") match {
      case Some("all") | None => SparkEntry.queries.keys.toSeq.sorted
      case Some(list) => list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }

    def runOnce(dir: String, capSec: Int = 600,
                only: String => Boolean = _ => true): Seq[(String, Timing)] =
      selected.filter(SparkEntry.queries.contains).filter(only)
        .map(name => name -> timedRun(spark, name, dir, capSec))

    // Warm per-query codegen at the smallest SF: generated classes are
    // cached by code shape, so a fast sf0.001 pass compiles every plan
    // and the timed runs measure execution, not Janino.
    val warmDir = new java.io.File(sfDir).getParent match {
      case null => sfDir
      case p if new java.io.File(s"$p/sf0.001").isDirectory => s"$p/sf0.001"
      case _ => sfDir
    }
    if (warmDir != sfDir) runOnce(warmDir)

    // Per-query minimum across SUCCESSFUL iterations (steady state,
    // GC-noise-free): a single contended iteration (concurrent JVM
    // stealing cores) can otherwise own the recorded number — and the
    // error/timeout sentinels (-1/-2) sort below any real timing, so
    // the min is taken over positive timings only; a query keeps its
    // sentinel (and lands in `failed`) only when EVERY repeat failed.
    val repeat = sys.env.getOrElse("BENCH_REPEAT", "2").toInt max 1
    // Repeats 2..N skip the streaming fixed-overhead queries (their
    // time is checkpoint/micro-batch cost — min-of-N is a no-op) and
    // stop entirely once the global deadline would be breached, so a
    // contended environment degrades to fewer repeats, never to a
    // killed process.
    val runs = (1 to repeat).flatMap { i =>
      if (i == 1) Some(runOnce(sfDir))
      else if (deadlineLeft < 600) {
        System.err.println(f"[bench] deadline ($deadlineSec%.0fs) near, " +
          s"skipping repeat $i")
        None
      } else Some(runOnce(sfDir, only = n => !isStreamingFixedOverhead(n)))
    }
    // per query: the fastest successful run's (sec, gcMs) pair — gc is
    // taken from the SAME run whose wall-time is reported, so the two
    // numbers describe one execution
    val picked = runs.head.map(_._1).map { name =>
      val timings = runs.flatMap(_.toMap.get(name))
      val ok = timings.filter(_.sec > 0)
      name -> (if (ok.nonEmpty) ok.minBy(_.sec)
               else timings.maxBy(_.sec)) // prefer -1 (timeout) over -2
    }
    val results = picked.map { case (n, t) => n -> t.sec }
    val gcMs = picked.map { case (n, t) => n -> t.gcMs.toDouble }
    val failed = results.collect { case (k, v) if v <= 0 => k }
    val timeAt01 = results.toMap

    // ── derived-scale sweep (shared by the 10× and 30× sections) ─────
    // cheapest-first under a global budget with a per-query cap, so a
    // superlinear query is DETECTED (flagged as a cliff) without the
    // sweep paying its full runtime.
    def sweep(copies: Int, budget: Int, cap: Int,
              prior: Map[String, Double] = Map.empty)
        : (String, Seq[String], Map[String, Double]) = {
      val scaledDir =
        new java.io.File(s"target/bench-scaled-x$copies").getAbsolutePath
      graft.sources.ScaledCorpus.build(spark, sfDir, scaledDir, copies)
      // cheapest-first by the best predictor available: a PRIOR sweep's
      // measured times when present (the 10× sweep predicts 30× far
      // better than 1× — at 1× the output-quadratic pair queries look
      // cheap, sort early, and eat the whole budget), else scaled 1×.
      // `_coarse` evidence twins are excluded BY NAME: they are
      // output-quadratic BY SEMANTICS (the unsuffixed adaptive
      // defaults are the scaling shape; the twins pin the
      // recall-maximal pair set at correctness SFs), so a derived-
      // scale cliff flag on them would re-report the null model every
      // round. The exclusion is reported in the top-level
      // `excluded_twins` field, never silent.
      val order = results.filter(_._2 > 0)
        .filterNot(_._1.endsWith("_coarse"))
        .filterNot(p => excludedSweep.contains(p._1))
        .sortBy { case (n, t1) => prior.getOrElse(n, t1 * copies) }
        .map(_._1)
      val sweepStart = System.nanoTime()
      def elapsed = (System.nanoTime() - sweepStart) / 1e9
      val timed = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val sweepGc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val errMsgs = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
      // Consecutive-error circuit breaker: a sick JVM (one r10-era run
      // failed 24 queries in a row, instantly, after 700 successful
      // runs — cause environmental, unreproducible) fails everything
      // it touches; each failure costs ~0 budget, so without a breaker
      // the sweep "times" the whole tail as errors and the artifact
      // reads as 24 distinct failures instead of one sick process.
      // Three unrelated queries failing back-to-back is not three
      // bugs; stop starting queries and report the rest as skips —
      // the recorded messages carry the shared root cause.
      var consecErrors = 0
      var cascadeAfter: Option[String] = None
      order.foreach { name =>
        // stop on the sweep's own budget, OR when the global deadline
        // no longer holds a full per-query cap + cancellation drain:
        // cheapest-first ordering means the unstarted tail is exactly
        // the expensive part, so truncating here (reported, with the
        // prior as the datapoint) is the graceful-degradation path
        // that keeps the artifact parseable under any wall-clock
        if (elapsed > budget || deadlineLeft < cap + 30 ||
            cascadeAfter.isDefined) skipped += name
        else {
          val t = timedRun(spark, name, scaledDir, cap)
          timed(name) = t.sec
          sweepGc(name) = t.gcMs.toDouble
          t.errMsg.foreach(m => errMsgs(name) = m)
          consecErrors = if (t.sec == -2.0) consecErrors + 1 else 0
          if (consecErrors >= 3) {
            cascadeAfter = Some(name)
            System.err.println(s"[bench] 3 consecutive errors ending at " +
              s"$name — treating as a sick JVM, skipping the rest of the " +
              s"${copies}x sweep")
          }
        }
      }
      if (skipped.nonEmpty)
        System.err.println(s"[bench] ${copies}x sweep budget (${budget}s) hit; " +
          s"skipped: ${skipped.mkString(",")}")
      // a skip must still carry a datapoint: the best prior (the 10×
      // sweep's measured time for the 30× section, else 1× scaled) —
      // so no query name ever appears in the artifact without a
      // scale number or an explicit predictor behind its skip
      val skDetail = skipped.map { n =>
        val p = prior.get(n)
          .orElse(timeAt01.get(n).filter(_ > 0).map(_ * copies))
          .map(v => f""","prior_sec":$v%.3f""").getOrElse("")
        f"""{"name":"$n"$p}"""
      }.mkString("[", ",", "]")
      // cliff: per-row cost at Nx data grew >2x vs the bench SF.
      // ratio = t_sfN / (copies * t_sf0.1); timeouts are cliffs by
      // definition (ratio from the cap is a LOWER bound).
      val cliffs = timed.toSeq.flatMap { case (name, tN) =>
        val t1 = timeAt01.getOrElse(name, 0.0)
        if (t1 <= 0.05 || tN == -2.0) None // too small to ratio / errored
        else {
          val eff = if (tN == -1.0) cap.toDouble else tN
          val ratio = eff / (copies * t1)
          // a timeout is ALWAYS a cliff (its ratio is only a LOWER
          // bound — the cap hid the true cost); otherwise ignore
          // sub-second absolute costs, where fixed per-query overhead
          // dominates and the ratio is noise
          if (tN == -1.0 || (ratio > 2.0 && eff > 2.0))
            Some((name, ratio, tN == -1.0))
          else None
        }
      }.sortBy(-_._2)
      // Per-INPUT-row ratio assumes work ∝ input. For pair-generating
      // queries (blocked self-joins) output grows ~quadratically in
      // block size, so a flagged ratio can still be sub-linear in true
      // work. Record measured output growth per cliff so the flag
      // carries its own null model: ratio ≪ rows_growth / copies
      // means the implementation scales; ratio ≈ rows_growth / copies
      // (or a timeout) means a real blow-up. base_rows disambiguates
      // the aggregate shape: a constant-size output (rows_growth 1 at
      // base_rows ~1) says the work lives in the internal stream and
      // output growth can't judge it either way.
      def outRows(name: String, dir: String): Long =
        try SparkEntry.queries(name)(spark, dir).count()
        catch { case _: Throwable => -1L }
      val rowsGrowth: Map[String, (Long, Double)] = cliffs.collect {
        case (name, _, timedOut) if !timedOut =>
          val base = outRows(name, sfDir)
          val scaled = outRows(name, scaledDir)
          name -> (base,
            if (base > 0 && scaled >= 0) scaled.toDouble / base else -1.0)
      }.toMap
      val cs = cliffs.map { case (n, r, to) =>
        val rg = rowsGrowth.get(n).filter(_._2 > 0)
          .map { case (base, g) =>
            f""","rows_growth":$g%.1f,"base_rows":$base%d"""
          }.getOrElse("")
        f"""{"name":"$n","ratio":$r%.2f,"timed_out":$to$rg}"""
      }.mkString("[", ",", "]")
      val sk = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      // errored queries (-2.0) are excluded from cliff ratios (no
      // timing to ratio) — name them explicitly so a scale-induced
      // failure is never readable as "not flagged"
      // each error carries its first message line — a cascade (shared
      // root cause repeated down the tail) is then readable from the
      // artifact alone
      val er = timed.collect { case (n, v) if v == -2.0 =>
        f"""{"name":"$n","msg":${jsonStr(errMsgs.getOrElse(n, ""))}}"""
      }.mkString("[", ",", "]")
      val casc = cascadeAfter.map(jsonStr).getOrElse("null")
      val json =
        f"""{"copies":$copies,"budget_sec":$budget,"query_cap_sec":$cap,"queries":${jsonDict(timed)},"gc_ms":${jsonDict(sweepGc)},"cliffs":$cs,"errored":$er,"cascade_stop_after":$casc,"skipped":$sk,"skipped_detail":$skDetail}"""
      (json, cliffs.map(_._1), timed.toMap)
    }

    val scaleCopies = sys.env.getOrElse("BENCH_SCALE_COPIES", "10").toInt
    val scaleBudget = sys.env.getOrElse("BENCH_SCALE_BUDGET_SEC", "900").toInt
    // 240s: with dd_ngram_prefix sweep-excluded, the slowest
    // genuinely-completing 10× query is well under 120s — the cap
    // only bounds true blow-ups now
    val scaleCap = sys.env.getOrElse("BENCH_SCALE_QUERY_CAP_SEC", "240").toInt
    val scaleOn = sys.env.getOrElse("BENCH_SCALE", "on") != "off" && scaleCopies > 1

    // 30× section: full registry, tighter budget (cheapest-first means
    // the budget cuts the most expensive tail, reported as skips).
    val scale30Copies = sys.env.getOrElse("BENCH_SCALE30_COPIES", "30").toInt
    // 900s DEFAULT — round 10 doubled this to 1800 and the full run
    // blew past the driver's outer wall-clock (BENCH_r10.json rc=124:
    // a dead artifact is worse than a truncated sweep). Full 30×
    // coverage runs locally with BENCH_SCALE30_BUDGET_SEC=1800
    // BENCH_DEADLINE_SEC=7200; the heavy tail's isolated 30× numbers
    // are tracked in BENCH_TAIL30.json instead of stretching the
    // driver run.
    val scale30Budget = sys.env.getOrElse("BENCH_SCALE30_BUDGET_SEC", "900").toInt
    val scale30Cap = sys.env.getOrElse("BENCH_SCALE30_QUERY_CAP_SEC", "240").toInt
    val scale30On =
      sys.env.getOrElse("BENCH_SCALE30", "on") != "off" && scale30Copies > 1

    val (scaleJson, cliffs10, timed10) =
      if (scaleOn) sweep(scaleCopies, scaleBudget, scaleCap)
      else ("null", Nil, Map.empty[String, Double])
    // the 10× measurements (scaled ×3) order the 30× sweep so the
    // known-expensive tail runs last and the budget buys max coverage
    val prior30 = timed10.collect { case (n, t) if t > 0 => n -> t * 3 }
    val (scale30Json, cliffs30, _) =
      if (scale30On) sweep(scale30Copies, scale30Budget, scale30Cap, prior30)
      else ("null", Nil, Map.empty[String, Double])

    // Isolated re-measurement of every 30× cliff: in-sweep timings run
    // back-to-back in a hot JVM, so cache/CPU pressure from the
    // previous query can inflate a ratio — round 10's three flags were
    // refuted as contention artifacts only in prose, invisible to the
    // artifact. Re-running each flagged query ALONE and recording both
    // ratios here lets every flag carry its own refutation (isolated
    // ratio ≤ 2) or confirmation (still > 2) in the tracked JSON.
    val recheckJson =
      if (scale30On && cliffs30.nonEmpty) {
        val dir30 =
          new java.io.File(s"target/bench-scaled-x$scale30Copies").getAbsolutePath
        cliffs30.flatMap { name =>
          if (deadlineLeft < scale30Cap + 30) None
          else {
            val t = timedRun(spark, name, dir30, scale30Cap)
            val t1 = timeAt01.getOrElse(name, 0.0)
            val iso =
              if (t.sec > 0 && t1 > 0) t.sec / (scale30Copies * t1) else -1.0
            Some(f"""{"name":"$name","sec_isolated":${t.sec}%.3f,"ratio_isolated":$iso%.2f}""")
          }
        }.mkString("[", ",", "]")
      } else "[]"

    val headlineResults = results.filter { case (k, v) => headline.contains(k) && v > 0 }
    val headlineTotal = headlineResults.map(_._2).sum
    val totalAll = results.collect { case (_, v) if v > 0 => v }.sum
    def names(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Key order = truncation priority: full dicts first, then the
    // headline per-query times, then the summary scalars — the last
    // ~1KB of the line is self-contained.
    val excludedTwins = results.collect {
      case (n, _) if n.endsWith("_coarse") => n
    }
    val failedDetail = picked.collect { case (n, t) if t.sec == -2.0 =>
      f"""{"name":"$n","msg":${jsonStr(t.errMsg.getOrElse(""))}}"""
    }.mkString("[", ",", "]")
    val line =
      f"""{"queries":${jsonDict(results)},"gc_ms":${jsonDict(gcMs)},"scale":$scaleJson,"scale30":$scale30Json,"headline_queries":${jsonDict(headlineResults)},"cliffs_10x":${names(cliffs10)},"cliffs_30x":${names(cliffs30)},"cliffs_rechecked":$recheckJson,"excluded_twins":${names(excludedTwins)},"excluded_sweep":${names(excludedSweep)},"elapsed_sec":$globalElapsed%.1f,"deadline_sec":$deadlineSec%.0f,"failed_detail":$failedDetail,"failed":${names(failed)},"total_all":$totalAll%.3f,"sf":"$sfDir","metric":"total","unit":"sec","value":$headlineTotal%.3f}"""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench.json"), line)
    // durable, TRACKED copy: the driver's BENCH_r{N}.json records only
    // the (truncated) tail of the printed line, and target/ is
    // regenerable — without this file the per-query evidence a round's
    // verdict cites would not survive the round. BENCH_OUT redirects a
    // focused local run (e.g. the isolated 30× tail sweep feeding
    // BENCH_TAIL30.json) so it can't stomp the full-run artifact.
    val outPath = sys.env.getOrElse("BENCH_OUT", "BENCH_LOCAL.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line)
    println(line)
    spark.stop()
  }
}
