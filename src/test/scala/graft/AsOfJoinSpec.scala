package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = graft.functions.Functions.utcTimestamp(s)

  private def trades = Seq(
    (1L, ts("2024-01-01 10:00:05"), "t1"),
    (1L, ts("2024-01-01 10:00:10"), "t2"),
    (1L, ts("2024-01-01 09:00:00"), "t0"), // before any quote
    (2L, ts("2024-01-01 10:00:07"), "t3")
  ).toDF("key", "ts", "trade_id")

  private def quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0, "q1"),
    (1L, ts("2024-01-01 10:00:10"), 101.0, "q2"), // equal-ts with t2
    (2L, ts("2024-01-01 10:00:06"), 200.0, "q3")
  ).toDF("key", "q_ts", "price", "quote_id")

  test("asof attaches the latest at-or-before right row per key") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("key"),
      "ts", "q_ts", Seq("price", "quote_id")).collect()
      .map(r => r.getAs[String]("trade_id") ->
        (Option(r.getAs[java.lang.Double]("price")), r.getAs[String]("quote_id"))).toMap
    assert(out("t1") === (Some(100.0), "q1"))
    assert(out("t2") === (Some(101.0), "q2")) // inclusive: equal ts matches
    assert(out("t0") === (None, null))        // no earlier quote → nulls
    assert(out("t3") === (Some(200.0), "q3")) // other key isolated
  }

  test("all attached columns come from the same right row even with null values") {
    val q = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0), "q1"),
      (1L, ts("2024-01-01 10:00:04"), None: Option[Double], "q2") // later, null price
    ).toDF("key", "q_ts", "price", "quote_id")
    val t = Seq((1L, ts("2024-01-01 10:00:05"), "t1")).toDF("key", "ts", "trade_id")
    val row = AsOfJoin.asofJoin(t, q, Seq("key"), "ts", "q_ts",
      Seq("price", "quote_id")).collect()(0)
    // latest row is q2: its null price must NOT be backfilled from q1
    assert(row.getAs[String]("quote_id") === "q2")
    assert(row.getAs[java.lang.Double]("price") == null)
  }

  test("left column set and row count are preserved") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("key"),
      "ts", "q_ts", Seq("price"))
    assert(out.count() === trades.count())
    assert(out.columns.toSeq === (trades.columns.toSeq :+ "price"))
  }

  test("tolerance: stale matches null out atomically; fresh and " +
    "boundary matches survive; no-match rows unchanged") {
    // t1 at 10:00:05 ← q1 at 10:00:00 (5s old)
    // t2 at 10:00:10 ← q2 at 10:00:10 (0s old)
    val tol = (sec: Int) => AsOfJoin.asofJoinTolerance(
      trades, quotes, Seq("key"), "ts", "q_ts",
      Seq("price", "quote_id"), expr(s"INTERVAL $sec SECONDS"))
      .collect().map(r => r.getAs[String]("trade_id") ->
        (Option(r.getAs[java.lang.Double]("price")),
          Option(r.getAs[String]("quote_id")),
          Option(r.getAs[java.sql.Timestamp]("q_ts")))).toMap
    val wide = tol(60)
    assert(wide("t1") === (Some(100.0), Some("q1"),
      Some(ts("2024-01-01 10:00:00"))))
    assert(wide("t0") === (None, None, None))
    val tight = tol(3)
    // 5s-old match exceeds 3s tolerance: price, quote_id AND q_ts all null
    assert(tight("t1") === (None, None, None))
    // equal-ts match is 0s old: survives any tolerance
    assert(tight("t2") === (Some(101.0), Some("q2"),
      Some(ts("2024-01-01 10:00:10"))))
    // boundary: exactly-at-tolerance match is FRESH (>= cut)
    val exact = tol(5)
    assert(exact("t1")._2 === Some("q1"))
    // row count always preserved (left join semantics)
    assert(tol(1).size === trades.collect().length)
  }
}
