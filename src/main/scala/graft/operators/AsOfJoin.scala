package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's Scala API lacks.
  *
  * For each left row, attach the most recent right row with
  * `right.ts <= left.ts` within the same key. Composed from built-ins
  * per the preference order (SURVEY.md §7.4): the union-sort-window
  * rendition needs ONE shuffle on (key) and no range-join row
  * explosion — each side is tagged, unioned, and a last-non-null
  * window carries the right row forward onto left rows. At 100 TB
  * this beats a range join (whose candidate set is unbounded) and
  * matches the sort-merge pattern a native AsOfJoinExec would use.
  *
  * Right values travel as ONE struct so all attached columns come
  * from the SAME right row (per-column carry would mix rows when a
  * right value column is legitimately null).
  */
object AsOfJoin {

  /** @param left       probe side (keeps all rows)
    * @param right      reference side (values carried forward)
    * @param keyCols    equality keys
    * @param leftTs     event-time column name on the left
    * @param rightTs    event-time column name on the right
    * @param valueCols  right columns to attach
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val packed = struct(valueCols.map(col): _*)
    val packedType = right.select(packed.as("_v")).schema("_v").dataType

    // _side: right=0 sorts before left=1 at equal ts → inclusive asof
    val taggedLeft = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_v", lit(null).cast(packedType))
    val taggedRight0 = right.select(
      (keyCols.map(col) :+ col(rightTs).as("_ts") :+ packed.as("_v")): _*)
      .withColumn("_side", lit(0))
    val taggedRight = leftCols.filterNot(keyCols.contains)
      .foldLeft(taggedRight0) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unioned = taggedLeft.unionByName(
      taggedRight.select(taggedLeft.columns.map(col): _*))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_v", last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((leftCols.map(col) ++
        valueCols.map(c => col(s"_v.$c").as(c))): _*)
  }

  /** As-of join with a TOLERANCE window (pandas `merge_asof
    * tolerance` / Flink interval-join semantics): a match older than
    * `tolerance` before the probe row is treated as NO match — every
    * attached column nulls out together (the match is one right ROW;
    * per-column nulling would leave a half-attached record). Same
    * one-shuffle union-sort-window plan as [[asofJoin]]; the
    * staleness check is a scan-side projection on top, so tolerance
    * costs nothing at any scale. `rightTs` must be among the carried
    * columns' namespace but differ from `leftTs` (both appear in the
    * output condition).
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame,
                        keyCols: Seq[String], leftTs: String, rightTs: String,
                        valueCols: Seq[String], tolerance: Column): DataFrame = {
    require(leftTs != rightTs,
      "leftTs and rightTs must have distinct names (both survive in the output)")
    val attached = (valueCols :+ rightTs).distinct
    val joined = asofJoin(left, right, keyCols, leftTs, rightTs, attached)
    val fresh = col(rightTs).isNotNull &&
      col(rightTs) >= col(leftTs) - tolerance
    joined.select((left.columns.toSeq.map(col) ++ attached.map(c =>
      when(fresh, col(c)).otherwise(lit(null)).as(c))): _*)
  }
}
