package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for every left row, attach the latest right row with the same
  * key and `rightTime <= leftTime` — the standard point-in-time lookup
  * (prices, latest-order-before-event, slowly-changing dims).
  *
  * Spark has no native as-of join; per the engine's custom-operator policy
  * this is COMPOSED from existing operators (preference (a)): tag and union
  * both sides, one window pass per key ordered by (time, tag) carrying the
  * right side's payload forward (`last(..., ignoreNulls)`), keep left rows.
  *
  * Scale shape: one shuffle on the key (the window partition), one sort per
  * partition — same cost as a sort-merge join, with none of the range-join
  * row blowup a `left.t >= right.t` theta join would produce.
  */
object AsofJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side; if several right rows share
    *                   (key, time), the one with the greatest tiebreak
    *                   column wins — pre-aggregate if that is not desired
    * @param leftKey    join key column name on the left
    * @param rightKey   join key column name on the right
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param rightCols  right-side payload columns to attach (null when no
    *                   right row is at or before the left time)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag 0 = right (sorts before left at equal time: <= semantics), 1 = left
    val taggedLeft = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    val taggedRight0 = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
    // align schemas: left payload nulled on right rows and vice versa
    val allLeft = leftCols.map(c => c -> col(c)) ++ rightCols.map(c => c -> lit(null))
    val allRight = leftCols.map(c => c -> lit(null)) ++ rightCols.map(c => c -> col(c))
    def shape(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
      val selection = Seq(col("__k"), col("__t"), col("__tag")) ++
        cols.map { case (n, c) => c.as(n) }
      df.select(selection: _*)
    }
    val unioned = shape(taggedLeft, allLeft).unionByName(shape(taggedRight0, allRight))

    // carry the latest right payload forward within each key's timeline
    val orderCols = Seq(col("__t"), col("__tag")) ++ rightCols.map(col)
    val w = Window.partitionBy("__k")
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried
      .where(col("__tag") === 1)
      .drop("__k", "__t", "__tag")
  }
}
