package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match left rows whose time falls inside right-side
  * `[start, end]` intervals — a category Spark has no native operator for
  * (a raw `t BETWEEN start AND end` condition plans as
  * BroadcastNestedLoopJoin, which is O(n·m) compares and only viable when
  * one side broadcasts).
  *
  * [[bucketedRangeJoin]] is the scale shape: each interval explodes to one
  * row per fixed-width time bucket it covers, the probe side computes its
  * single containing bucket, and the match becomes a plain EQUI-join on the
  * bucket key plus a residual `BETWEEN` filter. Shuffle volume is
  * O(intervals · avg_buckets_per_interval + probes), hash-partitioned like
  * any other join — no pairwise compare ever materializes. `bucketWidth`
  * trades interval fanout (wide intervals → more duplicate interval rows)
  * against bucket occupancy; set it near the typical interval length.
  *
  * A probe row lands in exactly one bucket, so a disjoint-interval join
  * needs no post-dedup; overlapping intervals yield one output row per
  * matching interval, exactly like the theta join would.
  */
object RangeJoin {

  /** Equi-bucket + residual-filter interval join.
    *
    * @param left        probe side; `leftTime` is a TIMESTAMP column name
    * @param right       interval side; `rightStart`/`rightEnd` TIMESTAMP
    *                    column names, inclusive bounds
    * @param bucketWidth bucket width in seconds
    */
  def bucketedRangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long = 3600L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c.cast("double") / bucketWidth).cast("long")

    // one row per (interval, covered bucket); sequence is inclusive on both
    // ends so an interval touching a bucket boundary still covers it
    val intervals = right.withColumn(
      "__bucket",
      explode(sequence(bucketOf(col(rightStart)), bucketOf(col(rightEnd)))))

    val probes = left.withColumn("__bucket", bucketOf(col(leftTime)))

    probes
      .join(intervals, Seq("__bucket"))
      .where(col(leftTime) >= col(rightStart) && col(leftTime) <= col(rightEnd))
      .drop("__bucket")
  }
}
