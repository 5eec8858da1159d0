package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k buffer: parallel (ids, scores) kept sorted by score desc,
  * id asc, truncated at k.
  */
case class TopKBuf(ids: Seq[Long], scores: Seq[Double])

/** Bounded top-k aggregator: keeps the k largest (score, id) pairs per
  * group, merged map-side. The custom-aggregation surface of the engine
  * (SURVEY.md §2.11 "UDAF registration"): a per-group top-k through
  * `Window.orderBy(...).row_number <= k` sorts EVERY group's full row set;
  * this buffer is O(k) per group with partial (map-side) merge — the shape
  * that survives groups with millions of rows.
  *
  * Ordering: score descending, then id ascending — fully deterministic.
  */
final class TopKAggregator(k: Int) extends Aggregator[(Long, Double), TopKBuf, TopKBuf] {
  require(k > 0)

  override def zero: TopKBuf = TopKBuf(Vector.empty, Vector.empty)

  private def rebuild(pairs: Seq[(Long, Double)]): TopKBuf = {
    val top = pairs.sortBy { case (i, s) => (-s, i) }.take(k)
    TopKBuf(top.map(_._1), top.map(_._2))
  }

  override def reduce(buf: TopKBuf, row: (Long, Double)): TopKBuf = {
    if (buf.ids.size >= k) {
      val worstScore = buf.scores.last
      val worstId = buf.ids.last
      // cheap reject for the common case: row can't displace the floor
      if (row._2 < worstScore || (row._2 == worstScore && row._1 > worstId)) return buf
    }
    rebuild(buf.ids.zip(buf.scores) :+ row)
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    rebuild(a.ids.zip(a.scores) ++ b.ids.zip(b.scores))

  override def finish(reduction: TopKBuf): TopKBuf = reduction

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]

  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopKAggregator {
  /** Column form usable in `df.groupBy(...).agg(topK(3)(col(id), col(score)))`;
    * result is a struct of parallel arrays (ids, scores).
    */
  def topK(k: Int)(id: Column, score: Column): Column =
    udaf(new TopKAggregator(k)).apply(id, score)
}
