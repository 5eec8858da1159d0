package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling (on by default) splits oversized post-shuffle
  * partitions, which covers most cases; explicit salting is the tool when a
  * single key is so hot that even split partitions bottleneck on one task,
  * or when the skewed side must join a NON-broadcastable right side.
  *
  * Mechanics: the skewed (left) side gets a salt in [0, saltFactor); the
  * right side is replicated `saltFactor`× with every salt value; the join
  * key becomes (key, salt). Row multiplicity is preserved exactly — each
  * left row joins the single replica carrying its salt.
  */
object SkewJoin {

  /** Seeded-rand salt: spreads even bit-identical hot rows, and Spark's
    * per-partition rand stream makes it stable under task retry.
    */
  private[ops] def withSalt(df: DataFrame, saltFactor: Int, seed: Long = 42L): DataFrame =
    df.withColumn("__salt", (rand(seed) * saltFactor).cast("int"))

  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    val leftSalted = withSalt(left, saltFactor)
    val rightReplicated = right.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    leftSalted
      .join(rightReplicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Skew-AWARE salted join: salt only the hot keys.
    *
    * [[saltedInnerJoin]] replicates the ENTIRE right side `saltFactor`× —
    * at 100 TB that multiplies the shuffle volume of a whole fact table to
    * fix what is almost always a handful of keys. The production shape:
    * estimate key frequencies from a bounded sample of the left side,
    * treat the (driver-bounded, ≤ `maxHotKeys`) heavy hitters as hot,
    * slice BOTH sides on membership, and pay replication only for the hot
    * slice — the cold remainder takes the plain co-partitioned join. On
    * data with no skew this degenerates to the plain join plus one cheap
    * sample pass; on a pathological key it bounds the widest task at
    * ~1/saltFactor of the hot key's rows. Row multiplicity is exact in
    * both slices, so the result is bit-identical to the plain join
    * (q25's oracle, and SkewJoinSpec's skewed-multiplicity property).
    */
  def skewAwareInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int = 8,
      sampleFraction: Double = 0.001,
      hotSampleCount: Long = 100L,
      maxHotKeys: Int = 1024): DataFrame = {
    require(saltFactor > 0)
    // a key sampled >= hotSampleCount times at sampleFraction has
    // ~hotSampleCount/sampleFraction expected occurrences — hot enough
    // that one post-shuffle task would own that many rows
    val hot = left.select(key).sample(withReplacement = false, sampleFraction, seed = 42L)
      .groupBy(key).count()
      .where(col("count") >= hotSampleCount)
      .orderBy(desc("count"))
      .limit(maxHotKeys)
      .select(key).collect().map(_.get(0))
    if (hot.isEmpty) left.join(right, Seq(key))
    else {
      val hotKeys = hot.toSeq
      val saltedHot = withSalt(left.where(col(key).isin(hotKeys: _*)), saltFactor)
        .join(
          right.where(col(key).isin(hotKeys: _*)).withColumn(
            "__salt", explode(sequence(lit(0), lit(saltFactor - 1)))),
          Seq(key, "__salt"))
        .drop("__salt")
      left.where(!col(key).isin(hotKeys: _*))
        .join(right.where(!col(key).isin(hotKeys: _*)), Seq(key))
        .unionByName(saltedHot)
    }
  }
}
