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
}
