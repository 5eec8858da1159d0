package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen shingle kernel must be BIT-IDENTICAL to the declarative
  * HOF form it replaced — every downstream minhash signature and every
  * DuckDB oracle CTE replays the HOF semantics, so a single divergent
  * byte breaks the dedup tier's hash gates.
  */
class ShinglesExprSpec extends AnyFunSuite with SparkFixture {

  private def compare(texts: Seq[String], n: Int): Unit = {
    val spark2 = spark
    import spark2.implicits._
    val df = texts.toDF("t")
    val got = df.select(graft.ops.TextOps.shingles(col("t"), n)).collect()
      .map(r => r.getSeq[String](0).toList)
    val want = df.select(graft.ops.TextOps.shinglesHof(col("t"), n)).collect()
      .map(r => r.getSeq[String](0).toList)
    got.zip(want).zip(texts).foreach { case ((g, w), t) =>
      assert(g == w, s"n=$n text=${t.take(80).replace(" ", "·")}")
    }
  }

  test("codegen shingles equal the HOF form on crafted edge cases") {
    val cases = Seq(
      "", " ", "  ", "a", "a b", "a b c", "a b c d",
      "a  b", "  leading", "trailing  ", " both ",
      "one", "ünï çødé wörds hère", "汉 字 分 词",
      "tab\tis not a separator here", "x " * 5 + "x")
    for (n <- 1 to 5) compare(cases, n)
  }

  test("codegen shingles equal the HOF form on 300 random strings") {
    val rng = new scala.util.Random(42)
    val alphabet = "ab λ字 "
    val texts = Seq.fill(300)(
      Seq.fill(rng.nextInt(30))(alphabet(rng.nextInt(alphabet.length))).mkString)
    for (n <- Seq(2, 3, 4)) compare(texts, n)
  }

  test("interpreted eval (nullSafeEval) matches the codegen path and nulls pass through") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.sql.catalyst.util.ArrayData
    // direct Expression.eval: UnaryExpression.eval -> nullSafeEval, the
    // interpreted path that codegen-disabled plans and fallback take
    def interp(text: String, n: Int): List[String] = {
      val got = ShinglesExpr(Literal(text), n).eval(null)
      got.asInstanceOf[ArrayData].toObjectArray(StringType)
        .map(_.toString).toList
    }
    assert(interp("a b c d", 2) == List("a b", "b c", "c d"))
    assert(interp("x y", 2) == List("x y"))
    assert(interp("", 3) == List(""))
    // interpreted == codegen on the same inputs, via the DataFrame path
    val spark2 = spark
    import spark2.implicits._
    val viaCodegen = Seq("a b c d", "x y").toDF("t")
      .select(graft.ops.TextOps.shingles(col("t"), 2)).collect()
      .map(_.getSeq[String](0).toList)
    assert(viaCodegen.toList == List(interp("a b c d", 2), interp("x y", 2)))
    // null in -> null out, on both paths
    assert(ShinglesExpr(Literal(null, StringType), 2).eval(null) == null)
    val withNull = Seq(Some("a b c"), None).toDF("t")
      .select(graft.ops.TextOps.shingles(col("t"), 2).as("s")).collect()
    assert(withNull(0).getSeq[String](0).toList == List("a b", "b c"))
    assert(withNull(1).isNullAt(0))
  }
}
