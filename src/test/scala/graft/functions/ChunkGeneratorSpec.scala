package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pure-expression property tests for the chunking Generator: `eval` on
  * literal children needs no Spark session, so the window arithmetic is
  * checked against a plain-Scala model across many random documents and
  * window/stride combinations (seeded — deterministic).
  */
class ChunkGeneratorSpec extends AnyFunSuite {

  private def chunksOf(text: String, w: Int, s: Int): Seq[(Int, Int, String)] = {
    val gen = ChunkGenerator(
      Literal(UTF8String.fromString(text)),
      Literal(w, IntegerType),
      Literal(s, IntegerType))
    gen.eval(InternalRow.empty).iterator.toSeq.map { r =>
      val row = r.asInstanceOf[InternalRow]
      (row.getInt(0), row.getInt(1), row.getUTF8String(2).toString)
    }
  }

  private def model(words: Seq[String], w: Int, s: Int): Seq[(Int, Int, String)] = {
    val n = words.length
    val nWin = math.ceil(math.max(n - w, 0).toDouble / s).toInt + 1
    (0 until nWin).map { i =>
      val chunk = words.slice(i * s, math.min(i * s + w, n))
      (i, chunk.length, chunk.mkString(" "))
    }
  }

  test("generator output matches the plain-Scala window model on random inputs") {
    val rng = new scala.util.Random(1234L)
    val vocab = Vector("a", "bb", "ccc", "dddd", "x1", "y2")
    for (_ <- 1 to 300) {
      val words = Vector.fill(1 + rng.nextInt(120))(vocab(rng.nextInt(vocab.size)))
      val s = 1 + rng.nextInt(40)
      val w = s + rng.nextInt(30)
      val got = chunksOf(words.mkString(" "), w, s)
      assert(got == model(words, w, s), s"n=${words.length} w=$w s=$s")
      // the last window always reaches the document end (no token is ever
      // dropped from the tail), and its token count matches its text
      val (_, lastTokens, lastText) = got.last
      assert(lastText.split(" ", -1).length == lastTokens)
      assert(words.mkString(" ").endsWith(lastText))
    }
  }

  test("null text generates no rows; empty string is one single-token chunk") {
    val nullGen = ChunkGenerator(
      Literal.create(null, org.apache.spark.sql.types.StringType),
      Literal(8, IntegerType), Literal(4, IntegerType))
    assert(nullGen.eval(InternalRow.empty).iterator.isEmpty)
    // "" splits into one empty token — one chunk, one token, empty text
    assert(chunksOf("", 8, 4) == Seq((0, 1, "")))
  }
}
