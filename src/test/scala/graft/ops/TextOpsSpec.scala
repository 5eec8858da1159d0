package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class TextOpsSpec extends AnyFunSuite with SparkFixture {

  private def one(text: String) =
    spark.createDataFrame(
      Seq(Row(1L, text)).asJava,
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("token counting: array form and char-arithmetic form agree") {
    val df = one("the quick brown fox")
    val r = df.select(
      TextOps.tokenCount(col("text")),
      TextOps.tokenCountArith(col("text"))).collect().head
    assert(r.getInt(0) == 4 && r.getInt(1) == 4)
  }

  test("BPE-ish estimate charges long words more than one token") {
    val r = one("a internationalization x").select(TextOps.bpeTokenEstimate(col("text"))).collect().head
    // a=1, internationalization(20 chars)=5, x=1
    assert(r.getLong(0) == 7)
  }

  test("stopword ratio and punct ratio") {
    val r = one("the cat is on mat")
      .select(
        TextOps.stopwordRatio(col("text")),
        TextOps.punctRatio(col("text"))).collect().head
    assert(math.abs(r.getDouble(0) - 3.0 / 5.0) < 1e-12) // the, is, on
    assert(r.getDouble(1) == 0.0)
    val p = one("wait, what?!").select(TextOps.punctRatio(col("text"))).collect().head
    assert(math.abs(p.getDouble(0) - 3.0 / 12.0) < 1e-12) // , ? !
  }

  test("language id picks the language with most marker hits") {
    val cases = Seq(
      "the cat is in the house and it is warm" -> "en",
      "el perro y la casa de que es una" -> "es",
      "der hund und die katze ist von dem haus" -> "de",
      "le chien et la maison est pour le chat" -> "fr",
      "xyzzy qwerty asdf" -> "und")
    cases.foreach { case (text, expected) =>
      val got = one(text).select(TextOps.langId(col("text"))).collect().head.getString(0)
      assert(got == expected, s"'$text' -> got $got, want $expected")
    }
  }

  test("fingerprint equals the manual rolling hash") {
    val text = "abc xyz"
    val expected = text.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val got = one(text).select(TextOps.fingerprint(col("text"))).collect().head.getLong(0)
    assert(got == expected)
  }

  test("shingles produce n-1 overlapping word trigrams") {
    val got = one("a b c d e").select(TextOps.shingles(col("text"), 3)).collect().head.getSeq[String](0)
    assert(got == Seq("a b c", "b c d", "c d e"))
    // shorter than n: whole text as single shingle
    val short = one("a b").select(TextOps.shingles(col("text"), 3)).collect().head.getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("portableHash56 is the big-endian first-14-hex-chars of md5") {
    // known answer: md5('hello') = 5d41402abc4b2a76..., first 14 hex chars
    // parsed base-16 = 26248916684786474; DuckDB computes the same via
    // ('0x' || substr(md5(s),1,14))::BIGINT — the cross-engine contract
    val got = one("hello").select(TextOps.portableHash56(col("text")))
      .collect().head.getLong(0)
    assert(got == 26248916684786474L)
    assert(got == java.lang.Long.parseLong("5d41402abc4b2a", 16))
  }

  test("analyze projection exposes all feature columns on the fixture table") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = TextOps.analyze(docs)
    val cols = out.columns.toSet
    assert(Set("n_tokens", "n_tokens_bpe", "avg_token_len", "stopword_ratio",
      "punct_ratio", "quality", "lang_pred", "fingerprint").subsetOf(cols))
    val rows = out.limit(50).collect()
    assert(rows.forall(_.getAs[Double]("quality") >= 0.0))
    assert(rows.forall(r => r.getAs[Double]("quality") <= 1.0))
  }

  test("repetition stats quantify duplicate n-grams") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, "a a a a a"),   // 4 bigrams, all "a a": dup 3/4, top 4/4
      (2L, "w x y z"))     // 3 bigrams, all distinct: dup 0, top 1/3
      .toDF("doc_id", "text")
    val got = TextOps.repetitionStats(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_2grams") == 4L)
    assert(got(1L).getAs[Double]("dup_2gram_frac") == 0.75)
    assert(got(1L).getAs[Double]("top_2gram_frac") == 1.0)
    assert(got(1L).getAs[Double]("dup_3gram_frac") == 2.0 / 3.0)
    assert(got(2L).getAs[Double]("dup_2gram_frac") == 0.0)
    assert(got(2L).getAs[Double]("top_2gram_frac") == 1.0 / 3.0)
  }

  test("trigram OOV score matches a plain-Scala replay of train+score") {
    val texts = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the dog sat on the log",
      3L -> "zqx!7#", // all-rare trigrams
      4L -> "hi", // < 3 chars: no trigrams, must drop out
      5L -> "the the the the")
    val df = spark.createDataFrame(
      texts.map { case (id, t) => Row(id, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val topK = 8
    // plain-Scala replay
    def tris(t: String): Seq[String] =
      if (t.length < 3) Seq.empty else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    val counts = texts.flatMap(t => tris(t._2)).groupBy(identity).map { case (k, v) => k -> v.size }
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(topK).map(_._1).toSet
    val expected = texts.filter(_._2.length >= 3).map { case (id, t) =>
      val ts = tris(t)
      val oov = ts.count(!vocab.contains(_))
      id -> ((ts.size.toLong, oov.toLong, oov.toDouble / ts.size))
    }.toMap
    val got = TextOps.oovScore(df, topK = topK).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_trigrams"), r.getAs[Long]("oov_trigrams"),
          r.getAs[Double]("oov_rate")))
    }.toMap
    assert(got.keySet == expected.keySet)
    assert(!got.contains(4L), "sub-trigram docs must produce no row")
    expected.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
    // the all-rare doc must be fully OOV with a tiny vocab
    assert(got(3L)._2 == got(3L)._1)
  }
}
