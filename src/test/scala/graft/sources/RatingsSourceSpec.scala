package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class RatingsSourceSpec extends AnyFunSuite with SparkFixture {

  test("headerless CSV triples parse to the canonical ratings schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/ratings.csv"),
      "1,2,5.0\n1,3,1.5\n2,2,4.0\nbad,line,x\n3,1,2.0\n")
    val df = RatingsSource.fromCsv(spark, s"$dir/ratings.csv")
    // csv source marks everything nullable; names/types must match exactly
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      RatingsSource.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(rows.toSeq == Seq((1L, 2L, 5.0), (1L, 3L, 1.5), (2L, 2L, 4.0), (3L, 1L, 2.0)))
  }

  test("CSV ratings train end-to-end through GraftALS") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv2").toString
    val rng = new scala.util.Random(3)
    val lines = (for (u <- 0 until 12; i <- 0 until 9 if rng.nextDouble() < 0.8)
      yield s"$u,$i,${(u % 3) + (i % 3) + 1}.0").mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/r.csv"), lines)
    val model = graft.als.GraftALS(
      rank = 4, maxIter = 8, regParam = 0.01,
      numUserBlocks = 2, numItemBlocks = 2,
      userCol = "user_id", itemCol = "item_id", ratingCol = "rating", seed = 11)
      .fit(RatingsSource.fromCsv(spark, s"$dir/r.csv"))
    val mse = model.mse(RatingsSource.fromCsv(spark, s"$dir/r.csv"), "rating")
    assert(mse < 0.5, s"mse=$mse")
  }

  test("implicit events derivation yields dense item ids and positive counts") {
    val df = RatingsSource.implicitFromEvents(spark, "/root/testdata/sf0.001")
    val items = df.select("item_id").distinct().collect().map(_.getLong(0)).sorted
    assert(items.toSeq == (1L to items.length)) // dense-rank ids
    assert(df.where("rating <= 0").count() == 0)
  }

  test("JSONL ingest tolerates corrupt lines and surfaces them for audit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part-0.jsonl"),
      """{"doc_id": 1, "text": "good one"}
        |not json at all {{{
        |{"doc_id": 2, "text": "also fine"}
        |{"doc_id": "not-a-number", "text": "type mismatch"}
        |""".stripMargin)
    // crawl-scale ingest contract: PERMISSIVE + explicit corrupt column —
    // good rows parse, bad rows land in _corrupt_record instead of failing
    // the job (FAILFAST would kill a 100 TB read for one bad shard)
    val df = spark.read
      .schema("doc_id BIGINT, text STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // required before filtering on the corrupt column (SPARK-21610)
    val good = df.where(col("_corrupt_record").isNull)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(good == Map(1L -> "good one", 2L -> "also fine"))
    val bad = df.where(col("_corrupt_record").isNotNull).count()
    assert(bad == 2, "both malformed lines must be quarantined, not dropped")
    df.unpersist()
    graft.streaming.EventsStream.deleteRecursively(new java.io.File(dir))
  }

  test("HashPartitioner semantics: nonNegativeMod over raw key hashCode (P1)") {
    // reference util/partitioner.py:13-28 — partition = nonNegativeMod(hash(key), n);
    // the kernel relies on org.apache.spark.HashPartitioner having identical
    // behavior for Long keys, including negative hashCodes
    val p = new org.apache.spark.HashPartitioner(7)
    for (k <- Seq(-10L, -1L, 0L, 1L, Long.MaxValue, Long.MinValue, 1234567890123L)) {
      val raw = k.hashCode % 7
      val expected = if (raw < 0) raw + 7 else raw
      assert(p.getPartition(k) == expected, s"key $k")
      assert(p.getPartition(k) >= 0 && p.getPartition(k) < 7)
    }
  }
}
